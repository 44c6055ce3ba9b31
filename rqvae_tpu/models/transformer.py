"""Pre-RMSNorm encoder-decoder transformer.

Parity: reference modules/transformer/model.py:21-188 and attention.py:17-233.
  * block: x + selfattn(drop(rmsnorm(x))); optional cross-attn whose query is
    built from the ORIGINAL block input x (reference model.py:76-79 — a quirk
    we reproduce: the cross branch reads cross_attn_norm(x), not attn_out);
    then out = attn_out + ff(attn_out) with ff = rmsnorm -> MLP(1024, dropout)
    -> dropout.
  * fused qkv projection for self-attention, separate q / kv for cross
    (reference attention.py:169-173); no bias anywhere; final proj no bias.
  * attention-prob dropout is OFF (the reference constructs Attend with
    dropout=False at attention.py:179).
  * encoder = n//2 non-causal blocks over the (masked) history; decoder =
    n//2 causal blocks with cross-attention (reference model.py:139-188).
  * the reference allocates but never uses block.ffn_norm and a KV cache that
    is hard-asserted off (attention.py:161); neither is replicated — the
    generation loop carries the encoder context explicitly instead.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp

from rqvae_tpu.models import mlp
from rqvae_tpu.models.normalize import rms_norm, rms_norm_init
from rqvae_tpu.ops import attention as attn_ops
from rqvae_tpu.utils import initializers


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    d_model: int
    num_heads: int
    dropout: float = 0.0
    encoder_layers: int = 4
    decoder_layers: int = 4
    mlp_hidden_dim: int = 1024

    def __post_init__(self):
        assert self.d_model % self.num_heads == 0, "d_model % num_heads != 0"


def _attn_init(key, d_model: int, cross: bool):
    if cross:
        kq, kkv, kp = jax.random.split(key, 3)
        return {
            "wq": initializers.linear(kq, d_model, d_model),
            "wkv": initializers.linear(kkv, d_model, 2 * d_model),
            "proj": initializers.linear(kp, d_model, d_model),
        }
    kqkv, kp = jax.random.split(key)
    return {
        "wqkv": initializers.linear(kqkv, d_model, 3 * d_model),
        "proj": initializers.linear(kp, d_model, d_model),
    }


def _block_init(key, cfg: TransformerConfig, cross: bool):
    keys = jax.random.split(key, 6)
    params = {
        "attn": _attn_init(keys[0], cfg.d_model, cross=False),
        "attn_norm": rms_norm_init(cfg.d_model),
        "ff_norm": rms_norm_init(cfg.d_model),
        "ff_mlp": mlp.init(keys[1], cfg.d_model, (cfg.mlp_hidden_dim,), cfg.d_model),
    }
    if cross:
        params["cross_attn"] = _attn_init(keys[2], cfg.d_model, cross=True)
        params["cross_attn_norm"] = rms_norm_init(cfg.d_model)
    return params


def init(key: jax.Array, cfg: TransformerConfig):
    k_enc, k_dec = jax.random.split(key)
    enc_keys = jax.random.split(k_enc, max(cfg.encoder_layers, 1))
    dec_keys = jax.random.split(k_dec, max(cfg.decoder_layers, 1))
    return {
        "encoder": [
            _block_init(enc_keys[i], cfg, cross=False)
            for i in range(cfg.encoder_layers)
        ],
        "decoder": [
            _block_init(dec_keys[i], cfg, cross=True)
            for i in range(cfg.decoder_layers)
        ],
    }


def _dropout(x, p, training, rng):
    if not training or p <= 0.0:
        return x, rng
    rng, sub = jax.random.split(rng)
    keep = jax.random.bernoulli(sub, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0), rng


def _self_attention(p, x, num_heads, *, causal, k_mask, q_spans=None):
    qkv = x @ p["wqkv"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    out = attn_ops.attend(
        attn_ops.split_heads(q, num_heads),
        attn_ops.split_heads(k, num_heads),
        attn_ops.split_heads(v, num_heads),
        causal=causal,
        k_mask=k_mask,
        q_spans=q_spans,
    )
    return attn_ops.merge_heads(out) @ p["proj"].astype(x.dtype)


def _cross_attention(p, x, context, num_heads, *, k_mask, q_spans=None):
    q = x @ p["wq"].astype(x.dtype)
    kv = context @ p["wkv"].astype(x.dtype)
    k, v = jnp.split(kv, 2, axis=-1)
    out = attn_ops.attend(
        attn_ops.split_heads(q, num_heads),
        attn_ops.split_heads(k, num_heads),
        attn_ops.split_heads(v, num_heads),
        causal=False,
        k_mask=k_mask,
        q_spans=q_spans,
    )
    return attn_ops.merge_heads(out) @ p["proj"].astype(x.dtype)


def _block_apply(
    p,
    cfg: TransformerConfig,
    x: jax.Array,
    *,
    causal: bool,
    self_k_mask=None,
    context: Optional[jax.Array] = None,
    cross_k_mask=None,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    self_spans=None,
    cross_spans=None,
):
    h, rng = _dropout(rms_norm(x, p["attn_norm"]), cfg.dropout, training, rng)
    attn_out = x + _self_attention(
        p["attn"], h, cfg.num_heads, causal=causal, k_mask=self_k_mask,
        q_spans=self_spans,
    )
    if context is not None:
        # quirk parity: cross query reads the BLOCK INPUT x, not attn_out
        hc, rng = _dropout(
            rms_norm(x, p["cross_attn_norm"]), cfg.dropout, training, rng
        )
        attn_out = attn_out + _cross_attention(
            p["cross_attn"], hc, context, cfg.num_heads, k_mask=cross_k_mask,
            q_spans=cross_spans,
        )
    ff_in = rms_norm(attn_out, p["ff_norm"])
    if rng is not None:
        rng, sub = jax.random.split(rng)
    else:
        sub = None
    ff = mlp.apply(
        p["ff_mlp"], ff_in, dropout=cfg.dropout, training=training, rng=sub
    )
    ff, rng = _dropout(ff, cfg.dropout, training, rng)
    return attn_out + ff, rng


def encode(
    params,
    cfg: TransformerConfig,
    context_in: jax.Array,        # (B, Nc, d_model)
    context_mask: jax.Array,      # (B, Nc) bool
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    self_spans=None,
) -> jax.Array:
    """Non-causal self-attention stack over the history. ``self_spans``
    (packed training) replaces the key mask with per-query key windows."""
    x = context_in
    for block in params["encoder"]:
        x, rng = _block_apply(
            block, cfg, x, causal=False,
            self_k_mask=None if self_spans is not None else context_mask,
            self_spans=self_spans,
            training=training, rng=rng,
        )
    return x


def decode(
    params,
    cfg: TransformerConfig,
    x: jax.Array,                 # (B, Nf, d_model) future/target side
    context: jax.Array,           # (B, Nc, d_model) encoder output
    context_mask: jax.Array,      # (B, Nc) bool
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    self_spans=None,
    cross_spans=None,
) -> jax.Array:
    """Causal self-attention + cross-attention to the encoder output.

    Packed training passes ``self_spans`` (causal-within-segment expressed
    as hi = own position + 1) and ``cross_spans`` (own segment's encoder
    window) instead of plain causality and the key mask."""
    for block in params["decoder"]:
        x, rng = _block_apply(
            block,
            cfg,
            x,
            causal=self_spans is None,
            context=context,
            cross_k_mask=None if cross_spans is not None else context_mask,
            training=training,
            rng=rng,
            self_spans=self_spans,
            cross_spans=cross_spans,
        )
    return x


def cross_kv(params, cfg: TransformerConfig, context: jax.Array):
    """Precompute every decoder block's cross-attention K/V from the encoder
    output — the generation loop's KV cache (the reference wrote a KV cache
    but hard-disabled it, attention.py:161; here it is the designed-in path).
    Returns a list over decoder blocks of (k, v), each (B, Nc, H, Dh)."""
    out = []
    for block in params["decoder"]:
        p = block["cross_attn"]
        kv = context @ p["wkv"].astype(context.dtype)
        k, v = jnp.split(kv, 2, axis=-1)
        out.append(
            (
                attn_ops.split_heads(k, cfg.num_heads),
                attn_ops.split_heads(v, cfg.num_heads),
            )
        )
    return out


def _fold_beams(x: jax.Array, beams: int) -> jax.Array:
    """(B*beams, Nf, H, Dh) -> (B, beams*Nf, H, Dh): beams of one row share
    cross-attention K/V, so they ride the query axis of one attention call.
    In the BNHD layout this is a pure reshape (beams and Nf are adjacent)."""
    bk, nf, h, dh = x.shape
    b = bk // beams
    return x.reshape(b, beams * nf, h, dh)


def _unfold_beams(x: jax.Array, beams: int) -> jax.Array:
    b, bn, h, dh = x.shape
    nf = bn // beams
    return x.reshape(b * beams, nf, h, dh)


def decode_with_kv(
    params,
    cfg: TransformerConfig,
    x: jax.Array,           # (B*beams, Nf, d_model)
    kv,                     # cross_kv() output: [(B, Nc, H, Dh)] per block
    context_mask: jax.Array,  # (B, Nc) bool
    *,
    beams: int = 1,
) -> jax.Array:
    """Generation-path decoder: causal self-attention per beam row +
    beam-folded cross-attention against the cached K/V (no per-step, per-beam
    K/V recompute)."""
    for block, (ck, cv) in zip(params["decoder"], kv):
        h = rms_norm(x, block["attn_norm"])
        attn_out = x + _self_attention(
            block["attn"], h, cfg.num_heads, causal=True, k_mask=None
        )
        hc = rms_norm(x, block["cross_attn_norm"])  # quirk: block input x
        p = block["cross_attn"]
        q = attn_ops.split_heads(
            hc @ p["wq"].astype(hc.dtype), cfg.num_heads
        )
        qf = _fold_beams(q, beams)
        of = attn_ops.attend(qf, ck, cv, causal=False, k_mask=context_mask)
        cross_out = attn_ops.merge_heads(_unfold_beams(of, beams))
        attn_out = attn_out + cross_out @ p["proj"].astype(x.dtype)
        ff = mlp.apply(block["ff_mlp"], rms_norm(attn_out, block["ff_norm"]))
        x = attn_out + ff
    return x


def decode_step_with_kv(
    params,
    cfg: TransformerConfig,
    x_new: jax.Array,       # (B*beams, 1, d_model) — the NEWEST fut token only
    self_kv,                # None (first token) or tuple per block of
                            # (k, v) each (B*beams, T, H, Dh)
    kv,                     # cross_kv() output per block
    context_mask: jax.Array,
    *,
    beams: int = 1,
):
    """Single-token decoder step with a growing self-attention KV cache.

    The full-prefix path (decode_with_kv) reprocesses every fut position at
    every beam step — Σ(i+1) token passes over the 4-step loop; this step
    processes exactly one. The newest position attends every cached one, so
    causality is positional and needs no mask; beams reorder between steps
    by gathering the cache along the beam axis (generation.py).

    Returns (x_out (B*beams, 1, d_model), new self_kv with T+1 entries).
    """
    x = x_new
    new_kv = []
    for li, (block, (ck, cv)) in enumerate(zip(params["decoder"], kv)):
        h = rms_norm(x, block["attn_norm"])
        p = block["attn"]
        qkv = h @ p["wqkv"].astype(h.dtype)
        q1, k1, v1 = (
            attn_ops.split_heads(t, cfg.num_heads)
            for t in jnp.split(qkv, 3, axis=-1)
        )
        if self_kv is None:
            k_full, v_full = k1, v1
        else:
            pk, pv = self_kv[li]
            k_full = jnp.concatenate([pk, k1], axis=1)
            v_full = jnp.concatenate([pv, v1], axis=1)
        new_kv.append((k_full, v_full))
        sa = attn_ops.merge_heads(
            attn_ops.attend(q1, k_full, v_full, causal=False)
        ) @ p["proj"].astype(x.dtype)
        attn_out = x + sa

        hc = rms_norm(x, block["cross_attn_norm"])  # quirk: block input x
        pc = block["cross_attn"]
        qf = _fold_beams(
            attn_ops.split_heads(hc @ pc["wq"].astype(hc.dtype), cfg.num_heads),
            beams,
        )
        of = attn_ops.attend(qf, ck, cv, causal=False, k_mask=context_mask)
        cross_out = attn_ops.merge_heads(_unfold_beams(of, beams))
        attn_out = attn_out + cross_out @ pc["proj"].astype(x.dtype)
        ff = mlp.apply(block["ff_mlp"], rms_norm(attn_out, block["ff_norm"]))
        x = attn_out + ff
    return x, tuple(new_kv)


def apply(
    params,
    cfg: TransformerConfig,
    x: jax.Array,
    context_in: jax.Array,
    context_mask: jax.Array,
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    cached_context: Optional[jax.Array] = None,
):
    """Full encoder-decoder pass; pass ``cached_context`` to skip the encoder
    (the generation loop's explicit replacement for the reference's
    ``cached_enc_output`` attribute, model.py:181-186)."""
    if cached_context is None:
        if rng is not None:
            rng, enc_rng = jax.random.split(rng)
        else:
            enc_rng = None
        context = encode(
            params, cfg, context_in, context_mask, training=training, rng=enc_rng
        )
    else:
        context = cached_context
    out = decode(
        params, cfg, x, context, context_mask, training=training, rng=rng
    )
    return out, context
