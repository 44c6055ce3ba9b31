"""Encoder-decoder generative-retrieval model over semantic-ID sequences.

Parity: reference modules/model.py:41-282 (EncoderDecoderRetrievalModel).
  * embedding sum: level-offset semantic-ID table + learned absolute
    positional table over flat token positions; user-ID hash-bucket token
    prepended to the history (model.py:101-123).
  * future side: learned BOS + (fut embedding + token-type embedding).
    (The reference allocates ``tte_fut`` but embeds with ``tte`` —
    model.py:78 vs :118; we keep the single used table.)
  * heavy input dropout p=0.5 on both streams (model.py:66, the shared
    ``self.do``), then RMSNorm -> in_proj to the attention width.
  * loss: per-position CE (ignore -1) on fut positions, summed over the
    sem-ID tuple, meaned over batch, plus per-position ``loss_d``
    (model.py:254-269).

The forward is pure and fully jittable; generation-time encoder caching is an
explicit return value, not module state.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rqvae_tpu.data.schemas import TokenizedSeqBatch
from rqvae_tpu.models import embeddings, transformer
from rqvae_tpu.models.normalize import rms_norm, rms_norm_init
from rqvae_tpu.models.transformer import TransformerConfig
from rqvae_tpu.utils import initializers


@dataclasses.dataclass(frozen=True)
class RetrievalConfig:
    embedding_dim: int = 128
    attn_dim: int = 512
    dropout: float = 0.3
    num_heads: int = 8
    n_layers: int = 8              # encoder + decoder total; split in half
    num_embeddings: int = 256      # codebook size
    sem_id_dim: int = 4            # n_layers_rqvae + 1 (dedup dim)
    max_pos: int = 80              # max flat token positions (N * sem_id_dim)
    user_hash_buckets: int = 2000  # reference model.py:74
    input_dropout: float = 0.5     # reference model.py:66 (hardcoded)
    mlp_hidden_dim: int = 1024

    @property
    def transformer(self) -> TransformerConfig:
        return TransformerConfig(
            d_model=self.attn_dim,
            num_heads=self.num_heads,
            dropout=self.dropout,
            encoder_layers=self.n_layers // 2,
            decoder_layers=self.n_layers // 2,
            mlp_hidden_dim=self.mlp_hidden_dim,
        )


class ModelOutput(NamedTuple):
    loss: jax.Array     # scalar
    logits: jax.Array   # (B, D, K) training / (B, K) generation step
    loss_d: jax.Array   # (D,) per-position loss


def init(key: jax.Array, cfg: RetrievalConfig):
    keys = jax.random.split(key, 9)
    e, a = cfg.embedding_dim, cfg.attn_dim
    return {
        "bos": initializers.uniform01(keys[0], (e,)),
        "norm": rms_norm_init(e),
        "norm_cxt": rms_norm_init(e),
        "sem_emb": embeddings.sem_id_embedder_init(
            keys[1], cfg.num_embeddings, cfg.sem_id_dim, e
        ),
        "user_emb": embeddings.user_id_embedder_init(
            keys[2], cfg.user_hash_buckets, e
        ),
        "wpe": initializers.normal(keys[3], (cfg.max_pos, e)),
        "tte": initializers.normal(keys[4], (cfg.sem_id_dim, e)),
        "in_proj": initializers.linear(keys[5], e, a),
        "in_proj_context": initializers.linear(keys[6], e, a),
        "out_proj": initializers.linear(keys[7], a, cfg.num_embeddings),
        "transformer": transformer.init(keys[8], cfg.transformer),
    }


def _dropout(x, p, training, rng):
    if not training or p <= 0.0:
        return x, rng
    rng, sub = jax.random.split(rng)
    keep = jax.random.bernoulli(sub, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0), rng


def embed_context(params, cfg: RetrievalConfig, batch: TokenizedSeqBatch):
    """History stream: [user token, wpe + sem-ID embeddings] and its mask."""
    b, n = batch.sem_ids.shape
    sem = embeddings.sem_id_embed(
        params["sem_emb"], batch.sem_ids, batch.token_type_ids,
        cfg.num_embeddings, batch.seq_mask,
    )
    pos = jnp.arange(n)
    sem = sem + params["wpe"][pos][None, :, :]
    user = embeddings.user_id_embed(params["user_emb"], batch.user_ids)
    ctx = jnp.concatenate([user[:, None, :], sem], axis=1)
    mask = jnp.concatenate(
        [jnp.ones((b, 1), dtype=bool), batch.seq_mask], axis=1
    )
    return ctx, mask


def embed_future(params, cfg: RetrievalConfig, batch: TokenizedSeqBatch):
    """Target stream: [BOS, fut embedding + token-type embedding]."""
    b = batch.sem_ids.shape[0]
    bos = jnp.broadcast_to(params["bos"], (b, 1, cfg.embedding_dim))
    if batch.sem_ids_fut is None:
        return bos
    fut = embeddings.sem_id_embed(
        params["sem_emb"], batch.sem_ids_fut, batch.token_type_ids_fut,
        cfg.num_embeddings,
    )
    fut = fut + params["tte"][batch.token_type_ids_fut]
    return jnp.concatenate([bos, fut], axis=1)


def predict(
    params,
    cfg: RetrievalConfig,
    batch: TokenizedSeqBatch,
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
    cached_context: Optional[jax.Array] = None,
):
    """Shared trunk (reference model.py:101-147): embed, project, transform.
    Returns (decoder output (B, Nf, A), encoder context (B, Nc, A), mask)."""
    ctx_emb, ctx_mask = embed_context(params, cfg, batch)
    fut_emb = embed_future(params, cfg, batch)

    h_ctx, rng = _dropout(
        rms_norm(ctx_emb, params["norm"]), cfg.input_dropout, training, rng
    )
    h_fut, rng = _dropout(
        rms_norm(fut_emb, params["norm_cxt"]), cfg.input_dropout, training, rng
    )
    ctx_in = h_ctx @ params["in_proj_context"].astype(h_ctx.dtype)
    fut_in = h_fut @ params["in_proj"].astype(h_fut.dtype)

    out, context = transformer.apply(
        params["transformer"],
        cfg.transformer,
        fut_in,
        ctx_in,
        ctx_mask,
        training=training,
        rng=rng,
        cached_context=cached_context,
    )
    return out, context, ctx_mask


def cross_entropy_ignore(
    logits: jax.Array, targets: jax.Array
) -> jax.Array:
    """Per-position CE with ignore_index=-1 semantics (0 at ignored).

    Targets outside [0, K) are also ignored: a degenerate tokenizer can emit
    dedup ranks >= codebook_size (unrepresentable by the K-way head); the
    train loop warns, and the loss stays finite instead of NaN-ing.
    """
    valid = (targets >= 0) & (targets < logits.shape[-1])
    safe = jnp.clip(targets, 0, logits.shape[-1] - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.where(valid, nll, 0.0)


def forward(
    params,
    cfg: RetrievalConfig,
    batch: TokenizedSeqBatch,
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
) -> ModelOutput:
    """Training/eval-loss forward (reference model.py:247-269)."""
    out, _, _ = predict(params, cfg, batch, training=training, rng=rng)
    logits = out @ params["out_proj"].astype(out.dtype)   # (B, D+1, K)
    logits = logits[:, :-1, :]                            # predict positions 0..D-1
    unred = cross_entropy_ignore(logits, batch.sem_ids_fut)  # (B, D)
    loss = jnp.mean(jnp.sum(unred, axis=1))
    loss_d = jnp.mean(unred, axis=0)
    return ModelOutput(loss=loss, logits=logits, loss_d=loss_d)


# ---------------------------------------------------------------------------
# Packed training path (data/packing.py): several user segments per row
# ---------------------------------------------------------------------------
# Token layout per row (R rows, S slots, N item capacity, D = sem_id_dim):
#   encoder: [user_0 .. user_{S-1}] ++ item tokens in (item, level) order
#            (Nc = S + N*D tokens; segment s's item tokens are contiguous)
#   decoder: S blocks of [BOS, fut_0 .. fut_{D-1}]  (Nf = S*(D+1) tokens)
# Attention is segment-local via per-query key spans (ops/attention.
# span_mask): window = own segment's item-token range, extra column = own
# user token. Per-segment semantics (embeddings, positions, loss) are
# EXACTLY the flat model's — tests/test_packing.py locks one-segment-per-row
# packed forward to the flat forward.


def packed_spans(cfg: RetrievalConfig, tok):
    """Derive the three span sets from the packing metadata.

    Returns (enc_spans, fut_self_spans, cross_spans), each a (lo, hi, extra)
    triple of (R, Nq) int32 — see ops/attention.span_mask.
    """
    r, s = tok.slot_valid.shape
    n = tok.seg_item.shape[1]
    d = cfg.sem_id_dim

    item_seg = jnp.repeat(tok.seg_item, d, axis=1)          # (R, N*D)
    lo_slot = s + tok.slot_start * d                        # (R, S) token lo
    hi_slot = lo_slot + tok.slot_len * d

    def window(seg):
        safe = jnp.maximum(seg, 0)
        lo = jnp.take_along_axis(lo_slot, safe, axis=1)
        hi = jnp.take_along_axis(hi_slot, safe, axis=1)
        ok = seg >= 0
        return jnp.where(ok, lo, 0), jnp.where(ok, hi, 0)

    # encoder self-attention: user tokens sit at columns 0..S-1, so a
    # token's extra column IS its slot index
    slot_ids = jnp.arange(s, dtype=jnp.int32)[None]
    user_seg = jnp.where(tok.slot_valid, slot_ids, -1)      # (R, S)
    lo_u, hi_u = window(user_seg)
    lo_i, hi_i = window(item_seg)
    enc_spans = (
        jnp.concatenate([lo_u, lo_i], axis=1),
        jnp.concatenate([hi_u, hi_i], axis=1),
        jnp.concatenate([user_seg, item_seg], axis=1),
    )

    # decoder fut side: slot s owns positions [s*(D+1), (s+1)*(D+1))
    nf = s * (d + 1)
    pos = jnp.arange(nf, dtype=jnp.int32)
    slot_of_fut = pos // (d + 1)                            # static layout
    fut_self_spans = (
        jnp.broadcast_to(slot_of_fut * (d + 1), (r, nf)),
        jnp.broadcast_to(pos + 1, (r, nf)),                 # causal in-slot
        jnp.full((r, nf), -1, jnp.int32),
    )

    fut_seg = jnp.where(
        tok.slot_valid[:, slot_of_fut], slot_of_fut[None], -1
    )                                                       # (R, Nf)
    lo_f, hi_f = window(fut_seg)
    cross_spans = (lo_f, hi_f, fut_seg)
    return enc_spans, fut_self_spans, cross_spans


def embed_packed_context(params, cfg: RetrievalConfig, tok):
    """[S user tokens] ++ [wpe + sem-ID embeddings]; positions restart per
    segment (identical to the flat embed_context per segment)."""
    r, nd = tok.sem_ids.shape
    n = tok.seg_item.shape[1]
    d = cfg.sem_id_dim
    sem = embeddings.sem_id_embed(
        params["sem_emb"], tok.sem_ids, tok.token_type_ids,
        cfg.num_embeddings, tok.seq_mask,
    )
    seg_pos = jnp.arange(n, dtype=jnp.int32)[None] - jnp.take_along_axis(
        tok.slot_start, jnp.maximum(tok.seg_item, 0), axis=1
    )                                                       # (R, N)
    tok_pos = jnp.repeat(seg_pos, d, axis=1) * d + jnp.tile(
        jnp.arange(d, dtype=jnp.int32), (r, n)
    )
    tok_pos = jnp.clip(tok_pos, 0, params["wpe"].shape[0] - 1)
    # one-hot matmul instead of a dynamic gather: the flat path's wpe add is
    # a static slice (free backward); a per-token gather here would make the
    # backward a serialized scatter-add into the table. As a matmul both
    # directions ride the MXU and XLA fuses the one-hot generation.
    oh = jax.nn.one_hot(tok_pos, params["wpe"].shape[0], dtype=sem.dtype)
    sem = sem + oh @ params["wpe"].astype(sem.dtype)
    user = embeddings.user_id_embed(params["user_emb"], tok.user_ids)
    return jnp.concatenate([user, sem], axis=1)             # (R, S+N*D, E)


def embed_packed_future(params, cfg: RetrievalConfig, tok):
    """S blocks of [BOS, fut embedding + token-type embedding]."""
    r, s, d = tok.sem_ids_fut.shape
    e = cfg.embedding_dim
    tt = jnp.broadcast_to(jnp.arange(d, dtype=jnp.int32), (r, s, d))
    fut = embeddings.sem_id_embed(
        params["sem_emb"], tok.sem_ids_fut, tt, cfg.num_embeddings
    ) + params["tte"][tt]                                   # (R, S, D, E)
    bos = jnp.broadcast_to(params["bos"], (r, s, 1, e))
    return jnp.concatenate([bos, fut], axis=2).reshape(r, s * (d + 1), e)


def forward_packed(
    params,
    cfg: RetrievalConfig,
    tok,                       # semids.PackedTokenizedBatch
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
) -> ModelOutput:
    """Training/eval-loss forward over a packed batch.

    Loss is the mean over VALID SLOTS of the per-example position-summed CE
    — i.e. exactly the flat forward's loss over the examples the batch
    packed (the flat step's batch mean, at a per-step example count set by
    the packer).
    """
    ctx_emb = embed_packed_context(params, cfg, tok)
    fut_emb = embed_packed_future(params, cfg, tok)

    h_ctx, rng = _dropout(
        rms_norm(ctx_emb, params["norm"]), cfg.input_dropout, training, rng
    )
    h_fut, rng = _dropout(
        rms_norm(fut_emb, params["norm_cxt"]), cfg.input_dropout, training, rng
    )
    ctx_in = h_ctx @ params["in_proj_context"].astype(h_ctx.dtype)
    fut_in = h_fut @ params["in_proj"].astype(h_fut.dtype)

    enc_spans, fut_self_spans, cross_spans = packed_spans(cfg, tok)
    if rng is not None:
        rng, enc_rng = jax.random.split(rng)
    else:
        enc_rng = None
    context = transformer.encode(
        params["transformer"], cfg.transformer, ctx_in, None,
        training=training, rng=enc_rng, self_spans=enc_spans,
    )
    out = transformer.decode(
        params["transformer"], cfg.transformer, fut_in, context, None,
        training=training, rng=rng,
        self_spans=fut_self_spans, cross_spans=cross_spans,
    )
    logits = out @ params["out_proj"].astype(out.dtype)     # (R, S*(D+1), K)
    r, s, d = tok.sem_ids_fut.shape
    logits = logits.reshape(r, s, d + 1, -1)[:, :, :d]      # predict 0..D-1
    targets = jnp.where(tok.slot_valid[:, :, None], tok.sem_ids_fut, -1)
    unred = cross_entropy_ignore(logits, targets)           # (R, S, D)
    n_valid = jnp.maximum(jnp.sum(tok.slot_valid), 1).astype(jnp.float32)
    loss = jnp.sum(unred) / n_valid
    loss_d = jnp.sum(unred, axis=(0, 1)) / n_valid
    return ModelOutput(loss=loss, logits=logits, loss_d=loss_d)


def forward_generate_step(
    params,
    cfg: RetrievalConfig,
    batch: TokenizedSeqBatch,
    *,
    cached_context: Optional[jax.Array] = None,
):
    """Generation step: logits at the LAST fut position (reference
    model.py:270-280). Returns (logits (B, K), encoder context to cache).

    Kept as the semantic reference for the fast path below (tests compare
    the two); the generation loop itself uses the KV-cached variant."""
    out, context, _ = predict(
        params, cfg, batch, training=False, cached_context=cached_context
    )
    logits = out[:, -1, :] @ params["out_proj"].astype(out.dtype)
    return logits, context


class GenerationCache(NamedTuple):
    """Per-batch-row state carried through the beam-search loop: every
    decoder block's cross-attention K/V (computed ONCE from the encoder
    output) and the encoder key mask. The reference instead repeated its
    jagged encoder cache to B*k rows and re-projected K/V from it on every
    step of every beam (model.py:219-228 + attention.py wkv per forward)."""

    kv: tuple                # transformer.cross_kv output, entries (B,Nc,H,Dh)
    ctx_mask: jax.Array      # (B, Nc) bool


def encode_for_generation(
    params, cfg: RetrievalConfig, batch: TokenizedSeqBatch
) -> GenerationCache:
    """Run the encoder once and cache cross-attention K/V per decoder block."""
    ctx_emb, ctx_mask = embed_context(params, cfg, batch)
    h_ctx = rms_norm(ctx_emb, params["norm"])
    ctx_in = h_ctx @ params["in_proj_context"].astype(h_ctx.dtype)
    context = transformer.encode(
        params["transformer"], cfg.transformer, ctx_in, ctx_mask
    )
    kv = transformer.cross_kv(params["transformer"], cfg.transformer, context)
    return GenerationCache(kv=tuple(kv), ctx_mask=ctx_mask)


def forward_generate_cached(
    params,
    cfg: RetrievalConfig,
    cache: GenerationCache,
    sem_ids_fut: Optional[jax.Array],       # (n_rows, i) or None (BOS only)
    token_type_ids_fut: Optional[jax.Array],
    *,
    beams: int,
    n_rows: int,
) -> jax.Array:
    """Logits at the last fut position for n_rows = B*beams beam rows,
    decoding against the cached cross K/V (beam-folded attention)."""
    bos = jnp.broadcast_to(params["bos"], (n_rows, 1, cfg.embedding_dim))
    if sem_ids_fut is None:
        fut_emb = bos
    else:
        fut = embeddings.sem_id_embed(
            params["sem_emb"], sem_ids_fut, token_type_ids_fut,
            cfg.num_embeddings,
        )
        fut = fut + params["tte"][token_type_ids_fut]
        fut_emb = jnp.concatenate([bos, fut], axis=1)
    h_fut = rms_norm(fut_emb, params["norm_cxt"])
    fut_in = h_fut @ params["in_proj"].astype(h_fut.dtype)
    out = transformer.decode_with_kv(
        params["transformer"], cfg.transformer, fut_in,
        cache.kv, cache.ctx_mask, beams=beams,
    )
    return out[:, -1, :] @ params["out_proj"].astype(out.dtype)


def decode_token_cached(
    params,
    cfg: RetrievalConfig,
    cache: GenerationCache,
    self_kv,                              # None for the BOS step
    token_ids: Optional[jax.Array],       # (n_rows,) newest token, None = BOS
    token_type: int,                      # its sem-ID level
    *,
    beams: int,
    n_rows: int,
):
    """Single-token generation step: embeds only the NEWEST fut token and
    decodes it against the cross-K/V cache and the growing self-attention
    cache (transformer.decode_step_with_kv). forward_generate_cached above
    reprocesses the whole prefix and stays as the semantic reference —
    tests lock this fast path to it.

    Returns (logits (n_rows, K), new self_kv)."""
    if token_ids is None:
        emb = jnp.broadcast_to(params["bos"], (n_rows, 1, cfg.embedding_dim))
    else:
        tt = jnp.full((n_rows, 1), token_type, jnp.int32)
        emb = embeddings.sem_id_embed(
            params["sem_emb"], token_ids[:, None], tt, cfg.num_embeddings
        ) + params["tte"][tt]
    h = rms_norm(emb, params["norm_cxt"])
    x_in = h @ params["in_proj"].astype(h.dtype)
    out, self_kv = transformer.decode_step_with_kv(
        params["transformer"], cfg.transformer, x_in, self_kv,
        cache.kv, cache.ctx_mask, beams=beams,
    )
    return out[:, -1, :] @ params["out_proj"].astype(out.dtype), self_kv
