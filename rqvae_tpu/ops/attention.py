"""Length-aware scaled dot-product attention (jnp reference path).

This replaces the reference's entire jagged stack: the Triton padded<->jagged
copy kernel (reference ops/triton/jagged.py:92-125) plus flash SDPA over
NestedTensors (reference modules/transformer/attention.py:113-124). On TPU we
keep sequences as dense padded buffers and make the attention kernel
length-aware via masks — there is no copy, no layout surgery, and the whole
model stays inside one XLA graph (the reference needed
``torch._dynamo.config.suppress_errors`` because NestedTensor creation broke
torch.compile graphs).

The jnp implementation here is the semantic reference; the fused Pallas flash
kernel in ``rqvae_tpu.ops.flash_attention`` is parity-tested against it and
selected on TPU for long-context shapes.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def build_mask(
    q_len: int,
    k_len: int,
    *,
    causal: bool = False,
    q_mask: Optional[jax.Array] = None,   # (B, Nq) bool
    k_mask: Optional[jax.Array] = None,   # (B, Nk) bool
    q_spans: Optional[tuple] = None,      # (lo, hi, extra) each (B, Nq) int32
) -> Optional[jax.Array]:
    """(B or 1, 1, Nq, Nk) boolean attention mask; True = attend."""
    mask = None
    if causal:
        mask = jnp.tril(jnp.ones((q_len, k_len), dtype=bool))[None, None]
    if k_mask is not None:
        km = k_mask[:, None, None, :]
        mask = km if mask is None else jnp.logical_and(mask, km)
    if q_mask is not None:
        qm = q_mask[:, None, :, None]
        mask = qm if mask is None else jnp.logical_and(mask, qm)
    if q_spans is not None:
        sm = span_mask(q_spans, k_len)[:, None]
        mask = sm if mask is None else jnp.logical_and(mask, sm)
    return mask


def span_mask(q_spans: tuple, k_len: int) -> jax.Array:
    """Per-query contiguous key window plus one extra column.

    ``q_spans = (lo, hi, extra)``, each (B, Nq) int32: query i may attend
    key j iff ``lo[i] <= j < hi[i]`` or ``j == extra[i]`` (extra = -1 for
    none). lo = hi = 0 makes a query row fully masked (attends nothing).
    This one primitive expresses every mask the packed training layout
    needs: segment-local encoder self-attention (window = own segment's
    item tokens, extra = own user token), packed cross-attention, and
    block-causal decoding (window = [segment start, own position]).
    Returns (B, Nq, Nk) bool."""
    lo, hi, extra = q_spans
    cols = jnp.arange(k_len, dtype=jnp.int32)[None, None, :]
    in_window = (cols >= lo[..., None]) & (cols < hi[..., None])
    return in_window | (cols == extra[..., None])


def sdpa(
    q: jax.Array,  # (B, Nq, H, Dh)
    k: jax.Array,  # (B, Nk, H, Dh)
    v: jax.Array,  # (B, Nk, H, Dh)
    mask: Optional[jax.Array] = None,  # (B or 1, 1, Nq, Nk) bool
) -> jax.Array:
    """Masked softmax(q k^T / sqrt(d)) v with fp32 softmax accumulation.

    Layout is (batch, seq, heads, head_dim) end to end: the head axis is a
    dot_general batch dim, so NO physical head transpose ever happens — a
    profiled (B,N,H,Dh)->(B,H,N,Dh) layout cost ~24% of the decoder train
    step as XLA 'data formatting' copies.

    Rows with no valid key produce zeros (not NaN) — padded query positions
    are handled gracefully and masked out downstream.
    """
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    # stable softmax; fully-masked rows -> uniform over NEG_INF -> zero out
    probs = jax.nn.softmax(scores, axis=-1)
    if mask is not None:
        any_valid = jnp.any(mask, axis=-1, keepdims=True)
        probs = jnp.where(any_valid, probs, 0.0)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def attend(
    q: jax.Array,  # (B, Nq, H, Dh)
    k: jax.Array,  # (B, Nk, H, Dh)
    v: jax.Array,  # (B, Nk, H, Dh)
    *,
    causal: bool = False,
    k_mask: Optional[jax.Array] = None,  # (B, Nk) bool
    q_spans: Optional[tuple] = None,     # (lo, hi, extra) each (B, Nq) int32
) -> jax.Array:
    """Structured-mask attention entry point used by the transformer.

    Routes to the fused Pallas flash kernel on TPU (no HBM score matrix)
    when the score matrix is big enough for its HBM traffic to matter.
    Measured on one v5e chip (bf16, H=8, Dh=64, after the full-N-block +
    pass-minimization kernel rework): B=256/N=801 flash fwd 8.6ms vs XLA
    90ms (8.61/17.36 fwd/bwd on the current runtime — AT the empirically
    measured VPU-pass floor, docs/PERF.md flash-floor table); B=64/N=801
    flash fwd 3.7ms vs XLA 19.2ms (the old 128-row-block kernel LOST this
    shape — the low-occupancy guard it needed is gone);
    B=256/N=81 flash ~2.4ms vs dense ~2.2ms, within run-to-run variance — dense
    keeps sub-256 shapes to skip the layout transpose. Both paths
    parity-locked by tests. The Pallas kernel tiles (batch, head) over its
    grid so it consumes the (B, H, N, Dh) layout; the transpose at this
    boundary is amortized by the kernel's win at the shapes that reach it.

    Head dims below 64 stay on the jnp path: the kernel's VMEM operands are
    Dh in the 128-wide lane dimension, so Dh=32 fills a quarter of every
    vreg while XLA is free to fuse the narrow matmuls — and Dh<64 has never
    been compiled on real hardware (only Dh=64 has; see docs/PERF.md).

    Short shapes (the Amazon 81-token train step) stay dense BY MEASUREMENT,
    not by default: the round-5 short-N Pallas variant
    (flash_attention.flash_attention_small — fused (batch, head) groups,
    whole score tile VMEM-resident) ties dense exactly on forward (0.72 ms
    vs 0.72 ms per call, 50-step chained loops, B=256/N=81/H=8/Dh=64 bf16,
    one v5e) and loses backward (2.45 ms vs 1.53 ms): at this shape both
    paths sit at the MXU tiny-matmul latency floor (2 x B*H (88,64)@(64,81)
    matmuls ~0.39 ms fwd), which HBM-traffic arguments do not move — see
    docs/PERF.md "short-N attention" section. RQVAE_TPU_SHORT_FLASH=1
    routes short self-attention through the kernel anyway (the switch the
    measurement itself uses).
    """
    import os

    from rqvae_tpu.ops import dispatch

    if q_spans is not None:
        # span-restricted attention (the packed-training masks). The flash
        # span kernel carries the window bounds into the kernel as per-q-
        # block int32 columns — no (B, Nq, Nk) mask ever exists in HBM.
        span_big = (
            q.shape[1] >= 256 and k.shape[1] >= 256 and q.shape[-1] >= 64
            and not causal and k_mask is None
        )
        if dispatch.pallas_enabled() and span_big and _shardable(q, None):
            from rqvae_tpu.ops import flash_attention as fa
            from jax.sharding import PartitionSpec as P
            from rqvae_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

            qs = P(DATA_AXIS, MODEL_AXIS, None, None)
            sp = P(DATA_AXIS, None)
            call = dispatch.shard_over_batch(
                lambda q_, k_, v_, lo_, hi_, u_: fa.flash_attention_spans(
                    q_, k_, v_, lo_, hi_, u_
                ),
                in_specs=(qs, qs, qs, sp, sp, sp),
                out_specs=qs,
            )
            out = call(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                *q_spans,
            )
            return out.transpose(0, 2, 1, 3)
        mask = build_mask(
            q.shape[1], k.shape[1], causal=causal, k_mask=k_mask,
            q_spans=q_spans,
        )
        return sdpa(q, k, v, mask)

    short_scores = (
        q.shape[1] < 256 and k.shape[1] < 256 and q.shape[-1] >= 64
        and os.environ.get("RQVAE_TPU_SHORT_FLASH", "0") == "1"
    )
    if dispatch.pallas_enabled() and short_scores and _shardable(q, k_mask):
        from rqvae_tpu.ops import flash_attention as fa
        from jax.sharding import PartitionSpec as P
        from rqvae_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

        if k_mask is None:
            k_mask = jnp.ones((q.shape[0], k.shape[1]), dtype=bool)
        qs = P(DATA_AXIS, MODEL_AXIS, None, None)
        call = dispatch.shard_over_batch(
            lambda q_, k_, v_, m_: fa.flash_attention_small(
                q_, k_, v_, k_mask=m_, causal=causal
            ),
            in_specs=(qs, qs, qs, P(DATA_AXIS, None)),
            out_specs=qs,
        )
        out = call(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            k_mask,
        )
        return out.transpose(0, 2, 1, 3)

    big_scores = (
        q.shape[1] >= 256 and k.shape[1] >= 256 and q.shape[-1] >= 64
    )
    if dispatch.pallas_enabled() and big_scores and _shardable(q, k_mask):
        from rqvae_tpu.ops import flash_attention as fa
        from jax.sharding import PartitionSpec as P
        from rqvae_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

        if k_mask is None:
            k_mask = jnp.ones((q.shape[0], k.shape[1]), dtype=bool)
        # Mosaic kernels are single-device programs: under a registered mesh
        # the call is shard_mapped over batch ('data') and heads ('model' —
        # the TP head sharding induced by the column-sharded qkv projections)
        qs = P(DATA_AXIS, MODEL_AXIS, None, None)
        call = dispatch.shard_over_batch(
            lambda q_, k_, v_, m_: fa.flash_attention(
                q_, k_, v_, k_mask=m_, causal=causal
            ),
            in_specs=(qs, qs, qs, P(DATA_AXIS, None)),
            out_specs=qs,
        )
        out = call(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            k_mask,
        )
        return out.transpose(0, 2, 1, 3)
    mask = build_mask(q.shape[1], k.shape[1], causal=causal, k_mask=k_mask)
    return sdpa(q, k, v, mask)


def _shardable(q: jax.Array, k_mask: Optional[jax.Array]) -> bool:
    """Whether the flash kernel can be shard_mapped under the registered
    mesh: batch divisible over 'data' and heads divisible over 'model'."""
    from rqvae_tpu.ops import dispatch

    return dispatch.divisible_over_data(q.shape[0], heads=q.shape[2])


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """(B, N, H*Dh) -> (B, N, H, Dh): a pure reshape, no layout change."""
    b, n, d = x.shape
    return x.reshape(b, n, num_heads, d // num_heads)


def merge_heads(x: jax.Array) -> jax.Array:
    """(B, N, H, Dh) -> (B, N, H*Dh): a pure reshape, no layout change."""
    b, n, h, dh = x.shape
    return x.reshape(b, n, h * dh)
