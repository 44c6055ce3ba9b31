"""Length-aware fused attention Pallas kernel (TPU ragged equivalent).

This is the TPU-native replacement for the reference's entire jagged stack:
the Triton padded<->jagged copy kernel (reference ops/triton/jagged.py:92-125)
plus NestedTensor flash SDPA (reference modules/transformer/attention.py:
113-124). Sequences stay dense and padded; raggedness is a key-validity mask
fused into the softmax — no layout copies, no NestedTensor surgery, no
torch.compile graph breaks.

Design note (documented decision, SURVEY.md §5): max sequence here is 801
tokens (ML, 200 items x 4 sem-IDs + user token) and 81 for Amazon. At these
lengths the full K/V for one (batch, head) fits comfortably in VMEM
(801 x 64 x 4B ≈ 200 KiB), so the kernel tiles over query blocks only and
consumes K/V in one shot per block — one pass, no online-softmax carry, and
the (Nq, Nk) score matrix never exists in HBM. Inter-chip sequence
parallelism would be pure overhead at these lengths.

Backward: ``jax.custom_vjp`` with a fused Pallas backward kernel that
recomputes probabilities per q-block (flash-style recompute — the (Nq, Nk)
score/probability matrices never exist in HBM in either direction) and
accumulates dk/dv in-place across the sequential q-block grid steps. A plain
jnp backward at ML-32M training shapes (B=256, H=8, N=801, fp32) materializes
two 5.2 GB probability tensors and OOMs a 16 GB chip; this kernel's HBM
footprint is O(B*H*N*Dh), the same as the inputs.

Parity-tested against ``rqvae_tpu.ops.attention.sdpa`` (values and gradients)
in tests/test_flash_attention.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *,
                  causal: bool, block_q: int):
    """The kernel is VPU-bound at Dh=64 (128 MXU flops per score element vs
    every elementwise pass over the (TQ, Nk) matrix), so the math is arranged
    to minimize N^2-element passes: the key mask arrives as an additive fp32
    bias (no where), and the 1/sum normalization and the empty-row guard are
    folded into the (TQ, Dh) output instead of the (TQ, Nk) probabilities."""
    i = pl.program_id(2)
    # inputs stay in their storage dtype (bf16 under amp) so the MXU runs at
    # native rate; accumulation is fp32 via preferred_element_type
    q = q_ref[0, 0]                              # (TQ, Dh)
    k = k_ref[0, 0]                              # (Nk, Dh)
    v = v_ref[0, 0]                              # (Nk, Dh)

    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + bias_ref[0]                      # (TQ, Nk) fp32

    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(cols <= rows + i * block_q, scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)                      # all-invalid rows: e == 1
    s = jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # rows with no valid key (m at the mask floor): zeros, like attention.sdpa
    inv = jnp.where(m > 0.5 * NEG_INF, 1.0 / s, 0.0)
    out_ref[0, 0] = (out * inv).astype(out_ref.dtype)


def _flash_forward(q, k, v, k_mask, *, causal: bool, block_q: int,
                   interpret: bool):
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    block_q = min(block_q, max(8, nq))
    pad_q = (-nq) % block_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    nqp = nq + pad_q
    # (B, 1, Nk): TPU block shapes must tile the last two dims by (8, 128) or
    # match the array dims exactly; a (1, Nk) block of a (B, Nk) array does
    # neither when B > 1. The mask ships as an additive fp32 bias so the
    # kernel adds it in one pass instead of a broadcast where.
    mask_bias = jnp.where(k_mask, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]

    kernel = functools.partial(_flash_kernel, causal=causal, block_q=block_q)
    out = pl.pallas_call(
        kernel,
        grid=(b, h, nqp // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dh), lambda b_, h_, i: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, dh), lambda b_, h_, i: (b_, h_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, dh), lambda b_, h_, i: (b_, h_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk), lambda b_, h_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, dh), lambda b_, h_, i: (b_, h_, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, nqp, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nqp * nk * dh,
            bytes_accessed=4 * (b * h * (2 * nqp * dh + 2 * nk * dh) + b * nk),
            transcendentals=b * h * nqp * nk,
        ),
        interpret=interpret,
    )(q, k, v, mask_bias)
    return out[:, :, :nq]


def _flash_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref,
                      dq_ref, dk_ref, dv_ref, *, causal: bool, block_q: int):
    """Per-q-block backward: recompute p, then
    ds = p * (dp - rowsum(dp * p)); dq = ds k; dk += ds^T q; dv += p^T g.
    dk/dv blocks are revisited across the (sequential, minor) q-block grid
    dimension and accumulated in fp32.

    Like the forward, arranged to minimize (TQ, Nk)-element VPU passes: the
    1/sum normalization stays row-folded — with unnormalized e and per-row
    inv = 1/s,  p = e*inv,  so
      dv = p^T g          = e^T (g * inv)         (scale g rows instead)
      c  = rowsum(dp * p) = rowsum(dp * e) * inv
      ds = p * (dp - c)   = e * ((dp - c) * inv)
    and matmul operands are cast to the input dtype so the MXU runs at
    native (bf16) rate rather than fp32 rate."""
    i = pl.program_id(2)
    q = q_ref[0, 0]                              # (TQ, Dh)
    k = k_ref[0, 0]                              # (Nk, Dh)
    v = v_ref[0, 0]                              # (Nk, Dh)
    g = g_ref[0, 0]                              # (TQ, Dh)

    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + bias_ref[0]
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(cols <= rows + i * block_q, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)                      # (TQ, Nk) unnormalized
    s = jnp.sum(e, axis=-1, keepdims=True)
    inv = jnp.where(m > 0.5 * NEG_INF, 1.0 / s, 0.0)   # (TQ, 1)

    dp = jax.lax.dot_general(                     # g v^T
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    c = jnp.sum(dp * e, axis=-1, keepdims=True) * inv
    ds = (e * ((dp - c) * inv)).astype(k.dtype)  # (TQ, Nk)

    dq_ref[0, 0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(i == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] += jax.lax.dot_general(          # ds^T q
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    g_n = (g.astype(jnp.float32) * inv).astype(g.dtype)  # (TQ, Dh)
    dv_ref[0, 0] += jax.lax.dot_general(          # p^T g = e^T (g * inv)
        e.astype(g.dtype), g_n, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _flash_backward(q, k, v, k_mask, g, *, causal: bool, block_q: int,
                    interpret: bool):
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    block_q = min(block_q, max(8, nq))
    pad_q = (-nq) % block_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    nqp = nq + pad_q
    mask_bias = jnp.where(k_mask, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]

    kernel = functools.partial(_flash_bwd_kernel, causal=causal,
                               block_q=block_q)
    qkv_spec = pl.BlockSpec((1, 1, nk, dh), lambda b_, h_, i: (b_, h_, 0, 0),
                            memory_space=pltpu.VMEM)
    qblk_spec = pl.BlockSpec(
        (1, 1, block_q, dh), lambda b_, h_, i: (b_, h_, i, 0),
        memory_space=pltpu.VMEM,
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, h, nqp // block_q),
        in_specs=[
            qblk_spec,
            qkv_spec,
            qkv_spec,
            pl.BlockSpec((1, 1, nk), lambda b_, h_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            qblk_spec,
        ],
        out_specs=[qblk_spec, qkv_spec, qkv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nqp, dh), jnp.float32),
            jax.ShapeDtypeStruct((b, h, nk, dh), jnp.float32),
            jax.ShapeDtypeStruct((b, h, nk, dh), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * nqp * nk * dh,
            bytes_accessed=4 * b * h * (4 * nqp * dh + 4 * nk * dh),
            transcendentals=b * h * nqp * nk,
        ),
        interpret=interpret,
    )(q, k, v, mask_bias, g)
    return (
        dq[:, :, :nq].astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, k_mask, causal, block_q, interpret):
    return _flash_forward(q, k, v, k_mask, causal=causal, block_q=block_q,
                          interpret=interpret)


def _flash_fwd(q, k, v, k_mask, causal, block_q, interpret):
    out = _flash_forward(q, k, v, k_mask, causal=causal, block_q=block_q,
                         interpret=interpret)
    return out, (q, k, v, k_mask)


def _flash_bwd(causal, block_q, interpret, res, g):
    q, k, v, k_mask = res
    dq, dk, dv = _flash_backward(q, k, v, k_mask, g, causal=causal,
                                 block_q=block_q, interpret=interpret)
    return (dq, dk, dv, None)


_flash.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Short-N variant: whole score tile VMEM-resident, G (batch, head) pairs fused
# per program
# ---------------------------------------------------------------------------
# The long-N kernel's grid is (B, H, Nq/block) — at short sequences (Amazon:
# 81 tokens) that is B*H tiny programs whose per-program launch/fetch overhead
# swamps the math (measured round 3: flash 2.4 ms vs dense 2.2 ms at
# B=256/N=81 — a tie, so dense kept the shape). Dense attention then costs the
# Amazon train step 13.7 ms of fp32 (B,H,N,N) HBM round-trips (54% of the
# step, docs/PERF.md knockout table). This variant removes the per-program
# overhead instead: inputs flatten to (B*H, N, Dh), each program consumes G
# rows at once with batched dot_generals, and the whole (G, Nq, Nk) score
# tile lives in VMEM — no HBM score matrix, ~G× fewer programs. The backward
# is one-shot per program (each program owns its full q AND k extent), so
# unlike the long-N kernel there is no cross-program dk/dv accumulation.


def _flash_small_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *,
                        causal: bool):
    q = q_ref[...]                               # (G, Nqp, Dh)
    k = k_ref[...]                               # (G, Nk, Dh)
    v = v_ref[...]
    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale + bias_ref[...]                    # (G, Nqp, Nk) fp32
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
        scores = jnp.where(cols <= rows, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        e.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                            # (G, Nqp, Dh)
    inv = jnp.where(m > 0.5 * NEG_INF, 1.0 / s, 0.0)
    out_ref[...] = (out * inv).astype(out_ref.dtype)


def _flash_small_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref,
                            dq_ref, dk_ref, dv_ref, *, causal: bool):
    """One-shot backward (same pass-minimized algebra as the long-N kernel's
    docstring): padded q rows carry zero cotangent, so their ds rows are zero
    and dk/dv stay clean without any explicit q-validity mask."""
    q = q_ref[...]                               # (G, Nqp, Dh)
    k = k_ref[...]
    v = v_ref[...]
    g = g_ref[...]
    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale + bias_ref[...]
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
        scores = jnp.where(cols <= rows, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)                      # (G, Nqp, Nk) unnormalized
    s = jnp.sum(e, axis=-1, keepdims=True)
    inv = jnp.where(m > 0.5 * NEG_INF, 1.0 / s, 0.0)

    dp = jax.lax.dot_general(                    # g v^T, batched over G
        g, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    c = jnp.sum(dp * e, axis=-1, keepdims=True) * inv
    ds = (e * ((dp - c) * inv)).astype(k.dtype)  # (G, Nqp, Nk)

    dq_ref[...] = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    dk_ref[...] = jax.lax.dot_general(           # ds^T q, batched over G
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    g_n = (g.astype(jnp.float32) * inv).astype(g.dtype)
    dv_ref[...] = jax.lax.dot_general(           # p^T g = e^T (g * inv)
        e.astype(g.dtype), g_n, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def default_group(bh: int, nq: int, nk: int, dh: int) -> int:
    """Largest power-of-two group of (batch, head) rows per program that
    divides B*H and keeps the program's working set (q/k/v/out + two fp32
    (Nqp, Nk) tiles) within a ~4 MB VMEM budget."""
    nqp = -(-max(nq, 8) // 8) * 8
    per_row = 4 * nqp * dh * 4 + 2 * nqp * max(nk, 128) * 4
    g = max(1, (4 * 1024 * 1024) // per_row)
    g = 1 << (g.bit_length() - 1)  # floor to a power of two (measured: G=16
    while bh % g:                  # beats the G=2 a raw divisor walk picks)
        g //= 2
    return g


def _small_specs(g: int, nqp: int, nk: int, dh: int):
    row = lambda i: (i, 0, 0)
    qspec = pl.BlockSpec((g, nqp, dh), row, memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((g, nk, dh), row, memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((g, 1, nk), row, memory_space=pltpu.VMEM)
    return qspec, kspec, bspec


def _flash_small_forward(q, k, v, k_mask, *, causal: bool, interpret: bool):
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    bh = b * h
    g = default_group(bh, nq, nk, dh)
    nqp = -(-max(nq, 8) // 8) * 8
    qf = q.reshape(bh, nq, dh)
    if nqp != nq:
        qf = jnp.pad(qf, ((0, 0), (0, nqp - nq), (0, 0)))
    kf = k.reshape(bh, nk, dh)
    vf = v.reshape(bh, nk, dh)
    bias = jnp.where(k_mask, 0.0, NEG_INF).astype(jnp.float32)  # (B, Nk)
    bias = jnp.broadcast_to(bias[:, None, :], (b, h, nk)).reshape(bh, 1, nk)

    qspec, kspec, bspec = _small_specs(g, nqp, nk, dh)
    out = pl.pallas_call(
        functools.partial(_flash_small_kernel, causal=causal),
        grid=(bh // g,),
        in_specs=[qspec, kspec, kspec, bspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((bh, nqp, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * nqp * nk * dh,
            bytes_accessed=2 * bh * (2 * nqp * dh + 2 * nk * dh) + 4 * bh * nk,
            transcendentals=bh * nqp * nk,
        ),
        interpret=interpret,
    )(qf, kf, vf, bias)
    return out[:, :nq].reshape(b, h, nq, dh)


def _flash_small_backward(q, k, v, k_mask, g_out, *, causal: bool,
                          interpret: bool):
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    bh = b * h
    g = default_group(bh, nq, nk, dh)
    nqp = -(-max(nq, 8) // 8) * 8
    qf = q.reshape(bh, nq, dh)
    gf = g_out.reshape(bh, nq, dh)
    if nqp != nq:
        qf = jnp.pad(qf, ((0, 0), (0, nqp - nq), (0, 0)))
        gf = jnp.pad(gf, ((0, 0), (0, nqp - nq), (0, 0)))
    kf = k.reshape(bh, nk, dh)
    vf = v.reshape(bh, nk, dh)
    bias = jnp.where(k_mask, 0.0, NEG_INF).astype(jnp.float32)
    bias = jnp.broadcast_to(bias[:, None, :], (b, h, nk)).reshape(bh, 1, nk)

    qspec, kspec, bspec = _small_specs(g, nqp, nk, dh)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_small_bwd_kernel, causal=causal),
        grid=(bh // g,),
        in_specs=[qspec, kspec, kspec, bspec, qspec],
        out_specs=[qspec, kspec, kspec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nqp, dh), jnp.float32),
            jax.ShapeDtypeStruct((bh, nk, dh), jnp.float32),
            jax.ShapeDtypeStruct((bh, nk, dh), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * nqp * nk * dh,
            bytes_accessed=2 * bh * (4 * nqp * dh + 4 * nk * dh),
            transcendentals=bh * nqp * nk,
        ),
        interpret=interpret,
    )(qf, kf, vf, bias, gf)
    return (
        dq[:, :nq].reshape(b, h, nq, dh).astype(q.dtype),
        dk.reshape(b, h, nk, dh).astype(k.dtype),
        dv.reshape(b, h, nk, dh).astype(v.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_small(q, k, v, k_mask, causal, interpret):
    return _flash_small_forward(q, k, v, k_mask, causal=causal,
                                interpret=interpret)


def _flash_small_fwd(q, k, v, k_mask, causal, interpret):
    out = _flash_small_forward(q, k, v, k_mask, causal=causal,
                               interpret=interpret)
    return out, (q, k, v, k_mask)


def _flash_small_bwd(causal, interpret, res, g):
    q, k, v, k_mask = res
    dq, dk, dv = _flash_small_backward(q, k, v, k_mask, g, causal=causal,
                                       interpret=interpret)
    return (dq, dk, dv, None)


_flash_small.defvjp(_flash_small_fwd, _flash_small_bwd)


def flash_attention_small(
    q: jax.Array,               # (B, H, Nq, Dh)
    k: jax.Array,               # (B, H, Nk, Dh)
    v: jax.Array,               # (B, H, Nk, Dh)
    *,
    k_mask: jax.Array | None = None,  # (B, Nk) bool; None = all valid
    causal: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """Short-sequence fused attention (Nq, Nk ≲ 256); differentiable."""
    if interpret is None:
        from rqvae_tpu.ops.dispatch import use_interpret

        interpret = use_interpret()
    if k_mask is None:
        k_mask = jnp.ones((q.shape[0], k.shape[2]), dtype=bool)
    return _flash_small(q, k, v, k_mask, causal, interpret)


# ---------------------------------------------------------------------------
# Span-restricted variant: per-query contiguous key window + one extra column
# ---------------------------------------------------------------------------
# The packed-training masks (ops/attention.span_mask): query i attends keys
# [lo_i, hi_i) plus column extra_i. The bounds ride into the kernel as three
# (1, TQ, 1)-blocked int32 columns, so the mask is two iota compares and a
# select per q-block — the (B, Nq, Nk) boolean mask never exists in HBM.
# Everything else (one-shot softmax over full K/V in VMEM, pass-minimized
# algebra, fp32 accumulation, empty-row zeros) matches the kernels above.


def _span_allow(scores, lo, hi, extra):
    cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    allow = (cols >= lo) & (cols < hi) | (cols == extra)
    return jnp.where(allow, scores, NEG_INF)


def _flash_span_kernel(q_ref, k_ref, v_ref, lo_ref, hi_ref, u_ref, out_ref):
    q = q_ref[0, 0]                              # (TQ, Dh)
    k = k_ref[0, 0]                              # (Nk, Dh)
    v = v_ref[0, 0]

    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                    # (TQ, Nk) fp32
    scores = _span_allow(scores, lo_ref[0], hi_ref[0], u_ref[0])

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    inv = jnp.where(m > 0.5 * NEG_INF, 1.0 / s, 0.0)
    out_ref[0, 0] = (out * inv).astype(out_ref.dtype)


def _flash_span_bwd_kernel(q_ref, k_ref, v_ref, lo_ref, hi_ref, u_ref, g_ref,
                           dq_ref, dk_ref, dv_ref):
    """Same pass-minimized backward algebra as _flash_bwd_kernel, with the
    span mask recomputed per q-block (padded q rows ship lo = hi = 0, so
    their e rows are uniformly weighted by inv = 0 and contribute nothing)."""
    i = pl.program_id(2)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    g = g_ref[0, 0]

    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    scores = _span_allow(scores, lo_ref[0], hi_ref[0], u_ref[0])
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    inv = jnp.where(m > 0.5 * NEG_INF, 1.0 / s, 0.0)

    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    c = jnp.sum(dp * e, axis=-1, keepdims=True) * inv
    ds = (e * ((dp - c) * inv)).astype(k.dtype)

    dq_ref[0, 0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(i == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    g_n = (g.astype(jnp.float32) * inv).astype(g.dtype)
    dv_ref[0, 0] += jax.lax.dot_general(
        e.astype(g.dtype), g_n, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _span_operands(lo, hi, extra, nq: int, block_q: int):
    """(B, Nq) int32 bounds -> padded (B, Nqp, 1) kernel operands; q padding
    rows get lo = hi = 0 (attend nothing) and extra = -1."""
    pad_q = (-nq) % block_q
    def prep(x, fill):
        x = x.astype(jnp.int32)
        if pad_q:
            x = jnp.pad(x, ((0, 0), (0, pad_q)), constant_values=fill)
        return x[:, :, None]
    return prep(lo, 0), prep(hi, 0), prep(extra, -1), nq + pad_q


def _span_specs(block_q: int, nk: int, dh: int):
    qblk = pl.BlockSpec((1, 1, block_q, dh), lambda b_, h_, i: (b_, h_, i, 0),
                        memory_space=pltpu.VMEM)
    kv = pl.BlockSpec((1, 1, nk, dh), lambda b_, h_, i: (b_, h_, 0, 0),
                      memory_space=pltpu.VMEM)
    bound = pl.BlockSpec((1, block_q, 1), lambda b_, h_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM)
    return qblk, kv, bound


def _flash_span_forward(q, k, v, lo, hi, extra, *, block_q: int,
                        interpret: bool):
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    lo_p, hi_p, u_p, nqp = _span_operands(lo, hi, extra, nq, block_q)
    if nqp != nq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, nqp - nq), (0, 0)))
    qblk, kv, bound = _span_specs(block_q, nk, dh)
    out = pl.pallas_call(
        _flash_span_kernel,
        grid=(b, h, nqp // block_q),
        in_specs=[qblk, kv, kv, bound, bound, bound],
        out_specs=qblk,
        out_shape=jax.ShapeDtypeStruct((b, h, nqp, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nqp * nk * dh,
            bytes_accessed=4 * (b * h * (2 * nqp * dh + 2 * nk * dh)),
            transcendentals=b * h * nqp * nk,
        ),
        interpret=interpret,
    )(q, k, v, lo_p, hi_p, u_p)
    return out[:, :, :nq]


def _flash_span_backward(q, k, v, lo, hi, extra, g, *, block_q: int,
                         interpret: bool):
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    lo_p, hi_p, u_p, nqp = _span_operands(lo, hi, extra, nq, block_q)
    if nqp != nq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, nqp - nq), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, 0), (0, nqp - nq), (0, 0)))
    qblk, kv, bound = _span_specs(block_q, nk, dh)
    dq, dk, dv = pl.pallas_call(
        _flash_span_bwd_kernel,
        grid=(b, h, nqp // block_q),
        in_specs=[qblk, kv, kv, bound, bound, bound, qblk],
        out_specs=[qblk, kv, kv],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nqp, dh), jnp.float32),
            jax.ShapeDtypeStruct((b, h, nk, dh), jnp.float32),
            jax.ShapeDtypeStruct((b, h, nk, dh), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * nqp * nk * dh,
            bytes_accessed=4 * b * h * (4 * nqp * dh + 4 * nk * dh),
            transcendentals=b * h * nqp * nk,
        ),
        interpret=interpret,
    )(q, k, v, lo_p, hi_p, u_p, g)
    return (
        dq[:, :, :nq].astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _flash_span(q, k, v, lo, hi, extra, block_q, interpret):
    return _flash_span_forward(q, k, v, lo, hi, extra, block_q=block_q,
                               interpret=interpret)


def _flash_span_fwd(q, k, v, lo, hi, extra, block_q, interpret):
    out = _flash_span_forward(q, k, v, lo, hi, extra, block_q=block_q,
                              interpret=interpret)
    return out, (q, k, v, lo, hi, extra)


def _flash_span_bwd(block_q, interpret, res, g):
    q, k, v, lo, hi, extra = res
    dq, dk, dv = _flash_span_backward(q, k, v, lo, hi, extra, g,
                                      block_q=block_q, interpret=interpret)
    return (dq, dk, dv, None, None, None)


_flash_span.defvjp(_flash_span_fwd, _flash_span_bwd)


def flash_attention_spans(
    q: jax.Array,               # (B, H, Nq, Dh)
    k: jax.Array,               # (B, H, Nk, Dh)
    v: jax.Array,               # (B, H, Nk, Dh)
    lo: jax.Array,              # (B, Nq) int32 window start (inclusive)
    hi: jax.Array,              # (B, Nq) int32 window end (exclusive)
    extra: jax.Array,           # (B, Nq) int32 extra key column, -1 = none
    *,
    block_q: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Span-restricted fused attention (ops/attention.span_mask semantics);
    differentiable (custom VJP). Non-causal: the packed decoder's causal-
    within-segment masking is expressed as hi = own position + 1."""
    if interpret is None:
        from rqvae_tpu.ops.dispatch import use_interpret

        interpret = use_interpret()
    if block_q is None:
        block_q = default_block_q(q.shape[2], k.shape[2])
    return _flash_span(q, k, v, lo, hi, extra, block_q, interpret)


def default_block_q(nq: int, nk: int) -> int:
    """Largest q-block whose fp32 score matrix stays within a ~3 MB VMEM
    budget, 128-aligned. Bigger blocks amortize per-program overhead and the
    per-program K/V fetch: at the ML-32M shape (B=256, H=8, N=801, bf16,
    one v5e) fwd is 23.5 ms at block_q=128 vs 13.0 ms at full-N blocks."""
    budget_rows = max(128, (3 * 1024 * 1024 // (nk * 4)) // 128 * 128)
    return min(-(-nq // 128) * 128, budget_rows)


def flash_attention(
    q: jax.Array,               # (B, H, Nq, Dh)
    k: jax.Array,               # (B, H, Nk, Dh)
    v: jax.Array,               # (B, H, Nk, Dh)
    *,
    k_mask: jax.Array | None = None,  # (B, Nk) bool; None = all valid
    causal: bool = False,
    block_q: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused masked attention; differentiable (custom VJP)."""
    if interpret is None:
        from rqvae_tpu.ops.dispatch import use_interpret

        interpret = use_interpret()
    if block_q is None:
        block_q = default_block_q(q.shape[2], k.shape[2])
    if k_mask is None:
        k_mask = jnp.ones((q.shape[0], k.shape[2]), dtype=bool)
    return _flash(q, k, v, k_mask, causal, block_q, interpret)
