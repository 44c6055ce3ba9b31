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
