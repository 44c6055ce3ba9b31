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


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *,
                  causal: bool, block_q: int):
    i = pl.program_id(2)
    # inputs stay in their storage dtype (bf16 under amp) so the MXU runs at
    # native rate; accumulation is fp32 via preferred_element_type
    q = q_ref[0, 0]                              # (TQ, Dh)
    k = k_ref[0, 0]                              # (Nk, Dh)
    v = v_ref[0, 0]                              # (Nk, Dh)
    kmask = mask_ref[0, 0] != 0                  # (Nk,)

    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                    # (TQ, Nk) fp32

    valid = jnp.broadcast_to(kmask[None, :], scores.shape)
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        valid = jnp.logical_and(valid, cols <= rows + i * block_q)

    scores = jnp.where(valid, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / s
    # rows with no valid key: zeros, matching attention.sdpa
    any_valid = jnp.any(valid, axis=-1, keepdims=True)
    probs = jnp.where(any_valid, probs, 0.0)
    out = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0, 0] = out.astype(out_ref.dtype)


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
    # neither when B > 1.
    mask_i32 = k_mask.astype(jnp.int32)[:, None, :]

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
    )(q, k, v, mask_i32)
    return out[:, :, :nq]


def _flash_bwd_kernel(q_ref, k_ref, v_ref, mask_ref, g_ref,
                      dq_ref, dk_ref, dv_ref, *, causal: bool, block_q: int):
    """Per-q-block backward: recompute p, then
    ds = p * (dp - rowsum(dp * p)); dq = ds k; dk += ds^T q; dv += p^T g.
    dk/dv blocks are revisited across the (sequential, minor) q-block grid
    dimension and accumulated in fp32."""
    i = pl.program_id(2)
    q = q_ref[0, 0]                              # (TQ, Dh)
    k = k_ref[0, 0]                              # (Nk, Dh)
    v = v_ref[0, 0]                              # (Nk, Dh)
    g = g_ref[0, 0].astype(jnp.float32)          # (TQ, Dh)
    kmask = mask_ref[0, 0] != 0                  # (Nk,)

    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    valid = jnp.broadcast_to(kmask[None, :], scores.shape)
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        valid = jnp.logical_and(valid, cols <= rows + i * block_q)
    scores = jnp.where(valid, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    any_valid = jnp.any(valid, axis=-1, keepdims=True)
    p = jnp.where(any_valid, p, 0.0)             # (TQ, Nk) fp32

    dp = jax.lax.dot_general(                     # g v^T
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # (TQ, Nk)

    dq_ref[0, 0] = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(i == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] += jax.lax.dot_general(          # ds^T q
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dv_ref[0, 0] += jax.lax.dot_general(          # p^T g
        p.astype(jnp.float32), g, (((0,), (0,)), ((), ())),
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
    mask_i32 = k_mask.astype(jnp.int32)[:, None, :]

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
    )(q, k, v, mask_i32, g)
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


def flash_attention(
    q: jax.Array,               # (B, H, Nq, Dh)
    k: jax.Array,               # (B, H, Nk, Dh)
    v: jax.Array,               # (B, H, Nk, Dh)
    *,
    k_mask: jax.Array | None = None,  # (B, Nk) bool; None = all valid
    causal: bool = False,
    block_q: int = 128,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused masked attention; differentiable (custom VJP)."""
    if interpret is None:
        from rqvae_tpu.ops.dispatch import use_interpret

        interpret = use_interpret()
    if k_mask is None:
        k_mask = jnp.ones((q.shape[0], k.shape[2]), dtype=bool)
    return _flash(q, k, v, k_mask, causal, block_q, interpret)
