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

Backward: ``jax.custom_vjp`` whose backward recomputes probabilities in plain
jnp (flash-style recompute instead of saving the score matrix). At Nk <= 801
the backward matmuls are already MXU-bound under XLA fusion; a hand-written
backward kernel is not the bottleneck.

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


def _recompute_probs(q, k, v, k_mask, causal):
    """fp32 probabilities, identical masking semantics to the kernel."""
    nq, nk = q.shape[2], k.shape[2]
    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    valid = jnp.broadcast_to(k_mask[:, None, None, :], scores.shape)
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1)
        valid = jnp.logical_and(valid, (cols <= rows)[None, None])
    scores = jnp.where(valid, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    any_valid = jnp.any(valid, axis=-1, keepdims=True)
    return jnp.where(any_valid, probs, 0.0), scale


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
    probs, scale = _recompute_probs(q, k, v, k_mask, causal)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", probs, g32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g32, v32)
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)) * scale
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None)


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
