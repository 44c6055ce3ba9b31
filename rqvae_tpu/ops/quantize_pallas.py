"""Fused residual-quantization Pallas kernel (the framework's hot kernel).

Replaces the reference's per-level ``Quantize.forward`` hot path (reference
modules/quantize.py:105-144: distance matrix -> argmin -> codebook gather ->
residual update) with ONE kernel that keeps the residual in VMEM across all
``n_layers`` levels:

  for each level l (static unroll):
      dist_l  = ||res||^2 - 2 res @ cb_l^T + ||cb_l||^2        (MXU)
      ids_l   = argmin(dist_l)                                  (VPU)
      emb_l   = one_hot(ids_l) @ cb_l                           (MXU; gather-
                free — a one-hot matmul maps onto the systolic array, a row
                gather does not)
      loss_l  = (1 + beta) * ||res - emb_l||^2   [value of the VQ-VAE
                codebook+commitment loss; stop_gradients don't change the value]
      res    <- res - emb_l

One HBM read of x, one HBM read of the codebooks, no (B, K) distance matrix
ever materialized in HBM. This is the eval / tokenize path (hard argmin): it
is what ``precompute_corpus_ids`` runs over the whole corpus on every decoder
training start and repeatedly during RQ-VAE eval (reference semids.py:74-101,
train_rqvae.py:223-239). Training estimators (gumbel / STE / rotation-trick)
need gradients through soft paths and stay in ``rqvae_tpu.models.quantize``.

Parity-tested against the jnp reference in tests/test_quantize_pallas.py
(interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rqvae_tpu.ops.dispatch import use_interpret


class RqTokenizeOutput(NamedTuple):
    sem_ids: jax.Array    # (B, L) int32
    emb_sum: jax.Array    # (B, D) sum of selected codewords over levels
    residual: jax.Array   # (B, D) final residual (x_enc - emb_sum)
    loss: jax.Array       # (B,) summed (1+beta)*||res_l - emb_l||^2 over levels


def _rq_kernel(x_ref, cb_ref, ids_ref, emb_ref, res_ref, loss_ref, *,
               n_levels: int, commitment_weight: float):
    res = x_ref[:].astype(jnp.float32)                      # (TB, D)
    emb_sum = jnp.zeros_like(res)
    loss = jnp.zeros((res.shape[0], 1), jnp.float32)
    k = cb_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (res.shape[0], k), 1)
    for level in range(n_levels):
        cb = cb_ref[level].astype(jnp.float32)              # (K, D)
        # ||res||^2 is constant per row w.r.t. the argmin but kept so the
        # loss term below can reuse dist at the winner (full squared L2).
        dist = (
            jnp.sum(res * res, axis=-1, keepdims=True)
            - 2.0 * jax.lax.dot_general(
                res, cb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jnp.sum(cb * cb, axis=-1)[None, :]
        )                                                   # (TB, K)
        ids = jnp.argmin(dist, axis=-1).astype(jnp.int32)   # (TB,)
        onehot = (col == ids[:, None]).astype(jnp.float32)  # (TB, K)
        emb = jax.lax.dot_general(
            onehot, cb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # (TB, D)
        ids_ref[:, level] = ids
        diff = res - emb
        loss = loss + (1.0 + commitment_weight) * jnp.sum(
            diff * diff, axis=-1, keepdims=True
        )
        emb_sum = emb_sum + emb
        res = diff
    emb_ref[:] = emb_sum
    res_ref[:] = res
    loss_ref[:] = loss


@functools.partial(
    jax.jit, static_argnames=("commitment_weight", "block_b", "interpret")
)
def rq_tokenize(
    x: jax.Array,            # (B, D) encoder output
    codebooks: jax.Array,    # (L, K, D) effective codebooks (post SimVQ/l2norm)
    *,
    commitment_weight: float = 0.25,
    block_b: int = 512,
    interpret: bool | None = None,
) -> RqTokenizeOutput:
    """Fused multi-level residual quantization (hard argmin path)."""
    b, d = x.shape
    n_levels, k, d2 = codebooks.shape
    assert d == d2, f"dim mismatch: x has {d}, codebooks have {d2}"
    if interpret is None:
        interpret = use_interpret()

    block_b = min(block_b, max(8, b))
    pad = (-b) % block_b
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    bp = b + pad

    grid = (bp // block_b,)
    kernel = functools.partial(
        _rq_kernel, n_levels=n_levels, commitment_weight=commitment_weight
    )
    ids, emb, res, loss = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_levels, k, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, n_levels), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, n_levels), jnp.int32),
            jax.ShapeDtypeStruct((bp, d), jnp.float32),
            jax.ShapeDtypeStruct((bp, d), jnp.float32),
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * n_levels * k * (2 * d),
            bytes_accessed=(bp * d + n_levels * k * d + 2 * bp * d) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, codebooks)
    return RqTokenizeOutput(
        sem_ids=ids[:b], emb_sum=emb[:b], residual=res[:b], loss=loss[:b, 0]
    )
