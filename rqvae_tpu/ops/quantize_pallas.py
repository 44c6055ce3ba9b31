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


# ---------------------------------------------------------------------------
# Fused TRAINING path (custom VJP): STE and rotation-trick estimators
# ---------------------------------------------------------------------------
#
# Key fact (reference modules/quantize.py:130-144): for the STE and
# ROTATION_TRICK estimators the training-forward VALUE of each level equals
# the hard-argmin codeword exactly —
#   STE:       x + sg(q - x)                          == q
#   ROTATION:  (e rotated onto q_hat) * sg(|q|/|x|)   == q   (sec 4.2 of
#              arXiv:2410.06424: the Householder pair maps x_hat to q_hat)
# — only the GRADIENTS differ. So stage-1 training reuses the fused
# distance+argmin+gather kernel for the forward (no (B, K) distance matrix in
# HBM, residual chain in VMEM) and attaches the estimator-exact gradients as
# a custom VJP. The backward needs NO K-wide distance work at all: argmin is
# piecewise-constant, so only (B, D) vector math plus one one-hot matmul per
# level (the codebook-loss scatter) remains. GUMBEL_SOFTMAX mixes codewords
# softly (value != codeword) and stays on the jnp path in models/quantize.
#
# Parity-tested against models/quantize.apply (values AND gradients) in
# tests/test_quantize_pallas.py.


class RqTrainOutput(NamedTuple):
    embeddings: jax.Array     # (B, D, L) estimator outputs (== codewords)
    residuals: jax.Array      # (B, D, L) pre-level residuals (res_0 = x)
    sem_ids: jax.Array        # (B, L) int32
    quantize_loss: jax.Array  # (B,) summed (1+beta)*||res_l - emb_l||^2


def _rq_train_kernel(x_ref, cb_ref, ids_ref, embs_ref, res_ref, loss_ref, *,
                     n_levels: int, commitment_weight: float):
    """Like _rq_kernel but records per-level embeddings and pre-level
    residuals (the backward pass and the model's debug stats need them)."""
    res = x_ref[:].astype(jnp.float32)                      # (TB, D)
    loss = jnp.zeros((res.shape[0], 1), jnp.float32)
    k = cb_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (res.shape[0], k), 1)
    for level in range(n_levels):
        cb = cb_ref[level].astype(jnp.float32)              # (K, D)
        dist = (
            jnp.sum(res * res, axis=-1, keepdims=True)
            - 2.0 * jax.lax.dot_general(
                res, cb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jnp.sum(cb * cb, axis=-1)[None, :]
        )
        ids = jnp.argmin(dist, axis=-1).astype(jnp.int32)
        onehot = (col == ids[:, None]).astype(jnp.float32)
        emb = jax.lax.dot_general(
            onehot, cb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ids_ref[:, level] = ids
        res_ref[level] = res
        embs_ref[level] = emb
        diff = res - emb
        loss = loss + (1.0 + commitment_weight) * jnp.sum(
            diff * diff, axis=-1, keepdims=True
        )
        res = diff
    loss_ref[:] = loss


def _rq_train_forward(x, codebooks, commitment_weight, block_b, interpret):
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

    kernel = functools.partial(
        _rq_train_kernel, n_levels=n_levels,
        commitment_weight=commitment_weight,
    )
    lvl_spec = pl.BlockSpec((n_levels, block_b, d), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    ids, embs, res, loss = pl.pallas_call(
        kernel,
        grid=(bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_levels, k, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, n_levels), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            lvl_spec,
            lvl_spec,
            pl.BlockSpec((block_b, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, n_levels), jnp.int32),
            jax.ShapeDtypeStruct((n_levels, bp, d), jnp.float32),
            jax.ShapeDtypeStruct((n_levels, bp, d), jnp.float32),
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * n_levels * k * (2 * d),
            bytes_accessed=(bp * d + n_levels * k * d
                            + 2 * n_levels * bp * d) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, codebooks)
    return RqTrainOutput(
        embeddings=jnp.moveaxis(embs[:, :b], 0, -1),
        residuals=jnp.moveaxis(res[:, :b], 0, -1),
        sem_ids=ids[:b],
        quantize_loss=loss[:b, 0],
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5)
)
def rq_quantize_train(
    x: jax.Array,            # (B, D) encoder output
    codebooks: jax.Array,    # (L, K, D) effective codebooks
    mode: str = "ROTATION_TRICK",   # "STE" | "ROTATION_TRICK"
    commitment_weight: float = 0.25,
    block_b: int = 512,
    interpret: bool | None = None,
) -> RqTrainOutput:
    """Fused multi-level residual quantization, TRAINING path (custom VJP)."""
    return _rq_train_forward(x, codebooks, commitment_weight, block_b,
                             interpret)


def _rq_train_fwd(x, codebooks, mode, commitment_weight, block_b, interpret):
    out = _rq_train_forward(x, codebooks, commitment_weight, block_b,
                            interpret)
    # dtype/shape carriers must be arrays (zero-size): custom_vjp residual
    # pytrees cannot hold raw dtype objects
    x_marker = jnp.zeros((0,), x.dtype)
    cb_marker = jnp.zeros((0, codebooks.shape[1]), codebooks.dtype)
    return out, (out.embeddings, out.residuals, out.sem_ids,
                 x_marker, cb_marker)


def _rq_train_bwd(mode, commitment_weight, block_b, interpret, saved, cot):
    """Estimator-exact gradients, levels processed in reverse.

    Per level l (res = pre-level residual, emb = selected codeword, all from
    the forward):
      * quantize loss (1+beta-split, reference modules/loss.py:39-42):
        d/d emb -> 2*(emb - res) * g_loss   (codebook rows, one-hot scatter)
        d/d res -> 2*beta*(res - emb) * g_loss   (commitment term)
      * residual chain res_{l+1} = res_l - emb_out_l:
        g_res_l += g_res_{l+1};  g_embout_l -= g_res_{l+1}
      * estimator emb_out_l = f(res_l) (codebook enters only under
        stop_gradient in both estimators — reference quantize.py:130-144):
        STE:      g_res_l += g_embout
        ROTATION: g_res_l += s * (g - 2 w (w.g) + 2 u (q_hat.g))
                  with u = res/|res|, q_hat = emb/|emb|, w = unit(u + q_hat),
                  s = |emb|/|res| — the vjp of e -> (e - 2(e.w)w + 2(e.u)q)*s
                  with w, u, q, s all detached (models/quantize.py:98-148,
                  eps values replicated exactly).
    """
    embs, residuals, sem_ids, x_marker, cb_marker = saved
    d_emb, d_res, _, d_loss = cot
    n_levels = embs.shape[-1]
    k = cb_marker.shape[1]
    x_dtype, cb_dtype = x_marker.dtype, cb_marker.dtype
    beta = commitment_weight

    g_loss = d_loss[:, None].astype(jnp.float32)            # (B, 1)
    g_res_next = jnp.zeros(embs.shape[:2], jnp.float32)     # (B, D)
    d_cb = []
    for level in reversed(range(n_levels)):
        res = residuals[..., level].astype(jnp.float32)
        emb = embs[..., level].astype(jnp.float32)
        g_embout = d_emb[..., level].astype(jnp.float32) - g_res_next
        g_res = g_res_next + d_res[..., level].astype(jnp.float32)

        # quantize-loss terms
        onehot = jax.nn.one_hot(sem_ids[:, level], k, dtype=jnp.float32)
        d_cb.append(jax.lax.dot_general(
            onehot, 2.0 * g_loss * (emb - res),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ))                                                   # (K, D)
        g_res = g_res + 2.0 * beta * g_loss * (res - emb)

        # estimator vjp
        if mode == "STE":
            g_res = g_res + g_embout
        elif mode == "ROTATION_TRICK":
            rn = jnp.linalg.norm(res, axis=-1, keepdims=True)
            en = jnp.linalg.norm(emb, axis=-1, keepdims=True)
            u = res / (rn + 1e-8)
            qh = emb / (en + 1e-8)
            w = u + qh
            w = w / jnp.sqrt(
                jnp.maximum(jnp.sum(w * w, axis=-1, keepdims=True), 1e-6**2)
            )
            s = en / (rn + 1e-6)
            g = g_embout
            g_res = g_res + s * (
                g
                - 2.0 * w * jnp.sum(w * g, axis=-1, keepdims=True)
                + 2.0 * u * jnp.sum(qh * g, axis=-1, keepdims=True)
            )
        else:  # pragma: no cover - guarded at the call site
            raise ValueError(f"unsupported fused training mode: {mode}")
        g_res_next = g_res
    d_cb = jnp.stack(d_cb[::-1], axis=0)
    return g_res_next.astype(x_dtype), d_cb.astype(cb_dtype)


rq_quantize_train.defvjp(_rq_train_fwd, _rq_train_bwd)
