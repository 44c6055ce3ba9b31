"""One residual-quantization level (codebook lookup + training estimators).

Parity: reference modules/quantize.py:48-156.
  * L2 / cosine distance matrix against the (out-projected) codebook.
  * hard argmin ids.
  * three gradient estimators for training:
      GUMBEL_SOFTMAX — soft weights @ codebook from gumbel_softmax(-dist, t)
      STE            — x + sg(emb - x)
      ROTATION_TRICK — Householder-style transform, §4.2 of arXiv:2410.06424
  * optional SimVQ out-projection (arXiv:2411.02038) and codebook l2-norm.
  * eval path: hard lookup.
  * quantize loss (codebook + commitment) in both paths.

The plain-jnp path here is the semantic reference; the fused Pallas kernel in
``rqvae_tpu.ops.quantize_pallas`` is parity-tested against it and used on TPU
for the distance+argmin hot loop.
"""
from __future__ import annotations

import enum
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rqvae_tpu.models.losses import quantize_loss
from rqvae_tpu.models.normalize import l2norm
from rqvae_tpu.utils import initializers


class QuantizeForwardMode(enum.Enum):
    GUMBEL_SOFTMAX = 1
    STE = 2
    ROTATION_TRICK = 3


class QuantizeDistance(enum.Enum):
    L2 = 1
    COSINE = 2


class QuantizeOutput(NamedTuple):
    embeddings: jax.Array  # (B, D)
    ids: jax.Array         # (B,) int32
    loss: jax.Array        # (B,)


def init(key: jax.Array, n_embed: int, embed_dim: int, sim_vq: bool = False):
    """Codebook ~ U(0,1) (reference modules/quantize.py:87-89); optional SimVQ
    projection uses the torch Linear default."""
    k_emb, k_proj = jax.random.split(key)
    params = {"codebook": initializers.uniform01(k_emb, (n_embed, embed_dim))}
    if sim_vq:
        params["sim_proj"] = initializers.linear(k_proj, embed_dim, embed_dim)
    return params


def effective_codebook(
    params, *, normalize: bool = False, dtype=jnp.float32
) -> jax.Array:
    """out_proj(embedding.weight): SimVQ linear then optional l2-norm
    (reference modules/quantize.py:70-73,105)."""
    cb = params["codebook"].astype(dtype)
    if "sim_proj" in params:
        cb = cb @ params["sim_proj"].astype(dtype)
    if normalize:
        cb = l2norm(cb)
    return cb


def distances(
    x: jax.Array, codebook: jax.Array, mode: QuantizeDistance = QuantizeDistance.L2
) -> jax.Array:
    """(B, K) distance matrix (reference modules/quantize.py:107-117)."""
    if mode == QuantizeDistance.L2:
        return (
            jnp.sum(x * x, axis=-1, keepdims=True)
            + jnp.sum(codebook * codebook, axis=-1)[None, :]
            - 2.0 * x @ codebook.T
        )
    if mode == QuantizeDistance.COSINE:
        xn = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        cn = codebook / jnp.linalg.norm(codebook, axis=-1, keepdims=True)
        return -(xn @ cn.T)
    raise ValueError(f"Unsupported distance mode: {mode}")


def gumbel_softmax_sample(
    rng: jax.Array, logits: jax.Array, temperature: float
) -> jax.Array:
    """softmax((logits + Gumbel(0,1)) / t) (reference distributions/gumbel.py:8-18)."""
    eps = 1e-20
    u = jax.random.uniform(rng, logits.shape, dtype=logits.dtype)
    g = -jnp.log(-jnp.log(u + eps) + eps)
    return jax.nn.softmax((logits + g) / temperature, axis=-1)


def _rotation_trick(u: jax.Array, q: jax.Array, e: jax.Array) -> jax.Array:
    """Householder-ish rotation transform, §4.2 of arXiv:2410.06424
    (reference modules/quantize.py:34-45). u, q are unit-ish vectors; e is the
    raw input carried through the transform."""
    sg = jax.lax.stop_gradient
    w = sg(l2norm(u + q, eps=1e-6))
    # e - 2 (e.w) w + 2 (e.u) q, with u and q detached in the reflection term
    ew = jnp.sum(e * w, axis=-1, keepdims=True)
    eu = jnp.sum(e * sg(u), axis=-1, keepdims=True)
    return e - 2.0 * ew * w + 2.0 * eu * sg(q)


def apply(
    params,
    x: jax.Array,
    *,
    temperature: float,
    mode: QuantizeForwardMode = QuantizeForwardMode.GUMBEL_SOFTMAX,
    distance: QuantizeDistance = QuantizeDistance.L2,
    normalize: bool = False,
    commitment_weight: float = 0.25,
    training: bool = False,
    rng: Optional[jax.Array] = None,
) -> QuantizeOutput:
    """One quantization level (reference modules/quantize.py:99-156)."""
    codebook = effective_codebook(params, normalize=normalize, dtype=x.dtype)
    dist = distances(x, codebook, distance)
    ids = jnp.argmin(jax.lax.stop_gradient(dist), axis=-1).astype(jnp.int32)

    if training:
        if mode == QuantizeForwardMode.GUMBEL_SOFTMAX:
            assert rng is not None, "gumbel estimator requires an rng"
            weights = gumbel_softmax_sample(rng, -dist, temperature)
            emb = weights @ codebook
            emb_out = emb
        elif mode == QuantizeForwardMode.STE:
            emb = codebook[ids]
            emb_out = x + jax.lax.stop_gradient(emb - x)
        elif mode == QuantizeForwardMode.ROTATION_TRICK:
            emb = codebook[ids]
            sg = jax.lax.stop_gradient
            rot = _rotation_trick(
                x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8),
                emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8),
                x,
            )
            scale = sg(
                jnp.linalg.norm(emb, axis=-1, keepdims=True)
                / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-6)
            )
            emb_out = rot * scale
        else:
            raise ValueError(f"Unsupported forward mode: {mode}")
        loss = quantize_loss(x, emb, commitment_weight)
    else:
        emb_out = codebook[ids]
        loss = quantize_loss(x, emb_out, commitment_weight)

    return QuantizeOutput(embeddings=emb_out, ids=ids, loss=loss)
