"""RQ-VAE losses.

Parity: reference modules/loss.py:5-42.
  * reconstruction: per-row squared L2 summed over the feature axis.
  * categorical variant: adds BCE-with-logits over the trailing n_cat dims.
  * quantize: ||sg(q) - v||^2 + beta * ||q - sg(v)||^2 (codebook + commitment).

All reductions are row-wise (no batch mean here); callers reduce.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def reconstruction_loss(x_hat: jax.Array, x: jax.Array) -> jax.Array:
    return jnp.sum((x_hat - x) ** 2, axis=-1)


def categorical_reconstruction_loss(
    x_hat: jax.Array, x: jax.Array, n_cat_feats: int
) -> jax.Array:
    """Dense squared-L2 on the leading dims + BCE-with-logits on the cat tail."""
    if n_cat_feats <= 0:
        return reconstruction_loss(x_hat, x)
    dense = reconstruction_loss(x_hat[..., :-n_cat_feats], x[..., :-n_cat_feats])
    logits = x_hat[..., -n_cat_feats:]
    targets = x[..., -n_cat_feats:]
    # binary_cross_entropy_with_logits, reduction='none', summed over features
    bce = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return dense + jnp.sum(bce, axis=-1)


def quantize_loss(
    query: jax.Array, value: jax.Array, commitment_weight: float = 0.25
) -> jax.Array:
    """query = pre-quantization residual, value = quantized embedding."""
    sg = jax.lax.stop_gradient
    emb_loss = jnp.sum((sg(query) - value) ** 2, axis=-1)
    commit_loss = jnp.sum((query - sg(value)) ** 2, axis=-1)
    return emb_loss + commitment_weight * commit_loss
