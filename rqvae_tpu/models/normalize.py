"""Normalization primitives.

Parity: reference modules/normalize.py:7-32 (l2norm / L2NormalizationLayer /
RMSNorm with fp32 accumulation and a learned scale).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def l2norm(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """F.normalize(p=2) semantics: x / max(||x||, eps)."""
    n = jnp.linalg.norm(x, ord=2, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm with fp32 accumulation (reference modules/normalize.py:21-32)."""
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return normed.astype(x.dtype) * weight


def rms_norm_init(dim: int, dtype=jnp.float32) -> jax.Array:
    return jnp.ones((dim,), dtype=dtype)
