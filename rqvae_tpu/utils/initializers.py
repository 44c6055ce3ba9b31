"""Parameter initializers matching the reference's torch defaults.

The reference relies on torch's default module initializers:
  * nn.Linear (modules/encoder.py:28): kaiming_uniform(a=sqrt(5)) which for a
    (out, in) weight reduces to U(-1/sqrt(in), +1/sqrt(in)).
  * nn.Embedding for codebooks (modules/quantize.py:87-89): U(0, 1) via the
    explicit ``nn.init.uniform_`` override.
  * nn.Embedding elsewhere (wpe/tte/sem-id tables): N(0, 1) torch default.
  * bos_emb (modules/model.py:63): torch.rand -> U(0, 1).

We keep weights laid out (in, out) so the forward is ``x @ w`` (row-major
activations hitting the MXU with the contraction on the last axis).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def linear(key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32) -> jax.Array:
    """torch nn.Linear default init, transposed to (in, out)."""
    bound = 1.0 / math.sqrt(in_dim)
    return jax.random.uniform(
        key, (in_dim, out_dim), minval=-bound, maxval=bound, dtype=dtype
    )


def uniform01(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """U(0, 1) — codebooks (reference modules/quantize.py:87-89) and bos_emb."""
    return jax.random.uniform(key, shape, minval=0.0, maxval=1.0, dtype=dtype)


def normal(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """N(0, 1) — torch nn.Embedding default (wpe/tte/sem-id/user tables)."""
    return jax.random.normal(key, shape, dtype=dtype)
