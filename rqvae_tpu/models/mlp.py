"""Bias-free MLP with SiLU activations (+ optional dropout / final l2-norm).

Parity: reference modules/encoder.py:7-36. Used as the RQ-VAE encoder/decoder
and as the transformer FFN (reference modules/transformer/model.py:48-54).

Functional layout: params are a list of (in, out) weight matrices; apply is a
pure function, jit/vmap friendly. Compute dtype is taken from ``x`` — cast
inputs to bf16 upstream for MXU-friendly matmuls; params stay fp32 and are
cast at use-site.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from rqvae_tpu.models.normalize import l2norm
from rqvae_tpu.utils import initializers


def init(key: jax.Array, input_dim: int, hidden_dims: Sequence[int], out_dim: int):
    """Returns a list of weight matrices [(d0,d1), (d1,d2), ...]."""
    dims = [input_dim, *hidden_dims, out_dim]
    keys = jax.random.split(key, len(dims) - 1)
    return [
        initializers.linear(k, d_in, d_out)
        for k, d_in, d_out in zip(keys, dims[:-1], dims[1:])
    ]


def apply(
    params: List[jax.Array],
    x: jax.Array,
    *,
    dropout: float = 0.0,
    normalize: bool = False,
    training: bool = False,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """SiLU between layers (never after the last), dropout after each SiLU."""
    in_dim = params[0].shape[0]
    assert x.shape[-1] == in_dim, (
        f"Invalid input dim: expected {in_dim}, found {x.shape[-1]}"
    )
    n = len(params)
    for i, w in enumerate(params):
        x = x @ w.astype(x.dtype)
        if i != n - 1:
            x = jax.nn.silu(x)
            if training and dropout > 0.0:
                assert rng is not None, "dropout requires an rng"
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 1.0 - dropout, x.shape)
                x = jnp.where(keep, x / (1.0 - dropout), 0.0)
    if normalize:
        x = l2norm(x)
    return x
