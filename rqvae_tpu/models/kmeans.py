"""Full-batch Lloyd's k-means for codebook initialization.

Parity: reference init/kmeans.py:8-74.
  * init: k centroids sampled without replacement from x.
  * assignment: argmin of squared pairwise distance.
  * update: cluster mean; empty clusters reseeded from a random point of x.
  * stop when max centroid movement < 1e-10 (bounded by max_iters under jit).

TPU-native formulation: the assignment is a (B, K) distance matrix (MXU
matmul), the cluster means use a one-hot matmul (segment mean without
scatter), and the whole refinement runs in one ``lax.while_loop`` — no host
round-trips during the priming step.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class KmeansOutput(NamedTuple):
    centroids: jax.Array   # (K, D)
    assignment: jax.Array  # (B,) int32


def kmeans(
    rng: jax.Array,
    x: jax.Array,
    k: int,
    max_iters: int = 300,
    stop_threshold: float = 1e-10,
) -> KmeansOutput:
    """Run Lloyd's algorithm on x (B, D); returns centroids and assignment."""
    x = x.astype(jnp.float32)
    b = x.shape[0]
    rng, init_key = jax.random.split(rng)
    init_idx = jax.random.choice(init_key, b, (k,), replace=False)
    centroids0 = x[init_idx]

    def assign(centroids):
        # ||x||^2 - 2 x.c + ||c||^2; ||x||^2 constant w.r.t. argmin, kept for
        # parity with the reference's full squared distance.
        d = (
            jnp.sum(x * x, axis=-1, keepdims=True)
            - 2.0 * x @ centroids.T
            + jnp.sum(centroids * centroids, axis=-1)[None, :]
        )
        return jnp.argmin(d, axis=-1).astype(jnp.int32)

    def body(state):
        centroids, _, i, rng = state
        assignment = assign(centroids)
        onehot = jax.nn.one_hot(assignment, k, dtype=jnp.float32)  # (B, K)
        counts = jnp.sum(onehot, axis=0)                            # (K,)
        sums = onehot.T @ x                                         # (K, D)
        means = sums / jnp.maximum(counts, 1.0)[:, None]
        # empty clusters: reseed from a random data point
        rng, sub = jax.random.split(rng)
        reseed_idx = jax.random.randint(sub, (k,), 0, b)
        reseeded = x[reseed_idx]
        new_centroids = jnp.where((counts > 0)[:, None], means, reseeded)
        shift = jnp.max(jnp.linalg.norm(new_centroids - centroids, axis=-1))
        return new_centroids, shift, i + 1, rng

    def cond(state):
        _, shift, i, _ = state
        return jnp.logical_and(i < max_iters, shift >= stop_threshold)

    state = (centroids0, jnp.float32(jnp.inf), jnp.int32(0), rng)
    centroids, _, _, _ = jax.lax.while_loop(cond, body, state)
    return KmeansOutput(centroids=centroids, assignment=assign(centroids))
