"""Retrieval eval metrics: hits@k over generated beam tuples.

Parity: reference evaluate/metrics.py:6-31 (TopKAccumulator).
  * ``h@K_slice_:i`` — the actual tuple's length-i prefix appears among the
    top-K beams (matched on the full prefix). ``h@K_slice_:D`` is recall@K
    of the exact item.
  * ``h@K_pos_i`` — position i alone matches in some top-K beam.

The per-batch counting is a pure jit-able function; the accumulator keeps
plain Python floats on host so it works across eval shards (sum-reducible —
use psum/allreduce of the count dict for multi-host).

NDCG@K is added on top of the reference's hit metrics: the exact-item match
rank r contributes 1/log2(r+2).
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def batch_hit_counts(
    actual: jax.Array,      # (B, D) int32
    top_k: jax.Array,       # (B, n_beams, D) int32
    ks: Sequence[int] = (1, 5, 10),
    valid: jax.Array = None,  # (B,) bool — False rows are padding, not counted
) -> Dict[str, jax.Array]:
    """Count hits for one eval batch (reference metrics.py:15-28).

    ``valid`` lets callers pad eval batches to a fixed global shape (the
    beam-search program is shape-specialized) and mask the padding out under
    jit — so the counts are replicated scalars even when the batch is sharded
    over a multi-host 'data' axis.
    """
    b, d = actual.shape
    if valid is None:
        valid = jnp.ones((b,), bool)
    pos_match = actual[:, None, :] == top_k  # (B, n_beams, D)
    out: Dict[str, jax.Array] = {}
    for i in range(d):
        for name, match in (
            (f"slice_:{i + 1}", jnp.all(pos_match[..., : i + 1], axis=-1)),
            (f"pos_{i}", pos_match[..., i]),
        ):
            found = jnp.any(match, axis=-1) & valid             # (B,)
            rank = jnp.argmax(match, axis=-1)                   # first hit
            for kk in ks:
                out[f"h@{kk}_{name}"] = jnp.sum(found & (rank < kk))
        # NDCG on the exact-item slice
        if i == d - 1:
            match = jnp.all(pos_match, axis=-1)
            found = jnp.any(match, axis=-1) & valid
            rank = jnp.argmax(match, axis=-1)
            gain = 1.0 / jnp.log2(rank.astype(jnp.float32) + 2.0)
            for kk in ks:
                out[f"ndcg@{kk}"] = jnp.sum(
                    jnp.where(found & (rank < kk), gain, 0.0)
                )
    return out


class TopKAccumulator:
    """Host-side accumulator with the reference's reduce() contract."""

    def __init__(self, ks: Sequence[int] = (1, 5, 10)):
        self.ks = tuple(ks)
        self.reset()

    def reset(self) -> None:
        self.total = 0
        self.metrics: Dict[str, float] = {}

    def accumulate(self, actual, top_k) -> None:
        counts = batch_hit_counts(jnp.asarray(actual), jnp.asarray(top_k), self.ks)
        self.accumulate_counts(counts, int(np.asarray(actual).shape[0]))

    def accumulate_counts(self, counts: Dict[str, object], n_rows: int) -> None:
        """Fold in precomputed per-batch counts (e.g. from a jitted
        batch_hit_counts over a mesh-sharded batch, where the counts come
        back as replicated scalars identical on every host)."""
        for key, value in counts.items():
            self.metrics[key] = self.metrics.get(key, 0.0) + float(value)
        self.total += int(n_rows)

    def reduce(self) -> Dict[str, float]:
        return {k: v / self.total for k, v in self.metrics.items()}
