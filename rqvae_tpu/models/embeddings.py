"""Semantic-ID and user-ID embedders.

Parity: reference modules/embedding/id_embedder.py:14-53.
  * SemIdEmbedder: ONE table of codebook_size * sem_ids_dim + 1 rows; the
    flat row index is token_type * codebook_size + sem_id (level-offset
    flattening); masked positions map to the final padding row.
  * UserIdEmbedder: hashing-trick bucket embedding (user_id % num_buckets).

This single table is the primary tensor-parallel shard target (BASELINE.json:
row/column-sharded item-embedding tables with all-to-all lookup).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from rqvae_tpu.utils import initializers


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def sem_id_embedder_init(
    key: jax.Array, num_embeddings: int, sem_ids_dim: int, embedding_dim: int
) -> jax.Array:
    """Functionally (K * D + 1, E) — row K*D is the padding vector (zeros,
    matching torch's padding_idx). The row count is rounded up to a multiple
    of 16 so the table can be row-sharded over a 'model' mesh axis; the
    trailing rows are never addressed."""
    rows = _round_up(num_embeddings * sem_ids_dim + 1, 16)
    table = initializers.normal(key, (rows, embedding_dim))
    return table.at[num_embeddings * sem_ids_dim :].set(0.0)


def sem_id_padding_idx(num_embeddings: int, sem_ids_dim: int) -> int:
    return num_embeddings * sem_ids_dim


def sem_id_embed(
    table: jax.Array,
    sem_ids: jax.Array,
    token_type_ids: jax.Array,
    num_embeddings: int,
    seq_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Level-offset lookup; invalid positions hit the padding row."""
    padding_idx = table.shape[0] - 1  # any zeroed tail row works as padding
    idx = token_type_ids * num_embeddings + sem_ids
    if seq_mask is not None:
        idx = jnp.where(seq_mask, idx, padding_idx)
    idx = jnp.clip(idx, 0, padding_idx)
    return table[idx]


def user_id_embedder_init(
    key: jax.Array, num_buckets: int, embedding_dim: int
) -> jax.Array:
    return initializers.normal(key, (num_buckets, embedding_dim))


def user_id_embed(table: jax.Array, user_ids: jax.Array) -> jax.Array:
    """Hashing trick: bucket = id mod num_buckets (reference id_embedder.py:51)."""
    num_buckets = table.shape[0]
    return table[jnp.abs(user_ids) % num_buckets]
