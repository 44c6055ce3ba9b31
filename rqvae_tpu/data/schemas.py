"""Batch schemas (pytrees) shared across the pipeline.

Parity: reference data/schemas.py:7-21 defines the same two batch records as
torch NamedTuples. Here they are NamedTuples of jax arrays, which makes them
pytrees for free (jit/shard/donate-friendly).

Conventions:
  * ``ids``/``sem_ids`` use -1 as the padding sentinel (same as reference).
  * masks are boolean, True = valid position.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax

Array = jax.Array

FUT_SUFFIX = "_fut"


class SeqBatch(NamedTuple):
    """A batch in raw item-ID space (reference data/schemas.py:7-13)."""

    user_ids: Array       # (B,) int32
    ids: Array            # (B, N) int32, -1 padded
    ids_fut: Array        # (B, 1) int32 target item
    x: Array              # (B, N, D_in) or (B, D_in) item features, -1 at pads
    x_fut: Array          # (B, 1, D_in) or placeholder
    seq_mask: Array       # (B, N) bool


class TokenizedSeqBatch(NamedTuple):
    """A batch in semantic-ID token space (reference data/schemas.py:15-21).

    sem_ids flattens each item's D-tuple into the sequence: length N*D.
    """

    user_ids: Array                     # (B,) int32
    sem_ids: Array                      # (B, N*D) int32, -1 padded
    sem_ids_fut: Optional[Array]        # (B, D) int32 or None
    seq_mask: Array                     # (B, N*D) bool
    token_type_ids: Array               # (B, N*D) int32 in [0, D)
    token_type_ids_fut: Optional[Array]  # (B, D) int32 or None
