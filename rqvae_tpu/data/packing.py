"""Sequence packing for long-context decoder training.

The reference pads every user history to ``max_seq_len`` items (801 encoder
tokens at the ML-32M shape) and burns the padding as dead compute; its only
mitigation is the jagged/NestedTensor representation (reference
ops/triton/jagged.py), which saves attention FLOPs but still runs one history
per row. This framework's first answer was length-bucketed gradient
accumulation (train_decoder.length_buckets) — measured 1.96-2.36x on one v5e
— but bucketing still pads within each bucket, runs one program per bucket,
and is restricted to a single process because the group shapes are
data-dependent.

Packing is the TPU-native end point of that line: place SEVERAL sampled
crops ("segments") in ONE fixed-shape row, give every row the same static
(items, slots) capacity, and make the attention kernel segment-local via
per-query key spans (ops/attention.span_mask, ops/flash_attention.
flash_attention_spans). Every shape is static, so ONE jit program serves
every step and the path shards over a multi-host mesh exactly like the flat
step — while the padded-token fraction drops from ~66% (801-token rows at
the real mean crop length of ~68 items) to ~2-5% (packer fill losses).

Semantics: each packed slot is EXACTLY one flat-step example (same crop
distribution, same tokens, same per-segment positional embeddings, same
per-example loss). A step's loss is the mean over the valid slots it packed,
i.e. a flat step whose batch size varies slightly around
rows * items_capacity / mean_crop_len. tests/test_packing.py locks slot-vs-
flat loss/grad parity.
"""
from __future__ import annotations

import bisect
import dataclasses
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import numpy as np

Array = jax.Array


class PackedSeqBatch(NamedTuple):
    """A packed batch in raw item-ID space: R rows, up to S segments each.

    Segments occupy contiguous item ranges; ``slot_*`` arrays describe them.
    Unused slots have slot_len == 0, slot_valid False, ids_fut -1.
    """

    user_ids: Array    # (R, S) int32 per-slot user (0 at unused slots)
    ids: Array         # (R, N) int32 packed item ids, -1 padding
    ids_fut: Array     # (R, S) int32 per-slot target item, -1 unused
    seg_item: Array    # (R, N) int32 slot index of each item position, -1 pad
    slot_start: Array  # (R, S) int32 item index where the slot begins
    slot_len: Array    # (R, S) int32 items in the slot (0 = unused)
    slot_valid: Array  # (R, S) bool


Crop = Tuple[int, np.ndarray, int]  # (user_id, item_ids, fut_id)


def pack_crops(
    crops: Sequence[Crop], rows: int, slots: int, capacity: int
) -> Tuple[PackedSeqBatch, List[Crop]]:
    """Best-fit-decreasing packing of ``crops`` into a fixed (rows, slots,
    capacity) grid. Pure function (tests and bench call it directly).

    Returns (batch, leftovers): crops that did not fit this batch, in their
    original order, to be carried into the next one.
    """
    n, s = capacity, slots
    user_ids = np.zeros((rows, s), np.int32)
    ids = np.full((rows, n), -1, np.int32)
    ids_fut = np.full((rows, s), -1, np.int32)
    seg_item = np.full((rows, n), -1, np.int32)
    slot_start = np.zeros((rows, s), np.int32)
    slot_len = np.zeros((rows, s), np.int32)
    slot_valid = np.zeros((rows, s), bool)

    # pending crops sorted ascending by length; best fit = longest <= cap
    order = sorted(range(len(crops)), key=lambda i: len(crops[i][1]))
    lengths = [len(crops[i][1]) for i in order]
    taken = [False] * len(crops)

    for r in range(rows):
        cursor = 0
        for slot in range(s):
            cap = n - cursor
            if cap <= 0 or not order:
                break
            j = bisect.bisect_right(lengths, cap) - 1
            if j < 0:
                break  # nothing fits the remaining capacity
            ci = order.pop(j)
            lengths.pop(j)
            taken[ci] = True
            user, crop_ids, fut = crops[ci]
            ln = len(crop_ids)
            ids[r, cursor : cursor + ln] = crop_ids
            seg_item[r, cursor : cursor + ln] = slot
            user_ids[r, slot] = user
            ids_fut[r, slot] = fut
            slot_start[r, slot] = cursor
            slot_len[r, slot] = ln
            slot_valid[r, slot] = True
            cursor += ln

    leftovers = [c for i, c in enumerate(crops) if not taken[i]]
    batch = PackedSeqBatch(
        user_ids=user_ids,
        ids=ids,
        ids_fut=ids_fut,
        seg_item=seg_item,
        slot_start=slot_start,
        slot_len=slot_len,
        slot_valid=slot_valid,
    )
    return batch, leftovers


@dataclasses.dataclass
class SequencePacker:
    """Streaming packer over a SeqDataset's sampled crops.

    Each ``next_batch`` samples fresh crops (the same random-crop subsample
    the flat step uses), tops up a carry buffer, and packs a fixed
    (rows, slots) batch. Unplaced crops carry over, so every sampled crop
    trains exactly once (modulo the final partial buffer of a finite run).
    """

    seqs: "object"               # data.dataset.SeqDataset
    rng: np.random.Generator
    rows: int
    slots: int
    subsample: bool = True
    # sampling chunk ~ expected examples per batch; the buffer floats around
    # 1-2 chunks so best-fit always has material to fill row tails with
    _pending: List[Crop] = dataclasses.field(default_factory=list)

    def __post_init__(self):
        self.capacity = self.seqs.max_seq_len
        # expected crop length under the reference's random-crop subsample is
        # ~len/3; use a conservative estimate so the buffer stays stocked
        self.chunk = max(32, int(self.rows * self.capacity / 40))

    def _sample_crops(self, count: int) -> List[Crop]:
        raw = self.seqs.sample_batch(self.rng, count, subsample=self.subsample)
        out = []
        for u, row, fut in zip(raw["user_ids"], raw["ids"], raw["ids_fut"]):
            trimmed = row[row >= 0]
            out.append((int(u), trimmed, int(fut[0])))
        return out

    def next_batch(self) -> Tuple[PackedSeqBatch, int]:
        """Returns (packed batch, number of examples = valid slots)."""
        target = max(self.chunk, 2 * self.rows)
        if len(self._pending) < target:
            self._pending.extend(
                self._sample_crops(target - len(self._pending) + self.chunk)
            )
        batch, leftovers = pack_crops(
            self._pending, self.rows, self.slots, self.capacity
        )
        self._pending = leftovers
        return batch, int(batch.slot_valid.sum())
