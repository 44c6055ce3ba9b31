"""Array-backed datasets + fixed-shape batchers (jit-friendly input pipeline).

Parity: reference data/processed.py:39-166 (ItemData / SeqData), redesigned
for a single-controller TPU pipeline:

  * datasets are plain NumPy arrays in host memory (loaded from .npz
    artifacts emitted by the offline preprocessing stage);
  * every sampled batch has a static shape: (B, max_seq_len) item IDs padded
    with -1, feature gathers done host-side, masks derived from ids >= 0;
  * train-time random-crop subsampling (reference data/processed.py:139-147)
    runs on host NumPy — it's control-flow-heavy and belongs off-device.

The reference truncates item features to [:768] in __getitem__
(data/processed.py:76,153), silently dropping categorical one-hots; here the
feature dim is explicit (``feature_dim``) and the truncation is a documented
choice of the caller.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from rqvae_tpu.data.schemas import SeqBatch


@dataclasses.dataclass
class ItemDataset:
    """Per-item rows: features + train/eval membership."""

    x: np.ndarray          # (n_items, feature_dim) float32
    is_train: np.ndarray   # (n_items,) bool

    def __len__(self) -> int:
        return self.x.shape[0]

    def filtered(self, split: str) -> np.ndarray:
        if split == "train":
            return self.x[self.is_train]
        if split == "eval":
            return self.x[~self.is_train]
        if split == "all":
            return self.x
        raise ValueError(f"unknown split: {split}")

    def sample_batch(self, rng: np.random.Generator, batch_size: int,
                     split: str = "train") -> np.ndarray:
        xs = self.filtered(split)
        idx = rng.integers(0, xs.shape[0], size=(batch_size,))
        return xs[idx]


def features_for_model(x: np.ndarray, input_dim: int) -> np.ndarray:
    """Slice item features to the model's input width.

    Reference parity: ``ItemData.__getitem__`` truncates features to the
    768-dim text embedding (reference data/processed.py:76,153), silently
    dropping trailing categorical one-hots (movielens genres). Here the
    truncation is explicit at every RQ-VAE feed site: wider artifacts (e.g.
    ml32m's 768 text + 6 genre dims) are sliced to ``input_dim``; narrower
    ones are a hard error rather than a silent shape mismatch downstream.
    """
    width = x.shape[-1]
    if width < input_dim:
        raise ValueError(
            f"item features are {width}-dim but the model expects "
            f"{input_dim}; regenerate the artifacts or lower vae_input_dim"
        )
    return x[..., :input_dim] if width > input_dim else x


@dataclasses.dataclass
class SeqDataset:
    """User histories in item-ID space.

    ``item_ids``: (n_users, max_stored_len) int32, -1 padded — for the train
    split this stores the FULL unpadded history (up to max_stored_len) so that
    random-crop subsampling can pick any window, mirroring the reference's
    decision to keep train sequences unpadded (data/amazon.py:76-78).
    ``item_ids_fut``: (n_users, 1) int32 target.
    """

    user_ids: np.ndarray       # (n_users,) int32
    item_ids: np.ndarray       # (n_users, max_stored_len) int32, -1 padded
    item_ids_fut: np.ndarray   # (n_users, 1) int32
    max_seq_len: int           # model-facing sequence length

    def __len__(self) -> int:
        return self.user_ids.shape[0]

    def _subsample_row(self, rng: np.random.Generator, row: np.ndarray,
                       fut: int) -> tuple[np.ndarray, int]:
        """Random crop (reference data/processed.py:139-147): append the
        future item, pick start in [0, len-3], end in [start+3,
        start+max_seq_len+1]; last element of the crop becomes the target."""
        seq = row[row >= 0].tolist() + [int(fut)]
        start = rng.integers(0, max(0, len(seq) - 3) + 1)
        end = rng.integers(start + 3, start + self.max_seq_len + 2)
        sample = seq[start:end]
        ids = sample[:-1]
        ids = ids + [-1] * (self.max_seq_len - len(ids))
        return np.asarray(ids, np.int32), sample[-1]

    def sample_batch(
        self,
        rng: np.random.Generator,
        batch_size: int,
        *,
        subsample: bool = False,
    ) -> dict:
        idx = rng.integers(0, len(self), size=(batch_size,))
        return self.batch_at(idx, rng if subsample else None)

    def batch_at(self, idx: np.ndarray, rng: Optional[np.random.Generator] = None) -> dict:
        """Assemble a fixed-shape batch; pass ``rng`` to enable subsampling.

        Subsampling uses the native C batcher (rqvae_tpu/native) when built —
        the per-row Python crop loop costs ~3 ms at bs=256 — with this Python
        path as the behavioral reference and fallback."""
        user_ids = self.user_ids[idx]
        if rng is not None:
            from rqvae_tpu import native

            nat = native.subsample_batch(
                self.item_ids, self.item_ids_fut, np.asarray(idx),
                self.max_seq_len, int(rng.integers(0, 2**63 - 1)),
            )
            if nat is not None:
                ids, fut = nat
                return {
                    "user_ids": user_ids.astype(np.int32).reshape(-1),
                    "ids": ids,
                    "ids_fut": fut[:, None],
                }
            rows, futs = [], []
            for i in idx:
                r, f = self._subsample_row(
                    rng, self.item_ids[i], int(self.item_ids_fut[i, 0])
                )
                rows.append(r)
                futs.append(f)
            ids = np.stack(rows)
            ids_fut = np.asarray(futs, np.int32)[:, None]
        else:
            ids = self.item_ids[idx][:, -self.max_seq_len:]
            # pad narrower storage up to max_seq_len
            if ids.shape[1] < self.max_seq_len:
                pad = np.full(
                    (ids.shape[0], self.max_seq_len - ids.shape[1]), -1, np.int32
                )
                ids = np.concatenate([ids, pad], axis=1)
            ids_fut = self.item_ids_fut[idx].astype(np.int32)
        return {"user_ids": user_ids.astype(np.int32).reshape(-1),
                "ids": ids.astype(np.int32),
                "ids_fut": ids_fut}


def make_seq_batch(
    batch: dict, item_x: np.ndarray, *, with_features: bool = True
) -> SeqBatch:
    """Gather item features for a sampled batch (host-side), -1 at pads
    (reference data/processed.py:148-166).

    ``with_features=False`` skips the gather and carries placeholder features:
    decoder training consumes only the ID stream (tokenization is a cached-ID
    lookup), and the 768-dim gather costs ~12 ms/step at bs=256 — half a
    device step — for tensors that would be thrown away.
    """
    ids = batch["ids"]
    ids_fut = batch["ids_fut"]
    if with_features:
        x = item_x[np.maximum(ids, 0)]
        x = np.where((ids >= 0)[..., None], x, -1.0).astype(np.float32)
        x_fut = item_x[np.maximum(ids_fut, 0)]
        x_fut = np.where(
            (ids_fut >= 0)[..., None], x_fut, -1.0
        ).astype(np.float32)
    else:
        x = np.zeros(ids.shape + (1,), np.float32)
        x_fut = np.zeros(ids_fut.shape + (1,), np.float32)
    return SeqBatch(
        user_ids=batch["user_ids"],
        ids=ids,
        ids_fut=ids_fut,
        x=x,
        x_fut=x_fut,
        seq_mask=ids >= 0,
    )


def load_item_dataset(path: str) -> ItemDataset:
    z = np.load(path, allow_pickle=False)
    return ItemDataset(x=z["x"].astype(np.float32), is_train=z["is_train"].astype(bool))


def load_seq_dataset(path: str, max_seq_len: int) -> SeqDataset:
    z = np.load(path, allow_pickle=False)
    return SeqDataset(
        user_ids=z["user_ids"].astype(np.int32),
        item_ids=z["item_ids"].astype(np.int32),
        item_ids_fut=z["item_ids_fut"].astype(np.int32),
        max_seq_len=max_seq_len,
    )
