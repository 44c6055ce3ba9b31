"""Native C batcher: builds, matches the Python reference crop semantics."""
import numpy as np
import pytest

from rqvae_tpu import native
from rqvae_tpu.data.dataset import SeqDataset


@pytest.fixture
def ds():
    rng = np.random.RandomState(0)
    n, stored = 50, 30
    lengths = rng.randint(1, stored + 1, n)
    ids = np.full((n, stored), -1, np.int32)
    for i, l in enumerate(lengths):
        ids[i, :l] = rng.randint(0, 1000, l)
    return SeqDataset(
        user_ids=np.arange(n, dtype=np.int32),
        item_ids=ids,
        item_ids_fut=rng.randint(0, 1000, (n, 1)).astype(np.int32),
        max_seq_len=10,
    )


def test_native_builds_and_runs(ds):
    if not native.available():
        pytest.skip("no C compiler in environment")
    out = native.subsample_batch(
        ds.item_ids, ds.item_ids_fut, np.arange(50), ds.max_seq_len, seed=7
    )
    assert out is not None
    ids, fut = out
    assert ids.shape == (50, 10) and fut.shape == (50,)


def test_native_crop_invariants(ds):
    """Every native crop must be a valid window of (row ++ fut): contiguous
    source slice, correct target, length within [min(2,len-1), max_seq_len]."""
    if not native.available():
        pytest.skip("no C compiler in environment")
    idx = np.arange(50)
    ids, fut = native.subsample_batch(
        ds.item_ids, ds.item_ids_fut, idx, ds.max_seq_len, seed=123
    )
    for b, i in enumerate(idx):
        row = ds.item_ids[i]
        seq = row[row >= 0].tolist() + [int(ds.item_ids_fut[i, 0])]
        crop = ids[b][ids[b] >= 0].tolist() + [int(fut[b])]
        assert len(crop) >= min(3, len(seq)), (b, crop, seq)
        assert len(crop) <= ds.max_seq_len + 1
        # crop must appear as a contiguous slice of seq
        found = any(
            seq[s : s + len(crop)] == crop
            for s in range(len(seq) - len(crop) + 1)
        )
        assert found, (b, crop, seq)


def test_native_distribution_reasonable(ds):
    """Aggregate crop lengths should span the valid range, not collapse."""
    if not native.available():
        pytest.skip("no C compiler in environment")
    ids, _ = native.subsample_batch(
        ds.item_ids, ds.item_ids_fut,
        np.repeat(np.arange(50), 20), ds.max_seq_len, seed=5,
    )
    lens = (ids >= 0).sum(axis=1)
    assert lens.min() >= 1 and lens.max() <= ds.max_seq_len
    assert len(np.unique(lens)) > 3  # varied crops


def test_batch_at_uses_native_or_python(ds):
    rng = np.random.default_rng(0)
    b = ds.batch_at(np.arange(8), rng)
    assert b["ids"].shape == (8, 10)
    assert b["ids_fut"].shape == (8, 1)
    assert (b["ids"] >= -1).all()


def test_python_fallback_when_disabled(ds, monkeypatch):
    monkeypatch.setenv("RQVAE_TPU_DISABLE_NATIVE", "1")
    # force re-evaluation of the availability check
    monkeypatch.setattr(native, "_TRIED", False)
    monkeypatch.setattr(native, "_LIB", None)
    rng = np.random.default_rng(0)
    b = ds.batch_at(np.arange(8), rng)
    assert b["ids"].shape == (8, 10)
    monkeypatch.setattr(native, "_TRIED", False)  # restore probing
