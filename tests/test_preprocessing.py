"""Offline preprocessing: Amazon + MovieLens raw-file pipelines on tiny
synthetic raw fixtures, end-to-end through the registry loader."""
import gzip
import json
import os

import numpy as np
import pytest

from rqvae_tpu.data import amazon, movielens, registry
from rqvae_tpu.data.text import hashed_stub_encoder


@pytest.fixture
def amazon_raw(tmp_path):
    raw = tmp_path / "raw" / "beauty"
    raw.mkdir(parents=True)
    # 4 users, item ids are 1-based in the raw file (reference amazon.py:66)
    lines = [
        "1 1 2 3 4 5",
        "2 3 4 5",
        "3 2 1 4",
        "4 5 4 3 2 1",
    ]
    (raw / "sequential_data.txt").write_text("\n".join(lines) + "\n")
    (raw / "datamaps.json").write_text(
        json.dumps({"item2id": {f"A{i}": str(i) for i in range(1, 6)}})
    )
    metas = [
        {"asin": f"A{i}", "title": f"item {i}", "brand": f"b{i}",
         "categories": [["Beauty", "Hair"]], "price": float(i)}
        for i in range(1, 6)
    ]
    with gzip.open(raw / "meta.json.gz", "wt") as f:
        for m in metas:
            f.write(repr(m) + "\n")
    return tmp_path


def test_amazon_process_and_load(amazon_raw):
    out = amazon.process(
        str(amazon_raw), "beauty", encode_fn=hashed_stub_encoder(dim=32)
    )
    bundle = registry.load(
        registry.RecDataset.AMAZON, str(amazon_raw), split="beauty"
    )
    assert bundle.items.x.shape == (5, 32)
    assert bundle.max_seq_len == 20

    # leave-last-two-out: user 1 history [1,2,3,4,5] 1-based -> [0..4] 0-based
    tr = bundle.train_seqs
    ev = bundle.eval_seqs
    te = bundle.test_seqs
    assert tr.item_ids_fut[0, 0] == 3 and te.item_ids_fut[0, 0] == 4
    np.testing.assert_array_equal(tr.item_ids[0][: 3], [0, 1, 2])
    # eval history ends right before the eval target
    row = ev.item_ids[0]
    assert row[row >= 0][-1] == 2 and ev.item_ids_fut[0, 0] == 3
    # test history includes the eval target
    row = te.item_ids[0]
    assert row[row >= 0][-1] == 3

    # idempotent cache: second call is a no-op
    assert amazon.process(str(amazon_raw), "beauty",
                          encode_fn=hashed_stub_encoder(dim=32)) == out


def test_amazon_sentence_template():
    s = amazon._item_sentence(
        {"title": "Lipstick", "brand": None,
         "categories": [["Beauty"]], "price": 9.99}
    )
    assert s == "Title: Lipstick; Brand: Unknown; Categories: ['Beauty']; Price: 9.99; "


@pytest.fixture
def ml1m_raw(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.RandomState(0)
    # 3 movies with >=5 ratings each, 1 movie with 1 rating (filtered out);
    # 5 users with >=5 ratings, 1 user with 2 (filtered out)
    rows = []
    t = 0
    for u in range(1, 6):
        for m in [10, 20, 30, 10, 20, 30]:
            rows.append(f"{u}::{m}::{rng.randint(1,6)}::{t}")
            t += 1
    rows.append(f"9::10::5::{t}")        # low-occurrence user
    rows.append(f"1::99::5::{t + 1}")    # low-occurrence movie
    (raw / "ratings.dat").write_text("\n".join(rows) + "\n")
    movies = [
        "10::Toy Story (1995)::Animation|Comedy",
        "20::Heat (1995)::Action|Crime",
        "30::Casino (1995)::Crime|Drama",
        "99::Obscure (1999)::Drama",
    ]
    (raw / "movies.dat").write_text("\n".join(movies) + "\n")
    return tmp_path


def test_ml1m_process_and_load(ml1m_raw):
    movielens.process(
        str(ml1m_raw), "ml1m", max_seq_len=4,
        encode_fn=hashed_stub_encoder(dim=16),
    )
    bundle = registry.load(registry.RecDataset.ML_1M, str(ml1m_raw))
    # movie 99 dropped (low occurrence): 3 items, 16 text dims + genre one-hots
    n_genres = 5  # Animation, Comedy, Action, Crime, Drama
    assert bundle.items.x.shape == (3, 16 + n_genres)

    tr, ev = bundle.train_seqs, bundle.eval_seqs
    assert len(tr) > 0 and len(ev) > 0
    # train windows: full window, no holdout target
    assert np.all(tr.item_ids_fut == -1)
    # eval windows: last element held out as future
    assert np.all(ev.item_ids_fut >= 0)
    # user 9's ratings were filtered (low occurrence)
    assert 9 not in set(tr.user_ids) | set(ev.user_ids)
    # all stored item indices are in-range contiguous ids
    assert tr.item_ids.max() < 3 and tr.item_ids.min() >= -1


def test_ml1m_low_occurrence_filter():
    ratings = movielens.pd.DataFrame(
        {"userId": [1] * 5 + [2], "movieId": [7, 7, 7, 7, 7, 8],
         "rating": [5] * 6, "timestamp": range(6)}
    )
    keep = movielens._low_occurrence_filter(ratings, "movieId")
    assert keep == {7}


def test_ml_rolling_window_stride():
    """window=3, stride=2: per-user windows [0:3],[2:5],[4:5] over 5 ratings."""
    ratings = movielens.pd.DataFrame(
        {"userId": [1] * 5, "movieId": [10, 20, 30, 10, 20],
         "rating": [5] * 5, "timestamp": range(5)}
    )
    hist = movielens.build_histories(
        ratings, movielens.pd.Series([10, 20, 30]), window=3, stride=2,
        train_split=1.0,
    )
    ids = hist["train"]["item_ids"]
    assert ids.shape[0] == 3
    np.testing.assert_array_equal(ids[0], [0, 1, 2])
    np.testing.assert_array_equal(ids[1], [2, 0, 1])
    np.testing.assert_array_equal(ids[2], [1, -1, -1])


def test_features_for_model_truncates_like_reference():
    """Wider artifacts (text + genre one-hots) are sliced to the model's
    input_dim (reference ItemData truncates to [:768], data/processed.py:76);
    narrower artifacts are a hard error, not a downstream shape crash."""
    from rqvae_tpu.data.dataset import features_for_model

    x = np.arange(12, dtype=np.float32).reshape(2, 6)
    np.testing.assert_array_equal(features_for_model(x, 4), x[:, :4])
    assert features_for_model(x, 6) is x  # no copy when widths match
    with pytest.raises(ValueError):
        features_for_model(x, 8)
