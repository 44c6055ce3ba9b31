"""Fabricate an ML-32M-format dataset with LONG histories (raw CSVs), for
long-context (200-item window = 801-token) train-loop validation on real
hardware. Same idea as make_synth_beauty.py at the MovieLens shape.

Run: python experiments/make_synth_ml32m.py --root dataset/synth-ml32m
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rqvae_tpu.data import movielens  # noqa: E402
from experiments.make_synth_beauty import _seeded_vec  # noqa: E402


def structured_title_encoder(dim: int = 768):
    """Genre-cluster-structured title embeddings (titles carry a cluster id)."""

    def encode(texts):
        out = np.empty((len(texts), dim), np.float32)
        for i, t in enumerate(texts):
            c = t.split("c")[-1].split(" ")[0] if "c" in t else "0"
            v = _seeded_vec(f"cl:{c}", dim) + 0.35 * _seeded_vec(f"t:{t}", dim)
            out[i] = v / np.linalg.norm(v)
        return out

    return encode


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="dataset/synth-ml32m")
    p.add_argument("--n-movies", type=int, default=4000)
    p.add_argument("--n-users", type=int, default=600)
    p.add_argument("--ratings-per-user", type=int, default=260)
    p.add_argument("--n-clusters", type=int, default=40)
    p.add_argument("--seed", type=int, default=5)
    args = p.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    raw = os.path.join(args.root, "raw")
    os.makedirs(raw, exist_ok=True)
    genres = ["Action", "Comedy", "Drama", "Horror", "Sci-Fi", "Romance"]
    n_clusters = args.n_clusters
    cluster = rng.integers(0, n_clusters, args.n_movies)
    with open(os.path.join(raw, "movies.csv"), "w") as f:
        f.write("movieId,title,genres\n")
        for m in range(1, args.n_movies + 1):
            g = "|".join(rng.choice(genres, 2, replace=False))
            f.write(f'{m},"Movie c{cluster[m-1]} n{m} (2001)",{g}\n')
    # vectorized rating generation (the per-rating Python loop took minutes
    # at the >=50k-window quality-parity scale: ~10M ratings)
    by_cluster = [np.where(cluster == c)[0] + 1 for c in range(n_clusters)]
    flat_pool = np.concatenate(by_cluster)
    pool_len = np.array([len(x) for x in by_cluster])
    pool_off = np.concatenate([[0], np.cumsum(pool_len)[:-1]])
    n = args.n_users * args.ratings_per_user
    u = np.repeat(np.arange(1, args.n_users + 1), args.ratings_per_user)
    # 3 DISTINCT preferred clusters per user (without replacement, matching
    # the original per-user rng.choice(..., replace=False) semantics):
    # argpartition of a random matrix = vectorized sampling w/o replacement
    prefs = np.argpartition(
        rng.random((args.n_users, n_clusters)), 2, axis=1
    )[:, :3]
    c = np.where(
        rng.random(n) < 0.85,
        prefs[u - 1, rng.integers(0, 3, n)],
        rng.integers(0, n_clusters, n),
    )
    m = flat_pool[pool_off[c] + (rng.random(n) * pool_len[c]).astype(np.int64)]
    t = 1_000_000 + np.cumsum(rng.integers(1, 30, n))
    rating = rng.choice([3.0, 4.0, 5.0], n)
    import pandas as pd

    pd.DataFrame(
        {"userId": u, "movieId": m, "rating": rating, "timestamp": t}
    ).to_csv(os.path.join(raw, "ratings.csv"), index=False)

    out = movielens.process(
        args.root, "ml32m", max_seq_len=200,
        encode_fn=structured_title_encoder(),
    )
    z = np.load(os.path.join(out, "items.npz"))
    s = np.load(os.path.join(out, "seqs_train.npz"))
    print(f"artifacts at {out}: items {z['x'].shape}, "
          f"train windows {s['item_ids'].shape}")


if __name__ == "__main__":
    main()
