"""Fabricate a Beauty-scale Amazon-format dataset with learnable structure.

The environment has no network egress, so the real Amazon Beauty raw files
cannot be downloaded. For the quality-parity experiment (VERDICT.md item 1)
we instead fabricate raw files AT THE REFERENCE FORMAT AND SCALE
(sequential_data.txt / datamaps.json / meta.json.gz — the exact inputs of
reference data/amazon.py:25-137) with:

  * hierarchical item structure — coarse category -> subcategory -> item,
    mirrored in both the metadata TEXT and the embedding geometry, so an
    RQ-VAE's residual levels have real structure to capture;
  * user preference structure — each user favors a few subcategories with
    Zipf-popular items inside them, so next-item prediction has a
    well-above-chance ceiling (like real recommendation data);
  * Beauty-like scale — ~12k items, ~22k users, 5-core sequences of mean
    length ~9 (matching the published Amazon Beauty dataset statistics).

Both frameworks (ours and the torch reference driver) then consume the SAME
.npz artifacts produced by our offline preprocessing pipeline
(rqvae_tpu.data.amazon.process), making the downstream quality comparison
apples-to-apples.

Run: python experiments/make_synth_beauty.py --root dataset/synth-beauty
"""
from __future__ import annotations

import argparse
import gzip
import hashlib
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rqvae_tpu.data import amazon  # noqa: E402

N_COARSE = 20
N_SUB = 12           # per coarse -> 240 fine categories
DIM = 768


def _seeded_vec(tag: str, dim: int = DIM) -> np.ndarray:
    """Deterministic unit Gaussian from a string (stable across hosts)."""
    h = int.from_bytes(hashlib.sha256(tag.encode()).digest()[:4], "little")
    v = np.random.RandomState(h).randn(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def structured_encoder(dim: int = DIM):
    """Parses the Amazon item sentence and emits an embedding whose geometry
    follows the category hierarchy: coarse direction + subcategory direction
    + per-item noise. This is what makes the fabricated corpus RQ-VAE-shaped
    (sentence-T5 on real Beauty text has the same coarse-to-fine cluster
    structure, which is what the residual levels exploit)."""

    cat_re = re.compile(r"Categories: \[([^\]]*)\]")
    title_re = re.compile(r"Title: ([^;]*);")

    def encode(texts):
        out = np.empty((len(texts), dim), np.float32)
        for i, t in enumerate(texts):
            m = cat_re.search(t)
            parts = [p.strip(" '\"") for p in m.group(1).split(",")] if m else []
            coarse = parts[1] if len(parts) > 1 else "unknown"
            sub = parts[2] if len(parts) > 2 else "unknown"
            title = title_re.search(t)
            item_tag = title.group(1) if title else t
            v = (
                1.0 * _seeded_vec(f"coarse:{coarse}", dim)
                + 0.55 * _seeded_vec(f"sub:{coarse}/{sub}", dim)
                + 0.25 * _seeded_vec(f"item:{item_tag}", dim)
            )
            out[i] = v / np.linalg.norm(v)
        return out

    return encode


def fabricate_raw(root: str, *, n_items: int = 12101, n_users: int = 22363,
                  seed: int = 7) -> str:
    rng = np.random.default_rng(seed)
    raw = os.path.join(root, "raw", "beauty")
    os.makedirs(raw, exist_ok=True)

    n_fine = N_COARSE * N_SUB
    fine_of_item = rng.integers(0, n_fine, size=n_items)
    # Zipf popularity within each fine category (rank-1.1 law, like real
    # purchase data) — this is what makes top-K retrieval tractable
    items_by_fine = [np.where(fine_of_item == f)[0] for f in range(n_fine)]
    pop_by_fine = []
    for pool in items_by_fine:
        if len(pool) == 0:
            pop_by_fine.append(np.zeros(0))
            continue
        w = 1.0 / np.arange(1, len(pool) + 1) ** 1.1
        pop_by_fine.append(w / w.sum())

    # ---- metadata ----
    brands = [f"Brand{b}" for b in range(400)]
    meta_path = os.path.join(raw, "meta.json.gz")
    with gzip.open(meta_path, "wt") as f:
        for i in range(n_items):
            fine = int(fine_of_item[i])
            coarse, sub = divmod(fine, N_SUB)
            f.write(repr({
                "asin": f"B{i:09d}",
                "title": f"item-{i} of Cat{coarse} Sub{sub}",
                "brand": brands[(fine * 13 + i) % len(brands)],
                "categories": [["Beauty", f"Cat{coarse}", f"Sub{sub}"]],
                "price": round(float(2 + (i % 97) * 0.5), 2),
            }) + "\n")
    with open(os.path.join(raw, "datamaps.json"), "w") as f:
        json.dump(
            {"item2id": {f"B{i:09d}": str(i + 1) for i in range(n_items)}}, f
        )

    # ---- user sequences (5-core, mean length ~9 like Beauty) ----
    lines = []
    for u in range(1, n_users + 1):
        # preferences: one coarse category, Dirichlet over its subcategories
        coarse = int(rng.integers(0, N_COARSE))
        sub_pref = rng.dirichlet(np.full(N_SUB, 0.3))
        length = int(np.clip(5 + rng.geometric(0.22), 5, 40))
        seq = []
        prev_fine = None
        for _ in range(length):
            r = rng.random()
            if r < 0.08:                      # exploration: any category
                fine = int(rng.integers(0, n_fine))
            elif r < 0.28 and prev_fine is not None:
                fine = prev_fine              # short-term repeat-category
            else:                             # preference-driven
                sub = int(rng.choice(N_SUB, p=sub_pref))
                fine = coarse * N_SUB + sub
            pool, pop = items_by_fine[fine], pop_by_fine[fine]
            if len(pool) == 0:
                fine = int(rng.integers(0, n_fine))
                pool, pop = items_by_fine[fine], pop_by_fine[fine]
                if len(pool) == 0:
                    continue
            seq.append(int(pool[rng.choice(len(pool), p=pop)]) + 1)  # 1-based
            prev_fine = fine
        if len(seq) < 5:
            continue
        lines.append(" ".join(map(str, [u] + seq)))
    with open(os.path.join(raw, "sequential_data.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return raw


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="dataset/synth-beauty")
    p.add_argument("--n-items", type=int, default=12101)
    p.add_argument("--n-users", type=int, default=22363)
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args(argv)

    fabricate_raw(args.root, n_items=args.n_items, n_users=args.n_users,
                  seed=args.seed)
    # always force=True: this script just rewrote the raw files, so reusing
    # an existing processed/ dir would silently serve a previous corpus
    # realization (the round-5 ml32m rerun hit exactly that)
    out = amazon.process(
        args.root, "beauty", encode_fn=structured_encoder(), force=True
    )
    z = np.load(os.path.join(out, "items.npz"))
    print(f"artifacts at {out}: items {z['x'].shape}, "
          f"train items {int(z['is_train'].sum())}")


if __name__ == "__main__":
    main()
