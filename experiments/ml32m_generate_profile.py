"""Decompose the ml32m_generate serving profile (VERDICT r3 item 6).

The profile (bench.py ml32m_generate): B=64 801-token histories, k=32
constrained beams over an 84,432-item corpus, exhaustive candidates,
bf16 serving weights — benched at ~1.8k q/s in round 3 with no analysis.

Pieces timed (each a separate jit, chained-carry, scalar-fetch forced —
see flash_floor.timed for why block_until_ready cannot be trusted here):

  full       generate_next_sem_ids end to end (the bench.py program)
  encode     encoder pass + BOS decode + first top-k (everything at B rows:
             the 801-token flash encoder dominates this piece)
  children   the 3 beam-step children_mask calls at (B*k, i) prefixes
             against the 84k-key rank-chained index
  decode3    the 3 KV-cached one-token decode steps at B*k = 2048 rows
             (self-KV grows 1..3 tokens; cross-attn reads the 801-token
             encoder cache at B rows)

full ≈ encode + children + decode3 + (top-k/score glue).

Run: python experiments/ml32m_generate_profile.py [--iters 20]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.data.schemas import TokenizedSeqBatch
from rqvae_tpu.models import generation, retrieval
from rqvae_tpu.models.retrieval import RetrievalConfig
from rqvae_tpu.tokenizer import semids
from rqvae_tpu.utils import amp

B, K_BEAMS, N_HIST, N_ITEMS = 64, 32, 200, 84432


def timed(fn, *args, iters, warmup=5):
    loop_fn = jax.jit(fn)
    for i in range(warmup):
        out = loop_fn(*args)
    float(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = loop_fn(*args)
    final = float(out)  # scalar fetch forces completion
    assert np.isfinite(final), final
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    cfg = RetrievalConfig(
        embedding_dim=128, attn_dim=512, dropout=0.3, num_heads=8, n_layers=8,
        num_embeddings=256, sem_id_dim=4, max_pos=N_HIST * 4,
    )
    rng = np.random.RandomState(0)
    base = rng.randint(0, 256, (N_ITEMS, 3)).astype(np.int32)
    dedup = np.asarray(semids.dedup_column(jnp.asarray(base), 256))
    cached = np.concatenate([base, dedup[:, None]], axis=1).astype(np.int32)
    index = semids.build_index(jnp.asarray(cached), codebook_size=256)
    params = amp.cast_floating(
        retrieval.init(jax.random.PRNGKey(0), cfg), jnp.bfloat16
    )
    n = N_HIST * 4
    batch = TokenizedSeqBatch(
        user_ids=jnp.arange(B, dtype=jnp.int32),
        sem_ids=jnp.asarray(rng.randint(0, 256, (B, n)).astype(np.int32)),
        sem_ids_fut=None,
        seq_mask=jnp.ones((B, n), bool),
        token_type_ids=jnp.asarray(
            np.tile(np.arange(4, dtype=np.int32), (B, N_HIST))
        ),
        token_type_ids_fut=None,
    )
    key = jax.random.key(1, impl="rbg")

    results = {}

    def report(name, dt):
        results[name] = dt * 1e3
        print(f"{name:10s} {dt * 1e3:8.2f} ms/batch  "
              f"({B / dt:,.0f} queries/s)", flush=True)

    # ---- full program (= bench.py ml32m_generate)
    def full(p, bt, r):
        out = generation.generate_next_sem_ids(
            p, cfg, index, bt, r, k=K_BEAMS, n_candidates=256
        )
        return out.log_probas.sum()

    report("full", timed(full, params, batch, key, iters=args.iters))

    # ---- encoder + BOS decode + first top-k (all at B rows)
    def encode(p, bt, r):
        cache = retrieval.encode_for_generation(p, cfg, bt)
        logits, self_kv = retrieval.decode_token_cached(
            p, cfg, cache, None, None, 0, beams=1, n_rows=B
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        top_scores, _ = jax.lax.top_k(logp, K_BEAMS)
        return top_scores.sum() + jax.tree.reduce(
            lambda a, c: a + c.astype(jnp.float32).sum(), self_kv, 0.0
        ) * 1e-6

    report("encode", timed(encode, params, batch, key, iters=args.iters))

    # ---- the 3 children_mask calls at beam rows
    prefixes = [
        jnp.asarray(rng.randint(0, 256, (B * K_BEAMS, i)).astype(np.int32))
        for i in (1, 2, 3)
    ]

    def children(p1, p2, p3):
        acc = jnp.float32(0.0)
        for pre in (p1, p2, p3):
            acc = acc + semids.children_mask(index, pre).sum()
        return acc

    report("children", timed(children, *prefixes, iters=args.iters))

    # ---- the 3 cached one-token decode steps at B*k rows
    cache = jax.jit(
        lambda p, bt: retrieval.encode_for_generation(p, cfg, bt)
    )(params, batch)
    _, self_kv0 = jax.jit(
        lambda p, c: retrieval.decode_token_cached(
            p, cfg, c, None, None, 0, beams=1, n_rows=B
        )
    )(params, cache)
    self_kv0 = jax.tree.map(
        lambda c: jnp.broadcast_to(
            c[:, None], (B, K_BEAMS) + c.shape[1:]
        ).reshape((B * K_BEAMS,) + c.shape[1:]),
        self_kv0,
    )
    tokens = jnp.asarray(
        rng.randint(0, 256, (B * K_BEAMS,)).astype(np.int32)
    )

    def decode3(p, c, kv, tok):
        acc = jnp.float32(0.0)
        for i in range(1, 4):
            logits, kv = retrieval.decode_token_cached(
                p, cfg, c, kv, tok, i - 1, beams=K_BEAMS, n_rows=B * K_BEAMS
            )
            acc = acc + logits.astype(jnp.float32).sum()
        return acc

    report("decode3", timed(decode3, params, cache, self_kv0, tokens,
                            iters=args.iters))

    glue = results["full"] - results["encode"] - results["children"] \
        - results["decode3"]
    print(f"\nglue (top-k/score/cache-reorder, by difference): {glue:.2f} ms")
    print("summary:", {k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
