"""Benchmark: decoder training throughput on the flagship (Amazon) config.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "examples/s", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so vs_baseline ratchets
against our own first measurement stored in BENCH_BASELINE.json (recorded on
1 TPU v5e chip in round 1). Full corpus tokenization + forward + backward +
AdamW per step, global batch 256, history 20 items x 4 sem-ID tokens + user
token (81 enc tokens), 8-layer / 512-wide transformer — the reference's
decoder_amazon.gin shapes.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rqvae_tpu.data.schemas import SeqBatch
    from rqvae_tpu.models import retrieval
    from rqvae_tpu.models.retrieval import RetrievalConfig
    from rqvae_tpu.tokenizer import semids
    from rqvae_tpu.train import optim
    from rqvae_tpu.train.train_decoder import make_train_step

    cfg = RetrievalConfig(
        embedding_dim=128, attn_dim=512, dropout=0.3, num_heads=8, n_layers=8,
        num_embeddings=256, sem_id_dim=4, max_pos=80,
    )
    batch_size = 256
    n_items = 12101  # Amazon Beauty corpus size
    n_hist = 20
    rng = np.random.RandomState(0)

    # corpus index (deduped tuples, as after stage-1)
    base = rng.randint(0, 256, (n_items, 3)).astype(np.int32)
    dedup = np.asarray(
        semids.dedup_column(jnp.asarray(base), 256)
    )
    cached = np.concatenate([base, dedup[:, None]], axis=1).astype(np.int32)
    index = semids.build_index(jnp.asarray(cached), codebook_size=256)

    params = retrieval.init(jax.random.PRNGKey(0), cfg)
    opt = optim.adamw(3e-4, 0.035)
    opt_state = opt.init(params)

    ids = rng.randint(0, n_items, (batch_size, n_hist)).astype(np.int32)
    lengths = rng.randint(3, n_hist + 1, (batch_size,))
    mask = np.arange(n_hist)[None, :] < lengths[:, None]
    ids = np.where(mask, ids, -1)
    batch = SeqBatch(  # leading accum=1 axis for the scan-based step
        user_ids=jnp.asarray(np.arange(batch_size, dtype=np.int32)[None]),
        ids=jnp.asarray(ids[None]),
        ids_fut=jnp.asarray(
            rng.randint(0, n_items, (1, batch_size, 1)).astype(np.int32)
        ),
        x=jnp.zeros((1, batch_size, 1)),
        x_fut=jnp.zeros((1, batch_size, 1)),
        seq_mask=jnp.asarray(mask[None]),
    )

    # the REAL train step from the decoder loop: tokenize -> forward ->
    # backward -> AdamW, bf16 compute / fp32 state (the TPU-native default)
    train_step = jax.jit(
        make_train_step(cfg, opt, index, 1, jnp.bfloat16, 4),
        donate_argnums=(0, 1),
    )

    key = jax.random.key(1, impl="rbg")  # the train loop's default PRNG
    # warmup: compile + ~20 steps (a fresh process's first steps run well
    # below steady state — measured 3.8k vs 10.1k ex/s on the same step)
    for _ in range(20):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = train_step(params, opt_state, batch, sub)
    jax.block_until_ready(metrics["total_loss"])

    n_steps = 50
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = train_step(params, opt_state, batch, sub)
    jax.block_until_ready(metrics["total_loss"])
    dt = time.perf_counter() - t0
    examples_per_s = n_steps * batch_size / dt

    baseline_path = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)["value"]
    else:
        baseline = examples_per_s
        with open(baseline_path, "w") as f:
            json.dump(
                {"metric": "decoder_train_examples_per_s",
                 "value": examples_per_s,
                 "note": "round-1 measurement on 1x TPU v5e"}, f)

    print(json.dumps({
        "metric": "decoder_train_examples_per_s_amazon_bs256",
        "value": round(examples_per_s, 2),
        "unit": "examples/s",
        "vs_baseline": round(examples_per_s / baseline, 4),
    }))


if __name__ == "__main__":
    main()
