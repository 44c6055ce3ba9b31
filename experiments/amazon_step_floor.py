"""Decompose the Amazon-shape decoder train step (PERF.md bound table row 1).

This instrument knocks out one step component at a time to localize where
the Amazon-shape step's time goes (its round-4 run produced the PERF.md
knockout table: attention 54% of the step — which round 5 then measured
to be AT its MXU tiny-matmul latency floor, PERF.md short-N section):

  full          the real train step (tokenize -> fwd -> bwd -> AdamW)
  variant_full  the reimplemented step with ALL components on — the
                CONTROL the knockouts are differenced against, so each
                component delta excludes the production-vs-variant
                harness gap (microbatch wrapper, metrics plumbing),
                which is reported separately as full - variant_full
  loss_only     loss only (no backward, no optimizer)
  no_dropout    training=False forward + backward (PRNG/dropout removed)
  no_attn       attend() monkeypatched to identity (attention + bwd out)
  no_tok        tokenize_sequences hoisted out of the step (gather cost)
  no_opt        grads computed, optimizer update skipped

Timing: donated chained state, 20 warmup steps, fetch-forced completion
(BASELINE.md protocol). Run on the real chip: python
experiments/amazon_step_floor.py [--steps 50]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_inputs():
    import jax
    import jax.numpy as jnp

    from rqvae_tpu.data.schemas import SeqBatch
    from rqvae_tpu.models.retrieval import RetrievalConfig
    from rqvae_tpu.tokenizer import semids

    n_hist, batch_size, n_items = 20, 256, 12101
    cfg = RetrievalConfig(
        embedding_dim=128, attn_dim=512, dropout=0.3, num_heads=8, n_layers=8,
        num_embeddings=256, sem_id_dim=4, max_pos=n_hist * 4,
    )
    rng = np.random.RandomState(0)
    base = rng.randint(0, 256, (n_items, 3)).astype(np.int32)
    dedup = np.asarray(semids.dedup_column(jnp.asarray(base), 256))
    cached = np.concatenate([base, dedup[:, None]], axis=1).astype(np.int32)
    index = semids.build_index(jnp.asarray(cached), codebook_size=256)

    ids = rng.randint(0, n_items, (batch_size, n_hist)).astype(np.int32)
    lengths = rng.randint(3, n_hist + 1, (batch_size,))
    mask = np.arange(n_hist)[None, :] < lengths[:, None]
    ids = np.where(mask, ids, -1)
    batch = SeqBatch(
        user_ids=jnp.asarray(np.arange(batch_size, dtype=np.int32)[None]),
        ids=jnp.asarray(ids[None]),
        ids_fut=jnp.asarray(
            rng.randint(0, n_items, (batch_size, 1)).astype(np.int32)[None]
        ),
        x=jnp.zeros((1, batch_size, 1)),
        x_fut=jnp.zeros((1, batch_size, 1)),
        seq_mask=jnp.asarray(mask[None]),
    )
    return cfg, index, batch


def time_step(step, params, opt_state, batch, key, n_steps):
    import jax

    for i in range(20):
        params, opt_state, metrics = step(
            params, opt_state, batch, jax.random.fold_in(key, i)
        )
    float(metrics["total_loss"])
    t0 = time.perf_counter()
    for i in range(n_steps):
        params, opt_state, metrics = step(
            params, opt_state, batch, jax.random.fold_in(key, 100 + i)
        )
    final = float(metrics["total_loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(final), final
    return dt / n_steps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from rqvae_tpu.models import retrieval
    from rqvae_tpu.ops import attention
    from rqvae_tpu.tokenizer import semids
    from rqvae_tpu.train import optim
    from rqvae_tpu.train.train_decoder import make_train_step
    from rqvae_tpu.utils import amp

    cfg, index, batch = make_inputs()
    opt = optim.adamw(3e-4, 0.035)

    def fresh():
        params = retrieval.init(jax.random.PRNGKey(0), cfg)
        return params, opt.init(params)

    key = jax.random.key(1, impl="rbg")
    results = {}

    # ---- full production step (== bench.py amazon profile) ----
    step = jax.jit(
        make_train_step(cfg, opt, index, 1, jnp.bfloat16, 4),
        donate_argnums=(0, 1),
    )
    params, opt_state = fresh()
    results["full"] = time_step(step, params, opt_state, batch, key, args.steps)

    # ---- variants around the same microbatch loss ----
    def variant(loss_training=True, do_bwd=True, do_opt=True, pre_tok=False):
        def step_fn(params, opt_state, b, rng):
            mb = jax.tree.map(lambda a: a[0], b)
            if pre_tok:
                tok = mb  # already tokenized outside the jit
            else:
                tok = semids.tokenize_sequences(index, mb)

            def loss_fn(p):
                # mirror _make_microbatch_loss: bf16 compute, fp32 master
                pc = amp.cast_floating(p, jnp.bfloat16)
                out = retrieval.forward(
                    pc, cfg, tok, training=loss_training, rng=rng
                )
                return out.loss

            if not do_bwd:
                return params, opt_state, {"total_loss": loss_fn(params)}
            loss, grads = jax.value_and_grad(loss_fn)(params)
            if do_opt:
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
            else:
                # consume grads so XLA can't DCE the backward
                loss = loss + sum(
                    jnp.sum(g).astype(jnp.float32) * 0.0
                    for g in jax.tree.leaves(grads)
                )
            return params, opt_state, {"total_loss": loss}

        return jax.jit(step_fn, donate_argnums=(0, 1))

    # control: variant() with all components enabled. Component deltas are
    # computed against THIS, not against the production step, so each
    # knockout measures only its component — the production-vs-variant
    # implementation delta (microbatch/grad-accum wrapper, metrics
    # plumbing) is reported separately as harness overhead.
    for name, kw in [
        ("variant_full", dict()),
        ("loss_only", dict(do_bwd=False)),
        ("no_dropout", dict(loss_training=False)),
        ("no_opt", dict(do_opt=False)),
    ]:
        params, opt_state = fresh()
        results[name] = time_step(
            variant(**kw), params, opt_state, batch, key, args.steps
        )

    # tokenize hoisted out (the step consumes a pre-tokenized batch)
    mb = jax.tree.map(lambda a: a[0], batch)
    tok = jax.jit(lambda b: semids.tokenize_sequences(index, b))(mb)
    tok_batch = jax.tree.map(lambda a: a[None], tok)
    params, opt_state = fresh()
    results["no_tok"] = time_step(
        variant(pre_tok=True), params, opt_state, tok_batch, key, args.steps
    )

    # attention knocked out (values pass through; q/k/v projections remain)
    real_attend = attention.attend
    attention.attend = lambda q, k, v, **kw: v[:, : q.shape[1]] if (
        v.shape[1] >= q.shape[1]
    ) else jnp.pad(v, ((0, 0), (0, q.shape[1] - v.shape[1]), (0, 0), (0, 0)))
    try:
        params, opt_state = fresh()
        results["no_attn"] = time_step(
            variant(), params, opt_state, batch, key, args.steps
        )
    finally:
        attention.attend = real_attend

    full = results["full"]
    control = results["variant_full"]
    print(f"\namazon step decomposition (ms/step, bs 256, {args.steps} steps):")
    print(f"  {'full':12s} {full:6.2f}  (production step)")
    print(f"  {'variant_full':12s} {control:6.2f}  "
          f"(control; harness overhead ~{full - control:5.2f} ms)")
    for name, ms in results.items():
        if name in ("full", "variant_full"):
            continue
        print(f"  {name:12s} {ms:6.2f}  (component ~{control - ms:5.2f} ms)")


if __name__ == "__main__":
    main()
