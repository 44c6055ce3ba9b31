"""Benchmark: decoder training throughput (the framework's headline metric).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "examples/s", "vs_baseline": N}

Default profile is the flagship Amazon config (reference decoder_amazon.gin:
global batch 256, history 20 items x 4 sem-ID tokens + user token = 81 enc
tokens, 8-layer / 512-wide transformer); ``--profile ml32m`` benchmarks the
long-context MovieLens shape (200 items -> 801 enc tokens, batch 256) where
the Pallas flash-attention path is live. Each step is the REAL train step
from the decoder loop: corpus-ID tokenize -> forward -> backward -> AdamW,
bf16 compute / fp32 state.

The reference publishes no numbers (BASELINE.md), so vs_baseline ratchets
against our own FIRST measurement of each profile, stored per-metric in
BENCH_BASELINE.json (1 TPU v5e chip; profiles added in later rounds seed
their baseline on their first run — entries are first-measurement ratchets,
not a single-round snapshot). ``--all`` runs every profile and writes a
machine-readable current snapshot (committed per round as
BENCH_full_r{N}.json) — that file, not BENCH_BASELINE, is the round's
source of truth for current numbers.

Timing notes (measured on the axon TPU tunnel): steps are chained through
donated (params, opt_state) so the loop is truly serialized, and ~20 warmup
steps are run first — a fresh process's first steps execute well below
steady state.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

PROFILES = {
    # name: (n_hist items, batch, corpus items)
    "amazon": dict(n_hist=20, batch_size=256, n_items=12101),
    # length-bucketed grad accumulation (exact flat-step gradients, fewer
    # padded tokens). MEASURED SLOWER on one v5e at this scale — 4.5k/5.6k
    # ex/s at 4/2 buckets vs 10.1k flat: per-program overhead and small
    # per-group batches beat the ~30% padded-FLOP saving. Kept as a profile
    # (and an opt-in train config) for larger-batch / multi-chip shapes.
    "amazon_bucketed": dict(n_hist=20, batch_size=256, n_items=12101,
                            buckets=2),
    # ml32m profiles draw lengths from the REAL training distribution (the
    # reference's random-crop subsample applied to stride-180 windows —
    # length_dist="crop" below); r03 drew uniform [3,200], which OVERstates
    # mean length (101.5 vs the real 67.7) and so UNDERstates bucketing's win
    "ml32m": dict(n_hist=200, batch_size=256, n_items=84432,
                  length_dist="crop"),
    # length_buckets at the regime it was designed for: 801-token histories
    # with heavy length skew, where padded-token waste is ~3x (the Amazon
    # shape's bucketing loss does not predict this one; VERDICT r2 item 9)
    "ml32m_bucketed": dict(n_hist=200, batch_size=256, n_items=84432,
                           buckets=4, length_dist="crop"),
    # packed long-context training (data/packing.py): several crops per
    # 801-token row, segment-local attention via the flash span kernel —
    # ONE static program, ~zero padding (vs ~66% padded tokens flat and
    # residual in-bucket padding for ml32m_bucketed). batch_size here is
    # the ROW count; throughput counts the packed examples per step.
    "ml32m_packed": dict(n_hist=200, batch_size=96, n_items=84432,
                         packed=True, slots=8, length_dist="crop"),
    # serving: constrained beam search queries/s (k=32 beams, exhaustive
    # candidates — a superset of the reference's 200-sample protocol)
    "amazon_generate": dict(n_hist=20, batch_size=256, n_items=12101),
    # protocol-parity serving row: EXACTLY the reference's 200 sampled
    # candidates per beam (reference modules/model.py:163-165)
    "amazon_generate_sampled": dict(n_hist=20, batch_size=256,
                                    n_items=12101, n_candidates=200),
    # long-context serving: 801-token histories against the full 84k-item
    # ML-32M corpus (flash encoder + KV-cached decode + rank-chained prefix
    # index at scale)
    "ml32m_generate": dict(n_hist=200, batch_size=64, n_items=84432),
    # the same long-context serving program at a batch that fills the
    # encoder (PERF.md's ml32m_generate section bounds bs 64 as
    # encoder-underfilled; this row measures the scaling claim). HBM note:
    # the cross-attention KV cache at B=256 x 801 tokens x 8 layers (bf16)
    # is ~3.4 GB of the 16 GB chip.
    "ml32m_generate_large": dict(n_hist=200, batch_size=256, n_items=84432),
    # stage 1: RQ-VAE tokenizer training (reference rqvae_amazon.gin shape:
    # bs 64, 768-dim inputs, 3x256 codebooks, embed 32)
    "rqvae": dict(batch_size=64, input_dim=768),
    # the shipped Amazon config's estimator (rqvae_amazon.gin:24
    # ROTATION_TRICK). NOTE: at this shape (3x256x32 codebooks) the size
    # heuristic routes training to XLA's jnp path — the fused Pallas
    # kernel is only faster (and only benchmarked) at large codebooks;
    # see rqvae_stretch.
    "rqvae_rotation": dict(batch_size=64, input_dim=768,
                           mode="ROTATION_TRICK"),
    # device-resident data loop (train_rqvae steps_per_call): corpus in HBM,
    # indices sampled on device, 32 steps per dispatch — the stage-1
    # speed-of-light path (~0.26 ms/step vs ~5 ms host-dispatch-bound)
    "rqvae_device_loop": dict(batch_size=64, input_dim=768,
                              mode="ROTATION_TRICK", steps_per_call=32),
    # the reference's DEFAULT estimator (train_rqvae.py:47 GUMBEL_SOFTMAX)
    # on the same device-resident loop — soft codeword mixing, jnp path
    # (no fused kernel: the (B, K) gumbel weights are inherent to the math)
    "rqvae_gumbel_device_loop": dict(batch_size=64, input_dim=768,
                                     mode="GUMBEL_SOFTMAX",
                                     steps_per_call=32),
    # BASELINE.json stretch shape (4x2048x64 codebooks, bs 1024): crosses
    # FUSED_TRAIN_MIN_CODEBOOK_VOLUME, so this DOES run the fused Pallas
    # training kernel (ops/quantize_pallas.rq_quantize_train) — measured
    # 1.54x the jnp path here
    "rqvae_stretch": dict(batch_size=1024, input_dim=768,
                          mode="ROTATION_TRICK", steps_per_call=16,
                          embed_dim=64, codebook_size=2048, n_layers=4),
}


def run_rqvae_profile(p) -> float:
    """Stage-1 RQ-VAE training throughput (examples/s)."""
    import jax
    import jax.numpy as jnp

    from rqvae_tpu.models import rqvae as rqvae_lib
    from rqvae_tpu.train import optim
    from rqvae_tpu.train.train_rqvae import make_train_step

    bsz, d = p["batch_size"], p["input_dim"]
    cfg = rqvae_lib.RqVaeConfig(
        input_dim=d, embed_dim=p.get("embed_dim", 32),
        hidden_dims=(512, 256, 128),
        codebook_size=p.get("codebook_size", 256),
        n_layers=p.get("n_layers", 3), n_cat_feats=0,
        codebook_mode=p.get("mode", "GUMBEL_SOFTMAX"),
    )
    rng = np.random.RandomState(0)
    params = rqvae_lib.init(jax.random.PRNGKey(0), cfg)
    opt = optim.adamw(5e-4, 0.01)
    opt_state = opt.init(params)
    key = jax.random.key(1, impl="rbg")
    t = jnp.float32(0.2)

    spc = p.get("steps_per_call", 1)
    if spc > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from rqvae_tpu.parallel import mesh as mesh_lib
        from rqvae_tpu.train.train_rqvae import make_device_chunk

        mesh = mesh_lib.make_mesh()
        corpus = jax.device_put(
            rng.randn(12101, d).astype(np.float32),
            mesh_lib.replicated(mesh),
        )
        chunk = jax.jit(
            make_device_chunk(
                cfg, opt, 1, jnp.bfloat16, bsz,
                NamedSharding(mesh, P(None, "data", None)), spc,
            ),
            donate_argnums=(0, 1),
        )
        for i in range(5):
            params, opt_state, metrics = chunk(
                params, opt_state, corpus, jax.random.fold_in(key, i), t
            )
        float(metrics["total_loss"])
        n_chunks = max(1, 800 // spc)
        t0 = time.perf_counter()
        for i in range(n_chunks):
            params, opt_state, metrics = chunk(
                params, opt_state, corpus, jax.random.fold_in(key, 100 + i), t
            )
        final = float(metrics["total_loss"])
        dt = time.perf_counter() - t0
        assert np.isfinite(final)
        return n_chunks * spc * bsz / dt

    x = jnp.asarray(rng.randn(1, bsz, d).astype(np.float32))
    step = jax.jit(
        make_train_step(cfg, opt, 1, jnp.bfloat16), donate_argnums=(0, 1)
    )
    for _ in range(20):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step(params, opt_state, x, sub, t)
    float(metrics["total_loss"])
    n_steps = 200
    t0 = time.perf_counter()
    for _ in range(n_steps):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step(params, opt_state, x, sub, t)
    final = float(metrics["total_loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(final)
    return n_steps * bsz / dt


def run_generate_profile(p) -> float:
    """Constrained beam-search serving throughput (queries/s)."""
    import jax
    import jax.numpy as jnp

    from rqvae_tpu.data.schemas import TokenizedSeqBatch
    from rqvae_tpu.models import generation, retrieval
    from rqvae_tpu.models.retrieval import RetrievalConfig
    from rqvae_tpu.tokenizer import semids

    n_hist, b, n_items = p["n_hist"], p["batch_size"], p["n_items"]
    cfg = RetrievalConfig(
        embedding_dim=128, attn_dim=512, dropout=0.3, num_heads=8, n_layers=8,
        num_embeddings=256, sem_id_dim=4, max_pos=n_hist * 4,
    )
    rng = np.random.RandomState(0)
    base = rng.randint(0, 256, (n_items, 3)).astype(np.int32)
    dedup = np.asarray(semids.dedup_column(jnp.asarray(base), 256))
    cached = np.concatenate([base, dedup[:, None]], axis=1).astype(np.int32)
    index = semids.build_index(jnp.asarray(cached), codebook_size=256)
    params = retrieval.init(jax.random.PRNGKey(0), cfg)
    n = n_hist * 4
    batch = TokenizedSeqBatch(
        user_ids=jnp.arange(b, dtype=jnp.int32),
        sem_ids=jnp.asarray(rng.randint(0, 256, (b, n)).astype(np.int32)),
        sem_ids_fut=None,
        seq_mask=jnp.ones((b, n), bool),
        token_type_ids=jnp.asarray(
            np.tile(np.arange(4, dtype=np.int32), (b, n_hist))
        ),
        token_type_ids_fut=None,
    )
    # n_candidates=256 == codebook size: the sampler covers every token, so
    # generation takes the exhaustive path — strictly MORE candidates than
    # the reference's 200-sample protocol (a superset), and faster: no
    # Gumbel noise, no candidate top-k, no per-sample logp gather.
    # Serving runs bf16 weights (logits are promoted to fp32 before the
    # softmax/score math inside generate_next_sem_ids).
    from rqvae_tpu.utils import amp
    params = amp.cast_floating(params, jnp.bfloat16)
    n_candidates = p.get("n_candidates", 256)
    gen = jax.jit(
        lambda pp, bt, r: generation.generate_next_sem_ids(
            pp, cfg, index, bt, r, k=32, n_candidates=n_candidates
        )
    )
    key = jax.random.key(1, impl="rbg")
    acc = jnp.zeros((), jnp.float32)
    for i in range(5):  # compile + ramp
        acc = acc + gen(params, batch, jax.random.fold_in(key, i)).log_probas.sum()
    float(acc)
    n_steps, acc = 20, jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for i in range(n_steps):
        out = gen(params, batch, jax.random.fold_in(key, 100 + i))
        acc = acc + out.log_probas.sum()
    final = float(acc)  # forced fetch serializes + completes
    dt = time.perf_counter() - t0
    assert np.isfinite(final)
    return n_steps * b / dt


def _crop_lengths(rng, count: int, n_hist: int) -> np.ndarray:
    """The reference's random-crop subsample applied to full stride-180
    windows (see the length_dist='crop' comment below) — the REAL ML-32M
    training length distribution (validated vs the artifacts: mean 67.2 vs
    67.7, matching quantiles)."""
    seqlen = n_hist + 1
    start = rng.randint(0, seqlen - 2, (count,))
    end = start + rng.randint(3, n_hist + 2, (count,))
    return np.minimum(end, seqlen) - start - 1


def run_packed_profile(p, cfg, index, rng) -> float:
    """Packed long-context training throughput: the train loop's real packed
    step (make_packed_step) over STEADY-STATE packer batches; examples/s
    counts the valid slots each batch packs (each slot is one flat-step
    example; tests/test_packing.py locks the equivalence).

    Steady state matters for the COUNT, not the shape: a one-shot pack from
    an oversized crop pool lets best-fit skim long crops (mean placed length
    ~97 vs the stream's 67.7 items), undercounting examples/step by ~1.4x.
    Running the real SequencePacker past its warmup gives batches whose mean
    placed length equals the stream mean — what a training run sustains.
    All batches share one static shape, so they reuse one jit program."""
    import jax
    import jax.numpy as jnp

    from rqvae_tpu.data import packing
    from rqvae_tpu.data.dataset import SeqDataset
    from rqvae_tpu.models import retrieval
    from rqvae_tpu.train import optim
    from rqvae_tpu.train.train_decoder import make_packed_step

    n_hist, rows, n_items = p["n_hist"], p["batch_size"], p["n_items"]
    slots = p["slots"]
    # a synthetic SeqDataset of full stride-180-style windows; the packer's
    # subsample path applies the reference's random crop to them, so the
    # placed-length distribution is the REAL training one
    n_users = 4096
    item_ids = rng.randint(0, n_items, (n_users, n_hist)).astype(np.int32)
    seqs = SeqDataset(
        user_ids=np.arange(n_users, dtype=np.int32),
        item_ids=item_ids,
        item_ids_fut=rng.randint(0, n_items, (n_users, 1)).astype(np.int32),
        max_seq_len=n_hist,
    )
    packer = packing.SequencePacker(
        seqs=seqs, rng=np.random.default_rng(0), rows=rows, slots=slots
    )
    for _ in range(3):  # buffer warmup past the long-crop skim
        packer.next_batch()
    n_cycle = 8
    batches = []
    for _ in range(n_cycle):
        b, n_ex = packer.next_batch()
        batches.append((jax.tree.map(jnp.asarray, b), n_ex))

    params = retrieval.init(jax.random.PRNGKey(0), cfg)
    opt = optim.adamw(3e-4, 0.035)
    opt_state = opt.init(params)
    step = jax.jit(
        make_packed_step(cfg, opt, index, jnp.bfloat16),
        donate_argnums=(0, 1),
    )
    key = jax.random.key(1, impl="rbg")
    for i in range(20):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step(
            params, opt_state, batches[i % n_cycle][0], sub
        )
    jax.block_until_ready(metrics["total_loss"])
    n_steps = 48
    n_examples = 0
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        batch, n_ex = batches[i % n_cycle]
        params, opt_state, metrics = step(params, opt_state, batch, sub)
        n_examples += n_ex
    final_loss = float(metrics["total_loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss), f"non-finite loss: {final_loss}"
    return n_examples / dt


def run_profile(name: str) -> float:
    import jax
    import jax.numpy as jnp

    from rqvae_tpu.data.schemas import SeqBatch
    from rqvae_tpu.models import retrieval
    from rqvae_tpu.models.retrieval import RetrievalConfig
    from rqvae_tpu.tokenizer import semids
    from rqvae_tpu.train import optim
    from rqvae_tpu.train.train_decoder import (
        bucket_slices,
        make_bucketed_fns,
        make_train_step,
    )

    p = PROFILES[name]
    if "_generate" in name:
        return run_generate_profile(p)
    if name.startswith("rqvae"):
        return run_rqvae_profile(p)
    n_hist, batch_size, n_items = p["n_hist"], p["batch_size"], p["n_items"]
    cfg = RetrievalConfig(
        embedding_dim=128, attn_dim=512, dropout=0.3, num_heads=8, n_layers=8,
        num_embeddings=256, sem_id_dim=4, max_pos=n_hist * 4,
    )
    rng = np.random.RandomState(0)

    # corpus index (deduped tuples, as after stage-1)
    base = rng.randint(0, 256, (n_items, 3)).astype(np.int32)
    dedup = np.asarray(semids.dedup_column(jnp.asarray(base), 256))
    cached = np.concatenate([base, dedup[:, None]], axis=1).astype(np.int32)
    index = semids.build_index(jnp.asarray(cached), codebook_size=256)

    params = retrieval.init(jax.random.PRNGKey(0), cfg)
    opt = optim.adamw(3e-4, 0.035)
    opt_state = opt.init(params)

    if p.get("packed"):
        return run_packed_profile(p, cfg, index, rng)

    ids = rng.randint(0, n_items, (batch_size, n_hist)).astype(np.int32)
    if p.get("length_dist") == "crop":
        # the reference's random-crop subsample (data/processed.py:139-147,
        # ours dataset._subsample_row) applied to a full n_hist-item window:
        # start ~ U[0, len-3], crop end ~ U[start+3, start+len+1], tail
        # truncated at the window end. At the ML-32M shape this simulation
        # matches the measured artifact distribution (mean 67.2 vs 67.7,
        # matching quantiles) — stride-180 windows are 92% full-length, so
        # sampled lengths are crop-dominated and skew SHORT.
        lengths = _crop_lengths(rng, batch_size, n_hist)
    else:
        lengths = rng.randint(3, n_hist + 1, (batch_size,))
    mask = np.arange(n_hist)[None, :] < lengths[:, None]
    ids = np.where(mask, ids, -1)
    ids_fut = rng.randint(0, n_items, (batch_size, 1)).astype(np.int32)
    key = jax.random.key(1, impl="rbg")  # the train loop's default PRNG

    if p.get("buckets", 1) > 1:
        # the train loop's length-bucketed path (exact same gradients as
        # the flat step, fewer padded tokens) — see train_decoder.py
        n_buckets = p["buckets"]
        grad_accum_fn, apply_fn = make_bucketed_fns(
            cfg, opt, index, jnp.bfloat16, 4
        )
        zeros_fn = jax.jit(lambda pp: jax.tree.map(jnp.zeros_like, pp))
        groups = []
        for rows, length in bucket_slices(mask.sum(axis=1), n_buckets):
            groups.append(SeqBatch(
                user_ids=jnp.asarray(rows.astype(np.int32)),
                ids=jnp.asarray(ids[rows, :length]),
                ids_fut=jnp.asarray(ids_fut[rows]),
                x=jnp.zeros((len(rows), 1)),
                x_fut=jnp.zeros((len(rows), 1)),
                seq_mask=jnp.asarray(ids[rows, :length] >= 0),
            ))
        w = jnp.float32(1.0 / n_buckets)

        def train_step(params, opt_state, _batch, sub):
            grads = zeros_fn(params)
            loss = jnp.float32(0.0)
            loss_d = jnp.zeros((4,), jnp.float32)
            for gi, bg in enumerate(groups):
                grads, loss, loss_d = grad_accum_fn(
                    params, grads, loss, loss_d, bg,
                    jax.random.fold_in(sub, gi), w,
                )
            params, opt_state = apply_fn(params, opt_state, grads)
            return params, opt_state, {"total_loss": loss}

        batch = None
    else:
        batch = SeqBatch(  # leading accum=1 axis for the scan-based step
            user_ids=jnp.asarray(np.arange(batch_size, dtype=np.int32)[None]),
            ids=jnp.asarray(ids[None]),
            ids_fut=jnp.asarray(ids_fut[None]),
            x=jnp.zeros((1, batch_size, 1)),
            x_fut=jnp.zeros((1, batch_size, 1)),
            seq_mask=jnp.asarray(mask[None]),
        )
        train_step = jax.jit(
            make_train_step(cfg, opt, index, 1, jnp.bfloat16, 4),
            donate_argnums=(0, 1),
        )

    for _ in range(20):  # compile + ramp past the fresh-process slow start
        key, sub = jax.random.split(key)
        params, opt_state, metrics = train_step(params, opt_state, batch, sub)
    jax.block_until_ready(metrics["total_loss"])

    n_steps = 50
    t0 = time.perf_counter()
    for _ in range(n_steps):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = train_step(params, opt_state, batch, sub)
    # chained state serializes the steps; the fetch forces completion
    final_loss = float(metrics["total_loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss), f"non-finite loss: {final_loss}"
    return n_steps * batch_size / dt


def metric_name(profile: str) -> str:
    """ONE derivation for both the computed and the recorded key (the
    round-2 advisor found a hand-written BENCH_BASELINE key desynced from
    the computed one and silently re-seeding the baseline)."""
    bs = PROFILES[profile]["batch_size"]
    if "_generate" in profile:
        return f"beam_search_queries_per_s_{profile}_bs{bs}"
    if profile.startswith("rqvae"):
        return f"{profile}_train_examples_per_s_bs{bs}"
    return f"decoder_train_examples_per_s_{profile}_bs{bs}"


def _bench_one(profile: str, baselines: dict, baseline_path: str) -> dict:
    value = run_profile(profile)
    metric = metric_name(profile)
    legacy_key = "decoder_train_examples_per_s"  # round-1 amazon number
    baseline = baselines.get(
        metric, baselines.get(legacy_key if profile == "amazon" else "")
    )
    if baseline is None:
        # first measurement of this profile becomes its ratchet baseline
        baseline = value
        baselines[metric] = value
        with open(baseline_path, "w") as f:
            json.dump(baselines, f, indent=1)
            f.write("\n")
    return {
        "metric": metric,
        "value": round(value, 2),
        "unit": "queries/s" if "_generate" in profile else "examples/s",
        "vs_baseline": round(value / baseline, 4),
    }


def _device_preflight(timeout_s: int = 180) -> bool:
    """Fail fast when the device is unreachable. A wedged axon terminal
    blocks ``jax.devices()`` forever (see docs/PERF.md on the remote-compile
    terminal); a subprocess probe with a timeout turns that into a clean
    nonzero exit instead of an indefinite hang of the caller's pipeline."""
    import subprocess
    import sys

    code = ("import jax, jax.numpy as jnp; x = jnp.ones((8, 8)); "
            "(x @ x).block_until_ready(); print('ok')")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--profile", default="amazon", choices=sorted(PROFILES))
    ap.add_argument("--all", action="store_true",
                    help="run EVERY profile; one JSON line each, plus a "
                         "machine-readable snapshot written to --out")
    ap.add_argument("--out", default="BENCH_full.json",
                    help="snapshot path for --all")
    ap.add_argument("--no-preflight", action="store_true",
                    help="skip the device-reachability probe")
    args = ap.parse_args()

    if not args.no_preflight and not _device_preflight():
        import sys

        print("bench: device preflight timed out (wedged/unreachable "
              "accelerator) — refusing to hang", file=sys.stderr)
        sys.exit(3)

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json"
    )
    baselines = {}
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baselines = json.load(f)
        if "metric" in baselines:  # legacy single-metric layout
            baselines = {baselines["metric"]: baselines["value"]}

    if args.all:
        records = []
        for profile in sorted(PROFILES):
            rec = _bench_one(profile, baselines, baseline_path)
            print(json.dumps(rec), flush=True)
            records.append(rec)
        with open(args.out, "w") as f:
            json.dump(records, f, indent=1)
            f.write("\n")
        return

    print(json.dumps(_bench_one(args.profile, baselines, baseline_path)))


if __name__ == "__main__":
    main()
