"""Stage-2 training: the generative-retrieval decoder.

Parity: reference train_decoder.py:28-276, re-architected TPU-first:

  * kwargs surface mirrors the reference train() (train_decoder.py:28-66),
    same defaults; the RQ-VAE handoff contract is identical — the config
    points at a stage-1 checkpoint, the tokenizer is frozen.
  * corpus semantic-IDs precomputed once up front (train_decoder.py:132) into
    a device-resident CorpusIndex; per-step tokenization is a cached-ID
    gather running INSIDE the jit step (the reference gathers on host).
  * AdamW + inverse-sqrt LR schedule, 10k warmup (train_decoder.py:151-160).
  * partial eval (loss) every partial_eval_every; full generative eval
    (constrained beam search + TopKAccumulator) every full_eval_every
    (train_decoder.py:208-245).
  * checkpoint/resume incl. optimizer and schedule step.

The reference asserts AMAZON-only (train_decoder.py:68-69); this framework
supports any dataset whose artifacts exist — the assert is not replicated.
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.data import registry
from rqvae_tpu.data.dataset import features_for_model, make_seq_batch
from rqvae_tpu.data.schemas import SeqBatch
from rqvae_tpu.evaluate.metrics import TopKAccumulator, batch_hit_counts
from rqvae_tpu.models import generation, retrieval
from rqvae_tpu.models import rqvae as rqvae_lib
from rqvae_tpu.models.quantize import QuantizeForwardMode
from rqvae_tpu.models.retrieval import RetrievalConfig
from rqvae_tpu.parallel import mesh as mesh_lib
from rqvae_tpu.tokenizer import semids
from rqvae_tpu.train import checkpoint as ckpt_lib
from rqvae_tpu.train import optim
from rqvae_tpu.utils import amp
from rqvae_tpu.utils import config as config_lib
from rqvae_tpu.utils import profiling
from rqvae_tpu.utils.logging import MetricsLogger


@dataclasses.dataclass(frozen=True)
class DecoderTrainConfig:
    # ---- reference train() kwargs (train_decoder.py:28-66) ----
    iterations: int = 500000
    batch_size: int = 64
    learning_rate: float = 0.001
    weight_decay: float = 0.01
    dataset_folder: str = "dataset/ml-1m"
    save_dir_root: str = "out/decoder/"
    dataset: registry.RecDataset = registry.RecDataset.ML_1M
    pretrained_rqvae_path: Optional[str] = None
    pretrained_decoder_path: Optional[str] = None
    split_batches: bool = True
    amp: bool = False
    force_dataset_process: bool = False
    mixed_precision_type: str = "bf16"
    gradient_accumulate_every: int = 1
    save_model_every: int = 1000000
    partial_eval_every: int = 1000
    full_eval_every: int = 10000
    vae_input_dim: int = 18
    vae_embed_dim: int = 16
    vae_hidden_dims: Tuple[int, ...] = (18, 18)
    vae_codebook_size: int = 32
    vae_codebook_normalize: bool = False
    vae_codebook_mode: QuantizeForwardMode = QuantizeForwardMode.GUMBEL_SOFTMAX
    vae_sim_vq: bool = False
    vae_n_cat_feats: int = 18
    vae_n_layers: int = 3
    decoder_embed_dim: int = 64
    dropout_p: float = 0.1
    attn_heads: int = 8
    attn_embed_dim: int = 64
    attn_layers: int = 4
    dataset_split: str = "beauty"
    train_data_subsample: bool = True
    # reference train_decoder.py:40-41,134-136: optionally publish the frozen
    # RQ-VAE to the HF hub after corpus precompute. The push is an exported
    # save_pretrained directory (models/io.py) uploaded via huggingface_hub;
    # it fails with a clear error on an airgapped pod.
    push_vae_to_hf: bool = False
    vae_hf_model_name: Optional[str] = None
    # ---- framework knobs ----
    # Length-bucketed gradient accumulation: sort each sampled batch by
    # history length, split into this many groups, pad each group only to
    # its own (grid-quantized) max, accumulate grads across groups, one
    # optimizer update. EXACTLY the same gradients as the flat step (same
    # samples, mean-of-means with equal group sizes). 1 = off. Single-
    # process only (group shapes are data-dependent; multi-host programs
    # must match). The win is a function of sequence length x length skew
    # x rows-per-bucket, all measured on one v5e at the REAL crop-length
    # distributions (docs/PERF.md length-bucketing section):
    #   * ML-32M 801-token shapes: 2.36x at bs 256 / 4 buckets
    #     (844.9 -> 1,996.6 ex/s), 1.96x at bs 64 / 2 buckets
    #     (916.9 -> 1,798.9) — ON by default in configs/decoder_ml32m.json.
    #   * Amazon 81-token shapes: SLOWER (4.5-5.6k vs 10.1k ex/s at bs 256)
    #     — short sequences leave too little padding to recover and 64-128-
    #     row groups underfill the chip; left off in the Amazon configs.
    # Rule of thumb: bucket long-sequence configs, keep >=32 rows per
    # bucket; bench.py ml32m vs ml32m_bucketed is the ready-made A/B.
    length_buckets: int = 1
    # Packed long-context training (data/packing.py): several sampled crops
    # share one fixed-shape row, attention is segment-local via per-query
    # key spans (ops/attention.span_mask + the flash span kernel). Compared
    # to length_buckets this removes ALL padding (not just cross-bucket),
    # runs ONE static jit program per step, and — because every shape is
    # static — shards over a multi-host mesh exactly like the flat step
    # (bucketing is single-process only). Per-slot semantics are exactly
    # the flat step's (tests/test_packing.py); the examples per step float
    # around packed_rows * max_seq_len / mean_crop_len instead of being
    # fixed at batch_size. packed_rows = GLOBAL rows per step (0 = off);
    # pack_slots = max segments per row.
    packed_rows: int = 0
    pack_slots: int = 8
    seed: int = 42
    prng_impl: str = "rbg"               # see train_rqvae.RqVaeTrainConfig
    log_every: int = 100
    metrics_sink: str = "jsonl"          # see train_rqvae.RqVaeTrainConfig
    tensorboard_dir: Optional[str] = None
    warmup_steps: int = 10000            # reference train_decoder.py:159
    eval_batches: int = 32
    generation_top_k: int = 32           # reference model.py:161
    generation_candidates: int = 200     # reference model.py:162
    generation_temperature: float = 1.0
    mesh_shape: Optional[Tuple[int, ...]] = None
    tensor_parallel: bool = False        # shard tables/FFN over 'model'
    synthetic_n_items: int = 2048
    synthetic_n_users: int = 2048
    data_path: Optional[str] = None
    profile_dir: Optional[str] = None    # capture a jax.profiler trace
    profile_start: int = 10
    profile_steps: int = 5
    auto_resume: bool = True             # resume from save_dir_root's latest
    # (resume-extends semantics: `iterations` counts from the resume point,
    # matching reference train_decoder.py:169-180 — see train_rqvae's note)
    debug_nans: bool = False             # jax_debug_nans for triage runs

    def vae_config(self) -> rqvae_lib.RqVaeConfig:
        return rqvae_lib.RqVaeConfig(
            input_dim=self.vae_input_dim,
            embed_dim=self.vae_embed_dim,
            hidden_dims=self.vae_hidden_dims,
            codebook_size=self.vae_codebook_size,
            n_layers=self.vae_n_layers,
            n_cat_feats=self.vae_n_cat_feats,
            codebook_mode=self.vae_codebook_mode,
            codebook_normalize=self.vae_codebook_normalize,
            codebook_sim_vq=self.vae_sim_vq,
            codebook_kmeans_init=False,
        )

    def retrieval_config(self, max_seq_len: int) -> RetrievalConfig:
        sem_dim = self.vae_n_layers + 1
        return RetrievalConfig(
            embedding_dim=self.decoder_embed_dim,
            attn_dim=self.attn_embed_dim,
            dropout=self.dropout_p,
            num_heads=self.attn_heads,
            n_layers=self.attn_layers,
            num_embeddings=self.vae_codebook_size,
            sem_id_dim=sem_dim,
            max_pos=max_seq_len * sem_dim,
        )



def _every(it: int, interval: int) -> bool:
    """True on steps where a periodic action (log/eval/save) fires.

    interval <= 0 disables the action entirely (the reference's gin configs
    always use positive intervals; 0 is this framework's explicit "off",
    e.g. partial_eval_every=0 on a run that only wants full beam evals).
    """
    return interval > 0 and (it + 1) % interval == 0

def debug_metrics(seq_mask: np.ndarray, prefix: str, token_scale: int = 1) -> dict:
    """Sequence-length quantiles (reference modules/utils.py:65-78; the
    reference measures token-space lengths — item lengths x sem_id_dim —
    so pass token_scale=sem_id_dim when the mask is item-space. Per-position
    losses are logged separately as loss_{d})."""
    lengths = (
        np.asarray(seq_mask).sum(axis=-1).astype(np.float32).ravel()
        * token_scale
    )
    return _length_quantiles(lengths, prefix)


def _length_quantiles(lengths: np.ndarray, prefix: str) -> dict:
    return {
        f"{prefix}_seq_length_p{q}": float(np.quantile(lengths, q))
        for q in (0.25, 0.5, 0.75, 0.9, 1)
    }


def make_packed_step(model_cfg, opt, index, compute_dtype):
    """Train step over a packed batch (data/packing.PackedSeqBatch): in-jit
    tokenization, segment-local forward, one optimizer update. Same loss
    estimator as the flat step over the examples the packer placed."""

    def packed_loss(params, packed, rng):
        p = amp.cast_floating(params, compute_dtype)
        tok = semids.tokenize_packed(index, packed)
        out = retrieval.forward_packed(
            p, model_cfg, tok, training=True, rng=rng
        )
        return out.loss, out.loss_d

    def step(params, opt_state, packed, rng):
        (loss, loss_d), grads = jax.value_and_grad(
            packed_loss, has_aux=True
        )(params, packed, rng)
        params, opt_state = _apply_updates(opt, params, opt_state, grads)
        return params, opt_state, {"total_loss": loss, "loss_d": loss_d}

    return step


def load_frozen_rqvae(cfg: DecoderTrainConfig):
    """Stage-1 -> stage-2 handoff (reference semids.py:42-58)."""
    vae_cfg = cfg.vae_config()
    params = rqvae_lib.init(jax.random.PRNGKey(0), vae_cfg)
    if cfg.pretrained_rqvae_path is not None:
        state, meta = ckpt_lib.restore(
            cfg.pretrained_rqvae_path,
            target=jax.device_get({"params": params}),
            partial=True,
        )
        params = state["params"]
        print(f"---Loaded RQVAE Iter {meta['step']}---", file=sys.stderr)
    return jax.tree.map(jax.lax.stop_gradient, params), vae_cfg


def _make_microbatch_loss(model_cfg, index, compute_dtype):
    """The ONE training loss: shared by the flat step, the length-bucketed
    accumulator, and bench.py — so the paths cannot silently diverge."""

    def microbatch_loss(params, batch: SeqBatch, rng):
        # bf16 compute / fp32 master params when amp is on (utils/amp.py)
        p = amp.cast_floating(params, compute_dtype)
        tok = semids.tokenize_sequences(index, batch)
        out = retrieval.forward(p, model_cfg, tok, training=True, rng=rng)
        return out.loss, out.loss_d

    return microbatch_loss


def _apply_updates(opt, params, opt_state, grads):
    updates, opt_state = opt.update(grads, opt_state, params)
    params = jax.tree.map(lambda p, u: p + u.astype(p.dtype), params, updates)
    return params, opt_state


def make_bucketed_fns(model_cfg, opt, index, compute_dtype, sem_dim):
    """(grad_accum, apply) pair for length-bucketed training.

    ``grad_accum`` is jit-cached per group shape (the length-bucket grid
    bounds the program count); ``apply`` is the single optimizer update.
    """
    microbatch_loss = _make_microbatch_loss(model_cfg, index, compute_dtype)

    def grad_accum(params, grads_acc, loss_acc, loss_d_acc, batch, rng, w):
        (loss, loss_d), grads = jax.value_and_grad(
            microbatch_loss, has_aux=True
        )(params, batch, rng)
        return (
            jax.tree.map(lambda a, g: a + w * g, grads_acc, grads),
            loss_acc + w * loss,
            loss_d_acc + w * loss_d,
        )

    def apply(params, opt_state, grads):
        return _apply_updates(opt, params, opt_state, grads)

    return (
        jax.jit(grad_accum, donate_argnums=(1, 2, 3)),
        jax.jit(apply, donate_argnums=(0, 1, 2)),
    )


def bucket_slices(lengths: np.ndarray, n_buckets: int, grid: int = 4):
    """Sort rows by length desc, split into equal groups, quantize each
    group's pad length to the grid (bounds the jit program count)."""
    order = np.argsort(-lengths, kind="stable")
    groups = np.split(order, n_buckets)
    out = []
    for rows in groups:
        lmax = max(1, int(lengths[rows].max()))
        out.append((rows, int(np.ceil(lmax / grid) * grid)))
    return out


def make_train_step(model_cfg, opt, index, accum, compute_dtype, sem_dim):
    microbatch_loss = _make_microbatch_loss(model_cfg, index, compute_dtype)

    def step(params, opt_state, batch, rng):
        if accum == 1:
            # no accumulation: skip the scan and the zeros+add round-trip
            # over the whole gradient tree
            one = jax.tree.map(lambda x: x[0], batch)
            (loss, loss_d), grads = jax.value_and_grad(
                microbatch_loss, has_aux=True
            )(params, one, rng)
        else:
            rngs = jax.random.split(rng, accum)

            def scan_body(carry, inp):
                grads_acc, loss_acc, loss_d_acc = carry
                b, r = inp
                (loss, loss_d), grads = jax.value_and_grad(
                    microbatch_loss, has_aux=True
                )(params, b, r)
                return (
                    jax.tree.map(jnp.add, grads_acc, grads),
                    loss_acc + loss,
                    loss_d_acc + loss_d,
                ), None

            zeros = jax.tree.map(jnp.zeros_like, params)
            init = (zeros, jnp.float32(0.0), jnp.zeros((sem_dim,), jnp.float32))
            (grads, loss, loss_d), _ = jax.lax.scan(
                scan_body, init, (batch, rngs)
            )
            grads = jax.tree.map(lambda g: g / accum, grads)
        params, opt_state = _apply_updates(opt, params, opt_state, grads)
        return params, opt_state, {
            "total_loss": loss / accum,
            "loss_d": loss_d / accum,
        }

    return step


def make_generative_eval_fns(model_cfg, index, cfg: DecoderTrainConfig, ks):
    """(generate_fn, hit_counts_fn) — the jitted pair driving full eval.
    Created once and reused so repeated evals don't retrace."""

    @jax.jit
    def generate_fn(p, batch, r):
        tok = semids.tokenize_sequences(index, batch)
        gen = generation.generate_next_sem_ids(
            p, model_cfg, index, tok._replace(
                sem_ids_fut=None, token_type_ids_fut=None
            ), r,
            k=cfg.generation_top_k,
            n_candidates=cfg.generation_candidates,
            temperature=cfg.generation_temperature,
        )
        return gen, tok.sem_ids_fut

    @jax.jit
    def hit_counts_fn(actual, top_k, valid):
        counts = batch_hit_counts(actual, top_k, ks, valid=valid)
        return counts, jnp.sum(valid)

    return generate_fn, hit_counts_fn


def run_generative_eval(
    params, model_cfg, index, seqs, items, cfg: DecoderTrainConfig,
    device_mesh, rng, *, n_eval: int, eval_fns=None,
) -> dict:
    """Full constrained-beam-search eval over the first n_eval rows of
    ``seqs`` (reference train_decoder.py:223-245 protocol): batches padded to
    a fixed shape (the beam program is shape-specialized), padding rows
    masked out of the counts under jit, metrics reduced host-side."""
    local_bs = mesh_lib.process_local_batch_size(cfg.batch_size)
    metrics_acc = TopKAccumulator(ks=(1, 5, 10))
    generate_fn, hit_counts_fn = eval_fns or make_generative_eval_fns(
        model_cfg, index, cfg, metrics_acc.ks
    )
    n_eval = min(n_eval, len(seqs))
    for lo in range(0, n_eval, cfg.batch_size):
        global_idx = np.arange(lo, lo + cfg.batch_size)
        valid = global_idx < min(lo + cfg.batch_size, n_eval)
        global_idx = np.minimum(global_idx, n_eval - 1)
        idx = mesh_lib.host_block(global_idx, local_bs)
        b = make_seq_batch(seqs.batch_at(idx), items.x, with_features=False)
        b_dev = mesh_lib.shard_batch(b, device_mesh, axis=0)
        valid_dev = mesh_lib.shard_batch(
            mesh_lib.host_block(valid, local_bs), device_mesh, axis=0
        )
        rng, gen_key = jax.random.split(rng)
        gen, actual = generate_fn(params, b_dev, gen_key)
        counts, n_rows = hit_counts_fn(actual, gen.sem_ids, valid_dev)
        metrics_acc.accumulate_counts(jax.device_get(counts), int(n_rows))
    return metrics_acc.reduce()


def train(cfg: DecoderTrainConfig, *, logger: Optional[MetricsLogger] = None):
    logger = logger or MetricsLogger(
        every=cfg.log_every, sink=cfg.metrics_sink,
        tensorboard_dir=cfg.tensorboard_dir,
    )
    # must precede the first JAX computation (corpus tokenization below) or
    # multi-host init becomes impossible — see mesh.maybe_init_distributed
    mesh_lib.maybe_init_distributed()
    compute_dtype = jnp.bfloat16 if cfg.amp else jnp.float32
    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)

    bundle = registry.load(
        cfg.dataset,
        cfg.data_path or cfg.dataset_folder,
        split=cfg.dataset_split if cfg.dataset == registry.RecDataset.AMAZON else None,
        synthetic_kwargs={
            "n_items": cfg.synthetic_n_items,
            "feature_dim": cfg.vae_input_dim,
            "n_users": cfg.synthetic_n_users,
            "seed": cfg.seed,
        },
    )
    model_cfg = cfg.retrieval_config(bundle.max_seq_len)
    sem_dim = model_cfg.sem_id_dim

    vae_params, vae_cfg = load_frozen_rqvae(cfg)
    index = semids.precompute_corpus_ids(
        vae_params, vae_cfg,
        jnp.asarray(features_for_model(bundle.items.x, vae_cfg.input_dim)),
    )
    if cfg.push_vae_to_hf and jax.process_index() == 0:
        from rqvae_tpu.models import io as model_io

        export_dir = os.path.join(cfg.save_dir_root, "rqvae_export")
        model_io.save_pretrained(export_dir, vae_params, vae_cfg)
        url = model_io.push_to_hub(
            export_dir, cfg.vae_hf_model_name or "rqvae-tpu-tokenizer"
        )
        print(f"pushed frozen RQ-VAE to {url}")
    max_dup = semids.max_duplicates(index)
    if max_dup >= cfg.vae_codebook_size:
        print(
            f"WARNING: max dedup rank {max_dup} >= codebook size "
            f"{cfg.vae_codebook_size}; the dedup dimension overflows the "
            "sem-ID embedding range — train the RQ-VAE further.",
            file=sys.stderr,
        )

    local_bs = mesh_lib.process_local_batch_size(cfg.batch_size)
    device_mesh = mesh_lib.make_mesh(cfg.mesh_shape)
    rng = jax.random.key(cfg.seed, impl=cfg.prng_impl)
    rng, init_key = jax.random.split(rng)
    params = retrieval.init(init_key, model_cfg)

    schedule = optim.inv_sqrt_schedule(cfg.learning_rate, cfg.warmup_steps)
    opt = optim.adamw(schedule, cfg.weight_decay)
    opt_state = opt.init(params)
    start_iter = 0
    resume_path = cfg.pretrained_decoder_path
    if resume_path is None and cfg.auto_resume and (
        ckpt_lib.latest_step(cfg.save_dir_root) is not None
    ):
        resume_path = cfg.save_dir_root
    if resume_path is not None:
        state, meta = ckpt_lib.restore(
            resume_path,
            target=jax.device_get({"params": params, "opt_state": opt_state}),
        )
        params, opt_state = state["params"], state["opt_state"]
        start_iter = meta["step"] + 1

    shardings = (
        mesh_lib.tp_param_shardings(params, device_mesh)
        if cfg.tensor_parallel
        else mesh_lib.dp_param_shardings(params, device_mesh)
    )
    params = jax.device_put(params, shardings)
    opt_state = jax.device_put(
        opt_state,
        mesh_lib.opt_state_shardings(opt_state, params, shardings, device_mesh),
    )
    index = mesh_lib.replicate_host_array(index, device_mesh)

    accum = max(1, cfg.gradient_accumulate_every)
    use_buckets = (
        cfg.length_buckets > 1
        and accum == 1
        and jax.process_count() == 1
        and local_bs % cfg.length_buckets == 0
    )
    if cfg.length_buckets > 1 and not use_buckets:
        print(
            f"WARNING: length_buckets={cfg.length_buckets} ignored "
            "(requires gradient_accumulate_every=1, a single process, and "
            f"batch size divisible by it; local_bs={local_bs}, "
            f"accum={accum}, processes={jax.process_count()}) — training "
            "takes the flat step.",
            file=sys.stderr,
        )
    if use_buckets:
        grad_accum_fn, apply_fn = make_bucketed_fns(
            model_cfg, opt, index, compute_dtype, sem_dim
        )
        zeros_fn = jax.jit(lambda p: jax.tree.map(jnp.zeros_like, p))
    use_packing = (
        cfg.packed_rows > 0 and accum == 1 and not use_buckets
    )
    if cfg.packed_rows > 0 and not use_packing:
        print(
            f"WARNING: packed_rows={cfg.packed_rows} ignored (requires "
            f"gradient_accumulate_every=1 and length_buckets=1; accum="
            f"{accum}, length_buckets={cfg.length_buckets}) — training "
            "takes the flat step.",
            file=sys.stderr,
        )
    if use_packing:
        packed_step_fn = jax.jit(
            make_packed_step(model_cfg, opt, index, compute_dtype),
            donate_argnums=(0, 1),
        )
    step_fn = jax.jit(
        make_train_step(model_cfg, opt, index, accum, compute_dtype, sem_dim),
        donate_argnums=(0, 1),
    )

    @jax.jit
    def eval_loss_fn(p, batch):
        tok = semids.tokenize_sequences(index, batch)
        out = retrieval.forward(p, model_cfg, tok, training=False)
        return out.loss, out.loss_d

    eval_fns = make_generative_eval_fns(model_cfg, index, cfg, (1, 5, 10))

    def sample_device_batch(host_rng):
        """(sharded global SeqBatch, host-side seq mask for logging)."""
        bs = [
            make_seq_batch(
                bundle.train_seqs.sample_batch(
                    host_rng, local_bs, subsample=cfg.train_data_subsample
                ),
                bundle.items.x,
                with_features=False,
            )
            for _ in range(accum)
        ]
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *bs)
        return (
            mesh_lib.shard_batch(stacked, device_mesh, axis=1),
            stacked.seq_mask,
        )

    # per-process stream: each host samples ITS slice of the global batch
    host_rng = np.random.default_rng(cfg.seed + jax.process_index())
    if use_packing:
        from rqvae_tpu.data import packing as packing_lib

        packer = packing_lib.SequencePacker(
            seqs=bundle.train_seqs,
            rng=host_rng,
            rows=mesh_lib.process_local_batch_size(cfg.packed_rows),
            slots=cfg.pack_slots,
            subsample=cfg.train_data_subsample,
        )
    profiler = profiling.StepProfiler(
        cfg.profile_dir, cfg.profile_start, cfg.profile_steps
    )
    t_start = time.monotonic()
    examples_seen = 0

    for it in range(start_iter, start_iter + cfg.iterations):
        profiler.step(it - start_iter)
        train_len_metrics = None
        if use_packing:
            raw, n_ex = packer.next_batch()
            train_len_metrics = _length_quantiles(
                (raw.slot_len[raw.slot_valid] * sem_dim).astype(np.float32),
                "train",
            )
            batch = mesh_lib.shard_batch(raw, device_mesh, axis=0)
            rng, step_key = jax.random.split(rng)
            params, opt_state, metrics = packed_step_fn(
                params, opt_state, batch, step_key
            )
            # each host packs its own rows; counts differ only by packer
            # fill noise, so local x process_count is the global estimate
            # (exact on a single process)
            examples_seen += n_ex * jax.process_count()
        elif use_buckets:
            raw = bundle.train_seqs.sample_batch(
                host_rng, local_bs, subsample=cfg.train_data_subsample
            )
            log_mask = raw["ids"] >= 0
            grads = zeros_fn(params)
            loss_acc = jnp.float32(0.0)
            loss_d_acc = jnp.zeros((sem_dim,), jnp.float32)
            w = jnp.float32(1.0 / cfg.length_buckets)
            for rows, length in bucket_slices(
                log_mask.sum(axis=1), cfg.length_buckets
            ):
                sub = {
                    "user_ids": raw["user_ids"][rows],
                    "ids": raw["ids"][rows, :length],
                    "ids_fut": raw["ids_fut"][rows],
                }
                bg = make_seq_batch(sub, bundle.items.x, with_features=False)
                bg = mesh_lib.shard_batch(bg, device_mesh, axis=0)
                rng, group_key = jax.random.split(rng)
                grads, loss_acc, loss_d_acc = grad_accum_fn(
                    params, grads, loss_acc, loss_d_acc, bg, group_key, w
                )
            params, opt_state = apply_fn(params, opt_state, grads)
            metrics = {"total_loss": loss_acc, "loss_d": loss_d_acc}
        else:
            # keep the length mask host-side: the sharded global batch spans
            # non-addressable devices in multi-host runs, so it cannot be
            # device_get for the logging quantiles
            batch, log_mask = sample_device_batch(host_rng)
            rng, step_key = jax.random.split(rng)
            params, opt_state, metrics = step_fn(
                params, opt_state, batch, step_key
            )
        if not use_packing:
            examples_seen += accum * cfg.batch_size

        if _every(it, cfg.log_every) or it == start_iter:
            m = jax.device_get(metrics)
            loss_d = m.pop("loss_d")
            m.update({f"loss_{d}": loss_d[d] for d in range(sem_dim)})
            m["learning_rate"] = float(schedule(it + 1))
            m["examples_per_s"] = examples_seen / (time.monotonic() - t_start)
            m.update(
                train_len_metrics
                if train_len_metrics is not None
                else debug_metrics(np.asarray(log_mask), "train", sem_dim)
            )
            logger.log(it + 1, m, force=True)

        last = it + 1 == start_iter + cfg.iterations
        # eval mirrors training's distribution: every global eval batch is
        # assembled from per-host contiguous blocks and sharded over 'data',
        # so losses/hit counts come back as replicated scalars identical on
        # all hosts — multi-host eval needs no separate reduction path.
        n_eval_rows = len(bundle.eval_seqs) if bundle.eval_seqs is not None else 0
        if n_eval_rows and (_every(it, cfg.partial_eval_every) or last):
            losses = []
            eval_mask = None
            n_batches = min(cfg.eval_batches,
                            max(1, n_eval_rows // cfg.batch_size))
            for eb in range(n_batches):
                lo = eb * cfg.batch_size
                # wrap small eval sets MODULO the set instead of shipping a
                # one-off tail shape through the jit program — repeats rows
                # near-uniformly, so the mean stays unbiased (repeating only
                # the last row would weight one example at ~the whole batch)
                global_idx = np.arange(lo, lo + cfg.batch_size) % n_eval_rows
                idx = mesh_lib.host_block(global_idx, local_bs)
                b = make_seq_batch(bundle.eval_seqs.batch_at(idx), bundle.items.x,
                                   with_features=False)
                l, _ = eval_loss_fn(
                    params, mesh_lib.shard_batch(b, device_mesh, axis=0)
                )
                losses.append(float(l))
                eval_mask = b.seq_mask
            logger.log(
                it + 1,
                {"eval_loss": float(np.mean(losses)),
                 **debug_metrics(eval_mask, "eval", sem_dim)},
                force=True,
            )

        if n_eval_rows and (_every(it, cfg.full_eval_every) or last):
            rng, eval_key = jax.random.split(rng)
            logger.log(
                it + 1,
                run_generative_eval(
                    params, model_cfg, index, bundle.eval_seqs, bundle.items,
                    cfg, device_mesh, eval_key,
                    n_eval=min(cfg.eval_batches * cfg.batch_size, n_eval_rows),
                    eval_fns=eval_fns,
                ),
                force=True,
            )

        # every process calls save (orbax synchronizes; process 0 writes —
        # see checkpoint.save)
        if _every(it, cfg.save_model_every) or last:
            ckpt_lib.save(
                cfg.save_dir_root,
                it,
                {"params": params, "opt_state": opt_state},
                meta={"config": config_lib.config_to_dict(cfg)},
            )

    profiler.close()
    return params


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    path = argv[0] if argv and "=" not in argv[0] else None
    overrides = argv[1:] if path else argv
    cfg = config_lib.load_config(DecoderTrainConfig, path, overrides)
    train(cfg)


if __name__ == "__main__":
    main()
