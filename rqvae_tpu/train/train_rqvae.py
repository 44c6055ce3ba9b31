"""Stage-1 training: the RQ-VAE tokenizer.

Parity: reference train_rqvae.py:24-255, re-architected as ONE jit-compiled
update step over a device mesh:

  * kwargs surface: every reference train() parameter has a config field
    (RqVaeTrainConfig), same defaults (train_rqvae.py:24-55).
  * iter-0 kmeans priming on a <=20k-item batch (train_rqvae.py:139-141),
    per-level sequential (see models/rqvae.kmeans_prime).
  * gumbel temperature hardcoded t=0.2 (train_rqvae.py:138 — the reference's
    TemperatureScheduler exists but is unused; we expose the constant).
  * gradient accumulation via lax.scan inside the step (reference loops
    microbatches on host, train_rqvae.py:144-151).
  * eval-split losses + ID-diversity metrics every eval_every: corpus
    re-tokenization, rqvae_entropy, codebook_usage_{i}, max_id_duplicates
    (train_rqvae.py:223-239) — these gate downstream recall, all kept.
  * checkpoints {params, opt_state} + meta{step, config}; resume restores
    optimizer state and step (train_rqvae.py:108-113).
  * NO per-step host syncs: the reference calls .cpu().item() on three
    losses every iteration (train_rqvae.py:155-157); here metrics come back
    once per log_every through a single device_get.

Data parallelism: the global batch is sharded over the mesh 'data' axis;
XLA inserts the grad psum (the reference needed Accelerate/DDP/NCCL).
"""
from __future__ import annotations

import dataclasses
import sys
import time
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.data import dataset as dataset_lib
from rqvae_tpu.data import registry
from rqvae_tpu.models import rqvae as rqvae_lib
from rqvae_tpu.models.quantize import QuantizeForwardMode
from rqvae_tpu.parallel import mesh as mesh_lib
from rqvae_tpu.tokenizer import semids
from rqvae_tpu.train import checkpoint as ckpt_lib
from rqvae_tpu.train import optim
from rqvae_tpu.train import temperature
from rqvae_tpu.utils import amp
from rqvae_tpu.utils import config as config_lib
from rqvae_tpu.utils import profiling
from rqvae_tpu.utils.logging import MetricsLogger


@dataclasses.dataclass(frozen=True)
class RqVaeTrainConfig:
    # ---- reference train() kwargs (train_rqvae.py:24-55) ----
    iterations: int = 50000
    batch_size: int = 64
    learning_rate: float = 0.0001
    weight_decay: float = 0.01
    dataset_folder: str = "dataset/ml-1m"
    dataset: registry.RecDataset = registry.RecDataset.ML_1M
    pretrained_rqvae_path: Optional[str] = None
    save_dir_root: str = "out/rqvae/"
    use_kmeans_init: bool = True
    split_batches: bool = True          # parity flag; batch_size is global
    amp: bool = False                    # bf16 compute when True
    do_eval: bool = True
    force_dataset_process: bool = False
    mixed_precision_type: str = "bf16"   # reference default fp16; TPU -> bf16
    gradient_accumulate_every: int = 1
    save_model_every: int = 1000000
    eval_every: int = 50000
    commitment_weight: float = 0.25
    vae_n_cat_feats: int = 18
    vae_input_dim: int = 18
    vae_embed_dim: int = 16
    vae_hidden_dims: Tuple[int, ...] = (18, 18)
    vae_codebook_size: int = 32
    vae_codebook_normalize: bool = False
    vae_codebook_mode: QuantizeForwardMode = QuantizeForwardMode.GUMBEL_SOFTMAX
    vae_sim_vq: bool = False
    vae_n_layers: int = 3
    dataset_split: str = "beauty"
    data_path: Optional[str] = None
    # ---- framework knobs ----
    seed: int = 42
    # 'rbg' is ~30% faster per step on TPU than jax's default threefry (the
    # dropout/gumbel mask generation is a measured 11ms of a 36ms decoder
    # step at bs=256); 'threefry2x32' restores cross-backend reproducibility.
    prng_impl: str = "rbg"
    log_every: int = 100
    # "jsonl" (default) or "tensorboard" (adds a TB event stream; JSONL stays
    # on — the reference's opt-in swanlab analog, train_rqvae.py:102-106)
    metrics_sink: str = "jsonl"
    tensorboard_dir: Optional[str] = None
    gumbel_temperature: float = 0.2      # reference hardcodes t=0.2
    # opt-in exponential anneal (reference TemperatureScheduler, unused there)
    gumbel_anneal: bool = False
    gumbel_min_t: float = 0.05
    gumbel_anneal_rate: float = 1e-5
    gumbel_anneal_step_size: int = 1000
    kmeans_prime_items: int = 20000
    eval_batches: int = 50
    # Device-resident data loop: keep the whole item corpus in HBM, sample
    # batch indices ON DEVICE, and run this many optimizer steps per host
    # dispatch (lax.scan). Removes ALL per-step host work — the stage-1
    # model is tiny (~5 ms/step is mostly Python dispatch on a busy host;
    # the corpus is 12k-84k x 768 floats = 37-258 MB, trivially HBM-resident).
    # 1 = the classic host-fed loop (host numpy sampling, one step/dispatch).
    steps_per_call: int = 8
    mesh_shape: Optional[Tuple[int, ...]] = None
    # shard codebooks + enc/dec MLPs over the mesh 'model' axis
    # (mesh.rqvae_tp_param_shardings); requires mesh_shape with model > 1
    tensor_parallel: bool = False
    synthetic_n_items: int = 2048
    synthetic_n_users: int = 2048
    profile_dir: Optional[str] = None    # capture a jax.profiler trace
    profile_start: int = 10
    profile_steps: int = 5
    # failure recovery: resume from the latest checkpoint under
    # save_dir_root when no explicit pretrained path is given (the reference
    # required hand-editing pretrained_rqvae_path after a crash).
    # NOTE on semantics (parity with reference train_rqvae.py:135,
    # train_decoder.py:169-180): `iterations` counts steps FROM THE RESUME
    # POINT — rerunning a completed run trains `iterations` MORE steps; it
    # does not no-op at the configured total. Point save_dir_root at a
    # fresh directory (or set auto_resume=false) for a from-scratch run.
    auto_resume: bool = True
    debug_nans: bool = False             # jax_debug_nans for triage runs

    def model_config(self) -> rqvae_lib.RqVaeConfig:
        return rqvae_lib.RqVaeConfig(
            input_dim=self.vae_input_dim,
            embed_dim=self.vae_embed_dim,
            hidden_dims=self.vae_hidden_dims,
            codebook_size=self.vae_codebook_size,
            n_layers=self.vae_n_layers,
            n_cat_feats=self.vae_n_cat_feats,
            commitment_weight=self.commitment_weight,
            codebook_mode=self.vae_codebook_mode,
            codebook_normalize=self.vae_codebook_normalize,
            codebook_sim_vq=self.vae_sim_vq,
            codebook_kmeans_init=self.use_kmeans_init
            and self.pretrained_rqvae_path is None,
        )



def _every(it: int, interval: int) -> bool:
    """True on steps where a periodic action (log/eval/save) fires.

    interval <= 0 disables the action entirely (the reference's gin configs
    always use positive intervals; 0 is this framework's explicit "off",
    e.g. partial_eval_every=0 on a run that only wants full beam evals).
    """
    return interval > 0 and (it + 1) % interval == 0

def make_train_step(model_cfg, opt, accum, compute_dtype):
    """One jit step: (params, opt_state, x(accum, B, D), rng, gumbel_t) ->
    updated. gumbel_t is a traced scalar so an annealing schedule never
    recompiles the step."""

    def microbatch_loss(params, x, rng, gumbel_t):
        # bf16 compute / fp32 master params when amp is on (utils/amp.py)
        p = amp.cast_floating(params, compute_dtype)
        x = x.astype(compute_dtype)
        out = rqvae_lib.forward(
            p, model_cfg, x, gumbel_t=gumbel_t, training=True, rng=rng
        )
        return out.loss, out

    def step(params, opt_state, x, rng, gumbel_t):
        if accum == 1:
            # no accumulation: skip the scan and the zeros+add round-trip
            (loss, out), grads = jax.value_and_grad(
                microbatch_loss, has_aux=True
            )(params, x[0], rng, gumbel_t)
            recon, vq, pu = (
                out.reconstruction_loss, out.rqvae_loss, out.p_unique_ids
            )
            embs_norm = out.embs_norm[None]
        else:
            rngs = jax.random.split(rng, accum)

            def scan_body(carry, inp):
                grads_acc, loss_acc, recon_acc, vq_acc, pu_acc = carry
                xb, r = inp
                (loss, out), grads = jax.value_and_grad(
                    microbatch_loss, has_aux=True
                )(params, xb, r, gumbel_t)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                return (
                    grads_acc,
                    loss_acc + loss,
                    recon_acc + out.reconstruction_loss,
                    vq_acc + out.rqvae_loss,
                    pu_acc + out.p_unique_ids,
                ), out.embs_norm

            zeros = jax.tree.map(jnp.zeros_like, params)
            init = (zeros, 0.0, 0.0, 0.0, 0.0)
            (grads, loss, recon, vq, pu), embs_norm = jax.lax.scan(
                scan_body, init, (x, rngs)
            )
            grads = jax.tree.map(lambda g: g / accum, grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree.map(
            lambda p, u: p + u.astype(p.dtype), params, updates
        )
        metrics = {
            "total_loss": loss / accum,
            "reconstruction_loss": recon / accum,
            "rqvae_loss": vq / accum,
            "p_unique_ids": pu / accum,
            "embs_norm_mean": jnp.mean(embs_norm, axis=(0, 1)),  # (L,)
        }
        return params, opt_state, metrics

    return step


def make_device_chunk(model_cfg, opt, accum, compute_dtype, batch_size,
                      data_sharding, n_steps):
    """n_steps optimizer steps per host dispatch: batch indices sampled ON
    DEVICE from the HBM-resident corpus, lax.scan over steps. The stage-1
    model is so small that the classic loop is host-dispatch-bound (~5 ms of
    per-step Python on a busy host vs <1 ms of device compute); this path
    removes all per-step host work. Metrics are chunk means."""
    base = make_train_step(model_cfg, opt, accum, compute_dtype)

    def chunk(params, opt_state, corpus, rng, gumbel_t):
        def body(carry, key):
            params, opt_state = carry
            k_idx, k_step = jax.random.split(key)
            idx = jax.random.randint(
                k_idx, (accum, batch_size), 0, corpus.shape[0]
            )
            x = jax.lax.with_sharding_constraint(corpus[idx], data_sharding)
            params, opt_state, metrics = base(
                params, opt_state, x, k_step, gumbel_t
            )
            return (params, opt_state), metrics

        keys = jax.random.split(rng, n_steps)
        (params, opt_state), ms = jax.lax.scan(
            body, (params, opt_state), keys
        )
        return params, opt_state, jax.tree.map(
            lambda m: jnp.mean(m, axis=0), ms
        )

    return chunk


def make_eval_step(model_cfg, gumbel_t, compute_dtype):
    @jax.jit
    def eval_step(params, x):
        out = rqvae_lib.forward(
            params, model_cfg, x.astype(compute_dtype),
            gumbel_t=gumbel_t, training=False,
        )
        return out.loss, out.reconstruction_loss, out.rqvae_loss

    return eval_step


def id_diversity_metrics(params, model_cfg, corpus_x) -> dict:
    """rqvae_entropy / codebook_usage_i / max_id_duplicates
    (reference train_rqvae.py:223-239). ``params`` may be host numpy (the
    process-0-only path hands over a device_get copy); re-put on the local
    default device so the traced tokenization closes over device arrays."""
    params = jax.tree.map(jnp.asarray, params)
    index = semids.precompute_corpus_ids(params, model_cfg, corpus_x)
    cached = np.asarray(index.cached_ids)
    n = cached.shape[0]
    # normalized by corpus size, exactly as the reference logs it
    # (train_rqvae.py:227: corpus_ids[:,-1].max() / corpus_ids.shape[0])
    out = {"max_id_duplicates": cached[:, -1].max() / n}
    _, counts = np.unique(cached[:, :-1], axis=0, return_counts=True)
    p = counts / n
    out["rqvae_entropy"] = float(-(p * np.log(p)).sum())
    for level in range(cached.shape[1] - 1):
        out[f"codebook_usage_{level}"] = (
            len(np.unique(cached[:, level])) / model_cfg.codebook_size
        )
    return out


def train(cfg: RqVaeTrainConfig, *, logger: Optional[MetricsLogger] = None):
    logger = logger or MetricsLogger(
        every=cfg.log_every, sink=cfg.metrics_sink,
        tensorboard_dir=cfg.tensorboard_dir,
    )
    # must precede the first JAX computation or multi-host init becomes
    # impossible — see mesh.maybe_init_distributed
    mesh_lib.maybe_init_distributed()
    model_cfg = cfg.model_config()
    compute_dtype = jnp.bfloat16 if cfg.amp else jnp.float32
    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)

    bundle = registry.load(
        cfg.dataset,
        cfg.data_path or cfg.dataset_folder,
        split=cfg.dataset_split if cfg.dataset == registry.RecDataset.AMAZON else None,
        need_seqs=False,
        synthetic_kwargs={
            "n_items": cfg.synthetic_n_items,
            "feature_dim": cfg.vae_input_dim,
            "n_users": cfg.synthetic_n_users,
            "seed": cfg.seed,
        },
    )
    items = bundle.items
    # reference parity: feed the model exactly its input_dim feature slice
    # (ItemData truncates to [:768], reference data/processed.py:76,153)
    _slice = lambda x: dataset_lib.features_for_model(x, cfg.vae_input_dim)
    train_x = _slice(items.filtered("train" if cfg.do_eval else "all"))
    eval_x = _slice(items.filtered("eval")) if cfg.do_eval else None
    index_x = _slice(items.filtered("all"))

    local_bs = mesh_lib.process_local_batch_size(cfg.batch_size)
    device_mesh = mesh_lib.make_mesh(cfg.mesh_shape)
    rng = jax.random.key(cfg.seed, impl=cfg.prng_impl)
    rng, init_key = jax.random.split(rng)
    params = rqvae_lib.init(init_key, model_cfg)

    opt = optim.adamw(cfg.learning_rate, cfg.weight_decay)
    opt_state = opt.init(params)
    start_iter = 0

    resume_path = cfg.pretrained_rqvae_path
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
        print(f"---Loaded RQVAE Iter {meta['step']}---", file=sys.stderr)

    # param shardings over the mesh (replicated for pure DP; codebooks/MLPs
    # over 'model' under TP); batches shard over 'data' either way, and the
    # Adam moments shard exactly like their params
    rep = (
        mesh_lib.rqvae_tp_param_shardings(params, device_mesh)
        if cfg.tensor_parallel
        else mesh_lib.dp_param_shardings(params, device_mesh)
    )
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(
        opt_state,
        mesh_lib.opt_state_shardings(opt_state, params, rep, device_mesh),
    )

    if start_iter == 0 and cfg.use_kmeans_init:
        n_prime = min(cfg.kmeans_prime_items, train_x.shape[0])
        rng, prime_key = jax.random.split(rng)
        params = rqvae_lib.kmeans_prime(
            params,
            model_cfg,
            mesh_lib.replicate_host_array(train_x[:n_prime], device_mesh),
            prime_key,
            gumbel_t=cfg.gumbel_temperature,
        )
        params = jax.device_put(params, rep)

    accum = max(1, cfg.gradient_accumulate_every)
    step_fn = jax.jit(
        make_train_step(model_cfg, opt, accum, compute_dtype),
        donate_argnums=(0, 1),
    )
    eval_fn = make_eval_step(model_cfg, cfg.gumbel_temperature, compute_dtype)
    temp_sched = (
        temperature.TemperatureScheduler(
            t0=cfg.gumbel_temperature,
            min_t=cfg.gumbel_min_t,
            anneal_rate=cfg.gumbel_anneal_rate,
            step_size=cfg.gumbel_anneal_step_size,
        )
        if cfg.gumbel_anneal
        else temperature.ConstantTemperature(cfg.gumbel_temperature)
    )

    # device-resident data loop (steps_per_call > 1): the corpus lives in
    # HBM as a replicated global array; chunks are clamped to the next
    # log/eval/save boundary so cadence semantics match the host-fed loop
    spc = max(1, cfg.steps_per_call)
    if spc > 1:
        corpus_dev = mesh_lib.replicate_host_array(train_x, device_mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P

        data_sharding = NamedSharding(
            device_mesh, P(None, mesh_lib.DATA_AXIS, None)
        )
        chunk_fns = {}

        def get_chunk_fn(n):
            if n not in chunk_fns:
                chunk_fns[n] = jax.jit(
                    make_device_chunk(
                        model_cfg, opt, accum, compute_dtype,
                        cfg.batch_size, data_sharding, n,
                    ),
                    donate_argnums=(0, 1),
                )
            return chunk_fns[n]

    # per-process stream: each host samples ITS slice of the global batch
    host_rng = np.random.default_rng(cfg.seed + jax.process_index())
    profiler = profiling.StepProfiler(
        cfg.profile_dir, cfg.profile_start, cfg.profile_steps
    )
    t_start = time.monotonic()
    examples_seen = 0
    first_it = start_iter
    it = start_iter - 1  # `it` = index of the last completed iteration
    while it + 1 < start_iter + cfg.iterations:
        it_start = it + 1
        profiler.step(it_start - start_iter)
        gumbel_t = temp_sched.get_t(it_start)
        rng, step_key = jax.random.split(rng)
        if spc > 1:
            # distance to the end and to each cadence boundary; the very
            # first chunk is a single step so the step-1 loss is logged,
            # matching the host-fed loop (and the reference's iter-0 log)
            cadences = (cfg.log_every, cfg.eval_every, cfg.save_model_every)
            bounds = [c - it_start % c for c in cadences]
            if cfg.gumbel_anneal:
                # t is sampled once per chunk, so a chunk may only span
                # iters sharing get_t (see constant_t_chunk_bound)
                bounds.append(temperature.constant_t_chunk_bound(
                    it_start, cfg.gumbel_anneal_step_size
                ))
            n = min(
                spc,
                start_iter + cfg.iterations - it_start,
                *bounds,
            ) if it_start != first_it else 1
            params, opt_state, metrics = get_chunk_fn(n)(
                params, opt_state, corpus_dev, step_key,
                jnp.float32(gumbel_t),
            )
            it = it_start + n - 1
        else:
            idx = host_rng.integers(
                0, train_x.shape[0], size=(accum, local_bs)
            )
            batch = mesh_lib.shard_batch(
                train_x[idx].reshape(accum, local_bs, -1),
                device_mesh,
                axis=1,
            )
            params, opt_state, metrics = step_fn(
                params, opt_state, batch, step_key, jnp.float32(gumbel_t)
            )
            it = it_start
        examples_seen += (it - it_start + 1) * accum * cfg.batch_size

        if _every(it, cfg.log_every) or it_start == first_it:
            m = jax.device_get(metrics)
            embs = m.pop("embs_norm_mean")
            m.update({f"emb_avg_norm_{i}": embs[i] for i in range(len(embs))})
            m["examples_per_s"] = examples_seen / (time.monotonic() - t_start)
            m["temperature"] = gumbel_t
            m["learning_rate"] = cfg.learning_rate
            logger.log(it + 1, m, force=True)

        last = it + 1 == start_iter + cfg.iterations
        # eval mirrors training's distribution: global batches assembled from
        # per-host contiguous blocks, sharded over 'data' — the loss means
        # come back as replicated scalars identical on every host, so
        # multi-host eval needs no separate reduction path
        if cfg.do_eval and eval_x.shape[0] and (
            _every(it, cfg.eval_every) or last
        ):
            losses = []
            n_eval_rows = eval_x.shape[0]
            n_batches = min(cfg.eval_batches,
                            max(1, n_eval_rows // cfg.batch_size))
            for eb in range(n_batches):
                lo = eb * cfg.batch_size
                # wrap small eval sets MODULO the set instead of shipping a
                # one-off tail shape through the jit program — repeats rows
                # near-uniformly, so the mean stays unbiased
                global_idx = np.arange(lo, lo + cfg.batch_size) % n_eval_rows
                xe = eval_x[mesh_lib.host_block(global_idx, local_bs)]
                xe = mesh_lib.shard_batch(xe, device_mesh, axis=0)
                losses.append([float(v) for v in eval_fn(params, xe)])
            ev = np.asarray(losses).mean(axis=0)
            # corpus re-tokenization on process 0 only (reference
            # train_rqvae.py:223-239 runs it on rank 0). The host fetch is
            # collective (params may be TP-sharded across hosts); the
            # corpus-sized tokenization then runs as a process-local jit on
            # host 0 only — N-1 hosts skip the redundant work
            host_params = mesh_lib.fetch_to_host(params)
            div = (
                id_diversity_metrics(
                    host_params, model_cfg, jnp.asarray(index_x)
                )
                if jax.process_index() == 0
                else {}
            )
            logger.log(
                it + 1,
                {
                    "eval_total_loss": ev[0],
                    "eval_reconstruction_loss": ev[1],
                    "eval_rqvae_loss": ev[2],
                    **div,
                },
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
    cfg = config_lib.load_config(RqVaeTrainConfig, path, overrides)
    train(cfg)


if __name__ == "__main__":
    main()
