"""Standalone generative evaluation: load a decoder checkpoint, run the full
constrained-beam-search eval on the eval OR test split.

The reference has no test-split evaluation entry point at all — it builds
test sequences (reference data/amazon.py:76-78: leave-one-out on the LAST
item) but never evaluates on them. This CLI completes the protocol:

  python -m rqvae_tpu.evaluate.run_eval configs/decoder_amazon.json \
      --split test [--checkpoint out/decoder/amazon/] [--max-users 2048]

Loads the decoder from --checkpoint (default: the config's save_dir_root),
the frozen RQ-VAE from the config's pretrained_rqvae_path, tokenizes the
corpus, and runs the same padded-tail beam-search eval the train loop uses
(train_decoder.run_generative_eval), printing one JSON line of
h@{1,5,10}/NDCG metrics.
"""
from __future__ import annotations

import json
import sys

import jax

from rqvae_tpu.data import dataset as dataset_lib
from rqvae_tpu.data import registry
from rqvae_tpu.parallel import mesh as mesh_lib
from rqvae_tpu.tokenizer import semids
from rqvae_tpu.train import checkpoint as ckpt_lib
from rqvae_tpu.train import train_decoder
from rqvae_tpu.utils import config as config_lib


def evaluate_checkpoint(
    cfg: train_decoder.DecoderTrainConfig,
    *,
    split: str = "eval",
    checkpoint: str | None = None,
    step: int | None = None,
    max_users: int | None = None,
    seed: int = 0,
) -> dict:
    import jax.numpy as jnp
    import numpy as np

    from rqvae_tpu.models import retrieval

    # must precede the first JAX computation (corpus tokenization below) or
    # multi-host init becomes impossible — see mesh.maybe_init_distributed
    mesh_lib.maybe_init_distributed()
    bundle = registry.load(
        cfg.dataset,
        cfg.data_path or cfg.dataset_folder,
        split=cfg.dataset_split
        if cfg.dataset == registry.RecDataset.AMAZON else None,
        synthetic_kwargs={
            "n_items": cfg.synthetic_n_items,
            "feature_dim": cfg.vae_input_dim,
            "n_users": cfg.synthetic_n_users,
            "seed": cfg.seed,
        },
    )
    seqs = {"eval": bundle.eval_seqs, "test": bundle.test_seqs}[split]
    if seqs is None:
        raise SystemExit(f"no '{split}' sequences in the dataset artifacts")

    model_cfg = cfg.retrieval_config(bundle.max_seq_len)
    vae_params, vae_cfg = train_decoder.load_frozen_rqvae(cfg)
    index = semids.precompute_corpus_ids(
        vae_params, vae_cfg,
        jnp.asarray(
            dataset_lib.features_for_model(bundle.items.x, vae_cfg.input_dim)
        ),
    )

    params = retrieval.init(jax.random.PRNGKey(0), model_cfg)
    path = checkpoint or cfg.save_dir_root
    state, meta = ckpt_lib.restore(
        path, step=step, target=jax.device_get({"params": params}),
        partial=True,
    )
    params = state["params"]
    print(f"---Loaded decoder iter {meta['step']}---", file=sys.stderr)

    device_mesh = mesh_lib.make_mesh(cfg.mesh_shape)
    params = jax.device_put(
        params, mesh_lib.dp_param_shardings(params, device_mesh)
    )
    index = mesh_lib.replicate_host_array(index, device_mesh)

    n_users = len(seqs) if max_users is None else min(max_users, len(seqs))
    rng = jax.random.key(seed, impl=cfg.prng_impl)
    metrics = train_decoder.run_generative_eval(
        params, model_cfg, index, seqs, bundle.items, cfg, device_mesh,
        rng, n_eval=n_users,
    )
    metrics["split"] = split
    metrics["n_users"] = n_users
    metrics["checkpoint_step"] = int(meta["step"])
    return metrics


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config", help="decoder train config (json)")
    p.add_argument("--split", default="eval", choices=["eval", "test"])
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint dir (default: config save_dir_root)")
    p.add_argument("--step", type=int, default=None,
                   help="exact checkpoint step to load (default: latest "
                        "under the checkpoint dir) — trajectory evals over "
                        "a training run's saved checkpoints")
    p.add_argument("--max-users", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("overrides", nargs="*", default=[])
    args = p.parse_args(argv)

    cfg = config_lib.load_config(
        train_decoder.DecoderTrainConfig, args.config, args.overrides
    )
    metrics = evaluate_checkpoint(
        cfg, split=args.split, checkpoint=args.checkpoint, step=args.step,
        max_users=args.max_users, seed=args.seed,
    )
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
