"""Worker process for the two-process distributed test (test_multiprocess.py).

Runs REAL multi-process JAX: jax.distributed.initialize against a localhost
coordinator, 4 virtual CPU devices per process -> 8 global devices, then
drives the actual train loops so the multi-host code paths
(make_array_from_process_local_data, host_block eval assembly, per-process
sampling, process-0-only checkpointing) execute with process_count() == 2
instead of being dead code until a pod exists.

Invoked as:  python tests/_mp_worker.py <coordinator> <num_procs> <proc_id>
             <tmpdir> <stage>
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    coordinator, num_procs, proc_id, tmpdir, stage = sys.argv[1:6]
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_procs),
        process_id=int(proc_id),
    )
    assert jax.process_count() == int(num_procs), jax.process_count()
    assert len(jax.devices()) == 4 * int(num_procs)

    from rqvae_tpu.utils.config import from_dict
    from rqvae_tpu.utils.logging import MetricsLogger

    records = []

    class Collect(MetricsLogger):
        def __init__(self):
            super().__init__(every=1)

        def log(self, step, metrics, force=False):
            records.append({"step": int(step), **{
                k: float(v) for k, v in metrics.items()
            }})

    if stage == "rqvae":
        from rqvae_tpu.train import train_rqvae

        cfg = from_dict(train_rqvae.RqVaeTrainConfig, dict(
            iterations=12, batch_size=32, dataset="SYNTHETIC",
            vae_input_dim=16, vae_hidden_dims=(16,), vae_embed_dim=8,
            vae_codebook_size=16, vae_n_cat_feats=0,
            eval_every=6, save_model_every=12, eval_batches=2,
            save_dir_root=os.path.join(tmpdir, "rq"),
            synthetic_n_items=128, synthetic_n_users=64,
            kmeans_prime_items=64, do_eval=True, log_every=4, seed=11,
        ))
        train_rqvae.train(cfg, logger=Collect())
    else:
        from rqvae_tpu.train import train_rqvae
        from rqvae_tpu.train import train_decoder

        rq_cfg = from_dict(train_rqvae.RqVaeTrainConfig, dict(
            iterations=4, batch_size=32, dataset="SYNTHETIC",
            vae_input_dim=16, vae_hidden_dims=(16,), vae_embed_dim=8,
            vae_codebook_size=16, vae_n_cat_feats=0,
            eval_every=1000, save_model_every=4, eval_batches=1,
            save_dir_root=os.path.join(tmpdir, "rq"),
            synthetic_n_items=128, synthetic_n_users=64,
            kmeans_prime_items=64, do_eval=False, log_every=4, seed=11,
        ))
        train_rqvae.train(rq_cfg)
        cfg = from_dict(train_decoder.DecoderTrainConfig, dict(
            iterations=8, batch_size=32, dataset="SYNTHETIC",
            pretrained_rqvae_path=os.path.join(tmpdir, "rq"),
            vae_input_dim=16, vae_hidden_dims=(16,), vae_embed_dim=8,
            vae_codebook_size=16, vae_n_cat_feats=0,
            decoder_embed_dim=16, attn_embed_dim=32, attn_heads=4,
            attn_layers=2, save_dir_root=os.path.join(tmpdir, "dec"),
            synthetic_n_items=128, synthetic_n_users=64,
            partial_eval_every=8, full_eval_every=8, eval_batches=1,
            generation_top_k=4, generation_candidates=8,
            log_every=4, seed=11,
        ))
        train_decoder.train(cfg, logger=Collect())

    out_path = os.path.join(tmpdir, f"metrics_p{proc_id}.json")
    with open(out_path, "w") as f:
        json.dump(records, f)
    print(f"WORKER_OK {proc_id}", flush=True)


if __name__ == "__main__":
    main()
