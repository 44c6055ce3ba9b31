"""Auto-resume: a second train() run picks up the latest checkpoint in
save_dir_root without an explicit pretrained path (failure recovery)."""
import pytest
import numpy as np

from rqvae_tpu.train import train_rqvae
from rqvae_tpu.utils.config import from_dict
from rqvae_tpu.utils.logging import MetricsLogger

pytestmark = pytest.mark.slow  # heavy end-to-end/train-loop suite (run: pytest -m slow)


class CaptureLogger(MetricsLogger):
    def __init__(self):
        super().__init__(every=1)
        self.records = []

    def log(self, step, metrics, force=False):
        self.records.append({"step": step, **metrics})


def _cfg(tmp_path, iters):
    return from_dict(train_rqvae.RqVaeTrainConfig, dict(
        iterations=iters, batch_size=16, learning_rate=1e-3,
        dataset="SYNTHETIC", vae_input_dim=16, vae_hidden_dims=(16,),
        vae_embed_dim=8, vae_codebook_size=16, vae_n_cat_feats=0,
        vae_n_layers=2, eval_every=10**9, do_eval=False,
        save_model_every=iters, save_dir_root=str(tmp_path / "ck"),
        log_every=5, synthetic_n_items=64, kmeans_prime_items=64,
        eval_batches=1, seed=0,
    ))


def test_auto_resume_continues_from_latest(tmp_path):
    log1 = CaptureLogger()
    train_rqvae.train(_cfg(tmp_path, 10), logger=log1)
    assert log1.records[-1]["step"] == 10

    # same save dir, no pretrained path: must continue at step 11, not restart
    log2 = CaptureLogger()
    train_rqvae.train(_cfg(tmp_path, 10), logger=log2)
    steps = [r["step"] for r in log2.records]
    assert min(steps) > 10, f"expected resume past step 10, got {steps[:3]}"


def test_auto_resume_off_restarts(tmp_path):
    train_rqvae.train(_cfg(tmp_path, 10))
    cfg = _cfg(tmp_path, 10)
    cfg = from_dict(
        train_rqvae.RqVaeTrainConfig,
        {**cfg.__dict__, "auto_resume": False, "save_dir_root": str(tmp_path / "ck2")},
    )
    log = CaptureLogger()
    train_rqvae.train(cfg, logger=log)
    assert log.records[0]["step"] == 1
