"""End-to-end smoke tests for both train loops (CPU, tiny shapes).

Mirrors SURVEY.md §4 plan (e): short train on synthetic data, loss decreases,
checkpoints round-trip, stage-1 -> stage-2 handoff works.
"""
import json

import numpy as np
import pytest

from rqvae_tpu.models.quantize import QuantizeForwardMode
from rqvae_tpu.train import checkpoint as ckpt
from rqvae_tpu.train import train_decoder, train_rqvae
from rqvae_tpu.utils.logging import MetricsLogger


class CaptureLogger(MetricsLogger):
    def __init__(self):
        super().__init__(every=1)
        self.records = []

    def log(self, step, metrics, force=False):
        self.records.append({"step": step, **metrics})


def _rqvae_cfg(tmp_path, **kw):
    base = dict(
        iterations=60,
        batch_size=32,
        learning_rate=1e-3,
        dataset="SYNTHETIC",
        vae_input_dim=24,
        vae_hidden_dims=(24, 16),
        vae_embed_dim=8,
        vae_codebook_size=16,
        vae_n_cat_feats=0,
        vae_n_layers=3,
        vae_codebook_mode=QuantizeForwardMode.ROTATION_TRICK,
        eval_every=30,
        save_model_every=30,
        save_dir_root=str(tmp_path / "rqvae"),
        log_every=10,
        synthetic_n_items=256,
        synthetic_n_users=128,
        kmeans_prime_items=256,
        eval_batches=2,
        seed=0,
    )
    base.update(kw)
    from rqvae_tpu.utils.config import from_dict
    return from_dict(train_rqvae.RqVaeTrainConfig, base)


def _decoder_cfg(tmp_path, **kw):
    base = dict(
        iterations=30,
        batch_size=16,
        learning_rate=1e-3,
        dataset="SYNTHETIC",
        vae_input_dim=24,
        vae_hidden_dims=(24, 16),
        vae_embed_dim=8,
        vae_codebook_size=16,
        vae_n_cat_feats=0,
        vae_n_layers=3,
        pretrained_rqvae_path=str(tmp_path / "rqvae"),
        save_dir_root=str(tmp_path / "decoder"),
        decoder_embed_dim=16,
        attn_embed_dim=32,
        attn_heads=4,
        attn_layers=2,
        dropout_p=0.1,
        partial_eval_every=15,
        full_eval_every=30,
        save_model_every=30,
        log_every=10,
        generation_candidates=16,
        generation_top_k=8,
        eval_batches=2,
        synthetic_n_items=256,
        synthetic_n_users=128,
        seed=0,
    )
    base.update(kw)
    from rqvae_tpu.utils.config import from_dict
    return from_dict(train_decoder.DecoderTrainConfig, base)


@pytest.fixture(scope="module")
def trained_rqvae(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("stage1")
    logger = CaptureLogger()
    cfg = _rqvae_cfg(tmp_path)
    train_rqvae.train(cfg, logger=logger)
    return tmp_path, cfg, logger


def test_rqvae_train_smoke(trained_rqvae):
    tmp_path, cfg, logger = trained_rqvae
    losses = [r["total_loss"] for r in logger.records if "total_loss" in r]
    assert len(losses) >= 3
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    evals = [r for r in logger.records if "rqvae_entropy" in r]
    assert evals, "ID-diversity metrics must be logged at eval"
    for key in ("codebook_usage_0", "codebook_usage_1", "codebook_usage_2",
                "max_id_duplicates", "eval_total_loss"):
        assert key in evals[-1]
    assert ckpt.latest_step(str(tmp_path / "rqvae")) == 59


def test_rqvae_resume(trained_rqvae, tmp_path):
    src, cfg, _ = trained_rqvae
    logger = CaptureLogger()
    cfg2 = _rqvae_cfg(
        tmp_path,
        iterations=5,
        pretrained_rqvae_path=str(src / "rqvae"),
        use_kmeans_init=False,
        save_dir_root=str(tmp_path / "resumed"),
        eval_every=1000,
        save_model_every=5,
    )
    train_rqvae.train(cfg2, logger=logger)
    # resumed from step 59 -> first logged step > 60
    assert logger.records[0]["step"] > 60
    assert ckpt.latest_step(str(tmp_path / "resumed")) == 64


def test_decoder_train_smoke(trained_rqvae, tmp_path):
    src, _, _ = trained_rqvae
    logger = CaptureLogger()
    cfg = _decoder_cfg(tmp_path, pretrained_rqvae_path=str(src / "rqvae"))
    train_decoder.train(cfg, logger=logger)
    losses = [r["total_loss"] for r in logger.records if "total_loss" in r]
    assert losses[-1] < losses[0]
    # full generative eval logged h@k + ndcg
    full = [r for r in logger.records if "h@10_slice_:4" in r]
    assert full, "full eval must run"
    assert "ndcg@10" in full[-1]
    assert ckpt.latest_step(str(tmp_path / "decoder")) == 29
    # per-position losses present
    step_logs = [r for r in logger.records if "loss_0" in r]
    assert all(f"loss_{d}" in step_logs[-1] for d in range(4))


def test_cli_main(tmp_path, capsys):
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "iterations": 3,
        "batch_size": 8,
        "dataset": "SYNTHETIC",
        "vae_input_dim": 16,
        "vae_hidden_dims": [16],
        "vae_embed_dim": 8,
        "vae_codebook_size": 8,
        "vae_n_cat_feats": 0,
        "eval_every": 1000,
        "save_model_every": 1000,
        "save_dir_root": str(tmp_path / "out"),
        "synthetic_n_items": 64,
        "synthetic_n_users": 32,
        "kmeans_prime_items": 64,
        "do_eval": False,
    }))
    train_rqvae.main([str(cfg_path), "iterations=2"])
    out = capsys.readouterr().out
    lines = [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]
    assert any("total_loss" in l for l in lines)
