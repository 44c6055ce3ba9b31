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

pytestmark = pytest.mark.slow  # heavy end-to-end/train-loop suite (run: pytest -m slow)


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


def test_decoder_train_packed_smoke(trained_rqvae, tmp_path):
    """Packed long-context path end to end: packed_rows in the train loop
    (packer -> jit packed step -> optimizer), loss decreases, eval and
    checkpointing still flow through the flat paths."""
    src, _, _ = trained_rqvae
    logger = CaptureLogger()
    cfg = _decoder_cfg(
        tmp_path,
        pretrained_rqvae_path=str(src / "rqvae"),
        packed_rows=8,
        pack_slots=4,
        batch_size=16,
        save_dir_root=str(tmp_path / "decoder_packed"),
    )
    train_decoder.train(cfg, logger=logger)
    losses = [r["total_loss"] for r in logger.records if "total_loss" in r]
    assert losses[-1] < losses[0]
    # throughput counts packed examples (> 1 per row on the synthetic set)
    steps = [r for r in logger.records if "examples_per_s" in r]
    assert steps and steps[-1]["examples_per_s"] > 0
    # length quantiles come from slot lengths in packed mode
    assert "train_seq_length_p0.5" in steps[-1]
    full = [r for r in logger.records if "h@10_slice_:4" in r]
    assert full, "full eval must still run (flat path)"
    assert ckpt.latest_step(str(tmp_path / "decoder_packed")) == 29


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


def test_length_bucketed_grads_match_flat_step():
    """Length-bucketed gradient accumulation computes EXACTLY the same
    update as the flat step: same samples, mean-of-means over equal groups."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rqvae_tpu.data.dataset import make_seq_batch
    from rqvae_tpu.models import retrieval
    from rqvae_tpu.models.retrieval import RetrievalConfig
    from rqvae_tpu.tokenizer import semids
    from rqvae_tpu.train.train_decoder import bucket_slices
    from rqvae_tpu.utils import amp

    cfg = RetrievalConfig(
        embedding_dim=16, attn_dim=32, dropout=0.0, num_heads=4, n_layers=2,
        num_embeddings=16, sem_id_dim=4, max_pos=40, input_dropout=0.0,
    )
    rng = np.random.RandomState(0)
    n_items, bsz = 60, 16
    cached = rng.randint(0, 16, (n_items, 3)).astype(np.int32)
    cached = np.concatenate(
        [cached, np.asarray(semids.dedup_column(jnp.asarray(cached), 16))[:, None]],
        axis=1,
    ).astype(np.int32)
    index = semids.build_index(jnp.asarray(cached), codebook_size=16)
    params = retrieval.init(jax.random.PRNGKey(0), cfg)

    ids = rng.randint(0, n_items, (bsz, 10)).astype(np.int32)
    lengths = rng.randint(3, 11, (bsz,))
    ids = np.where(np.arange(10)[None] < lengths[:, None], ids, -1)
    raw = {
        "user_ids": np.arange(bsz, dtype=np.int32),
        "ids": ids,
        "ids_fut": rng.randint(0, n_items, (bsz, 1)).astype(np.int32),
    }
    item_x = np.zeros((n_items, 1), np.float32)

    def loss_fn(p, batch):
        tok = semids.tokenize_sequences(index, batch)
        out = retrieval.forward(
            amp.cast_floating(p, jnp.float32), cfg, tok, training=False
        )
        return out.loss

    flat = make_seq_batch(raw, item_x, with_features=False)
    flat_grads = jax.grad(loss_fn)(params, jax.tree.map(jnp.asarray, flat))

    n_buckets = 4
    acc = jax.tree.map(jnp.zeros_like, params)
    for rows, length in bucket_slices((ids >= 0).sum(axis=1), n_buckets):
        sub = {"user_ids": raw["user_ids"][rows],
               "ids": raw["ids"][rows, :length],
               "ids_fut": raw["ids_fut"][rows]}
        g = jax.grad(loss_fn)(
            params,
            jax.tree.map(jnp.asarray, make_seq_batch(sub, item_x,
                                                     with_features=False)),
        )
        acc = jax.tree.map(lambda a, b: a + b / n_buckets, acc, g)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        ),
        acc, flat_grads,
    )


def test_run_eval_cli_on_test_split(trained_rqvae, tmp_path, capsys):
    """Standalone eval entry point (evaluate/run_eval.py): loads a decoder
    checkpoint and runs the full generative eval on the TEST split — the
    reference builds test sequences (data/amazon.py:76-78) but never
    evaluates them; this completes the protocol."""
    from rqvae_tpu.evaluate import run_eval

    src, _, _ = trained_rqvae
    cfg = _decoder_cfg(tmp_path, pretrained_rqvae_path=str(src / "rqvae"),
                       iterations=10, full_eval_every=1000)
    train_decoder.train(cfg, logger=CaptureLogger())

    metrics = run_eval.evaluate_checkpoint(cfg, split="test", max_users=24)
    assert metrics["split"] == "test"
    assert 0 < metrics["n_users"] <= 24
    assert "h@10_slice_:4" in metrics and "ndcg@10" in metrics
    assert 0.0 <= metrics["h@10_slice_:4"] <= 1.0


def test_every_interval_zero_disables():
    """interval <= 0 means "never fire" (a run that only wants full beam
    evals sets partial_eval_every=0; round 5 this raised ZeroDivisionError)."""
    from rqvae_tpu.train.train_decoder import _every

    assert _every(9, 10)
    assert not _every(8, 10)
    assert not any(_every(it, 0) for it in range(5))
    assert not any(_every(it, -1) for it in range(5))
