"""Config-drift guards.

Round 3's sharpest review finding was the repo's own bench contradicting
its config defaults (length bucketing measured 1.86-2.36x faster at the
ML-32M shape while configs/decoder_ml32m.json left it off). These tests
pin the measured decisions so a config edit can't silently drift from the
published PERF.md story, and pin the full-budget configs to the
reference's SHIPPED protocol (reference configs/rqvae_amazon.gin:4,
decoder_amazon.gin:4) that QUALITY.md's full-budget section claims.
"""
import glob
import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    with open(os.path.join(ROOT, "configs", name)) as f:
        return json.load(f)


def test_ml32m_decoder_buckets_on():
    # measured 1.96x at the shipped bs-64 801-token shape (PERF.md); 2
    # buckets, not 4 (16-row groups underfill one v5e)
    cfg = _load("decoder_ml32m.json")
    assert cfg.get("length_buckets") == 2


def test_amazon_decoder_buckets_off():
    # measured SLOWER at 81-token shapes (PERF.md length-bucketing table)
    for name in ("decoder_amazon.json", "decoder_synthbeauty.json",
                 "decoder_synthbeauty_full.json"):
        cfg = _load(name)
        assert cfg.get("length_buckets", 1) == 1, name


def test_full_budget_matches_reference_shipped_protocol():
    # reference configs/rqvae_amazon.gin:4 + decoder_amazon.gin:4
    s1 = _load("rqvae_synthbeauty_full.json")
    assert s1["iterations"] == 400_000 and s1["batch_size"] == 64
    s2 = _load("decoder_synthbeauty_full.json")
    assert s2["iterations"] == 200_000 and s2["batch_size"] == 256
    assert s2["attn_layers"] == 8 and s2["attn_embed_dim"] == 512


def test_bench_metric_names_unique_and_stable():
    import bench

    names = [bench.metric_name(p) for p in bench.PROFILES]
    assert len(set(names)) == len(names)
    # ratchet keys must stay stable: every baseline entry maps to a live
    # profile (a renamed profile would silently re-seed its baseline —
    # the round-2 advisor's finding)
    with open(os.path.join(ROOT, "BENCH_BASELINE.json")) as f:
        baseline = json.load(f)
    legacy = {"decoder_train_examples_per_s"}  # round-1 amazon key
    for key in baseline:
        assert key in names or key in legacy, key


def test_every_config_parses_into_its_train_dataclass():
    from rqvae_tpu.utils.config import load_config
    from rqvae_tpu.train.train_decoder import DecoderTrainConfig
    from rqvae_tpu.train.train_rqvae import RqVaeTrainConfig

    for path in glob.glob(os.path.join(ROOT, "configs", "*.json")):
        name = os.path.basename(path)
        cls = RqVaeTrainConfig if name.startswith("rqvae") else (
            DecoderTrainConfig
        )
        cfg = load_config(cls, path)
        assert cfg.iterations > 0, name


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
