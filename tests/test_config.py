"""Tests for the config system (utils/config.py)."""
import json

import pytest

from rqvae_tpu.data.registry import RecDataset
from rqvae_tpu.models.quantize import QuantizeForwardMode
from rqvae_tpu.train.train_rqvae import RqVaeTrainConfig
from rqvae_tpu.utils import config as config_lib


def test_defaults_match_reference():
    """Defaults mirror reference train_rqvae.py:24-55."""
    cfg = RqVaeTrainConfig()
    assert cfg.iterations == 50000
    assert cfg.batch_size == 64
    assert cfg.learning_rate == 0.0001
    assert cfg.weight_decay == 0.01
    assert cfg.vae_input_dim == 18
    assert cfg.vae_embed_dim == 16
    assert cfg.vae_hidden_dims == (18, 18)
    assert cfg.vae_codebook_size == 32
    assert cfg.vae_n_layers == 3
    assert cfg.commitment_weight == 0.25
    assert cfg.vae_codebook_mode == QuantizeForwardMode.GUMBEL_SOFTMAX
    assert cfg.gumbel_temperature == 0.2


def test_load_json_with_enums(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({
        "iterations": 10,
        "vae_codebook_mode": "ROTATION_TRICK",
        "dataset": "AMAZON",
        "vae_hidden_dims": [512, 256],
    }))
    cfg = config_lib.load_config(RqVaeTrainConfig, str(p))
    assert cfg.iterations == 10
    assert cfg.vae_codebook_mode == QuantizeForwardMode.ROTATION_TRICK
    assert cfg.dataset == RecDataset.AMAZON
    assert cfg.vae_hidden_dims == (512, 256)


def test_cli_overrides(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"iterations": 10}))
    cfg = config_lib.load_config(
        RqVaeTrainConfig, str(p),
        ["iterations=99", "amp=true", "vae_hidden_dims=[8,4]",
         "dataset=SYNTHETIC", "learning_rate=3e-4"],
    )
    assert cfg.iterations == 99
    assert cfg.amp is True
    assert cfg.vae_hidden_dims == (8, 4)
    assert cfg.dataset == RecDataset.SYNTHETIC
    assert cfg.learning_rate == pytest.approx(3e-4)


def test_unknown_key_rejected():
    with pytest.raises(ValueError, match="unknown config keys"):
        config_lib.from_dict(RqVaeTrainConfig, {"not_a_key": 1})


def test_roundtrip_to_dict():
    cfg = RqVaeTrainConfig(vae_codebook_mode=QuantizeForwardMode.STE)
    d = config_lib.config_to_dict(cfg)
    assert d["vae_codebook_mode"] == "STE"
    cfg2 = config_lib.from_dict(RqVaeTrainConfig, d)
    assert cfg2 == cfg
