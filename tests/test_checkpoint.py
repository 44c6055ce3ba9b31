"""Tests for checkpoint save/restore (train/checkpoint.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from rqvae_tpu.train import checkpoint as ckpt


def _state():
    params = {"w": jnp.arange(6.0).reshape(2, 3), "layers": [{"c": jnp.ones(4)}]}
    opt = optax.adamw(1e-3)
    return {"params": params, "opt_state": opt.init(params)}


def test_save_restore_roundtrip(tmp_path):
    root = str(tmp_path / "ckpt")
    state = _state()
    ckpt.save(root, 7, state, meta={"config": {"lr": 1e-3}})
    restored, meta = ckpt.restore(root, target=jax.device_get(state))
    assert meta["step"] == 7
    assert meta["config"]["lr"] == 1e-3
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        state, restored,
    )


def test_latest_step(tmp_path):
    root = str(tmp_path / "ckpt")
    assert ckpt.latest_step(root) is None
    state = _state()
    ckpt.save(root, 3, state)
    ckpt.save(root, 11, state)
    assert ckpt.latest_step(root) == 11
    restored, meta = ckpt.restore(root, target=jax.device_get(state))
    assert meta["step"] == 11
    restored, meta = ckpt.restore(root, step=3, target=jax.device_get(state))
    assert meta["step"] == 3


def test_partial_restore(tmp_path):
    root = str(tmp_path / "ckpt")
    state = _state()
    ckpt.save(root, 0, state)
    restored, _ = ckpt.restore(
        root, target=jax.device_get({"params": state["params"]}), partial=True
    )
    assert "params" in restored and "opt_state" not in restored
