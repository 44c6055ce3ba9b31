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


def test_npz_fallback_roundtrip(tmp_path, monkeypatch):
    """The orbax-less fallback must round-trip a realistic train state
    (nested dicts + tuples + scalar-count leaves) — it is the only backend
    when orbax is absent."""
    import numpy as np
    from rqvae_tpu.train import checkpoint as ckpt_mod

    monkeypatch.setattr(ckpt_mod, "_HAS_ORBAX", False)
    state = {
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                   "layers": [{"codebook": np.ones((4, 2), np.float32)}]},
        "opt_state": (np.int32(7), (np.zeros(3, np.float32),
                                    np.full((2, 2), 2.5, np.float32))),
    }
    ckpt_mod.save(str(tmp_path / "r"), 5, state, meta={"config": {"a": 1}})
    assert ckpt_mod.latest_step(str(tmp_path / "r")) == 5
    restored, meta = ckpt_mod.restore(str(tmp_path / "r"), target=state)
    assert meta["step"] == 5 and meta["config"] == {"a": 1}
    flat_a = jax.tree_util.tree_flatten(state)[0]
    flat_b = jax.tree_util.tree_flatten(restored)[0]
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_relative_save_dir(tmp_path, monkeypatch):
    """Relative save roots must work (orbax requires absolute paths; the
    shipped configs use out/... relative paths)."""
    import numpy as np
    from rqvae_tpu.train import checkpoint as ckpt_mod

    monkeypatch.chdir(tmp_path)
    state = {"params": {"w": np.ones((2, 2), np.float32)}}
    ckpt_mod.save("out/rel/ckpt", 3, state)
    restored, meta = ckpt_mod.restore("out/rel/ckpt", target=state)
    assert meta["step"] == 3
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.ones((2, 2))
    )
