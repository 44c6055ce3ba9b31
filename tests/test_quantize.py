"""Unit tests for the residual-quantization level (models/quantize.py).

Golden values are computed with NumPy against the reference semantics
(reference modules/quantize.py:99-156, modules/loss.py:39-42).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rqvae_tpu.models import quantize
from rqvae_tpu.models.losses import quantize_loss
from rqvae_tpu.models.quantize import QuantizeDistance, QuantizeForwardMode


def _setup(b=7, k=16, d=8, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, d).astype(np.float32))
    params = {"codebook": jnp.asarray(rng.randn(k, d).astype(np.float32))}
    return x, params


def test_l2_distance_matches_numpy():
    x, params = _setup()
    cb = np.asarray(params["codebook"])
    xn = np.asarray(x)
    expected = ((xn[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
    got = quantize.distances(x, params["codebook"], QuantizeDistance.L2)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-4)


def test_cosine_distance_matches_numpy():
    x, params = _setup()
    cb = np.asarray(params["codebook"])
    xn = np.asarray(x)
    xs = xn / np.linalg.norm(xn, axis=1, keepdims=True)
    cs = cb / np.linalg.norm(cb, axis=1, keepdims=True)
    expected = -(xs @ cs.T)
    got = quantize.distances(x, params["codebook"], QuantizeDistance.COSINE)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-5)


def test_eval_path_hard_lookup():
    x, params = _setup()
    out = quantize.apply(params, x, temperature=0.001, training=False)
    cb = np.asarray(params["codebook"])
    d = ((np.asarray(x)[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
    ids = d.argmin(-1)
    np.testing.assert_array_equal(np.asarray(out.ids), ids)
    np.testing.assert_allclose(np.asarray(out.embeddings), cb[ids], rtol=1e-5)


def test_quantize_loss_golden():
    q = jnp.asarray([[1.0, 2.0], [0.0, -1.0]])
    v = jnp.asarray([[0.0, 0.0], [1.0, 1.0]])
    # emb term: ||q-v||^2 = [5, 5]; total with beta=0.25: 5 + 1.25 = 6.25
    got = quantize_loss(q, v, commitment_weight=0.25)
    np.testing.assert_allclose(np.asarray(got), [6.25, 6.25])


def test_quantize_loss_gradients_split():
    """Value term updates v, commitment term updates q (reference loss.py:39-42)."""
    q = jnp.asarray([[1.0, 2.0]])
    v = jnp.asarray([[0.0, 0.0]])
    gq = jax.grad(lambda a: quantize_loss(a, v, 0.25).sum())(q)
    gv = jax.grad(lambda a: quantize_loss(q, a, 0.25).sum())(v)
    # d/dq of 0.25*||q - sg(v)||^2 = 0.5*(q-v)
    np.testing.assert_allclose(np.asarray(gq), [[0.5, 1.0]])
    # d/dv of ||sg(q) - v||^2 = -2*(q-v)
    np.testing.assert_allclose(np.asarray(gv), [[-2.0, -4.0]])


def test_ste_forward_and_gradient():
    x, params = _setup()
    out = quantize.apply(
        params, x, temperature=1.0, training=True, mode=QuantizeForwardMode.STE
    )
    cb = np.asarray(params["codebook"])
    np.testing.assert_allclose(
        np.asarray(out.embeddings), cb[np.asarray(out.ids)], rtol=1e-5
    )

    # Straight-through: d(sum(emb_out))/dx == ones
    def f(xx):
        o = quantize.apply(
            params, xx, temperature=1.0, training=True, mode=QuantizeForwardMode.STE
        )
        return jnp.sum(o.embeddings)

    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(np.asarray(x)))


def test_rotation_trick_forward_close_to_codeword():
    """The rotation maps x onto (approximately) its codeword: same direction as
    q and rescaled to ||emb|| (arXiv:2410.06424 §4.2)."""
    x, params = _setup()
    out = quantize.apply(
        params,
        x,
        temperature=1.0,
        training=True,
        mode=QuantizeForwardMode.ROTATION_TRICK,
    )
    cb = np.asarray(params["codebook"])
    emb = cb[np.asarray(out.ids)]
    np.testing.assert_allclose(np.asarray(out.embeddings), emb, rtol=1e-3, atol=1e-3)


def test_rotation_trick_has_nontrivial_x_gradient():
    x, params = _setup()

    def f(xx):
        o = quantize.apply(
            params,
            xx,
            temperature=1.0,
            training=True,
            mode=QuantizeForwardMode.ROTATION_TRICK,
        )
        return jnp.sum(o.embeddings ** 2)

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_gumbel_weights_are_distribution():
    x, params = _setup()
    rng = jax.random.PRNGKey(0)
    w = quantize.gumbel_softmax_sample(rng, -quantize.distances(x, params["codebook"]), 0.2)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), np.ones(x.shape[0]), rtol=1e-5)
    assert (np.asarray(w) >= 0).all()


def test_gumbel_low_temperature_approaches_hard():
    x, params = _setup()
    rng = jax.random.PRNGKey(1)
    out = quantize.apply(
        params,
        x,
        temperature=1e-5,
        training=True,
        rng=rng,
        mode=QuantizeForwardMode.GUMBEL_SOFTMAX,
    )
    # at t->0 the soft embedding collapses onto a single codeword
    cb = np.asarray(params["codebook"])
    d = ((np.asarray(out.embeddings)[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
    assert (d.min(-1) < 1e-6).all()


def test_sim_vq_projection_applied():
    x, params = _setup()
    key = jax.random.PRNGKey(3)
    params = quantize.init(key, 16, 8, sim_vq=True)
    cb_eff = quantize.effective_codebook(params)
    expected = np.asarray(params["codebook"]) @ np.asarray(params["sim_proj"])
    np.testing.assert_allclose(np.asarray(cb_eff), expected, rtol=1e-5)


def test_codebook_normalize():
    params = {"codebook": jnp.asarray(np.random.RandomState(0).randn(16, 8).astype(np.float32))}
    cb = quantize.effective_codebook(params, normalize=True)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(cb, axis=-1)), np.ones(16), rtol=1e-5
    )


@pytest.mark.parametrize(
    "mode",
    [QuantizeForwardMode.GUMBEL_SOFTMAX, QuantizeForwardMode.STE,
     QuantizeForwardMode.ROTATION_TRICK],
)
def test_all_modes_jit(mode):
    x, params = _setup()
    rng = jax.random.PRNGKey(0)

    @jax.jit
    def f(p, xx, r):
        return quantize.apply(
            p, xx, temperature=0.2, training=True, rng=r, mode=mode
        )

    out = f(params, x, rng)
    assert out.embeddings.shape == x.shape
    assert out.ids.shape == (x.shape[0],)
    assert np.isfinite(np.asarray(out.loss)).all()
