"""Tests for the RQ-VAE model (models/rqvae.py).

Covers: residual decomposition invariants, loss composition (reference
modules/rqvae.py:140-165), kmeans priming order, and that a few AdamW steps
reduce the loss on synthetic data.
"""
import jax
import pytest
import jax.numpy as jnp
import numpy as np
import optax

from rqvae_tpu.models import rqvae
from rqvae_tpu.models.quantize import QuantizeForwardMode

CFG = rqvae.RqVaeConfig(
    input_dim=18,
    embed_dim=16,
    hidden_dims=(18, 18),
    codebook_size=32,
    n_layers=3,
    n_cat_feats=0,
    codebook_kmeans_init=False,
)


def _x(b=24, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(b, CFG.input_dim).astype(np.float32))


def test_shapes():
    params = rqvae.init(jax.random.PRNGKey(0), CFG)
    out = rqvae.get_semantic_ids(params, CFG, _x())
    assert out.sem_ids.shape == (24, 3)
    assert out.embeddings.shape == (24, 16, 3)
    assert out.residuals.shape == (24, 16, 3)
    assert out.sem_ids.dtype == jnp.int32
    assert (np.asarray(out.sem_ids) >= 0).all()
    assert (np.asarray(out.sem_ids) < 32).all()


def test_residual_recursion_eval():
    """residual[l+1] == residual[l] - emb[l]; eval path uses hard codewords."""
    params = rqvae.init(jax.random.PRNGKey(0), CFG)
    out = rqvae.get_semantic_ids(params, CFG, _x())
    res = np.asarray(out.residuals)
    emb = np.asarray(out.embeddings)
    for l in range(2):
        np.testing.assert_allclose(
            res[:, :, l + 1], res[:, :, l] - emb[:, :, l], rtol=1e-4, atol=1e-5
        )


def test_eval_embeddings_are_codewords():
    params = rqvae.init(jax.random.PRNGKey(0), CFG)
    out = rqvae.get_semantic_ids(params, CFG, _x())
    for l in range(3):
        cb = np.asarray(params["layers"][l]["codebook"])
        np.testing.assert_allclose(
            np.asarray(out.embeddings[:, :, l]),
            cb[np.asarray(out.sem_ids[:, l])],
            rtol=1e-5,
        )


def test_forward_loss_composition():
    params = rqvae.init(jax.random.PRNGKey(0), CFG)
    x = _x()
    losses = rqvae.forward(params, CFG, x, gumbel_t=0.001, training=False)
    out = rqvae.get_semantic_ids(params, CFG, x)
    x_hat = rqvae.decode(params, CFG, jnp.sum(out.embeddings, axis=-1))
    recon = np.sum((np.asarray(x_hat) - np.asarray(x)) ** 2, axis=-1)
    expected = np.mean(recon + np.asarray(out.quantize_loss))
    np.testing.assert_allclose(float(losses.loss), expected, rtol=1e-5)
    # decoder output is l2-normalized by its final MLP layer
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x_hat), axis=-1), np.ones(24), rtol=1e-5
    )


def test_p_unique_ids():
    params = rqvae.init(jax.random.PRNGKey(0), CFG)
    # duplicate rows share semantic ids -> p_unique < 1
    x_dup = jnp.concatenate([_x(4)] * 2, axis=0)
    losses = rqvae.forward(params, CFG, x_dup, gumbel_t=0.001, training=False)
    # earlier copy of each duplicate pair is counted non-unique: 4/8
    assert float(losses.p_unique_ids) <= 0.5 + 1e-6


def test_kmeans_prime_improves_quantization():
    params = rqvae.init(jax.random.PRNGKey(0), CFG)
    x = _x(512, seed=7)
    before = rqvae.forward(params, CFG, x, gumbel_t=0.001, training=False)
    primed = rqvae.kmeans_prime(params, CFG, x, jax.random.PRNGKey(1))
    after = rqvae.forward(primed, CFG, x, gumbel_t=0.001, training=False)
    assert float(after.rqvae_loss) < float(before.rqvae_loss)


@pytest.mark.slow
def test_training_reduces_loss():
    # rotation-trick estimator: deterministic forward -> crisp learning signal
    cfg = rqvae.RqVaeConfig(
        input_dim=18, embed_dim=16, hidden_dims=(18, 18), codebook_size=32,
        n_layers=3, n_cat_feats=0, codebook_kmeans_init=False,
        codebook_mode=QuantizeForwardMode.ROTATION_TRICK,
    )
    params = rqvae.init(jax.random.PRNGKey(0), cfg)
    # learnable structure: unit-norm data on a 4-dim manifold (mirrors the
    # real inputs — sentence-T5 embeddings are ~unit-norm, and the decoder's
    # final layer l2-normalizes, so targets must live on the sphere)
    rs = np.random.RandomState(3)
    z = rs.randn(128, 4)
    w = rs.randn(4, cfg.input_dim)
    x = (z @ w).astype(np.float32)
    x = jnp.asarray(x / np.linalg.norm(x, axis=1, keepdims=True))
    params = rqvae.kmeans_prime(params, cfg, x, jax.random.PRNGKey(1))
    opt = optax.adamw(1e-3, weight_decay=0.01)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            return rqvae.forward(p, cfg, x, gumbel_t=0.2, training=True, rng=rng).loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(2)
    losses = []
    for i in range(150):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    head = np.mean(losses[:10])
    tail = np.mean(losses[-10:])
    assert tail < head * 0.8, (head, tail)


def test_gradients_flow_to_all_params():
    params = rqvae.init(jax.random.PRNGKey(0), CFG)
    x = _x()

    def loss_fn(p):
        return rqvae.forward(
            p, CFG, x, gumbel_t=0.2, training=True, rng=jax.random.PRNGKey(5)
        ).loss

    grads = jax.grad(loss_fn)(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    for g in flat:
        assert np.isfinite(np.asarray(g)).all()
    # every codebook receives gradient through the quantize loss
    for l in range(3):
        assert np.abs(np.asarray(grads["layers"][l]["codebook"])).max() > 0


def test_rotation_mode_end_to_end():
    cfg = rqvae.RqVaeConfig(
        input_dim=18, embed_dim=16, hidden_dims=(18, 18), codebook_size=32,
        n_layers=3, n_cat_feats=0, codebook_mode=QuantizeForwardMode.ROTATION_TRICK,
    )
    params = rqvae.init(jax.random.PRNGKey(0), cfg)
    losses = rqvae.forward(
        params, cfg, _x(), gumbel_t=0.2, training=True, rng=jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(losses.loss))


def test_cat_feats_loss():
    cfg = rqvae.RqVaeConfig(
        input_dim=18, embed_dim=16, hidden_dims=(18, 18), codebook_size=32,
        n_layers=3, n_cat_feats=4,
    )
    params = rqvae.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    x = np.concatenate(
        [rng.randn(8, 14), (rng.rand(8, 4) > 0.5).astype(np.float32)], axis=1
    ).astype(np.float32)
    losses = rqvae.forward(params, cfg, jnp.asarray(x), gumbel_t=0.001, training=False)
    assert np.isfinite(float(losses.loss))
