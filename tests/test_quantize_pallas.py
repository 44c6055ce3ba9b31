"""Parity: fused Pallas RQ kernel vs the plain-jnp reference quantizer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rqvae_tpu.models import quantize, rqvae
from rqvae_tpu.models.rqvae import RqVaeConfig
from rqvae_tpu.ops import quantize_pallas


def _jnp_reference(x, codebooks, commitment_weight):
    """Eval-mode residual quantization via the module-level reference."""
    res = x
    ids, emb_sum = [], jnp.zeros_like(x)
    loss = jnp.zeros(x.shape[:-1], jnp.float32)
    for level in range(codebooks.shape[0]):
        out = quantize.apply(
            {"codebook": codebooks[level]},
            res,
            temperature=0.001,
            training=False,
            commitment_weight=commitment_weight,
        )
        ids.append(out.ids)
        emb_sum = emb_sum + out.embeddings
        loss = loss + out.loss
        res = res - out.embeddings
    return jnp.stack(ids, axis=-1), emb_sum, res, loss


@pytest.mark.parametrize("b,d,k,l", [(64, 32, 256, 3), (37, 16, 32, 2)])
def test_rq_tokenize_matches_jnp(b, d, k, l):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, d).astype(np.float32))
    cbs = jnp.asarray(rng.randn(l, k, d).astype(np.float32))

    out = quantize_pallas.rq_tokenize(x, cbs, commitment_weight=0.25,
                                      block_b=32)
    ref_ids, ref_emb, ref_res, ref_loss = _jnp_reference(x, cbs, 0.25)

    np.testing.assert_array_equal(np.asarray(out.sem_ids), np.asarray(ref_ids))
    np.testing.assert_allclose(np.asarray(out.emb_sum), np.asarray(ref_emb),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.residual), np.asarray(ref_res),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.loss), np.asarray(ref_loss),
                               rtol=1e-4, atol=1e-4)


def test_rq_tokenize_tail_block_padding():
    """B not divisible by block_b: padded rows must not leak into outputs."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(70, 8).astype(np.float32))
    cbs = jnp.asarray(rng.randn(3, 16, 8).astype(np.float32))
    out = quantize_pallas.rq_tokenize(x, cbs, block_b=32)
    ref_ids, _, _, _ = _jnp_reference(x, cbs, 0.25)
    assert out.sem_ids.shape == (70, 3)
    np.testing.assert_array_equal(np.asarray(out.sem_ids), np.asarray(ref_ids))


def test_encode_and_tokenize_matches_get_semantic_ids():
    """Full path through the encoder MLP + effective codebooks (incl. SimVQ)."""
    cfg = RqVaeConfig(
        input_dim=18, embed_dim=16, hidden_dims=(18, 18), codebook_size=32,
        n_layers=3, n_cat_feats=0, codebook_sim_vq=True,
    )
    params = rqvae.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(2).randn(50, 18).astype(np.float32))
    fused = rqvae.encode_and_tokenize(params, cfg, x)
    ref = rqvae.get_semantic_ids(params, cfg, x).sem_ids
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_encode_and_tokenize_normalized_codebook():
    cfg = RqVaeConfig(
        input_dim=18, embed_dim=16, hidden_dims=(18,), codebook_size=32,
        n_layers=3, n_cat_feats=0, codebook_normalize=True,
    )
    params = rqvae.init(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray(np.random.RandomState(4).randn(33, 18).astype(np.float32))
    fused = rqvae.encode_and_tokenize(params, cfg, x)
    ref = rqvae.get_semantic_ids(params, cfg, x).sem_ids
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


# ---------------------------------------------------------------------------
# Fused TRAINING path (rq_quantize_train custom VJP)
# ---------------------------------------------------------------------------

def _jnp_train_loop(params, cfg, x, mode):
    """The plain-jnp training loop (models/quantize.apply per level) — the
    semantic reference the fused kernel's values AND grads must match."""
    res = rqvae.encode(params, cfg, x)
    embs, q_loss = [], 0.0
    from rqvae_tpu.models import quantize as q

    for level in range(cfg.n_layers):
        out = q.apply(
            params["layers"][level], res, temperature=0.2, mode=mode,
            commitment_weight=cfg.commitment_weight, training=True,
        )
        q_loss = q_loss + out.loss
        res = res - out.embeddings
        embs.append(out.embeddings)
    return jnp.stack(embs, axis=-1), q_loss


def _fused_train(params, cfg, x):
    res = rqvae.encode(params, cfg, x)
    out = quantize_pallas.rq_quantize_train(
        res, rqvae.effective_codebooks(params, cfg),
        cfg.codebook_mode.name, cfg.commitment_weight, 512, True,
    )
    return out.embeddings, out.quantize_loss


@pytest.mark.parametrize("mode_name", ["STE", "ROTATION_TRICK"])
def test_rq_train_values_and_grads_match_jnp(mode_name):
    from rqvae_tpu.models.quantize import QuantizeForwardMode

    mode = QuantizeForwardMode[mode_name]
    cfg = RqVaeConfig(
        input_dim=18, embed_dim=16, hidden_dims=(18, 18), codebook_size=32,
        n_layers=3, n_cat_feats=0, codebook_mode=mode,
    )
    params = rqvae.init(jax.random.PRNGKey(5), cfg)
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(40, 18).astype(np.float32))
    w = jnp.asarray(rng.randn(16, 4).astype(np.float32))

    def scalar_loss(fn):
        def inner(p, xx):
            embs, q_loss = fn(p, cfg, xx)
            # exercise the emb-gradient path with a decoder-like readout
            z = jnp.sum(embs, axis=-1) @ w
            return jnp.mean(jnp.sum(z * z, axis=-1)) + jnp.mean(q_loss)
        return inner

    ref_fn = scalar_loss(lambda p, c, xx: _jnp_train_loop(p, c, xx, mode))
    fused_fn = scalar_loss(_fused_train)

    ref_val, ref_grads = jax.value_and_grad(ref_fn, argnums=(0, 1))(params, x)
    fus_val, fus_grads = jax.value_and_grad(fused_fn, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(float(ref_val), float(fus_val), rtol=1e-5)
    # atol 5e-5: the rotation-trick backward reassociates the fp32 vector
    # chain; observed max deviation ~3e-5 on isolated encoder-weight elements
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=5e-5
        ),
        ref_grads, fus_grads,
    )


@pytest.mark.parametrize("mode_name", ["STE", "ROTATION_TRICK"])
def test_fused_training_path_in_model_matches_jnp(mode_name, monkeypatch):
    """rqvae.forward with the fused path forced on == the jnp loop (values
    and grads), i.e. flipping pallas_enabled cannot change training."""
    from rqvae_tpu.models.quantize import QuantizeForwardMode
    from rqvae_tpu.ops import dispatch

    mode = QuantizeForwardMode[mode_name]
    cfg = RqVaeConfig(
        input_dim=18, embed_dim=16, hidden_dims=(18,), codebook_size=32,
        n_layers=3, n_cat_feats=0, codebook_mode=mode,
    )
    params = rqvae.init(jax.random.PRNGKey(7), cfg)
    x = jnp.asarray(np.random.RandomState(8).randn(24, 18).astype(np.float32))

    def loss_fn(p, xx):
        return rqvae.forward(p, cfg, xx, gumbel_t=0.2, training=True).loss

    v_ref, g_ref = jax.value_and_grad(loss_fn)(params, x)

    monkeypatch.setattr(dispatch, "pallas_enabled", lambda: True)
    monkeypatch.setattr(
        quantize_pallas, "use_interpret", lambda: True
    )
    # the size heuristic would route this tiny test config to jnp
    monkeypatch.setattr(rqvae, "FUSED_TRAIN_MIN_CODEBOOK_VOLUME", 0)
    v_fus, g_fus = jax.value_and_grad(loss_fn)(params, x)
    np.testing.assert_allclose(float(v_ref), float(v_fus), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        g_ref, g_fus,
    )
