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
