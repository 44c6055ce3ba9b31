"""Model-only export/import round-trips for both model families."""
import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.models import io as model_io
from rqvae_tpu.models import retrieval, rqvae
from rqvae_tpu.models.retrieval import RetrievalConfig
from rqvae_tpu.models.rqvae import RqVaeConfig


def _trees_equal(a, b):
    return all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_rqvae_roundtrip(tmp_path):
    cfg = RqVaeConfig(input_dim=18, embed_dim=8, hidden_dims=(16,),
                      codebook_size=16, n_layers=2, n_cat_feats=0)
    params = rqvae.init(jax.random.PRNGKey(0), cfg)
    model_io.save_pretrained(str(tmp_path / "m"), params, cfg)
    params2, cfg2 = model_io.load_pretrained(str(tmp_path / "m"))
    assert cfg2 == cfg
    assert _trees_equal(params, params2)
    x = jnp.ones((4, 18))
    np.testing.assert_array_equal(
        np.asarray(rqvae.get_semantic_ids(params, cfg, x).sem_ids),
        np.asarray(rqvae.get_semantic_ids(params2, cfg2, x).sem_ids),
    )


def test_retrieval_roundtrip(tmp_path):
    cfg = RetrievalConfig(embedding_dim=8, attn_dim=16, dropout=0.0,
                          num_heads=2, n_layers=2, num_embeddings=16,
                          sem_id_dim=3, max_pos=12, mlp_hidden_dim=32)
    params = retrieval.init(jax.random.PRNGKey(1), cfg)
    model_io.save_pretrained(str(tmp_path / "d"), params, cfg)
    params2, cfg2 = model_io.load_pretrained(str(tmp_path / "d"))
    assert cfg2 == cfg
    assert _trees_equal(params, params2)
