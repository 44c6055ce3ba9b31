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


def test_push_to_hub_uploads_export_dir(tmp_path, monkeypatch):
    """Hub publish wraps huggingface_hub (reference parity:
    PyTorchModelHubMixin push, modules/rqvae.py:13,37)."""
    import huggingface_hub

    cfg = RqVaeConfig(input_dim=18, embed_dim=8, hidden_dims=(16,),
                      codebook_size=16, n_layers=2, n_cat_feats=0)
    params = rqvae.init(jax.random.PRNGKey(0), cfg)
    export = str(tmp_path / "export")
    model_io.save_pretrained(export, params, cfg)

    calls = {}

    class FakeApi:
        def __init__(self, token=None):
            calls["token"] = token

        def create_repo(self, repo_id, private, exist_ok):
            calls["create"] = (repo_id, private, exist_ok)

        def upload_folder(self, folder_path, repo_id):
            calls["upload"] = (folder_path, repo_id)

    monkeypatch.setattr(huggingface_hub, "HfApi", FakeApi)
    url = model_io.push_to_hub(export, "me/rqvae-test")
    assert url == "https://huggingface.co/me/rqvae-test"
    assert calls["create"] == ("me/rqvae-test", True, True)
    assert calls["upload"] == (export, "me/rqvae-test")


def test_load_pretrained_auto_hub_fallback(tmp_path, monkeypatch):
    """A non-directory path is treated as a hub repo id and
    snapshot-downloaded, then read as a local export directory."""
    import huggingface_hub

    cfg = RqVaeConfig(input_dim=18, embed_dim=8, hidden_dims=(16,),
                      codebook_size=16, n_layers=2, n_cat_feats=0)
    params = rqvae.init(jax.random.PRNGKey(0), cfg)
    export = str(tmp_path / "snapshot")
    model_io.save_pretrained(export, params, cfg)

    def fake_snapshot(repo, token=None, revision=None):
        assert repo == "me/rqvae-test"
        return export

    monkeypatch.setattr(huggingface_hub, "snapshot_download", fake_snapshot)
    params2, cfg2 = model_io.load_pretrained_auto("me/rqvae-test")
    assert cfg2 == cfg
    assert _trees_equal(params, params2)

    # local directories never touch the hub
    params3, cfg3 = model_io.load_pretrained_auto(export)
    assert cfg3 == cfg
