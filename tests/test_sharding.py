"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Standard JAX pattern for validating pjit/GSPMD programs without a pod
(SURVEY.md §4 plan (d)): data parallelism must be numerically equivalent to
single-device execution; tensor-parallel shardings must compile and run.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from rqvae_tpu.data.schemas import TokenizedSeqBatch
from rqvae_tpu.models import retrieval
from rqvae_tpu.models import rqvae as rqvae_lib
from rqvae_tpu.models.retrieval import RetrievalConfig
from rqvae_tpu.parallel import mesh as mesh_lib

VAE_CFG = rqvae_lib.RqVaeConfig(
    input_dim=16, embed_dim=8, hidden_dims=(16,), codebook_size=16,
    n_layers=3, n_cat_feats=0,
)

RET_CFG = RetrievalConfig(
    embedding_dim=16, attn_dim=32, dropout=0.0, num_heads=4, n_layers=4,
    num_embeddings=16, sem_id_dim=4, max_pos=16, input_dropout=0.0,
    mlp_hidden_dim=64,
)


def test_mesh_shapes(cpu_devices):
    m = mesh_lib.make_mesh()
    assert m.devices.shape == (8, 1)
    m2 = mesh_lib.make_mesh((4, 2))
    assert m2.devices.shape == (4, 2)
    assert m2.axis_names == ("data", "model")


def test_dp_rqvae_grads_match_single_device(cpu_devices):
    """Grad of the data-sharded loss == grad of the unsharded loss."""
    mesh = mesh_lib.make_mesh()
    params = rqvae_lib.init(jax.random.PRNGKey(0), VAE_CFG)
    x = jnp.asarray(np.random.RandomState(0).randn(32, 16).astype(np.float32))

    def loss_fn(p, xx):
        return rqvae_lib.forward(p, VAE_CFG, xx, gumbel_t=0.001, training=False).loss

    g_single = jax.grad(loss_fn)(params, x)

    params_sh = jax.device_put(params, mesh_lib.dp_param_shardings(params, mesh))
    x_sh = mesh_lib.shard_batch(x, mesh)
    g_dp = jax.jit(jax.grad(loss_fn))(params_sh, x_sh)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        g_single, g_dp,
    )


def _tok_batch(b=16, n_items=4, d=4, k=16, seed=0):
    rng = np.random.RandomState(seed)
    n = n_items * d
    return TokenizedSeqBatch(
        user_ids=jnp.asarray(np.arange(b, dtype=np.int32)),
        sem_ids=jnp.asarray(rng.randint(0, k, (b, n)).astype(np.int32)),
        sem_ids_fut=jnp.asarray(rng.randint(0, k, (b, d)).astype(np.int32)),
        seq_mask=jnp.ones((b, n), dtype=bool),
        token_type_ids=jnp.asarray(np.tile(np.arange(d, dtype=np.int32), (b, n_items))),
        token_type_ids_fut=jnp.asarray(np.tile(np.arange(d, dtype=np.int32), (b, 1))),
    )


def test_dp_decoder_loss_matches_single_device(cpu_devices):
    mesh = mesh_lib.make_mesh()
    params = retrieval.init(jax.random.PRNGKey(0), RET_CFG)
    batch = _tok_batch()
    loss_single = retrieval.forward(params, RET_CFG, batch).loss

    params_sh = jax.device_put(params, mesh_lib.dp_param_shardings(params, mesh))
    batch_sh = mesh_lib.shard_batch(batch, mesh)
    loss_dp = jax.jit(
        lambda p, b: retrieval.forward(p, RET_CFG, b).loss
    )(params_sh, batch_sh)
    np.testing.assert_allclose(float(loss_single), float(loss_dp), rtol=1e-5)


def test_tp_shardings_compile_and_match(cpu_devices):
    """Tensor-parallel param shardings on a (4, 2) mesh: same loss, and the
    sem-ID table really lands sharded over 'model'."""
    mesh = mesh_lib.make_mesh((4, 2))
    params = retrieval.init(jax.random.PRNGKey(0), RET_CFG)
    batch = _tok_batch()
    loss_single = retrieval.forward(params, RET_CFG, batch).loss

    shardings = mesh_lib.tp_param_shardings(params, mesh)
    assert shardings["sem_emb"].spec == P("model", None)
    params_sh = jax.device_put(params, shardings)
    batch_sh = mesh_lib.shard_batch(batch, mesh)
    loss_tp = jax.jit(
        lambda p, b: retrieval.forward(p, RET_CFG, b).loss
    )(params_sh, batch_sh)
    np.testing.assert_allclose(float(loss_single), float(loss_tp), rtol=1e-4)

    # the table shards actually live on distinct devices along 'model'
    db = params_sh["sem_emb"].sharding.device_set
    assert len(db) == 8


def test_tp_train_step_runs(cpu_devices):
    """One AdamW step with TP params + DP batch compiles and stays finite."""
    mesh = mesh_lib.make_mesh((4, 2))
    params = retrieval.init(jax.random.PRNGKey(0), RET_CFG)
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    params = jax.device_put(params, mesh_lib.tp_param_shardings(params, mesh))
    batch = mesh_lib.shard_batch(_tok_batch(), mesh)

    @jax.jit
    def step(p, s, b):
        loss, g = jax.value_and_grad(
            lambda pp: retrieval.forward(pp, RET_CFG, b).loss
        )(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    params, opt_state, loss = step(params, opt_state, batch)
    assert np.isfinite(float(loss))


def test_full_dp_train_loop_on_mesh(cpu_devices, tmp_path):
    """The real train loop runs on the 8-device mesh (mesh_shape=(8,1))."""
    from rqvae_tpu.train import train_rqvae
    from rqvae_tpu.utils.config import from_dict

    cfg = from_dict(train_rqvae.RqVaeTrainConfig, dict(
        iterations=10, batch_size=32, dataset="SYNTHETIC",
        vae_input_dim=16, vae_hidden_dims=(16,), vae_embed_dim=8,
        vae_codebook_size=16, vae_n_cat_feats=0,
        eval_every=1000, save_model_every=1000,
        save_dir_root=str(tmp_path / "o"), synthetic_n_items=128,
        synthetic_n_users=64, kmeans_prime_items=128, do_eval=False,
        mesh_shape=(8, 1), log_every=5,
    ))

    class Collect:
        records = []

        def log(self, step, metrics, force=False):
            self.records.append(metrics)

    train_rqvae.train(cfg, logger=Collect())
    assert Collect.records
    assert np.isfinite(Collect.records[-1]["total_loss"])
