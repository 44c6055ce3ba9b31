"""Mixed precision: bf16 compute keeps fp32 master params and finite losses."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.data.schemas import SeqBatch
from rqvae_tpu.models import retrieval, rqvae
from rqvae_tpu.models.retrieval import RetrievalConfig
from rqvae_tpu.models.rqvae import RqVaeConfig
from rqvae_tpu.tokenizer import semids
from rqvae_tpu.train import optim
from rqvae_tpu.train.train_decoder import make_train_step as decoder_step
from rqvae_tpu.train.train_rqvae import make_train_step as rqvae_step
from rqvae_tpu.utils import amp

pytestmark = pytest.mark.slow  # heavy end-to-end/train-loop suite (run: pytest -m slow)


def test_cast_floating_leaves_ints_alone():
    tree = {"w": jnp.ones((2, 2), jnp.float32), "i": jnp.ones((2,), jnp.int32)}
    out = amp.cast_floating(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["i"].dtype == jnp.int32


def _decoder_fixtures():
    cfg = RetrievalConfig(
        embedding_dim=16, attn_dim=32, dropout=0.1, num_heads=4, n_layers=4,
        num_embeddings=32, sem_id_dim=4, max_pos=16, mlp_hidden_dim=64,
    )
    rng = np.random.RandomState(0)
    cached = np.concatenate(
        [rng.randint(0, 8, (64, 3)), np.zeros((64, 1), int)], axis=1
    ).astype(np.int32)
    index = semids.build_index(jnp.asarray(cached), codebook_size=32)
    b, n = 8, 4
    ids = rng.randint(0, 64, (1, b, n)).astype(np.int32)
    batch = SeqBatch(
        user_ids=jnp.asarray(np.arange(b, dtype=np.int32)[None]),
        ids=jnp.asarray(ids),
        ids_fut=jnp.asarray(rng.randint(0, 64, (1, b, 1)).astype(np.int32)),
        x=jnp.zeros((1, b, n, 1)),
        x_fut=jnp.zeros((1, b, 1, 1)),
        seq_mask=jnp.ones((1, b, n), dtype=bool),
    )
    return cfg, index, batch


def test_decoder_train_step_bf16_finite_and_fp32_state():
    cfg, index, batch = _decoder_fixtures()
    params = retrieval.init(jax.random.PRNGKey(0), cfg)
    opt = optim.adamw(1e-3, 0.01)
    opt_state = opt.init(params)
    step = jax.jit(decoder_step(cfg, opt, index, 1, jnp.bfloat16, 4))
    for i in range(3):
        params, opt_state, metrics = step(
            params, opt_state, batch, jax.random.PRNGKey(i)
        )
    loss = float(metrics["total_loss"])
    assert np.isfinite(loss)
    # master params remain fp32 after updates
    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(params)
        if jnp.issubdtype(leaf.dtype, jnp.floating)
    )


def test_decoder_bf16_loss_close_to_fp32():
    cfg, index, batch = _decoder_fixtures()
    params = retrieval.init(jax.random.PRNGKey(0), cfg)
    opt = optim.adamw(1e-3, 0.01)
    s32 = jax.jit(decoder_step(cfg, opt, index, 1, jnp.float32, 4))
    s16 = jax.jit(decoder_step(cfg, opt, index, 1, jnp.bfloat16, 4))
    _, _, m32 = s32(params, opt.init(params), batch, jax.random.PRNGKey(0))
    _, _, m16 = s16(params, opt.init(params), batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(m32["total_loss"]), float(m16["total_loss"]), rtol=0.05
    )


def test_decoder_grad_accum_matches_single_step():
    """accum=2 over a duplicated microbatch == accum=1 on that batch (same
    rng per microbatch is not required — compare via duplicated batch +
    deterministic dropout-free config)."""
    cfg, index, batch = _decoder_fixtures()
    cfg = cfg.__class__(**{**cfg.__dict__, "dropout": 0.0, "input_dropout": 0.0})
    params = retrieval.init(jax.random.PRNGKey(0), cfg)
    opt = optim.adamw(1e-3, 0.01)
    dup = jax.tree.map(lambda x: jnp.concatenate([x, x], axis=0), batch)

    s1 = jax.jit(decoder_step(cfg, opt, index, 1, jnp.float32, 4))
    s2 = jax.jit(decoder_step(cfg, opt, index, 2, jnp.float32, 4))
    p1, _, m1 = s1(params, opt.init(params), batch, jax.random.PRNGKey(0))
    p2, _, m2 = s2(params, opt.init(params), dup, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(m1["total_loss"]), float(m2["total_loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_rqvae_train_step_bf16_finite():
    cfg = RqVaeConfig(
        input_dim=18, embed_dim=16, hidden_dims=(18, 18), codebook_size=32,
        n_layers=3, n_cat_feats=0,
    )
    params = rqvae.init(jax.random.PRNGKey(0), cfg)
    opt = optim.adamw(1e-3, 0.01)
    opt_state = opt.init(params)
    step = jax.jit(rqvae_step(cfg, opt, 1, jnp.bfloat16))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 18), jnp.float32)
    for i in range(3):
        params, opt_state, metrics = step(
            params, opt_state, x, jax.random.PRNGKey(i), jnp.float32(0.2)
        )
    assert np.isfinite(float(metrics["total_loss"]))
    assert params["layers"][0]["codebook"].dtype == jnp.float32
