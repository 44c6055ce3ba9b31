"""Tests for the encoder-decoder transformer (models/transformer.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.models import transformer
from rqvae_tpu.models.transformer import TransformerConfig

CFG = TransformerConfig(
    d_model=32, num_heads=4, dropout=0.0, encoder_layers=2, decoder_layers=2,
    mlp_hidden_dim=64,
)


def _data(b=3, nf=5, nc=9, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, nf, 32).astype(np.float32))
    ctx = jnp.asarray(rng.randn(b, nc, 32).astype(np.float32))
    lengths = np.array([9, 5, 1])
    mask = jnp.asarray(np.arange(nc)[None, :] < lengths[:, None])
    return x, ctx, mask


def test_shapes_and_finite():
    params = transformer.init(jax.random.PRNGKey(0), CFG)
    x, ctx, mask = _data()
    out, context = transformer.apply(params, CFG, x, ctx, mask)
    assert out.shape == (3, 5, 32)
    assert context.shape == (3, 9, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_decoder_causality():
    """Perturbing future-side position j must not change outputs at i < j."""
    params = transformer.init(jax.random.PRNGKey(0), CFG)
    x, ctx, mask = _data()
    out1, _ = transformer.apply(params, CFG, x, ctx, mask)
    x2 = x.at[:, 3, :].add(10.0)
    out2, _ = transformer.apply(params, CFG, x2, ctx, mask)
    np.testing.assert_allclose(
        np.asarray(out1[:, :3]), np.asarray(out2[:, :3]), rtol=1e-4, atol=1e-5
    )
    assert np.abs(np.asarray(out1[:, 3:]) - np.asarray(out2[:, 3:])).max() > 1e-3


def test_padding_invariance():
    """Changing context features at masked positions must not change anything."""
    params = transformer.init(jax.random.PRNGKey(0), CFG)
    x, ctx, mask = _data()
    out1, _ = transformer.apply(params, CFG, x, ctx, mask)
    noise = jnp.asarray(np.random.RandomState(1).randn(3, 9, 32).astype(np.float32))
    ctx2 = jnp.where(np.asarray(mask)[:, :, None], ctx, ctx + 100.0 * noise)
    out2, _ = transformer.apply(params, CFG, x, ctx2, mask)
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out2), rtol=1e-4, atol=1e-4
    )


def test_cached_context_matches_fresh():
    params = transformer.init(jax.random.PRNGKey(0), CFG)
    x, ctx, mask = _data()
    out1, context = transformer.apply(params, CFG, x, ctx, mask)
    out2, _ = transformer.apply(params, CFG, x, ctx, mask, cached_context=context)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5)


def test_encoder_not_causal():
    """Encoder context position 0 output must depend on later valid positions."""
    params = transformer.init(jax.random.PRNGKey(0), CFG)
    _, ctx, _ = _data()
    mask = jnp.ones((3, 9), dtype=bool)
    enc1 = transformer.encode(params, CFG, ctx, mask)
    ctx2 = ctx.at[:, 8, :].add(10.0)
    enc2 = transformer.encode(params, CFG, ctx2, mask)
    assert np.abs(np.asarray(enc1[:, 0]) - np.asarray(enc2[:, 0])).max() > 1e-4


def test_dropout_train_vs_eval():
    cfg = TransformerConfig(
        d_model=32, num_heads=4, dropout=0.5, encoder_layers=1, decoder_layers=1,
        mlp_hidden_dim=64,
    )
    params = transformer.init(jax.random.PRNGKey(0), cfg)
    x, ctx, mask = _data()
    out_eval, _ = transformer.apply(params, cfg, x, ctx, mask, training=False)
    out_train, _ = transformer.apply(
        params, cfg, x, ctx, mask, training=True, rng=jax.random.PRNGKey(1)
    )
    assert np.abs(np.asarray(out_eval) - np.asarray(out_train)).max() > 1e-3
    # eval is deterministic
    out_eval2, _ = transformer.apply(params, cfg, x, ctx, mask, training=False)
    np.testing.assert_allclose(np.asarray(out_eval), np.asarray(out_eval2))


def test_jit_apply():
    params = transformer.init(jax.random.PRNGKey(0), CFG)
    x, ctx, mask = _data()
    f = jax.jit(lambda p, a, b, m: transformer.apply(p, CFG, a, b, m))
    out, _ = f(params, x, ctx, mask)
    assert np.isfinite(np.asarray(out)).all()
