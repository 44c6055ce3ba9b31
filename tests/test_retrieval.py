"""Tests for the retrieval model (models/retrieval.py)."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np
import optax

from rqvae_tpu.data.schemas import TokenizedSeqBatch
from rqvae_tpu.models import retrieval
from rqvae_tpu.models.retrieval import RetrievalConfig

CFG = RetrievalConfig(
    embedding_dim=16, attn_dim=32, dropout=0.0, num_heads=4, n_layers=4,
    num_embeddings=32, sem_id_dim=4, max_pos=20, input_dropout=0.0,
    mlp_hidden_dim=64,
)


def _batch(b=6, n_items=5, d=4, k=32, seed=0, n_valid=None):
    rng = np.random.RandomState(seed)
    n = n_items * d
    sem_ids = rng.randint(0, k, size=(b, n)).astype(np.int32)
    if n_valid is None:
        n_valid = np.full(b, n_items)
    mask_items = np.arange(n_items)[None, :] < np.asarray(n_valid)[:, None]
    seq_mask = np.repeat(mask_items, d, axis=1)
    sem_ids = np.where(seq_mask, sem_ids, -1)
    return TokenizedSeqBatch(
        user_ids=jnp.asarray(rng.randint(0, 5000, size=(b,)).astype(np.int32)),
        sem_ids=jnp.asarray(sem_ids),
        sem_ids_fut=jnp.asarray(rng.randint(0, k, size=(b, d)).astype(np.int32)),
        seq_mask=jnp.asarray(seq_mask),
        token_type_ids=jnp.asarray(np.tile(np.arange(d, dtype=np.int32), (b, n_items))),
        token_type_ids_fut=jnp.asarray(np.tile(np.arange(d, dtype=np.int32), (b, 1))),
    )


def test_forward_shapes():
    params = retrieval.init(jax.random.PRNGKey(0), CFG)
    out = retrieval.forward(params, CFG, _batch())
    assert out.logits.shape == (6, 4, 32)
    assert out.loss_d.shape == (4,)
    assert np.isfinite(float(out.loss))
    # untrained CE should be near log(K) per position
    assert abs(float(out.loss) / 4 - np.log(32)) < 1.5


def test_loss_composition():
    params = retrieval.init(jax.random.PRNGKey(0), CFG)
    batch = _batch()
    out = retrieval.forward(params, CFG, batch)
    logp = np.asarray(jax.nn.log_softmax(out.logits.astype(jnp.float32), axis=-1))
    tgt = np.asarray(batch.sem_ids_fut)
    nll = -np.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    np.testing.assert_allclose(float(out.loss), nll.sum(1).mean(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.loss_d), nll.mean(0), rtol=1e-5)


def test_ignore_index():
    params = retrieval.init(jax.random.PRNGKey(0), CFG)
    batch = _batch()
    batch = batch._replace(
        sem_ids_fut=batch.sem_ids_fut.at[:, 2].set(-1)
    )
    out = retrieval.forward(params, CFG, batch)
    assert float(out.loss_d[2]) == 0.0


def test_padding_invariance():
    """Features at masked history positions must not affect the loss."""
    params = retrieval.init(jax.random.PRNGKey(0), CFG)
    b1 = _batch(n_valid=[5, 3, 1, 4, 2, 5])
    # change the sem_ids at masked slots to junk values
    junk = np.asarray(b1.sem_ids).copy()
    junk[~np.asarray(b1.seq_mask)] = 7
    b2 = b1._replace(sem_ids=jnp.asarray(junk))
    o1 = retrieval.forward(params, CFG, b1)
    o2 = retrieval.forward(params, CFG, b2)
    # invalid ids map to the padding row regardless of value, so identical
    np.testing.assert_allclose(float(o1.loss), float(o2.loss), rtol=1e-6)


def test_generate_step_matches_forward_last_position():
    """The generation-step logits for a fut prefix of length j must equal the
    training-forward logits at position j (teacher forcing consistency)."""
    params = retrieval.init(jax.random.PRNGKey(0), CFG)
    batch = _batch()
    full = retrieval.forward(params, CFG, batch)
    # prefix of length 2 -> logits for position 2
    prefix = batch._replace(
        sem_ids_fut=batch.sem_ids_fut[:, :2],
        token_type_ids_fut=batch.token_type_ids_fut[:, :2],
    )
    logits, context = retrieval.forward_generate_step(params, CFG, prefix)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full.logits[:, 2]), rtol=1e-4, atol=1e-5
    )
    # and the BOS-only step matches position 0
    bos_only = batch._replace(sem_ids_fut=None, token_type_ids_fut=None)
    logits0, _ = retrieval.forward_generate_step(params, CFG, bos_only)
    np.testing.assert_allclose(
        np.asarray(logits0), np.asarray(full.logits[:, 0]), rtol=1e-4, atol=1e-5
    )
    # cached context reproduces the fresh result
    logits_c, _ = retrieval.forward_generate_step(
        params, CFG, prefix, cached_context=context
    )
    np.testing.assert_allclose(np.asarray(logits_c), np.asarray(logits), rtol=1e-5)


def test_training_reduces_loss():
    params = retrieval.init(jax.random.PRNGKey(0), CFG)
    batch = _batch(b=16, seed=3)
    opt = optax.adamw(1e-3, weight_decay=0.01)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, r):
        def lf(pp):
            return retrieval.forward(pp, CFG, batch, training=True, rng=r).loss

        l, g = jax.value_and_grad(lf)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(60):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])


@pytest.mark.slow
def test_gradient_reaches_sem_emb():
    """Mirrors the reference's gradient-presence assert (train_decoder.py:197)."""
    params = retrieval.init(jax.random.PRNGKey(0), CFG)
    g = jax.grad(lambda p: retrieval.forward(p, CFG, _batch()).loss)(params)
    assert np.abs(np.asarray(g["sem_emb"])).max() > 0
    assert np.abs(np.asarray(g["wpe"])).max() > 0
    assert np.abs(np.asarray(g["bos"])).max() > 0
