"""Tests for constrained beam search (models/generation.py) and eval metrics."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.data.schemas import TokenizedSeqBatch
from rqvae_tpu.evaluate.metrics import TopKAccumulator
from rqvae_tpu.models import generation, retrieval
from rqvae_tpu.models.retrieval import RetrievalConfig
from rqvae_tpu.tokenizer import semids

CFG = RetrievalConfig(
    embedding_dim=16, attn_dim=32, dropout=0.0, num_heads=4, n_layers=4,
    num_embeddings=32, sem_id_dim=4, max_pos=20, input_dropout=0.0,
    mlp_hidden_dim=64,
)


def _index(n_items=60, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(0, 8, size=(n_items, 3)).astype(np.int32)
    dedup = np.asarray(semids.dedup_column(jnp.asarray(ids), 32))
    cached = np.concatenate([ids, dedup[:, None]], axis=1).astype(np.int32)
    return semids.build_index(jnp.asarray(cached), codebook_size=32)


def _batch(b=4, n_items=5, d=4, k=32, seed=1):
    rng = np.random.RandomState(seed)
    n = n_items * d
    sem_ids = rng.randint(0, 8, size=(b, n)).astype(np.int32)
    seq_mask = np.ones((b, n), dtype=bool)
    return TokenizedSeqBatch(
        user_ids=jnp.asarray(np.arange(b, dtype=np.int32)),
        sem_ids=jnp.asarray(sem_ids),
        sem_ids_fut=None,
        seq_mask=jnp.asarray(seq_mask),
        token_type_ids=jnp.asarray(np.tile(np.arange(d, dtype=np.int32), (b, n_items))),
        token_type_ids_fut=None,
    )


@pytest.mark.parametrize("n_candidates", [16, 32])  # 32 == K: exhaustive path
@pytest.mark.slow
def test_generated_tuples_are_corpus_members(n_candidates):
    params = retrieval.init(jax.random.PRNGKey(0), CFG)
    index = _index()
    out = generation.generate_next_sem_ids(
        params, CFG, index, _batch(), jax.random.PRNGKey(2),
        k=8, n_candidates=n_candidates,
    )
    assert out.sem_ids.shape == (4, 8, 4)
    assert out.log_probas.shape == (4, 8)
    cached = np.asarray(index.cached_ids)
    gen = np.asarray(out.sem_ids).reshape(-1, 4)
    # corpus has 60 items with 8^3 possible prefixes: beams with sane scores
    # (no -10000 penalty) must be real corpus members
    scores = np.asarray(out.log_probas).reshape(-1)
    for row, s in zip(gen, scores):
        if s > generation.INVALID_PENALTY / 2:
            assert any((cached == row).all(axis=1)), row


@pytest.mark.parametrize("n_candidates", [16, 32])  # 32 == K: exhaustive path
def test_beams_sorted_and_unique(n_candidates):
    params = retrieval.init(jax.random.PRNGKey(0), CFG)
    index = _index()
    out = generation.generate_next_sem_ids(
        params, CFG, index, _batch(), jax.random.PRNGKey(3), k=8,
        n_candidates=n_candidates,
    )
    lp = np.asarray(out.log_probas)
    assert (np.diff(lp, axis=-1) <= 1e-6).all(), "beams must be score-sorted"
    # beams within a row are distinct tuples (sampling w/o replacement +
    # unique corpus tuples)
    for row in np.asarray(out.sem_ids):
        assert len(np.unique(row, axis=0)) == row.shape[0]


def test_generation_is_jittable_and_deterministic():
    params = retrieval.init(jax.random.PRNGKey(0), CFG)
    index = _index()
    batch = _batch()

    f = jax.jit(
        lambda p, bt, r: generation.generate_next_sem_ids(
            p, CFG, index, bt, r, k=4, n_candidates=8
        )
    )
    o1 = f(params, batch, jax.random.PRNGKey(5))
    o2 = f(params, batch, jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(o1.sem_ids), np.asarray(o2.sem_ids))


@pytest.mark.slow
def test_trained_model_recovers_target():
    """Overfit on a single target tuple -> the top beam must find it."""
    import optax

    params = retrieval.init(jax.random.PRNGKey(0), CFG)
    index = _index()
    cached = np.asarray(index.cached_ids)
    target = cached[7]  # an actual corpus tuple
    batch = _batch(b=4)
    train_batch = batch._replace(
        sem_ids_fut=jnp.asarray(np.tile(target, (4, 1)).astype(np.int32)),
        token_type_ids_fut=jnp.asarray(np.tile(np.arange(4, dtype=np.int32), (4, 1))),
    )
    opt = optax.adamw(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(
            lambda pp: retrieval.forward(pp, CFG, train_batch).loss
        )(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    for _ in range(150):
        params, state, loss = step(params, state)
    assert float(loss) < 0.1, float(loss)

    out = generation.generate_next_sem_ids(
        params, CFG, index, batch, jax.random.PRNGKey(9), k=4, n_candidates=16,
        temperature=1.0,
    )
    top1 = np.asarray(out.sem_ids)[:, 0, :]
    np.testing.assert_array_equal(top1, np.tile(target, (4, 1)))


def test_topk_accumulator_golden():
    acc = TopKAccumulator(ks=(1, 5))
    actual = np.array([[1, 2, 3, 0], [4, 5, 6, 0]], np.int32)
    # beams: row 0 has the exact item at rank 2; row 1 has no full match but
    # a correct position-0 token at rank 0
    beams = np.tile(np.array([[9, 9, 9, 9]], np.int32), (2, 5, 1))
    beams[0, 2] = [1, 2, 3, 0]
    beams[1, 0] = [4, 9, 9, 9]
    acc.accumulate(actual, beams)
    m = acc.reduce()
    assert m["h@5_slice_:4"] == 0.5   # exact item within top5: row0 only
    assert m["h@1_slice_:4"] == 0.0   # not at rank 0
    assert m["h@1_pos_0"] == 0.5      # row1 beam0 has pos0 right... row0 no
    assert m["h@5_pos_0"] == 1.0      # both rows have pos0 right in top5
    np.testing.assert_allclose(m["ndcg@5"], 0.5 * (1 / np.log2(2 + 2)))
    acc.reset()
    assert acc.total == 0


@pytest.mark.parametrize("n_candidates", [16, 32])  # 32 == K: exhaustive path
@pytest.mark.slow
def test_beam_scores_match_teacher_forced_logprobs(n_candidates):
    """log_probas must equal the sum of teacher-forced per-position log-probs
    for every valid beam — this locks the parent-gather bookkeeping (and, at
    n_candidates == K, the exhaustive branch's div/mod winner bookkeeping)."""
    params = retrieval.init(jax.random.PRNGKey(0), CFG)
    index = _index()
    batch = _batch(b=2)
    out = generation.generate_next_sem_ids(
        params, CFG, index, batch, jax.random.PRNGKey(11),
        k=4, n_candidates=n_candidates, temperature=1.0,
    )
    beams = np.asarray(out.sem_ids)      # (B, k, D)
    scores = np.asarray(out.log_probas)  # (B, k)
    b, k, d = beams.shape

    for bi in range(b):
        row_batch = jax.tree.map(
            lambda x: x[bi : bi + 1] if x is not None else None, batch,
            is_leaf=lambda x: x is None,
        )
        for ki in range(k):
            if scores[bi, ki] <= generation.INVALID_PENALTY / 2:
                continue  # penalized beam; score includes the -10000 term
            total = 0.0
            for pos in range(d):
                fut = (
                    jnp.asarray(beams[bi, ki, :pos][None].astype(np.int32))
                    if pos > 0 else None
                )
                tt = (
                    jnp.asarray(np.arange(pos, dtype=np.int32)[None])
                    if pos > 0 else None
                )
                logits, _ = retrieval.forward_generate_step(
                    params, CFG,
                    row_batch._replace(sem_ids_fut=fut, token_type_ids_fut=tt),
                )
                logp = jax.nn.log_softmax(
                    logits.astype(jnp.float32), axis=-1
                )
                total += float(logp[0, beams[bi, ki, pos]])
            np.testing.assert_allclose(scores[bi, ki], total, rtol=2e-4,
                                       atol=2e-4)


def test_cached_generation_matches_reference_path():
    """forward_generate_cached (KV cache + beam folding) must produce the
    same logits as the plain forward_generate_step at every position."""
    params = retrieval.init(jax.random.PRNGKey(0), CFG)
    batch = _batch(b=3)
    k = 2
    cache = retrieval.encode_for_generation(params, CFG, batch)

    # BOS step (beams=1)
    ref_logits, context = retrieval.forward_generate_step(params, CFG, batch)
    got = retrieval.forward_generate_cached(
        params, CFG, cache, None, None, beams=1, n_rows=3
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_logits),
                               rtol=1e-4, atol=1e-5)

    # step with 2-token prefixes across k=2 beams per row
    rng = np.random.RandomState(0)
    fut = jnp.asarray(rng.randint(0, 8, (3 * k, 2)).astype(np.int32))
    tt = jnp.asarray(np.tile(np.arange(2, dtype=np.int32), (3 * k, 1)))
    big = TokenizedSeqBatch(
        user_ids=jnp.repeat(batch.user_ids, k, axis=0),
        sem_ids=jnp.repeat(batch.sem_ids, k, axis=0),
        sem_ids_fut=fut,
        seq_mask=jnp.repeat(batch.seq_mask, k, axis=0),
        token_type_ids=jnp.repeat(batch.token_type_ids, k, axis=0),
        token_type_ids_fut=tt,
    )
    ref_logits, _ = retrieval.forward_generate_step(
        params, CFG, big, cached_context=jnp.repeat(context, k, axis=0)
    )
    got = retrieval.forward_generate_cached(
        params, CFG, cache, fut, tt, beams=k, n_rows=3 * k
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_logits),
                               rtol=1e-4, atol=1e-5)


def test_decode_token_cached_matches_full_prefix():
    """The single-token self-KV-cache path must produce the same logits as
    forward_generate_cached's full-prefix reprocessing at every step,
    including after a beam-parent cache reorder."""
    params = retrieval.init(jax.random.PRNGKey(0), CFG)
    batch = _batch(b=3)
    k = 2
    cache = retrieval.encode_for_generation(params, CFG, batch)

    # BOS step
    ref = retrieval.forward_generate_cached(
        params, CFG, cache, None, None, beams=1, n_rows=3
    )
    got, self_kv = retrieval.decode_token_cached(
        params, CFG, cache, None, None, 0, beams=1, n_rows=3
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    # expand to beams and run two more token steps, reordering between them
    self_kv = jax.tree.map(
        lambda c: jnp.broadcast_to(
            c[:, None], (3, k) + c.shape[1:]
        ).reshape((3 * k,) + c.shape[1:]),
        self_kv,
    )
    rng = np.random.RandomState(0)
    tok0 = jnp.asarray(rng.randint(0, 8, (3 * k,)).astype(np.int32))
    got, self_kv = retrieval.decode_token_cached(
        params, CFG, cache, self_kv, tok0, 0, beams=k, n_rows=3 * k
    )
    fut = tok0[:, None]
    tt = jnp.zeros((3 * k, 1), jnp.int32)
    ref = retrieval.forward_generate_cached(
        params, CFG, cache, fut, tt, beams=k, n_rows=3 * k
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    # beam reorder: every row keeps parent 0's cache and history
    parent = jnp.zeros((3, k), jnp.int32)
    self_kv = jax.tree.map(
        lambda c: jnp.take_along_axis(
            c.reshape((3, k) + c.shape[1:]),
            parent.reshape((3, k) + (1,) * (c.ndim - 1)),
            axis=1,
        ).reshape(c.shape),
        self_kv,
    )
    fut0 = jnp.repeat(tok0.reshape(3, k)[:, :1], k, axis=1).reshape(3 * k)
    tok1 = jnp.asarray(rng.randint(0, 8, (3 * k,)).astype(np.int32))
    got, self_kv = retrieval.decode_token_cached(
        params, CFG, cache, self_kv, tok1, 1, beams=k, n_rows=3 * k
    )
    fut = jnp.stack([fut0, tok1], axis=1)
    tt = jnp.asarray(np.tile(np.arange(2, dtype=np.int32), (3 * k, 1)))
    ref = retrieval.forward_generate_cached(
        params, CFG, cache, fut, tt, beams=k, n_rows=3 * k
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
