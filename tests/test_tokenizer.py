"""Tests for the semantic-ID tokenizer (tokenizer/semids.py).

Dedup and membership semantics verified against brute-force NumPy equivalents
of the reference's O(n^2) implementation (reference semids.py:74-120).
"""
import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.data.dataset import make_seq_batch
from rqvae_tpu.data.synthetic import synthetic_items, synthetic_sequences
from rqvae_tpu.models import rqvae
from rqvae_tpu.tokenizer import semids

CFG = rqvae.RqVaeConfig(
    input_dim=18, embed_dim=16, hidden_dims=(18, 18), codebook_size=32,
    n_layers=3, n_cat_feats=0,
)


def _brute_force_dedup(ids: np.ndarray) -> np.ndarray:
    """Reference semantics: count of earlier rows with an identical tuple."""
    n = ids.shape[0]
    out = np.zeros(n, np.int32)
    for i in range(n):
        out[i] = sum((ids[j] == ids[i]).all() for j in range(i))
    return out


def test_dedup_column_matches_brute_force():
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, 4, size=(64, 3)).astype(np.int32))
    got = semids.dedup_column(ids, codebook_size=32)
    np.testing.assert_array_equal(np.asarray(got), _brute_force_dedup(np.asarray(ids)))


def test_dedup_no_duplicates():
    ids = jnp.asarray(np.stack(np.unravel_index(np.arange(27), (3, 3, 3)), axis=1).astype(np.int32))
    got = semids.dedup_column(ids, codebook_size=32)
    np.testing.assert_array_equal(np.asarray(got), np.zeros(27, np.int32))


def test_pack_prefix_bijective_at_32bit_limit():
    """codebook 256 x 4 dims = exactly 32 bits; extremes must round-trip."""
    ids = jnp.asarray([[255, 255, 255, 255], [0, 0, 0, 0], [255, 0, 0, 1]], dtype=jnp.int32)
    keys = semids.pack_prefix(ids, 256)
    assert keys.dtype == jnp.uint32
    got = np.asarray(keys, dtype=np.uint64)
    expected = np.array(
        [(2 ** 32) - 1, 0, 255 * 256 ** 3 + 1], dtype=np.uint64
    )
    np.testing.assert_array_equal(got, expected)


def test_exists_prefix_all_lengths():
    rng = np.random.RandomState(1)
    cached = rng.randint(0, 8, size=(50, 4)).astype(np.int32)
    index = semids.build_index(jnp.asarray(cached), codebook_size=32)
    for l in range(1, 5):
        queries = rng.randint(0, 8, size=(40, l)).astype(np.int32)
        got = np.asarray(semids.exists_prefix(index, jnp.asarray(queries)))
        expected = np.array([
            any((cached[:, :l] == q).all(axis=1)) for q in queries
        ])
        np.testing.assert_array_equal(got, expected)


def test_exists_prefix_batched_shapes():
    cached = np.array([[1, 2, 3, 0], [4, 5, 6, 0]], np.int32)
    index = semids.build_index(jnp.asarray(cached), codebook_size=32)
    q = jnp.asarray(np.array([[[1, 2], [9, 9]], [[4, 5], [1, 9]]], np.int32))
    got = np.asarray(semids.exists_prefix(index, q))
    np.testing.assert_array_equal(got, [[True, False], [True, False]])


def test_exists_prefix_jittable():
    cached = np.array([[1, 2, 3, 0], [4, 5, 6, 0]], np.int32)
    index = semids.build_index(jnp.asarray(cached), codebook_size=32)
    f = jax.jit(lambda q: semids.exists_prefix(index, q))
    got = f(jnp.asarray([[1, 2, 3], [4, 5, 7]], jnp.int32))
    np.testing.assert_array_equal(np.asarray(got), [True, False])


def test_precompute_corpus_ids_end_to_end():
    items = synthetic_items(n_items=300, seed=2)
    params = rqvae.init(jax.random.PRNGKey(0), CFG)
    params = rqvae.kmeans_prime(params, CFG, jnp.asarray(items.x), jax.random.PRNGKey(1))
    index = semids.precompute_corpus_ids(params, CFG, jnp.asarray(items.x), chunk_size=128)
    cached = np.asarray(index.cached_ids)
    assert cached.shape == (300, 4)
    # dedup makes every 4-tuple unique
    assert len(np.unique(cached, axis=0)) == 300
    # dedup column matches brute force over the first-3 tuples
    np.testing.assert_array_equal(cached[:, 3], _brute_force_dedup(cached[:, :3]))
    # every corpus row is a member at every prefix length
    for l in range(1, 5):
        got = np.asarray(semids.exists_prefix(index, index.cached_ids[:, :l]))
        assert got.all()
    # chunking does not change results
    index2 = semids.precompute_corpus_ids(params, CFG, jnp.asarray(items.x), chunk_size=300)
    np.testing.assert_array_equal(cached, np.asarray(index2.cached_ids))


def test_tokenize_sequences():
    items = synthetic_items(n_items=100, seed=3)
    train, _ = synthetic_sequences(100, n_users=16, max_seq_len=5, seed=4)
    params = rqvae.init(jax.random.PRNGKey(0), CFG)
    index = semids.precompute_corpus_ids(params, CFG, jnp.asarray(items.x))

    rng = np.random.default_rng(0)
    batch = make_seq_batch(train.sample_batch(rng, 8), items.x)
    tok = semids.tokenize_sequences(index, jax.tree.map(jnp.asarray, batch))

    assert tok.sem_ids.shape == (8, 5 * 4)
    assert tok.sem_ids_fut.shape == (8, 4)
    cached = np.asarray(index.cached_ids)
    ids = np.asarray(batch.ids)
    sem = np.asarray(tok.sem_ids)
    mask = np.asarray(tok.seq_mask)
    for b in range(8):
        for n in range(5):
            chunk = sem[b, n * 4:(n + 1) * 4]
            if ids[b, n] >= 0:
                np.testing.assert_array_equal(chunk, cached[ids[b, n]])
                assert mask[b, n * 4:(n + 1) * 4].all()
            else:
                np.testing.assert_array_equal(chunk, [-1] * 4)
                assert not mask[b, n * 4:(n + 1) * 4].any()
    # token types cycle 0..3
    np.testing.assert_array_equal(
        np.asarray(tok.token_type_ids)[0], np.tile(np.arange(4), 5)
    )
    # future: cached row of the target item
    fut = np.asarray(tok.sem_ids_fut)
    np.testing.assert_array_equal(fut, cached[np.asarray(batch.ids_fut).reshape(-1)])


def test_dedup_base_widens_beyond_codebook():
    """Untrained tokenizers can emit dedup ranks >= codebook_size; the index
    must stay bijective (regression: base-K packing aliased tuples)."""
    n = 300
    # every row shares one tuple -> dedup ranks 0..299 >> codebook 32
    cached = np.concatenate(
        [np.tile([1, 2, 3], (n, 1)), np.arange(n)[:, None]], axis=1
    ).astype(np.int32)
    index = semids.build_index(jnp.asarray(cached), codebook_size=32)
    assert index.bases[-1] >= 300
    got = np.asarray(semids.exists_prefix(index, index.cached_ids))
    assert got.all()
    # a tuple whose base-32 packing would collide with a real row must miss
    probe = jnp.asarray([[1, 2, 3, 300], [0, 2, 3, 5]], jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(semids.exists_prefix(index, probe)), [False, False]
    )


def test_subsample_batch_semantics():
    train, _ = synthetic_sequences(50, n_users=32, max_seq_len=6, seed=5)
    rng = np.random.default_rng(1)
    b = train.sample_batch(rng, 16, subsample=True)
    ids, fut = b["ids"], b["ids_fut"]
    assert ids.shape == (16, 6) and fut.shape == (16, 1)
    lengths = (ids >= 0).sum(axis=1)
    assert (lengths >= 2).all()       # crop keeps >= 3 incl. target
    assert (fut >= 0).all()
    # padding is a suffix
    for row in ids:
        v = row >= 0
        assert not (~v[:-1] & v[1:]).any()


def test_children_mask_matches_exists_prefix():
    """children_mask (contiguous-run enumeration) == brute-force membership
    of every (prefix, token) extension, valid and invalid prefixes alike."""
    rng = np.random.RandomState(3)
    cached = rng.randint(0, 8, size=(60, 4)).astype(np.int32)
    index = semids.build_index(jnp.asarray(cached), codebook_size=32)
    for l in range(0, 4):
        queries = rng.randint(0, 9, size=(25, l)).astype(np.int32)  # some invalid
        got = np.asarray(semids.children_mask(index, jnp.asarray(queries)))
        assert got.shape == (25, 32)
        ext = np.concatenate(
            [
                np.repeat(queries[:, None, :], 32, axis=1),
                np.tile(np.arange(32, dtype=np.int32)[None, :, None], (25, 1, 1)),
            ],
            axis=-1,
        )  # (25, 32, l+1)
        expected = np.array([
            [any((cached[:, : l + 1] == e).all(axis=1)) for e in row]
            for row in ext
        ])
        np.testing.assert_array_equal(got, expected)


def test_children_mask_max_prefix_no_overflow():
    """The all-max prefix at the 32-bit packing limit must still find its
    children (the naive (pk+1)*radix upper bound wraps to 0)."""
    cached = np.array([[255, 255, 255, 0], [255, 255, 254, 0]], np.int32)
    index = semids.build_index(jnp.asarray(cached), codebook_size=256)
    mask = np.asarray(
        semids.children_mask(index, jnp.asarray([[255, 255, 255]], np.int32))
    )[0]
    assert mask[0] and mask.sum() == 1


def test_children_mask_dedup_ranks_beyond_codebook():
    """Dedup ranks >= codebook_size exist in the table but are not
    generatable; the mask must cover ranks < K and drop the rest."""
    n = 40
    cached = np.zeros((n, 4), np.int32)
    cached[:, -1] = np.arange(n)  # 40 duplicates of the same 3-tuple
    index = semids.build_index(jnp.asarray(cached), codebook_size=8)
    mask = np.asarray(
        semids.children_mask(index, jnp.asarray([[0, 0, 0]], np.int32))
    )[0]
    np.testing.assert_array_equal(mask, np.ones(8, bool))


def test_rank_chained_index_large_codebook_deep():
    """The BASELINE.json stretch shape — 4-level 2048-way codebooks (5 dims
    with dedup) — overflows any flat positional packing (55 bits) but fits
    rank-chained uint32 keys. Membership + children must match brute force."""
    rng = np.random.RandomState(7)
    cached = rng.randint(0, 2048, size=(200, 5)).astype(np.int32)
    cached[:, -1] = semids.dedup_column(jnp.asarray(cached[:, :4]), 2048)
    index = semids.build_index(jnp.asarray(cached), codebook_size=2048)
    assert index.sorted_keys.dtype == jnp.uint32
    # every corpus prefix exists at every length
    for l in (1, 3, 5):
        got = np.asarray(semids.exists_prefix(index, index.cached_ids[:, :l]))
        assert got.all(), f"corpus prefixes of len {l} must exist"
    # non-members miss
    probe = cached[:8].copy()
    probe[:, 2] += 1  # perturb one level
    assert not np.asarray(
        semids.exists_prefix(index, jnp.asarray(probe[:, :4]))
    ).any()
    # children of a real 2-prefix match brute force
    p = cached[:6, :2]
    got = np.asarray(semids.children_mask(index, jnp.asarray(p)))
    for r in range(6):
        hits = cached[(cached[:, :2] == p[r]).all(axis=1)][:, 2]
        expected = np.zeros(2048, bool)
        expected[hits] = True
        np.testing.assert_array_equal(got[r], expected)


def test_children_window_kernel_parity():
    """Pallas children_window (interpret mode) == the jnp windowed read."""
    from rqvae_tpu.ops.children_window import children_window

    rng = np.random.RandomState(11)
    n, r, k = 500, 70, 32
    table = np.sort(rng.choice(2**20, n, replace=False)).astype(np.uint32)
    lo = rng.randint(0, n, r).astype(np.int32)
    cnt = rng.randint(0, k + 5, r).astype(np.int32)
    key0 = (table[np.minimum(lo, n - 1)] // 7 * 7).astype(np.uint32)

    got = np.asarray(children_window(
        jnp.asarray(table), jnp.asarray(lo), jnp.asarray(cnt),
        jnp.asarray(key0), window=k, k_tokens=k, block_r=16, interpret=True,
    ))
    wide = k + 128
    assert got.shape == (r, wide)
    padded = np.concatenate([table, np.zeros(wide + 256, np.uint32)])
    for i in range(r):
        aligned = lo[i] // 128 * 128
        off = lo[i] - aligned
        win = padded[aligned: aligned + wide].astype(np.int64) - int(key0[i])
        idx = np.arange(wide)
        ok = (idx >= off) & (idx < off + cnt[i]) & (win >= 0) & (win < k)
        np.testing.assert_array_equal(got[i], np.where(ok, win, k))
