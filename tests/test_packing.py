"""Packed long-context training: packer invariants, span-attention parity,
and packed-vs-flat forward/grad equivalence (data/packing.py,
ops/flash_attention.flash_attention_spans, models/retrieval.forward_packed).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import flatten_util

from rqvae_tpu.data import packing
from rqvae_tpu.data.dataset import SeqDataset
from rqvae_tpu.data.schemas import SeqBatch
from rqvae_tpu.models import retrieval
from rqvae_tpu.models.retrieval import RetrievalConfig
from rqvae_tpu.ops import attention as attn_ops
from rqvae_tpu.ops import flash_attention as fa
from rqvae_tpu.tokenizer import semids

CFG = RetrievalConfig(
    embedding_dim=16, attn_dim=32, dropout=0.0, num_heads=4, n_layers=4,
    num_embeddings=32, sem_id_dim=4, max_pos=48, input_dropout=0.0,
    mlp_hidden_dim=64,
)
N_CAP = 12          # item capacity per packed row
N_ITEMS = 40        # corpus size


def _index(seed=0, k=32, n_items=N_ITEMS):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, k, (n_items, 3)).astype(np.int32)
    dedup = np.asarray(semids.dedup_column(jnp.asarray(base), k))
    cached = np.concatenate([base, dedup[:, None]], axis=1).astype(np.int32)
    return semids.build_index(jnp.asarray(cached), codebook_size=k)


def _crops(n, seed=1, min_len=2, max_len=N_CAP):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        ln = rng.randint(min_len, max_len + 1)
        out.append((
            int(rng.randint(0, 5000)),
            rng.randint(0, N_ITEMS, ln).astype(np.int32),
            int(rng.randint(0, N_ITEMS)),
        ))
    return out


# ---------------------------------------------------------------------------
# packer
# ---------------------------------------------------------------------------

def test_pack_crops_invariants():
    crops = _crops(17)
    batch, leftovers = packing.pack_crops(crops, rows=6, slots=4,
                                          capacity=N_CAP)
    placed = int(batch.slot_valid.sum())
    assert placed + len(leftovers) == len(crops)
    assert placed > 0
    # every valid slot reproduces exactly one crop, in a contiguous range
    seen = []
    for r in range(6):
        cursor_items = batch.ids[r][batch.ids[r] >= 0]
        total = 0
        for s in range(4):
            if not batch.slot_valid[r, s]:
                assert batch.slot_len[r, s] == 0
                assert batch.ids_fut[r, s] == -1
                continue
            st, ln = int(batch.slot_start[r, s]), int(batch.slot_len[r, s])
            assert ln >= 1 and st + ln <= N_CAP
            assert (batch.seg_item[r, st:st + ln] == s).all()
            seen.append((
                int(batch.user_ids[r, s]),
                batch.ids[r, st:st + ln].copy(),
                int(batch.ids_fut[r, s]),
            ))
            total += ln
        assert total == len(cursor_items)
        # non-segment positions are padding
        assert (batch.seg_item[r][batch.ids[r] < 0] == -1).all()
    # multiset equality with the placed crops
    key = lambda c: (c[0], c[2], tuple(int(x) for x in c[1]))
    assert sorted(map(key, seen)) == sorted(
        key(c) for c in crops if not any(c is l for l in leftovers)
    )


def test_packer_streaming_conserves_examples():
    rng = np.random.default_rng(0)
    n_users, stored = 30, 16
    lens = rng.integers(3, stored + 1, n_users)
    item_ids = np.full((n_users, stored), -1, np.int32)
    for i, ln in enumerate(lens):
        item_ids[i, :ln] = rng.integers(0, N_ITEMS, ln)
    seqs = SeqDataset(
        user_ids=np.arange(n_users, dtype=np.int32),
        item_ids=item_ids,
        item_ids_fut=rng.integers(0, N_ITEMS, (n_users, 1)).astype(np.int32),
        max_seq_len=N_CAP,
    )
    packer = packing.SequencePacker(seqs=seqs, rng=rng, rows=4, slots=4)
    total, fills = 0, []
    for _ in range(8):
        batch, n = packer.next_batch()
        assert n == int(batch.slot_valid.sum()) and n >= 4
        total += n
        fills.append((batch.ids >= 0).sum() / batch.ids.size)
    assert total >= 8 * 4
    # packing must beat one-example-per-row fill by a wide margin
    assert np.mean(fills) > 0.7


# ---------------------------------------------------------------------------
# span attention
# ---------------------------------------------------------------------------

def test_flash_span_parity_with_dense():
    rng = np.random.RandomState(0)
    b, h, nq, nk, dh = 2, 2, 70, 70, 64
    q = jnp.asarray(rng.randn(b, h, nq, dh).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, nk, dh).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, nk, dh).astype(np.float32))
    lo = jnp.asarray(rng.randint(0, 30, (b, nq)).astype(np.int32))
    hi = lo + jnp.asarray(rng.randint(0, 40, (b, nq)).astype(np.int32))
    extra = jnp.asarray(rng.randint(-1, nk, (b, nq)).astype(np.int32))
    # exercise fully-masked rows and window-only rows
    lo = lo.at[:, :5].set(0)
    hi = hi.at[:, :5].set(0)
    extra = extra.at[:, :3].set(-1)

    def dense(q, k, v):
        m = attn_ops.build_mask(nq, nk, q_spans=(lo, hi, extra))
        return attn_ops.sdpa(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), m,
        ).transpose(0, 2, 1, 3)

    def flash(q, k, v):
        return fa.flash_attention_spans(q, k, v, lo, hi, extra,
                                        interpret=True)

    o1, o2 = dense(q, k, v), flash(q, k, v)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-5)
    g = jnp.asarray(rng.randn(*o1.shape).astype(np.float32))
    g1 = jax.grad(lambda *a: (dense(*a) * g).sum(), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: (flash(*a) * g).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)


def test_span_mask_semantics():
    lo = jnp.asarray([[1, 0]], jnp.int32)
    hi = jnp.asarray([[3, 0]], jnp.int32)
    extra = jnp.asarray([[4, -1]], jnp.int32)
    m = np.asarray(attn_ops.span_mask((lo, hi, extra), 5))
    assert m.shape == (1, 2, 5)
    assert m[0, 0].tolist() == [False, True, True, False, True]
    assert m[0, 1].tolist() == [False] * 5  # lo=hi=0, extra=-1: attend nothing


# ---------------------------------------------------------------------------
# packed forward vs flat forward
# ---------------------------------------------------------------------------

def _flat_batch_from_crops(crops, index):
    b = len(crops)
    ids = np.full((b, N_CAP), -1, np.int32)
    for i, (_, crop, _) in enumerate(crops):
        ids[i, :len(crop)] = crop
    raw = SeqBatch(
        user_ids=jnp.asarray(np.asarray([c[0] for c in crops], np.int32)),
        ids=jnp.asarray(ids),
        ids_fut=jnp.asarray(
            np.asarray([[c[2]] for c in crops], np.int32)
        ),
        x=jnp.zeros((b, N_CAP, 1)),
        x_fut=jnp.zeros((b, 1, 1)),
        seq_mask=jnp.asarray(ids >= 0),
    )
    return semids.tokenize_sequences(index, raw)


def _packed_from_crops(crops, rows, slots, index):
    batch, leftovers = packing.pack_crops(crops, rows=rows, slots=slots,
                                          capacity=N_CAP)
    assert not leftovers, "test crops must all fit"
    dev = jax.tree.map(jnp.asarray, batch)
    return semids.tokenize_packed(index, dev)


def test_packed_single_segment_matches_flat():
    """One crop per row (slots=1) is exactly the flat layout: loss, loss_d,
    and parameter gradients must match the flat forward."""
    index = _index()
    crops = _crops(6, max_len=N_CAP)
    params = retrieval.init(jax.random.PRNGKey(0), CFG)

    flat_tok = _flat_batch_from_crops(crops, index)
    packed_tok = _packed_from_crops(crops, rows=6, slots=1, index=index)

    def flat_loss(p):
        return retrieval.forward(p, CFG, flat_tok).loss

    def packed_loss(p):
        return retrieval.forward_packed(p, CFG, packed_tok).loss

    l1, g1 = jax.value_and_grad(flat_loss)(params)
    l2, g2 = jax.value_and_grad(packed_loss)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    flat_g, _ = flatten_util.ravel_pytree(g1)
    packed_g, _ = flatten_util.ravel_pytree(g2)
    np.testing.assert_allclose(
        np.asarray(flat_g), np.asarray(packed_g), atol=1e-5
    )


def test_packed_multi_segment_matches_flat_mean():
    """Several crops per row: packed loss == flat batch mean over the same
    examples, and so do the gradients (the packed step IS the flat step at a
    packer-chosen batch size)."""
    index = _index()
    crops = _crops(11, max_len=6)  # short crops so several pack per row
    params = retrieval.init(jax.random.PRNGKey(1), CFG)

    flat_tok = _flat_batch_from_crops(crops, index)
    packed_tok = _packed_from_crops(crops, rows=4, slots=4, index=index)
    assert int(packed_tok.slot_valid.sum()) == len(crops)
    # really packed: fewer rows than examples
    assert packed_tok.sem_ids.shape[0] < len(crops)

    out_flat = retrieval.forward(params, CFG, flat_tok)
    out_packed = retrieval.forward_packed(params, CFG, packed_tok)
    np.testing.assert_allclose(
        float(out_flat.loss), float(out_packed.loss), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_flat.loss_d), np.asarray(out_packed.loss_d), rtol=1e-4
    )

    g1 = jax.grad(lambda p: retrieval.forward(p, CFG, flat_tok).loss)(params)
    g2 = jax.grad(
        lambda p: retrieval.forward_packed(p, CFG, packed_tok).loss
    )(params)
    a, _ = flatten_util.ravel_pytree(g1)
    b, _ = flatten_util.ravel_pytree(g2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_packed_segments_are_isolated():
    """Changing one segment's tokens must not change another segment's
    per-slot loss (no attention leakage across segments in a row)."""
    index = _index()
    crops = _crops(8, max_len=5)
    params = retrieval.init(jax.random.PRNGKey(2), CFG)
    packed = packing.pack_crops(crops, rows=3, slots=4, capacity=N_CAP)[0]
    tok = semids.tokenize_packed(index, jax.tree.map(jnp.asarray, packed))

    def slot_losses(t):
        out = retrieval.forward_packed(params, CFG, t)
        # recompute per-slot sums from logits
        logp = jax.nn.log_softmax(out.logits.astype(jnp.float32), -1)
        tgt = jnp.where(t.slot_valid[:, :, None], t.sem_ids_fut, -1)
        safe = jnp.clip(tgt, 0, logp.shape[-1] - 1)
        nll = -jnp.take_along_axis(logp, safe[..., None], -1)[..., 0]
        return np.asarray(jnp.where(tgt >= 0, nll, 0.0).sum(-1))

    base = slot_losses(tok)
    # perturb segment (0, 0): change its sem ids to different valid codes
    r, s = 0, 0
    assert bool(tok.slot_valid[r, s])
    st = int(tok.slot_start[r, s]) * 4
    ln = int(tok.slot_len[r, s]) * 4
    new_sem = tok.sem_ids.at[r, st:st + ln].set(
        (tok.sem_ids[r, st:st + ln] + 1) % 32
    )
    pert = slot_losses(tok._replace(sem_ids=new_sem))
    valid = np.asarray(tok.slot_valid)
    changed = np.abs(base - pert) > 1e-6
    assert changed[r, s]
    # every other valid slot, including others in the same row, unchanged
    other = valid.copy()
    other[r, s] = False
    np.testing.assert_allclose(base[other], pert[other], atol=1e-6)
