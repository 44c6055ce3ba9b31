"""Semantic-ID tokenizer: corpus precompute, dedup column, prefix membership.

Parity: reference modules/tokenizer/semids.py:23-154, redesigned TPU-first.

  * ``precompute_corpus_ids``: tokenizes the whole item corpus with the frozen
    RQ-VAE and appends a dedup column so each item's (n_layers+1)-tuple is
    unique. The reference counts duplicates with O(n^2) equality strips in
    512-row batches (semids.py:84-99); here the dedup rank is a stable
    sort + searchsorted — O(n log n), one jit, exactly the same semantics
    (occurrence index in corpus order).
  * ``exists_prefix``: the reference does O(n_items) equality scans per query,
    chunked by 16 rows (semids.py:105-120, with a tail-drop bug we do not
    replicate). Here every corpus prefix maps to a RANK-CHAINED sort key and
    membership is a binary search (jnp.searchsorted) per level —
    device-resident and fixed-shape, so it sits inside the jitted beam-search
    loop.
  * ``children_mask``: the beam-search validity test — one contiguous run of
    the level's distinct key table per beam prefix (see its docstring).
  * ``tokenize_sequences``: cached-ID gather producing a TokenizedSeqBatch
    (semids.py:127-154): flatten each item's D-tuple into the sequence,
    expand the mask D-fold, -1 at padding.

Key construction: a flat positional packing would need codebook_size**dim
bits-wise room (256^4 is already the full uint32 range; the BASELINE.json
stretch config of 4x2048-way codebooks would need 55 bits). Instead the
level-l key is ``rank_{l-1}(prefix[:-1]) * base_l + token_l`` where the rank
indexes the PREVIOUS level's distinct-prefix table — so key range is bounded
by n_items * max(bases) regardless of depth or codebook size (84k-item
ML-32M x 2048-way: 2^28, comfortably uint32).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.data.schemas import SeqBatch, TokenizedSeqBatch
from rqvae_tpu.models import rqvae as rqvae_lib
from rqvae_tpu.ops.dispatch import pallas_enabled


@jax.tree_util.register_pytree_node_class
class CorpusIndex:
    """Device-resident corpus semantic-ID table + sorted prefix keys.

    ``bases`` are the per-dim packing radices: codebook_size for the ID
    levels, and ``max(codebook_size, max_dedup + 2)`` for the dedup column
    (build_index; the dedup count is unbounded by codebook_size for an
    untrained/collapsed tokenizer, so packing with base=codebook_size would
    alias distinct tuples).

    ``sorted_keys`` rows hold the DISTINCT packed prefixes per length, padded
    to n_items with a sentinel (dtype max); ``n_distinct[l]`` is the real
    count (host ints — build_index runs outside jit, so they are static).
    Distinctness is what makes ``children_mask`` possible: the children of a
    prefix occupy a contiguous run of its level's table.
    """

    def __init__(self, cached_ids: jax.Array, sorted_keys: jax.Array,
                 bases: tuple, codebook_size: int, n_distinct: tuple = None):
        self.cached_ids = cached_ids      # (n_items, D) int32
        self.sorted_keys = sorted_keys    # (D, n_items), row L-1 = prefix len L
        self.bases = tuple(int(b) for b in bases)
        self.codebook_size = int(codebook_size)
        if n_distinct is None:  # back-compat: rows not deduped
            n_distinct = (int(sorted_keys.shape[-1]),) * int(sorted_keys.shape[0])
        self.n_distinct = tuple(int(n) for n in n_distinct)

    def tree_flatten(self):
        return (self.cached_ids, self.sorted_keys), (
            self.bases, self.codebook_size, self.n_distinct
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1], aux[2])

    @property
    def n_items(self) -> int:
        return self.cached_ids.shape[0]

    @property
    def dim(self) -> int:
        return self.cached_ids.shape[-1]


def sem_ids_dim(cfg: rqvae_lib.RqVaeConfig) -> int:
    return cfg.n_layers + 1


def _bits_for(bases) -> int:
    return sum(max(1, int(np.ceil(np.log2(b)))) for b in bases)


def _key_dtype(bases):
    """Dtype for FLAT positional packing (pack_prefix). The corpus index
    itself uses rank-chained keys (_chain_key_dtype) and has no per-depth
    bit growth."""
    bits = _bits_for(bases)
    if bits <= 32:
        return jnp.uint32
    if bits <= 64 and jax.config.jax_enable_x64:
        return jnp.uint64
    raise ValueError(
        f"prefix keys need {bits} bits for bases {tuple(bases)} "
        "(enable jax_enable_x64 for up-to-64-bit keys)"
    )


def _chain_key_dtype(n_items: int, bases):
    """Dtype for rank-chained keys: rank * base + token < n_items * base."""
    span = n_items * max(int(b) for b in bases)
    if span < 2**32:  # strict: the dtype max is the padding sentinel
        return jnp.uint32
    if span < 2**64 and jax.config.jax_enable_x64:
        return jnp.uint64
    raise ValueError(
        f"rank-chained keys need {span} values for n_items={n_items}, "
        f"bases {tuple(bases)} (enable jax_enable_x64 for 64-bit keys)"
    )


def pack_prefix(prefix: jax.Array, bases, dtype=None) -> jax.Array:
    """Mixed-radix Horner-pack of the last axis into a scalar sort key.

    ``bases`` may be a single int (uniform radix) or one radix per dim; only
    the first ``prefix.shape[-1]`` radices are consumed.
    """
    dim = prefix.shape[-1]
    if isinstance(bases, int):
        bases = (bases,) * dim
    bases = tuple(bases)[:dim]
    dt = dtype if dtype is not None else _key_dtype(bases)
    key = jnp.zeros(prefix.shape[:-1], dt)
    for i in range(dim):
        key = key * jnp.asarray(bases[i], dt) + prefix[..., i].astype(dt)
    return key


def dedup_column(sem_ids: jax.Array, codebook_size: int = 0) -> jax.Array:
    """Occurrence rank of each row's tuple in corpus order.

    Matches the reference's duplicate counting (semids.py:84-99): row i gets
    the number of rows j < i with an identical tuple. Lexicographic sort with
    the corpus position as the least-significant key keeps corpus order
    within each duplicate group, so the within-group position is exactly that
    count — and no packed key exists, so any codebook size / depth works
    (``codebook_size`` is kept for API compatibility and unused).
    """
    n, d = sem_ids.shape
    arange = jnp.arange(n, dtype=jnp.int32)
    order = jnp.lexsort(
        [arange] + [sem_ids[:, i] for i in range(d - 1, -1, -1)]
    )
    s = sem_ids[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.any(s[1:] != s[:-1], axis=1)]
    )
    # position of each sorted row's group start, via a running maximum
    start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, arange, 0)
    )
    rank_in_group = arange - start
    return jnp.zeros((n,), jnp.int32).at[order].set(rank_in_group)


def precompute_corpus_ids(
    params,
    cfg: rqvae_lib.RqVaeConfig,
    corpus_x: jax.Array,
    *,
    chunk_size: int = 4096,
) -> CorpusIndex:
    """Tokenize the full corpus and build the prefix-membership index.

    The RQ-VAE forward runs in eval mode (hard argmin, reference
    semids.py:131-135 via rq_vae.get_semantic_ids). Chunked with lax.map to
    bound activation memory on big corpora; results are corpus-ordered so the
    dedup column is deterministic.
    """
    n = corpus_x.shape[0]
    pad = (-n) % chunk_size
    x_padded = jnp.pad(corpus_x, ((0, pad), (0, 0)))
    chunks = x_padded.reshape(-1, chunk_size, corpus_x.shape[-1])

    def encode_chunk(xc):
        return rqvae_lib.encode_and_tokenize(params, cfg, xc)

    def run():
        return jax.lax.map(encode_chunk, chunks).reshape(-1, cfg.n_layers)[:n]

    if jax.process_count() > 1:
        # Multi-host: corpus tokenization is a host-driven setup step whose
        # operands are process-local arrays — they cannot feed a global-mesh
        # shard_map, and train_rqvae's diversity metrics run it on host 0
        # ONLY (reference train_rqvae.py:223-239 rank-0 semantics). Clear
        # the registered mesh so the Pallas call sites dispatch on this
        # process's local device instead of the global mesh.
        from rqvae_tpu.ops import dispatch

        with dispatch.local_execution():
            sem_ids = run()
    else:
        sem_ids = run()
    dedup = dedup_column(sem_ids, cfg.codebook_size)
    cached = jnp.concatenate([sem_ids, dedup[:, None]], axis=-1)
    return build_index(cached, cfg.codebook_size)


def build_index(cached_ids: jax.Array, codebook_size: int) -> CorpusIndex:
    """Rank-chained sorted distinct-key tables for every prefix length (1..D).

    Level l's key for a corpus row is ``rank * bases[l] + token_l`` where
    ``rank`` is the row's prefix position in level l-1's DISTINCT sorted
    table (0 for l=0). Each level's table keeps distinct keys only, pushed
    left and padded with the dtype-max sentinel.

    The last column (dedup rank) may exceed codebook_size on an untrained
    tokenizer, so its radix is sized to the observed maximum. Requires
    concrete values — call outside jit (corpus precompute is a host-driven
    setup step, as in the reference).
    """
    d = cached_ids.shape[-1]
    n = cached_ids.shape[0]
    max_dedup = int(jnp.max(cached_ids[:, -1]))
    dedup_base = max(codebook_size, max_dedup + 2)
    bases = (codebook_size,) * (d - 1) + (dedup_base,)
    dt = _chain_key_dtype(n, bases)
    sentinel = jnp.asarray(jnp.iinfo(dt).max, dt)
    rows, n_distinct = [], []
    rank = jnp.zeros((n,), dt)
    for l in range(d):
        keys = rank * jnp.asarray(bases[l], dt) + cached_ids[:, l].astype(dt)
        skeys = jnp.sort(keys)
        # keep first occurrences only, pushed left; pad with the sentinel
        first = jnp.concatenate(
            [jnp.ones((1,), bool), skeys[1:] != skeys[:-1]]
        )
        uniq = jnp.where(first, skeys, sentinel)
        order = jnp.argsort(~first, stable=True)  # firsts first, sorted order
        table = uniq[order]
        rows.append(table)
        n_distinct.append(int(first.sum()))
        # each row's rank for the next level: position of its key in the
        # distinct table (padding is the sentinel, above every real key)
        rank = jnp.searchsorted(table, keys).astype(dt)
    return CorpusIndex(
        cached_ids=cached_ids,
        sorted_keys=jnp.stack(rows, axis=0),
        bases=bases,
        codebook_size=codebook_size,
        n_distinct=tuple(n_distinct),
    )


def exists_prefix(index: CorpusIndex, prefix: jax.Array) -> jax.Array:
    """Membership of ID-prefixes against the corpus (reference semids.py:105-120).

    prefix: (..., L) int32 with 1 <= L <= D. Returns bool (...). Fixed-shape,
    jittable, usable inside the generation loop.
    """
    l = prefix.shape[-1]
    rank, ok = _prefix_rank(index, prefix.reshape(-1, l))
    return ok.reshape(prefix.shape[:-1])


def _prefix_rank(index: CorpusIndex, flat_prefix: jax.Array):
    """(rank, ok) of each length-L prefix row in level L-1's distinct table.

    One searchsorted per level (rank chaining is inherently sequential in
    depth). method='sort' (co-sort queries with the table) instead of the
    default binary-search scan: the scan's serially-dependent gathers cost
    ~10x more at high query volumes on a v5e; at the beam-search volume
    (B*k ~ 8k queries) either is cheap.
    """
    l = flat_prefix.shape[-1]
    dt = index.sorted_keys.dtype
    rank = jnp.zeros(flat_prefix.shape[:1], dt)
    ok = jnp.ones(flat_prefix.shape[:1], bool)
    for i in range(l):
        key = rank * jnp.asarray(index.bases[i], dt) + flat_prefix[:, i].astype(dt)
        table = index.sorted_keys[i]
        pos = jnp.searchsorted(table, key, method="sort")
        pos = jnp.clip(pos, 0, table.shape[0] - 1)
        ok &= (table[pos] == key) & (pos < index.n_distinct[i])
        rank = pos.astype(dt)
    return rank, ok


def _rows_shardable(n_rows: int) -> bool:
    """Whether the children-window kernel rows divide the registered mesh's
    'data' axis."""
    from rqvae_tpu.ops import dispatch

    return dispatch.divisible_over_data(n_rows)


def children_mask(index: CorpusIndex, prefix: jax.Array) -> jax.Array:
    """Valid-next-token mask for every prefix: (..., L) int32 -> (..., K) bool.

    The beam-search inner loop's membership test, restructured around a fact
    the reference's per-candidate equality scans ignore: beam prefixes are
    already valid, and in a DISTINCT sorted key table all children of a
    prefix occupy one contiguous run. So instead of testing B*k*n_candidates
    packed keys against the table (a 1.6M-element co-sort per step at the
    serving shape), binary-search the B*k run bounds, gather one K-wide
    contiguous window of children per beam, and scatter a (B*k, K) validity
    mask. The window is always wide enough: distinct child tokens of an ID
    level lie in [0, K); distinct dedup ranks are contiguous from 0, so any
    child beyond position K-1 has token >= K and cannot be generated anyway.

    For L=0 (prefix of nothing) pass shape (..., 0); the run is the whole
    level-1 table.
    """
    l = prefix.shape[-1]
    k = index.codebook_size
    dt = index.sorted_keys.dtype
    table = index.sorted_keys[l]          # keys of length l+1 prefixes
    n_valid = index.n_distinct[l]
    radix = jnp.asarray(index.bases[l], dt)
    batch_shape = prefix.shape[:-1]
    n_rows = int(np.prod(batch_shape, dtype=np.int64)) if batch_shape else 1
    rank, ok = _prefix_rank(index, prefix.reshape(n_rows, l))    # (R,)
    lo = jnp.searchsorted(table, rank * radix)                   # (R,)
    # upper bound via the run's max possible key, side='right' (rank+1 keys
    # belong to the next parent; no key-dtype overflow: rank*radix + radix-1
    # < n_distinct * radix, within the chain-key capacity by construction)
    hi = jnp.searchsorted(table, rank * radix + (radix - 1), side="right")
    hi = jnp.minimum(hi, jnp.asarray(n_valid, hi.dtype))
    hi = jnp.where(ok, hi, lo)                                   # empty run
    # child token per window slot, k at invalid slots (past the run, or a
    # dedup rank outside the generatable token range). On TPU the windowed
    # read is a Pallas kernel (one contiguous dynamic slice per row from the
    # VMEM-resident table — XLA lowers the same read to a general gather,
    # measured 16 ms vs ~1 ms at the serving shape); the jnp path below is
    # the behavioral reference and the CPU/test implementation.
    if pallas_enabled() and _rows_shardable(n_rows):
        from jax.sharding import PartitionSpec as P

        from rqvae_tpu.ops import dispatch
        from rqvae_tpu.ops.children_window import children_window
        from rqvae_tpu.parallel.mesh import DATA_AXIS

        rsp = P(DATA_AXIS)
        # shard_mapped over beam rows under a registered mesh (the prefix
        # table broadcasts into every device's VMEM; rows split over 'data')
        call = dispatch.shard_over_batch(
            lambda t_, lo_, cnt_, key0_: children_window(
                t_, lo_, cnt_, key0_, window=k, k_tokens=k
            ),
            in_specs=(P(), rsp, rsp, rsp),
            out_specs=rsp,
        )
        child = call(
            index.sorted_keys[l], lo.astype(jnp.int32),
            (hi - lo).astype(jnp.int32), rank * radix,
        )
    else:
        win_pos = lo[:, None] + jnp.arange(k, dtype=lo.dtype)    # (R, K)
        in_run = win_pos < hi[:, None]
        win_keys = table[jnp.minimum(win_pos, table.shape[0] - 1)]
        child = (win_keys - rank[:, None] * radix).astype(jnp.int32)
        child = jnp.where(in_run & (child >= 0) & (child < k), child, k)
    # one-hot + sum instead of a boolean scatter: the reduction maps onto
    # the MXU/VPU (measured 1.9 ms vs 14 ms for the scatter at the serving
    # shape, R=8k x K=256, one v5e chip)
    hits = jax.nn.one_hot(child, k + 1, dtype=jnp.bfloat16).sum(axis=1)
    return (hits[:, :k] > 0).reshape(*batch_shape, k)


def max_duplicates(index: CorpusIndex) -> int:
    """Largest dedup value; must stay < codebook_size for the decoder's
    level-offset embedding table (train_rqvae.py:228 logs the same stat)."""
    return int(jnp.max(index.cached_ids[:, -1]))


def tokenize_sequences(
    index: CorpusIndex, batch: SeqBatch
) -> TokenizedSeqBatch:
    """Cached-ID gather: item-ID sequences -> semantic-ID token sequences
    (reference semids.py:122-154)."""
    b, n = batch.ids.shape
    d = index.cached_ids.shape[-1]
    safe_ids = jnp.maximum(batch.ids, 0)
    sem_ids = index.cached_ids[safe_ids].reshape(b, n * d)
    seq_mask = jnp.repeat(batch.seq_mask, d, axis=1)
    sem_ids = jnp.where(seq_mask, sem_ids, -1)

    ids_fut = jnp.maximum(batch.ids_fut, 0).reshape(b)
    sem_ids_fut = index.cached_ids[ids_fut].reshape(b, d)

    token_type = jnp.tile(jnp.arange(d, dtype=jnp.int32), (b, n))
    token_type_fut = jnp.tile(jnp.arange(d, dtype=jnp.int32), (b, 1))
    return TokenizedSeqBatch(
        user_ids=batch.user_ids,
        sem_ids=sem_ids,
        sem_ids_fut=sem_ids_fut,
        seq_mask=seq_mask,
        token_type_ids=token_type,
        token_type_ids_fut=token_type_fut,
    )


def tokenize_packed(
    index: CorpusIndex, packed
) -> "PackedTokenizedBatch":
    """Cached-ID gather for a packed batch (data.packing.PackedSeqBatch):
    item-ID rows carrying several user segments -> semantic-ID token rows.

    Identical per-segment semantics to :func:`tokenize_sequences`; the packing
    metadata (segment membership and slot table) passes through untouched for
    the model to derive its attention spans from.
    """
    r, n = packed.ids.shape
    d = index.cached_ids.shape[-1]
    safe_ids = jnp.maximum(packed.ids, 0)
    sem_ids = index.cached_ids[safe_ids].reshape(r, n * d)
    seq_mask = jnp.repeat(packed.ids >= 0, d, axis=1)
    sem_ids = jnp.where(seq_mask, sem_ids, -1)

    fut_safe = jnp.maximum(packed.ids_fut, 0)           # (R, S)
    sem_ids_fut = index.cached_ids[fut_safe]            # (R, S, D)

    token_type = jnp.tile(jnp.arange(d, dtype=jnp.int32), (r, n))
    return PackedTokenizedBatch(
        user_ids=packed.user_ids,
        sem_ids=sem_ids,
        sem_ids_fut=sem_ids_fut,
        seq_mask=seq_mask,
        token_type_ids=token_type,
        seg_item=packed.seg_item,
        slot_start=packed.slot_start,
        slot_len=packed.slot_len,
        slot_valid=packed.slot_valid,
    )


class PackedTokenizedBatch(NamedTuple):
    """A packed batch in semantic-ID token space (packed counterpart of
    TokenizedSeqBatch): R rows x S segments, item tokens flattened to N*D."""

    user_ids: jax.Array        # (R, S) int32
    sem_ids: jax.Array         # (R, N*D) int32, -1 padded
    sem_ids_fut: jax.Array     # (R, S, D) int32
    seq_mask: jax.Array        # (R, N*D) bool
    token_type_ids: jax.Array  # (R, N*D) int32 in [0, D)
    seg_item: jax.Array        # (R, N) int32 slot per item, -1 pad
    slot_start: jax.Array      # (R, S) int32
    slot_len: jax.Array        # (R, S) int32
    slot_valid: jax.Array      # (R, S) bool


def tokenize_items_fresh(
    params, cfg: rqvae_lib.RqVaeConfig, x: jax.Array
) -> jax.Array:
    """Fresh-encode path (no cache): raw features -> n_layers-tuple ids
    (reference semids.py:131-135)."""
    return rqvae_lib.encode_and_tokenize(params, cfg, x)
