"""Pallas kernel: windowed children extraction from a sorted prefix table.

The constrained-beam-search validity test (tokenizer/semids.children_mask)
needs, for every beam prefix, the run ``table[lo : lo+cnt]`` of its children's
keys out of the level's sorted distinct-key table (SURVEY.md §7 kernel target
3: corpus prefix-membership for generation; reference semids.py:105-120 did
O(n_items) equality scans per query on GPU).

XLA lowers the windowed read ``table[lo[:, None] + arange(K)]`` to a general
gather — measured 16 ms at the serving shape (8k beams x K=256 window,
12k-entry table) on one v5e chip, the single largest non-transformer cost of
a beam-search step. But each row's read is CONTIGUOUS: this kernel keeps the
whole table in VMEM (84k-item ML-32M corpus: 340 KB) and issues one dynamic
slice per beam row, which is a lane rotation instead of a gather.

Output is the CHILD TOKEN value per window slot (key - parent_key0), with
``k_tokens`` (an out-of-range class) at slots past the run or holding tokens
outside the generatable range; the caller folds these into a one-hot
reduction to get the validity mask.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rqvae_tpu.ops.dispatch import use_interpret


def _children_kernel(lo_ref, cnt_ref, key0_ref, table_ref, out_ref, *,
                     block_r: int, wide: int, k_tokens: int):
    # Mosaic only allows 128-aligned dynamic slices on the lane dimension,
    # so each row loads the aligned window containing its run and masks by
    # the in-lane offset instead of slicing at the exact start.
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, wide), 1)

    def row(i, _):
        start = lo_ref[i]
        aligned = pl.multiple_of((start // 128) * 128, 128)
        off = start - aligned
        win = table_ref[pl.ds(0, 1), pl.ds(aligned, wide)]       # (1, wide)
        child = (win - key0_ref[i]).astype(jnp.int32)
        ok = (pos >= off) & (pos < off + cnt_ref[i]) \
            & (child >= 0) & (child < k_tokens)
        out_ref[pl.ds(i, 1), :] = jnp.where(ok, child, k_tokens)
        return 0

    jax.lax.fori_loop(0, block_r, row, 0)


@functools.partial(
    jax.jit, static_argnames=("window", "k_tokens", "block_r", "interpret")
)
def children_window(
    table: jax.Array,   # (n,) sorted distinct keys (uint32/uint64)
    lo: jax.Array,      # (R,) int32 run starts
    cnt: jax.Array,     # (R,) int32 run lengths
    key0: jax.Array,    # (R,) parent_rank * radix, table dtype
    *,
    window: int,        # W = codebook_size (covers all generatable children)
    k_tokens: int,      # token alphabet size; invalid slots map to k_tokens
    block_r: int = 1024,  # SMEM 1D operands tile at 1024 on v5e
    interpret: bool | None = None,
) -> jax.Array:         # (R, W+128) int32 child tokens, k_tokens at invalid
    if interpret is None:
        interpret = use_interpret()
    r = lo.shape[0]
    n = table.shape[0]
    wide = window + 128  # aligned load window (see kernel comment)

    # table padded so any aligned start reads in-bounds; rows padded to the
    # block size (cnt=0 rows emit all-invalid, which callers slice away)
    n_pad = ((n + wide - 1) // 128 + 1) * 128
    table2 = jnp.pad(table, (0, n_pad - n))[None, :]
    lo = jnp.minimum(lo, n_pad - wide).astype(jnp.int32)
    pad_r = (-r) % block_r
    if pad_r:
        lo = jnp.pad(lo, (0, pad_r))
        cnt = jnp.pad(cnt, (0, pad_r))
        key0 = jnp.pad(key0, (0, pad_r))
    rp = r + pad_r

    kernel = functools.partial(
        _children_kernel, block_r=block_r, wide=wide, k_tokens=k_tokens
    )
    out = pl.pallas_call(
        kernel,
        grid=(rp // block_r,),
        in_specs=[
            pl.BlockSpec((block_r,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_r,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_r,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_r, wide), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, wide), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=rp * wide,
            bytes_accessed=(n_pad + 3 * rp + 2 * rp * wide) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lo, cnt, key0, table2)
    return out[:r]
