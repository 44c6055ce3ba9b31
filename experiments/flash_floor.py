"""Empirical VPU-floor measurement + pass-minimization variants for the
flash-attention forward AND backward kernels (VERDICT r2 item 6).

The ML-32M shape (B=256, H=8, N=801, Dh=64, bf16) is VPU-bound: docs/PERF.md
estimates a ~3-4 us/program floor from pass counting but round 2 never
MEASURED it. This script measures:

  floor        the kernel with both matmuls deleted (same grid, same N^2
               elementwise passes + exp, inputs/outputs still touched) --
               the empirical VPU bound for the current pass structure
  floor_noexp  floor without the exp (isolates transcendental cost)
  current      the production kernel (ops/flash_attention._flash_forward)
  variants     candidate pass reductions, one at a time:
                 prescale   fold 1/sqrt(Dh) into q outside the kernel
                 bf16exp    exp computed on bf16 vregs (2x packing), e stays
                            bf16 for the PV matmul (removes the cast pass)
                 onescol    row-sum via a ones-column appended to v (MXU does
                            the (TQ,Nk) sum reduction, not the VPU)
                 combined   all three

Backward profiles (production _flash_backward vs pass reductions; the bwd
recomputes p per q-block, so the same N^2 VPU passes dominate):

  bwd_current  the production backward kernel
  bwd_outid    c = rowsum(dp*p) replaced by the identity
               c = rowsum(g * out) with out recomputed via one extra e@v
               matmul: two (TQ,Nk) VPU passes (dp*e multiply + N^2 rowsum)
               traded for one MXU matmul + a (TQ,Dh) reduction
  bwd_bf16exp  e on bf16 vregs straight into the dv/ds math
  bwd_combined both

Timing: chained-carry fori_loop inside one jit (axon dispatch rule: blocking
on independent results lies), 20-iter warmup, carry folds out*1e-6 back into
q to defeat DCE without constant-folding.

Usage:  python experiments/flash_floor.py [--iters 50]
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rqvae_tpu.ops.flash_attention import (
    NEG_INF,
    _flash_backward,
    _flash_forward,
    default_block_q,
)

SHAPE = dict(b=256, h=8, n=801, dh=64)


# ---------------------------------------------------------------- kernels


def _floor_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, with_exp: bool):
    """All the N^2 VPU passes of the production kernel, matmuls deleted.
    scores is fabricated by a broadcast (one N^2 pass, standing in for the
    matmul-epilogue scale+bias pass of the real kernel)."""
    q = q_ref[0, 0]                                   # (TQ, Dh)
    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
    # (TQ,1) * scalar + (1,Nk) broadcast -> one pass over (TQ, Nk), like the
    # real kernel's `matmul_out * scale + bias`
    scores = q[:, :1].astype(jnp.float32) * scale + bias_ref[0]
    m = jnp.max(scores, axis=-1, keepdims=True)
    if with_exp:
        e = jnp.exp(scores - m)
    else:
        e = scores - m
    s = jnp.sum(e, axis=-1, keepdims=True)
    eb = e.astype(v_ref.dtype)                        # the pre-PV cast pass
    inv = jnp.where(m > 0.5 * NEG_INF, 1.0 / s, 0.0)
    # touch v + produce the (TQ, Dh) output without an MXU op (v's HBM->VMEM
    # copy is driven by its BlockSpec, so reading one broadcast row keeps the
    # memory traffic while staying shape-safe when TQ > Nk after q padding)
    out = eb[:, : q.shape[-1]].astype(jnp.float32) + v_ref[0, 0, :1]
    out_ref[0, 0] = (out * inv).astype(out_ref.dtype)


def _variant_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *,
                    prescale: bool, bf16exp: bool, onescol: bool):
    """Production kernel math with selectable pass reductions."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]                                   # (Nk, Dh[+128 pad])

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if prescale:                                      # scale folded into q
        scores = scores + bias_ref[0]
    else:
        scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
        scores = scores * scale + bias_ref[0]

    m = jnp.max(scores, axis=-1, keepdims=True)
    if bf16exp:
        e = jnp.exp((scores - m).astype(jnp.bfloat16))   # 2x-packed vregs
        eb = e
    else:
        e = jnp.exp(scores - m)
        eb = e.astype(v.dtype)

    if onescol:
        # v arrives with a ones column appended (dh+1 wide): one MXU pass
        # yields PV and the row-sums together; the VPU never reduces (TQ,Nk)
        out_aug = jax.lax.dot_general(
            eb, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (TQ, Dh+1)
        dh = q.shape[-1]
        out = out_aug[:, :dh]
        s = out_aug[:, dh:dh + 1]
    else:
        s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        out = jax.lax.dot_general(
            eb, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    inv = jnp.where(m > 0.5 * NEG_INF, 1.0 / s, 0.0)
    out_ref[0, 0] = (out * inv).astype(out_ref.dtype)


def _bwd_variant_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref,
                        dq_ref, dk_ref, dv_ref, *,
                        outid: bool, bf16exp: bool, block_q: int):
    """Production backward math (ops/flash_attention._flash_bwd_kernel,
    non-causal) with selectable pass reductions."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    g = g_ref[0, 0]

    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + bias_ref[0]
    m = jnp.max(scores, axis=-1, keepdims=True)
    if bf16exp:
        e = jnp.exp((scores - m).astype(jnp.bfloat16))
        s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        eb = e
    else:
        e = jnp.exp(scores - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        eb = e.astype(g.dtype)
    inv = jnp.where(m > 0.5 * NEG_INF, 1.0 / s, 0.0)   # (TQ, 1)

    dp = jax.lax.dot_general(                           # g v^T
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if outid:
        # c = rowsum(dp * p) == rowsum(g * out): recompute out with one MXU
        # matmul instead of a (TQ,Nk) multiply + N^2 VPU rowsum
        out = jax.lax.dot_general(
            eb, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv                                         # (TQ, Dh)
        c = jnp.sum(g.astype(jnp.float32) * out, axis=-1, keepdims=True)
    else:
        c = jnp.sum(dp * e.astype(jnp.float32), axis=-1, keepdims=True) * inv
    if bf16exp:
        ds = (e * ((dp - c) * inv).astype(jnp.bfloat16)).astype(k.dtype)
    else:
        ds = (e * ((dp - c) * inv)).astype(k.dtype)

    dq_ref[0, 0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(pl.program_id(2) == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    g_n = (g.astype(jnp.float32) * inv).astype(g.dtype)
    dv_ref[0, 0] += jax.lax.dot_general(
        eb.astype(g.dtype), g_n, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bwd_call(kernel, q, k, v, mask_bias, g, *, block_q, interpret=False):
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    pad_q = (-nq) % block_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    nqp = nq + pad_q
    qkv_spec = pl.BlockSpec((1, 1, nk, dh), lambda b_, h_, i: (b_, h_, 0, 0),
                            memory_space=pltpu.VMEM)
    qblk_spec = pl.BlockSpec(
        (1, 1, block_q, dh), lambda b_, h_, i: (b_, h_, i, 0),
        memory_space=pltpu.VMEM,
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, h, nqp // block_q),
        in_specs=[qblk_spec, qkv_spec, qkv_spec,
                  pl.BlockSpec((1, 1, nk), lambda b_, h_, i: (b_, 0, 0),
                               memory_space=pltpu.VMEM),
                  qblk_spec],
        out_specs=[qblk_spec, qkv_spec, qkv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nqp, dh), jnp.float32),
            jax.ShapeDtypeStruct((b, h, nk, dh), jnp.float32),
            jax.ShapeDtypeStruct((b, h, nk, dh), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, mask_bias, g)
    return dq[:, :, :nq], dk, dv


def _call(kernel, q, k, v, mask_bias, *, block_q, dh_out, v_width=None,
          interpret=False):
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    pad_q = (-nq) % block_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    nqp = nq + pad_q
    vw = v_width or v.shape[-1]
    return pl.pallas_call(
        kernel,
        grid=(b, h, nqp // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dh), lambda b_, h_, i: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, dh), lambda b_, h_, i: (b_, h_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, vw), lambda b_, h_, i: (b_, h_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk), lambda b_, h_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, dh_out), lambda b_, h_, i: (b_, h_, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, nqp, dh_out), q.dtype),
        interpret=interpret,
    )(q, k, v, mask_bias)[:, :, :nq]


# ---------------------------------------------------------------- timing


def timed(fn, q, *rest, iters, warmup=20):
    """Chained-carry timing (see memory: axon-tpu-timing).

    ``rest`` operands MUST be passed here (not closed over in ``fn``):
    closure arrays become constants inlined into the serialized HLO, and at
    this shape (k/v/g = 210 MB each) the axon remote-compile request body
    exceeds the tunnel's limit (HTTP 413) — the round-3 failure mode that
    kept this table unpublished."""

    @jax.jit
    def loop(q0, n, *r):
        def body(_, carry):
            out = fn(carry, *r)
            return carry + out * 1e-6

        # reduce to a scalar INSIDE the jit and force completion with a
        # host fetch: on this axon backend block_until_ready on the full
        # (B,H,N,Dh) carry returns early (measured 0.01 ms/iter for a ~9 ms
        # kernel); float() of a scalar result cannot lie
        return jax.lax.fori_loop(0, n, body, q0).sum()

    float(loop(q, warmup, *rest))
    t0 = time.perf_counter()
    float(loop(q, iters, *rest))
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--interpret", action="store_true",
                    help="interpret-mode kernels (CPU numerics validation)")
    ap.add_argument("--small", action="store_true",
                    help="tiny shape for the CPU validation run")
    ap.add_argument("--only", default=None,
                    help="run a single profile (current/floor/floor_noexp/"
                         "prescale/bf16exp/onescol/combined): one fresh "
                         "process per kernel so a compile hang can't take "
                         "the other measurements down with it")
    args = ap.parse_args()

    if args.small:
        SHAPE.update(b=1, h=1, n=128)
    b, h, n, dh = SHAPE["b"], SHAPE["h"], SHAPE["n"], SHAPE["dh"]
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, n, dh), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, n, dh), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, n, dh), jnp.bfloat16)
    lengths = jnp.full((b,), n, jnp.int32)
    k_mask = jnp.arange(n)[None, :] < lengths[:, None]
    mask_bias = jnp.where(k_mask, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]
    block_q = default_block_q(n, n)
    print(f"shape B={b} H={h} N={n} Dh={dh} bf16, block_q={block_q}, "
          f"programs={b * h * ((n + block_q - 1) // block_q)}")

    results = {}

    # reference output for numerics
    ref = _flash_forward(q, k, v, k_mask, causal=False, block_q=block_q,
                         interpret=args.interpret)

    def report(name, dt, out=None):
        us_per_prog = dt / (b * h) * 1e6
        err = ""
        if out is not None:
            err = f"  max|err|={float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))):.2e}"
        print(f"{name:12s} {dt * 1e3:7.2f} ms  ({us_per_prog:5.2f} us/prog){err}")
        results[name] = dt * 1e3

    def want(name):
        return args.only is None or args.only == name

    # current production kernel
    if not args.interpret and want("current"):
        dt = timed(lambda q_, k_, v_, m_: _flash_forward(
                       q_, k_, v_, m_, causal=False, block_q=block_q,
                       interpret=args.interpret),
                   q, k, v, k_mask, iters=args.iters)
        report("current", dt)

    # floor kernels (shape-check only under --interpret: their outputs are
    # deliberately not attention)
    for name, with_exp in [("floor", True), ("floor_noexp", False)]:
        if not want(name):
            continue
        kern = functools.partial(_floor_kernel, with_exp=with_exp)
        fl = lambda q_, k_, v_, mb_: _call(kern, q_, k_, v_, mb_,
                                           block_q=block_q, dh_out=dh,
                                           interpret=args.interpret)
        if args.interpret:
            jax.block_until_ready(fl(q, k, v, mask_bias))
            print(f"{name:12s} runs (no numerics: floor kernels are not attention)")
            continue
        dt = timed(fl, q, k, v, mask_bias, iters=args.iters)
        report(name, dt)

    # variants
    # ones column at index dh, zero-padded out to 128 lanes (Mosaic tiles
    # the lane dim at 128; a 65-wide operand would still occupy a full tile)
    v_ones = jnp.concatenate(
        [v, jnp.ones((b, h, n, 1), v.dtype),
         jnp.zeros((b, h, n, 128 - dh - 1), v.dtype)], axis=-1)
    scale = 1.0 / jnp.sqrt(jnp.float32(dh))
    q_pre = (q.astype(jnp.float32) * scale).astype(q.dtype)

    combos = [
        ("prescale", dict(prescale=True, bf16exp=False, onescol=False)),
        ("bf16exp", dict(prescale=False, bf16exp=True, onescol=False)),
        ("onescol", dict(prescale=False, bf16exp=False, onescol=True)),
        ("combined", dict(prescale=True, bf16exp=True, onescol=True)),
    ]
    for name, flags in combos:
        if not want(name):
            continue
        kern = functools.partial(_variant_kernel, **flags)
        vv = v_ones if flags["onescol"] else v
        qq = q_pre if flags["prescale"] else q
        fn = lambda q_, k_, v_, mb_: _call(
            kern, q_, k_, v_, mb_, block_q=block_q,
            dh_out=dh, v_width=vv.shape[-1], interpret=args.interpret)
        out = fn(qq, k, vv, mask_bias)
        if args.interpret:
            err = float(jnp.max(jnp.abs(
                out.astype(jnp.float32) - ref.astype(jnp.float32))))
            print(f"{name:12s} max|err|={err:.2e}")
            continue
        dt = timed(fn, qq, k, vv, mask_bias, iters=args.iters)
        report(name, dt, out)

    # ------------------------------------------------------------- backward
    g = jax.random.normal(jax.random.PRNGKey(9), (b, h, n, dh), jnp.bfloat16)
    bwd_ref = None
    if any(want(x) for x in
           ("bwd_current", "bwd_outid", "bwd_bf16exp", "bwd_combined")):
        bwd_ref = _flash_backward(q, k, v, k_mask, g, causal=False,
                                  block_q=block_q, interpret=args.interpret)

    def bwd_report(name, dt, grads=None):
        us_per_prog = dt / (b * h) * 1e6
        err = ""
        if grads is not None:
            err = "  max|err|=" + "/".join(
                f"{float(jnp.max(jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32)))):.2e}"
                for a, r in zip(grads, bwd_ref))
        print(f"{name:12s} {dt * 1e3:7.2f} ms  ({us_per_prog:5.2f} us/prog){err}")
        results[name] = dt * 1e3

    if want("bwd_current"):
        if args.interpret:
            print("bwd_current  runs (is the reference for bwd numerics)")
        else:
            dt = timed(lambda q_, k_, v_, m_, g_: _flash_backward(
                q_, k_, v_, m_, g_, causal=False, block_q=block_q,
                interpret=args.interpret)[0].astype(q_.dtype),
                q, k, v, k_mask, g, iters=args.iters)
            bwd_report("bwd_current", dt)

    bwd_combos = [
        ("bwd_outid", dict(outid=True, bf16exp=False)),
        ("bwd_bf16exp", dict(outid=False, bf16exp=True)),
        ("bwd_combined", dict(outid=True, bf16exp=True)),
    ]
    for name, flags in bwd_combos:
        if not want(name):
            continue
        kern = functools.partial(_bwd_variant_kernel, block_q=block_q,
                                 **flags)
        fn = lambda q_, k_, v_, mb_, g_: _bwd_call(
            kern, q_, k_, v_, mb_, g_,
            block_q=block_q, interpret=args.interpret)
        grads = fn(q, k, v, mask_bias, g)
        if args.interpret:
            errs = "/".join(
                f"{float(jnp.max(jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32)))):.2e}"
                for a, r in zip(grads, bwd_ref))
            print(f"{name:12s} max|err| dq/dk/dv = {errs}")
            continue
        dt = timed(lambda q_, *r_: fn(q_, *r_)[0].astype(q_.dtype),
                   q, k, v, mask_bias, g, iters=args.iters)
        bwd_report(name, dt, grads)

    print("\nsummary:", {k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
