"""Empirical VPU-floor measurement + pass-minimization variants for the
flash-attention forward kernel (VERDICT r2 item 6).

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
    # touch v + produce the (TQ, Dh) output without an MXU op
    out = eb[:, : q.shape[-1]].astype(jnp.float32) + v_ref[0, 0, : q.shape[0]]
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
    """Chained-carry timing (see memory: axon-tpu-timing)."""

    @jax.jit
    def loop(q0, n):
        def body(_, carry):
            out = fn(carry, *rest)
            return carry + out * 1e-6

        return jax.lax.fori_loop(0, n, body, q0)

    jax.block_until_ready(loop(q, warmup))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(q, iters))
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
        dt = timed(lambda q_: _flash_forward(q_, k, v, k_mask, causal=False,
                                             block_q=block_q,
                                             interpret=args.interpret),
                   q, iters=args.iters)
        report("current", dt)

    # floor kernels (shape-check only under --interpret: their outputs are
    # deliberately not attention)
    for name, with_exp in [("floor", True), ("floor_noexp", False)]:
        if not want(name):
            continue
        kern = functools.partial(_floor_kernel, with_exp=with_exp)
        fl = lambda q_: _call(kern, q_, k, v, mask_bias,
                              block_q=block_q, dh_out=dh,
                              interpret=args.interpret)
        if args.interpret:
            jax.block_until_ready(fl(q))
            print(f"{name:12s} runs (no numerics: floor kernels are not attention)")
            continue
        dt = timed(fl, q, iters=args.iters)
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
        fn = lambda q_: _call(kern, q_, k, vv, mask_bias, block_q=block_q,
                              dh_out=dh, v_width=vv.shape[-1],
                              interpret=args.interpret)
        out = fn(qq)
        if args.interpret:
            err = float(jnp.max(jnp.abs(
                out.astype(jnp.float32) - ref.astype(jnp.float32))))
            print(f"{name:12s} max|err|={err:.2e}")
            continue
        dt = timed(fn, qq, iters=args.iters)
        report(name, dt, out)

    print("\nsummary:", {k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
