"""Assemble the QUALITY.md ML-32M comparison from the run logs.

Stage 1: final train/eval reconstruction + diversity from both sides.
Stage 2: per-position CE losses at matched iteration checkpoints (the
3000-iter matched protocol is deliberately short of convergence — the CPU
reference runs at 0.35 it/s — so the comparable signal is the loss
TRAJECTORY, not end-state h@k), plus whatever full-eval records exist.

Usage: python experiments/ml32m_report.py \
    --ours-rqvae out/queue/done/70_ours_ml32m_rq_cpu.sh.log \
    --ours-decoder out/rb_ml32m_decoder.log \
    --ref out/ref_ml32m/metrics.jsonl [--iters 600 1400 2200 3000]
"""
from __future__ import annotations

import argparse

from _logs import json_lines as _json_lines


def _nearest(recs, step_key, target):
    best, dist = None, None
    for r in recs:
        d = abs(r[step_key] - target)
        if dist is None or d < dist:
            best, dist = r, d
    return best


def _window_mean(recs, step_key, target, half_width):
    """Mean of total/per-position losses over records within +/-half_width.

    Single-batch CE at ML-32M shapes is dominated by the batch's sequence-
    length mix (p50 swings 60-240 tokens between logged steps), so point
    losses are not comparable across frameworks; a windowed mean is.
    """
    win = [r for r in recs if abs(r[step_key] - target) <= half_width]
    if not win:
        return None
    out = {"n": len(win),
           "total_loss": sum(r["total_loss"] for r in win) / len(win)}
    for i in range(4):
        out[f"loss_{i}"] = sum(r[f"loss_{i}"] for r in win) / len(win)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ours-rqvae", required=True)
    p.add_argument("--ours-decoder", default=None)
    p.add_argument("--ref", required=True)
    p.add_argument("--iters", type=int, nargs="+",
                   default=[600, 1400, 2200, 3000])
    p.add_argument("--window", type=int, default=300,
                   help="half-width (iters) of the smoothing window; "
                        "0 = raw nearest-record values")
    args = p.parse_args(argv)

    ref = list(_json_lines(args.ref))
    ours_rq = [r for r in _json_lines(args.ours_rqvae) if "step" in r]

    # ---- stage 1
    ref_rq_last = [r for r in ref if r.get("stage") == "rqvae"][-1]
    ref_rq_eval = [r for r in ref if r.get("stage") == "rqvae_eval"][-1]
    ref_tok = [r for r in ref if r.get("stage") == "tokenizer"][-1]
    ours_last = [r for r in ours_rq if "total_loss" in r][-1]
    ours_eval = [r for r in ours_rq if "eval_total_loss" in r][-1]
    n_items = ref_tok["n_items"]
    print("stage 1 (50k iters, matched hypers):\n")
    print("| metric | ours | reference |")
    print("|---|---|---|")
    print(f"| final train total loss | {ours_last['total_loss']:.4f} "
          f"| {ref_rq_last['total_loss']:.4f} |")
    print(f"| eval reconstruction loss | "
          f"{ours_eval['eval_reconstruction_loss']:.4f} "
          f"| {ref_rq_eval['eval_reconstruction_loss']:.4f} |")
    ours_dup = ours_eval.get("max_id_duplicates")
    dup = ("—" if ours_dup is None
           else f"{round(ours_dup * n_items)}")
    print(f"| max dedup rank (of {n_items:,}) | {dup} "
          f"| {ref_tok['max_id_duplicates']} |")
    ent = ours_eval.get("rqvae_entropy")
    print(f"| rqvae_entropy | {ent:.2f} | (not logged by the driver) |"
          if ent is not None else "")

    # ---- stage 2 loss trajectory
    if not args.ours_decoder:
        return
    ours_dec = [r for r in _json_lines(args.ours_decoder)
                if "total_loss" in r and "step" in r]
    ref_dec = [r for r in ref if r.get("stage") == "decoder"]
    if args.window:
        print(f"\nstage 2 loss trajectory (per-position CE, mean over "
              f"iter±{args.window} — single-batch losses swing with the "
              f"batch's length mix):\n")
    else:
        print("\nstage 2 loss trajectory (per-position CE, matched iters):\n")
    hdr = "| iter | ours total | ref total | ours pos 0-3 | ref pos 0-3 |"
    print(hdr)
    print("|---" * 5 + "|")
    for it in args.iters:
        if args.window:
            o = _window_mean(ours_dec, "step", it, args.window)
            r = _window_mean(ref_dec, "iter", it, args.window)
            label = (f"{it} (n={o['n']}/{r['n']})"
                     if o is not None and r is not None else str(it))
        else:
            o = _nearest(ours_dec, "step", it)
            r = _nearest(ref_dec, "iter", it)
            label = (f"{it} (ours@{o['step']}, ref@{r['iter']})"
                     if o is not None and r is not None else str(it))
        if o is None or r is None:
            continue
        od = "/".join(f"{o[f'loss_{i}']:.2f}" for i in range(4))
        rd = "/".join(f"{r[f'loss_{i}']:.2f}" for i in range(4))
        print(f"| {label} "
              f"| {o['total_loss']:.3f} | {r['total_loss']:.3f} "
              f"| {od} | {rd} |")

    # ---- full evals
    print("\nfull-eval records (512 users, top-32 beams):")
    for name, recs, key in [("ours", ours_dec and list(
            _json_lines(args.ours_decoder)) or [], "step"),
            ("ref", ref, "iter")]:
        for r in recs:
            if "h@10_slice_:4" in r:
                print(f"  {name}@{r.get(key)}: "
                      f"h@10={r['h@10_slice_:4']:.4f} "
                      f"h@5={r['h@5_slice_:4']:.4f} "
                      f"ndcg@10={r.get('ndcg@10', float('nan')):.4f}")


if __name__ == "__main__":
    main()
