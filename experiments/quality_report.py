"""Assemble the QUALITY.md comparison table from the run logs.

Reads ours (JSONL train logs + run_eval output) and the reference driver's
metrics.jsonl, prints markdown rows for the headline table.

Usage: python experiments/quality_report.py \
    --ours-decoder out/ours_decoder.log --ours-test out/ours_test_eval.log \
    --ref out/ref_quality/metrics.jsonl
"""
from __future__ import annotations

import argparse
import json


def _last_json_with(path, key):
    hit = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if key in rec:
                hit = rec
    return hit


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ours-decoder", default="out/ours_decoder.log")
    p.add_argument("--ours-test", default="out/ours_test_eval.log")
    p.add_argument("--ref", default="out/ref_quality/metrics.jsonl")
    p.add_argument("--ref-iter", type=int, default=None,
                   help="pick the ref full eval at this iter (default: last)")
    args = p.parse_args(argv)

    ours = _last_json_with(args.ours_decoder, "h@10_slice_:4")
    ours_test = _last_json_with(args.ours_test, "h@10_slice_:4")
    ref = None
    with open(args.ref) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("stage") == "decoder_full_eval" and (
                args.ref_iter is None or rec.get("iter") == args.ref_iter
            ):
                ref = rec

    def fmt(rec, key):
        return f"{rec[key]:.4f}" if rec and key in rec else "—"

    rows = [
        ("h@1 (exact item)", "h@1_slice_:4"),
        ("h@5", "h@5_slice_:4"),
        ("h@10", "h@10_slice_:4"),
        ("ndcg@10", "ndcg@10"),
        ("h@10 prefix len 1", "h@10_slice_:1"),
        ("h@10 prefix len 2", "h@10_slice_:2"),
        ("h@10 prefix len 3", "h@10_slice_:3"),
    ]
    print("| metric | ours (TPU) | reference (CPU torch) |")
    print("|---|---|---|")
    for label, key in rows:
        print(f"| {label} | {fmt(ours, key)} | {fmt(ref, key)} |")
    if ours_test:
        print(f"| test-split h@10 | {fmt(ours_test, 'h@10_slice_:4')} "
              f"(ndcg@10 {fmt(ours_test, 'ndcg@10')}) | see --stage eval |")
    if ref:
        print(f"\nref eval: iter={ref.get('iter')} n={ref.get('n_eval')} "
              f"wall={ref.get('eval_s', 0):.0f}s")


if __name__ == "__main__":
    main()
