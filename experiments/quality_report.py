"""Assemble the QUALITY.md comparison tables from the run logs.

Aggregates multi-seed runs on both sides and keeps the two reference
architectures separate (--arch custom = the reference's own pre-RMSNorm
TransformerEncoderDecoder, reference modules/transformer/model.py:139-188,
run via the pure-torch jagged shims; --arch nn = the torch nn.Transformer
fallback that reference modules/model.py:87-95 silently substitutes under
jagged_mode=False).

Usage: python experiments/quality_report.py \
    --ours out/ours_decoder.log out/synthbeauty_s43/decoder.log ... \
    --ours-test out/ours_test_eval.log \
    --ref-custom out/ref_jagged_s0/metrics.jsonl out/ref_jagged_s1/... \
    --ref-nn out/ref_quality/metrics.jsonl
"""
from __future__ import annotations

import argparse
import itertools
import math

from _logs import json_lines as _json_lines


def _last_with(path, key, pred=lambda r: True):
    hit = None
    for rec in _json_lines(path):
        if key in rec and pred(rec):
            hit = rec
    return hit


def ours_evals(path):
    """Final full-eval record of EACH training run in one of our decoder
    train logs (a file may hold several sequential seed runs — the step
    counter resetting marks a new run)."""
    runs, last_step, cur = [], None, None
    for rec in _json_lines(path):
        step = rec.get("step")
        if step is not None and last_step is not None and step < last_step:
            if cur:
                runs.append(cur)
            cur = None
        if step is not None:
            last_step = step
        if "h@10_slice_:4" in rec:
            cur = rec
    if cur:
        runs.append(cur)
    return runs


def ref_eval(path, split):
    """Reference driver full-eval record: split 'eval' = end-of-training
    (iter >= 0), 'test' = the eval-only rerun (iter == -1)."""
    want = (lambda r: r.get("iter", 0) >= 0) if split == "eval" else (
        lambda r: r.get("iter") == -1)
    return _last_with(path, "h@10_slice_:4",
                      lambda r: r.get("stage") == "decoder_full_eval" and want(r))


def agg(recs, key):
    vals = [r[key] for r in recs if r and key in r]
    if not vals:
        return "—"
    if len(vals) == 1:
        return f"{vals[0]:.4f}"
    mean = sum(vals) / len(vals)
    sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / (len(vals) - 1))
    return f"{mean:.4f} ± {sd:.4f}"


ROWS = [
    ("h@1 (exact item)", "h@1_slice_:4"),
    ("h@5", "h@5_slice_:4"),
    ("h@10", "h@10_slice_:4"),
    ("ndcg@10", "ndcg@10"),
    ("h@10 prefix len 1", "h@10_slice_:1"),
    ("h@10 prefix len 2", "h@10_slice_:2"),
    ("h@10 prefix len 3", "h@10_slice_:3"),
]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ours", nargs="+", default=["out/ours_decoder.log"])
    p.add_argument("--ours-test", nargs="+", default=["out/ours_test_eval.log"])
    p.add_argument("--ref-custom", nargs="*", default=[])
    p.add_argument("--ref-nn", nargs="*", default=[])
    args = p.parse_args(argv)

    ours = [r for f in args.ours for r in ours_evals(f)]
    ours_test = [r for f in args.ours_test for r in ours_evals(f)]
    cols = [(f"ours (TPU, n={len(ours)})", ours, ours_test)]
    for name, paths in [("reference custom pre-RMSNorm", args.ref_custom),
                        ("reference nn.Transformer", args.ref_nn)]:
        if paths:
            cols.append((f"{name} (n={len(paths)})",
                         [ref_eval(f, "eval") for f in paths],
                         [ref_eval(f, "test") for f in paths]))

    print("| metric | " + " | ".join(c[0] for c in cols) + " |")
    print("|---" * (len(cols) + 1) + "|")
    for label, key in ROWS:
        cells = [agg(c[1], key) for c in cols]
        print(f"| {label} | " + " | ".join(cells) + " |")
    for label, key in [("test-split h@10", "h@10_slice_:4"),
                       ("test-split ndcg@10", "ndcg@10")]:
        cells = [agg(c[2], key) for c in cols]
        print(f"| {label} | " + " | ".join(cells) + " |")

    print("\nper-seed h@10 (eval / test):")
    for name, evs, tests in cols:
        pairs = []
        for e, t in itertools.zip_longest(evs, tests):
            ev = f"{e['h@10_slice_:4']:.4f}" if e else "—"
            tv = f"{t['h@10_slice_:4']:.4f}" if t else "—"
            pairs.append(f"{ev}/{tv}")
        print(f"  {name}: {' '.join(pairs)}")


if __name__ == "__main__":
    main()
