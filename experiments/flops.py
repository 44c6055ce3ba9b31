"""Analytic bf16-matmul FLOP counts behind docs/PERF.md's bound table.

Counts matmul FLOPs only (projections, attention scores/PV, FFN, logits
head) for the flagship decoder (8L/512w, 8 heads, Dh 64, FFN 1024, vocab
256, embed 128); embeddings, norms, elementwise and the optimizer are
excluded — so the derived rooflines are LOWER bounds on step time only up
to that approximation. fwd+bwd ≈ 3x fwd. v5e bf16 peak ≈ 197 TFLOP/s.

Run: python experiments/flops.py
"""
from __future__ import annotations

import numpy as np

PEAK = 197e12  # v5e bf16 matmul peak, FLOP/s


def decoder_flops(B, N_enc, N_dec=5, L_enc=4, L_dec=4, D=512, Dh=64, H=8,
                  ffn=1024, K=256, emb=128):
    """Matmul FLOPs, one forward pass of the retrieval decoder."""
    def lin(rows, din, dout):
        return 2 * rows * din * dout

    f = lin(B * N_enc, emb, D) + lin(B * N_dec, emb, D)      # in-projections
    f += L_enc * (
        lin(B * N_enc, D, 3 * D) + lin(B * N_enc, D, D)      # qkv + out
        + 2 * 2 * B * H * N_enc * N_enc * Dh                 # QK^T + PV
        + lin(B * N_enc, D, ffn) + lin(B * N_enc, ffn, D)    # FFN
    )
    f += L_dec * (
        lin(B * N_dec, D, 3 * D) + lin(B * N_dec, D, D)      # self qkv + out
        + 2 * 2 * B * H * N_dec * N_dec * Dh                 # self scores
        + lin(B * N_dec, D, D) + lin(B * N_enc, D, 2 * D)    # cross q, kv
        + lin(B * N_dec, D, D)                               # cross out
        + 2 * 2 * B * H * N_dec * N_enc * Dh                 # cross scores
        + lin(B * N_dec, D, ffn) + lin(B * N_dec, ffn, D)    # FFN
    )
    f += lin(B * N_dec, D, K)                                # logits head
    return f


def flash_score_flops(B, N, H=8, Dh=64, layers=4):
    """The score-matmul FLOPs inside the flash kernel (fwd), all layers."""
    return layers * 4 * B * H * N * N * Dh


def main():
    for name, B, n_items in [("amazon", 256, 20), ("ml32m_flat", 256, 200)]:
        n = n_items * 4 + 1
        fwd = decoder_flops(B, n)
        tot = 3 * fwd
        print(f"{name}: fwd {fwd / 1e12:.3f} TFLOP, fwd+bwd "
              f"{tot / 1e12:.3f} TFLOP -> matmul roofline "
              f"{tot / PEAK * 1e3:.2f} ms = {B / (tot / PEAK):,.0f} ex/s")

    # ml32m composite bound: flash layers at the MEASURED floor
    # (experiments/flash_floor.py: 8.61 ms fwd + 17.36 ms bwd per layer at
    # B=256/N=801) + the non-flash remainder at the matmul roofline
    B, n = 256, 801
    tot = 3 * decoder_flops(B, n)
    flash_scores = 3 * flash_score_flops(B, n)
    flash_ms = 4 * (8.61 + 17.36)
    rest_ms = (tot - flash_scores) / PEAK * 1e3
    bound_ms = flash_ms + rest_ms
    print(f"ml32m composite bound: flash {flash_ms:.1f} ms + rest "
          f"{rest_ms:.1f} ms = {bound_ms:.1f} ms -> "
          f"{B / bound_ms * 1e3:,.0f} ex/s")

    # bucketed expected FLOPs on the real crop-length distribution
    try:
        lengths = np.load("out/ml32m_crop_lengths.npy")
    except FileNotFoundError:
        print("(no out/ml32m_crop_lengths.npy — skipping bucketed estimate)")
        return
    rng = np.random.default_rng(0)
    sums = []
    for _ in range(20):
        l = np.sort(rng.choice(lengths, 256, replace=False))[::-1]
        groups = np.split(l, 4)
        f = sum(
            decoder_flops(64, int(np.ceil(g.max() / 4) * 4) * 4 + 1)
            for g in groups
        )
        sums.append(3 * f)
    tot = float(np.mean(sums))
    print(f"ml32m_bucketed (4 buckets, real lengths): fwd+bwd "
          f"{tot / 1e12:.3f} TFLOP -> matmul roofline "
          f"{256 / (tot / PEAK):,.0f} ex/s")


if __name__ == "__main__":
    main()
