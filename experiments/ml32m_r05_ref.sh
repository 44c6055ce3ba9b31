#!/bin/bash
# Reference side (torch CPU) on the round-5 STRUCTURED corpus: 2 seeds,
# stage 1 matched 50k + decoder 1,500 iters (the CPU-completable budget,
# same as round 4) with the matched-budget eval at 1500.
set -euo pipefail
cd "$(dirname "$0")/.."
for s in 1 2; do
  echo "[r05-ref $(date +%H:%M:%S)] seed $s start"
  python experiments/ref_driver.py --root dataset/synth-ml32m-big --split "" \
      --out out/ref_ml32m_r05_s$s --seed $s --stage all --max-seq-len 200 \
      --vae-embed-dim 64 --rqvae-lr 1e-4 --rqvae-iters 50000 \
      --decoder-iters 1500 --decoder-bs 32 --attn-dim 192 --attn-heads 6 \
      --attn-layers 4 --decoder-embed-dim 64 --dropout 0.1 \
      --full-eval-every 1500 --eval-users 512 \
      > out/ref_ml32m_r05_s$s.log 2>&1
  echo "[r05-ref $(date +%H:%M:%S)] seed $s done"
done
