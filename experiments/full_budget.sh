#!/bin/bash
# Full-budget run at the reference's SHIPPED protocol (VERDICT r3 item 4):
# stage 1 400k iters bs 64 (reference configs/rqvae_amazon.gin:4) +
# stage 2 200k iters bs 256 (reference configs/decoder_amazon.gin:4) on the
# Beauty-scale synthetic corpus, then a test-split eval at 2048 users —
# the same protocol as QUALITY.md's 40k/10k headline table, at 10x/20x depth.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p out/synthbeauty_full
echo "[full_budget $(date +%H:%M:%S)] stage 1 start"
python -m rqvae_tpu.train.train_rqvae configs/rqvae_synthbeauty_full.json \
    > out/synthbeauty_full/rqvae.log 2>&1
echo "[full_budget $(date +%H:%M:%S)] stage 2 start"
python -m rqvae_tpu.train.train_decoder configs/decoder_synthbeauty_full.json \
    > out/synthbeauty_full/decoder.log 2>&1
echo "[full_budget $(date +%H:%M:%S)] test eval start"
python -m rqvae_tpu.evaluate.run_eval configs/decoder_synthbeauty_full.json \
    --split test --max-users 2048 \
    > out/synthbeauty_full/eval_test.log 2>&1
echo "[full_budget $(date +%H:%M:%S)] all done"
