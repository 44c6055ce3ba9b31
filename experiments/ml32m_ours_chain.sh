#!/bin/bash
# ML-32M ours-side quality chain (VERDICT r3 item 3), all on the TPU:
#   stage 1 (50k iters, matched rqvae_ml32m.gin hypers)
#   stage 2 matched protocol (3k iters, attn 192x4L bs 32 — the reference-
#     comparable run; the torch-CPU reference side runs the same protocol)
#   stage 2 deep (25k iters, same arch, full generative eval every 2.5k —
#     the h@k trajectory behind the matched-budget iter-3k comparison)
#   run_eval on both final checkpoints through the TPU path (512 users,
#     corpus order, eval split — the r3 protocol)
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p out/synthml32m
echo "[ml32m_ours $(date +%H:%M:%S)] stage 1 start"
python -m rqvae_tpu.train.train_rqvae configs/rqvae_synthml32m.json \
    > out/synthml32m/rqvae.log 2>&1
echo "[ml32m_ours $(date +%H:%M:%S)] stage 2 matched (3k) start"
# full_eval_every=1500 lands evals at 1500 AND 3000: the round-4 reference
# seed (s1) runs a contended-host-completable 1500-iter decoder, so 1500
# is the paired matched-budget eval point this round
python -m rqvae_tpu.train.train_decoder configs/decoder_synthml32m.json \
    full_eval_every=1500 \
    > out/synthml32m/decoder_matched.log 2>&1
echo "[ml32m_ours $(date +%H:%M:%S)] stage 2 deep (25k) start"
python -m rqvae_tpu.train.train_decoder configs/decoder_synthml32m_deep.json \
    > out/synthml32m/decoder_deep.log 2>&1
echo "[ml32m_ours $(date +%H:%M:%S)] TPU-path evals"
python -m rqvae_tpu.evaluate.run_eval configs/decoder_synthml32m.json \
    --split eval --max-users 512 \
    > out/synthml32m/eval_matched_tpu.log 2>&1
python -m rqvae_tpu.evaluate.run_eval configs/decoder_synthml32m_deep.json \
    --split eval --max-users 512 \
    > out/synthml32m/eval_deep_tpu.log 2>&1
echo "[ml32m_ours $(date +%H:%M:%S)] all done"
