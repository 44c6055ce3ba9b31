#!/bin/bash
# Round-4 deferred TPU tasks, run serially after the ml32m chain:
#   1. protocol-exact matched eval@1500 (fresh dir: auto_resume would
#      otherwise extend from the existing 5999 checkpoint)
#   2. matched-budget eval@3000 from the preserved step_2999 checkpoint
#   3. full-budget decoder: TEST-split trajectory over saved checkpoints
#      (the overfitting evidence for QUALITY.md)
#   4. amazon train-step decomposition (PERF.md bound table follow-up)
#   5. the new bs-256 long-context serving bench row
set -uo pipefail
cd "$(dirname "$0")/.."
echo "[r04 $(date +%H:%M:%S)] 1: matched 0->1500 rerun"
python -m rqvae_tpu.train.train_decoder configs/decoder_synthml32m.json \
    iterations=1500 full_eval_every=1500 save_model_every=1500 \
    save_dir_root=out/synthml32m/decoder_1500/ \
    > out/synthml32m/decoder_matched1500.log 2>&1
echo "[r04 $(date +%H:%M:%S)] 2: eval@3000 from step_2999"
python -m rqvae_tpu.evaluate.run_eval configs/decoder_synthml32m.json \
    --split eval --max-users 512 --step 2999 \
    > out/synthml32m/eval_3000_tpu.log 2>&1
echo "[r04 $(date +%H:%M:%S)] 3: full-budget test-split trajectory"
for step in 24999 74999 124999 199999; do
  python -m rqvae_tpu.evaluate.run_eval configs/decoder_synthbeauty_full.json \
      --split test --max-users 2048 --step $step \
      > out/synthbeauty_full/eval_test_$step.log 2>&1
  echo "  step $step done"
done
echo "[r04 $(date +%H:%M:%S)] 4: amazon step decomposition"
python experiments/amazon_step_floor.py > out/amazon_step_floor.log 2>&1
echo "[r04 $(date +%H:%M:%S)] 5: ml32m_generate_large bench"
python bench.py --profile ml32m_generate_large > out/bench_mgl.log 2>&1
echo "[r04 $(date +%H:%M:%S)] all done"
