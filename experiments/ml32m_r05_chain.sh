#!/bin/bash
# ML-32M round-5 quality chain on the STRUCTURED corpus (Zipf popularity +
# cluster persistence, experiments/make_synth_ml32m.py round-5 defaults —
# popularity-oracle h@10 ceiling ~0.3, so generative eval finally has a
# non-chance target). All ours-side runs on the TPU; outputs under
# out/synthml32m_r05/ so the round-4 flat-popularity logs stay intact.
#
# Prereq: python experiments/make_synth_ml32m.py --root dataset/synth-ml32m-big \
#             --n-movies 30000 --n-users 39000
set -euo pipefail
cd "$(dirname "$0")/.."
O=out/synthml32m_r05
mkdir -p $O
echo "[r05 $(date +%H:%M:%S)] stage 1 (50k, matched rqvae_ml32m.gin hypers)"
python -m rqvae_tpu.train.train_rqvae configs/rqvae_synthml32m.json \
    save_dir_root=$O/rqvae/ > $O/rqvae.log 2>&1
echo "[r05 $(date +%H:%M:%S)] stage 2 matched (3k, attn 192x4L bs 32; evals at 1500+3000)"
python -m rqvae_tpu.train.train_decoder configs/decoder_synthml32m.json \
    pretrained_rqvae_path=$O/rqvae/ save_dir_root=$O/decoder_matched/ \
    full_eval_every=1500 > $O/decoder_matched.log 2>&1
echo "[r05 $(date +%H:%M:%S)] stage 2 deep (25k, same arch, full eval every 2.5k)"
python -m rqvae_tpu.train.train_decoder configs/decoder_synthml32m_deep.json \
    pretrained_rqvae_path=$O/rqvae/ save_dir_root=$O/decoder_deep/ \
    > $O/decoder_deep.log 2>&1
echo "[r05 $(date +%H:%M:%S)] TPU-path standalone evals (512 users)"
python -m rqvae_tpu.evaluate.run_eval configs/decoder_synthml32m.json \
    pretrained_rqvae_path=$O/rqvae/ save_dir_root=$O/decoder_matched/ \
    --split eval --max-users 512 > $O/eval_matched_tpu.log 2>&1
python -m rqvae_tpu.evaluate.run_eval configs/decoder_synthml32m_deep.json \
    pretrained_rqvae_path=$O/rqvae/ save_dir_root=$O/decoder_deep/ \
    --split eval --max-users 512 > $O/eval_deep_tpu.log 2>&1
echo "[r05 $(date +%H:%M:%S)] full-size arch (decoder_ml32m.json, 25k @ bs 64)"
python -m rqvae_tpu.train.train_decoder configs/decoder_ml32m.json \
    iterations=25000 pretrained_rqvae_path=$O/rqvae/ \
    save_dir_root=$O/decoder_full/ dataset_folder=dataset/synth-ml32m-big \
    full_eval_every=12500 partial_eval_every=5000 save_model_every=12500 \
    > $O/decoder_full.log 2>&1
python -m rqvae_tpu.evaluate.run_eval configs/decoder_ml32m.json \
    pretrained_rqvae_path=$O/rqvae/ save_dir_root=$O/decoder_full/ \
    dataset_folder=dataset/synth-ml32m-big --split eval --max-users 512 \
    > $O/eval_full_tpu.log 2>&1
echo "[r05 $(date +%H:%M:%S)] all done"
