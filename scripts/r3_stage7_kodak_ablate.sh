#!/bin/bash
# Round-3 stage 7: classify the kodak_mini patch-path gap (ours default
# 46.62 vs torch 47.07 dB, single seed each). Seeds 8/9 at the shipping
# default bound run-to-run noise; 'scoped' (finetune einsums at exact f32)
# tests whether the patch path — unlike cifar — is finetune-precision
# sensitive at full schedule.
set -u
cd /root/repo

run_km () {
  seed=$1; mode=$2; out=docs/head_to_head/ours_kodak_mini_s${seed}_${mode}.json
  if [ -s "$out" ]; then echo "skip $out" >> /tmp/r3_stage7.log; return; fi
  echo "=== stage 7: kodak_mini seed ${seed} ${mode} ===" >> /tmp/r3_stage7.log
  python scripts/babysit.py --log /tmp/ours_km_s${seed}_${mode}.log --stall 1500 -- \
    python scripts/head_to_head.py --side ours --geometry kodak_mini \
      --n_images 1 --enc_seed ${seed} --precision ${mode} \
      --state /tmp/h2h_km_s${seed}_${mode} \
      --out ${out} >> /tmp/r3_stage7.log 2>&1
  echo "=== kodak_mini s${seed} ${mode} rc=$? ===" >> /tmp/r3_stage7.log
  sleep 20
}

run_km 8 default
run_km 9 default
run_km 7 scoped
echo "=== STAGE 7 COMPLETE ===" >> /tmp/r3_stage7.log

# stage 8: resume the audio retrain with the remaining round time
echo "=== stage 8: audio retrain resume ===" >> /tmp/r3_stage7.log
python scripts/babysit.py --log docs/rd_full_audio_r3.log --stall 1500 -- \
  python -m recombiner_tpu.cli.rd_sweep --dataset audio --synthetic 64 \
    --synthetic_kind speech --test_wav /root/reference/examples/ground_truth.wav \
    --bitrates 22.11 5.17 --em_chunk 1 --export_dir docs/media_r3 \
    --save_prior_dir docs/audio_state_r3 --train_state_dir docs/audio_state_r3 \
    --state_dir docs/audio_state_r3 \
    --out docs/rd_full_audio_r3.json >> /tmp/r3_stage7.log 2>&1
echo "=== stage 8 rc=$? ===" >> /tmp/r3_stage7.log
