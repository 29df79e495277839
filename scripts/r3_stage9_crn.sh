#!/bin/bash
# Round-3 stage 9: common-random-numbers finetune experiment. The reference's
# train() uses random_seed=epoch (test_model.py:621-623), so every coding-
# phase finetune minimizes the SAME per-epoch noise draws — variance
# reduction ours lacked (fresh keys per finetune). Measure CRN on both
# geometries at the shipping default precision.
set -u
cd /root/repo

run () {
  geom=$1; seed=$2; out=$3; extra=$4
  if [ -s "$out" ]; then echo "skip $out" >> /tmp/r3_stage9.log; return; fi
  echo "=== stage 9: $geom s$seed crn ===" >> /tmp/r3_stage9.log
  python scripts/babysit.py --log /tmp/h2h_crn_${geom}_s${seed}.log --stall 1800 -- \
    python scripts/head_to_head.py --side ours --enc_seed ${seed} \
      --precision default --finetune_crn ${extra} \
      --state /tmp/h2h_crn_${geom}_${seed} \
      --out ${out} >> /tmp/r3_stage9.log 2>&1
  echo "=== $geom s$seed crn rc=$? ===" >> /tmp/r3_stage9.log
  sleep 20
}

run kodak_mini 7 docs/head_to_head/ours_kodak_mini_s7_crn.json "--geometry kodak_mini --n_images 1"
run cifar 8 docs/head_to_head/ours_s8_sobol_crn.json "--n_images 8 --codebook sobol"
run kodak_mini 8 docs/head_to_head/ours_kodak_mini_s8_crn.json "--geometry kodak_mini --n_images 1"
run cifar 9 docs/head_to_head/ours_s9_sobol_crn.json "--n_images 8 --codebook sobol"
run cifar 7 docs/head_to_head/ours_s7_sobol_crn.json "--n_images 8 --codebook sobol"
run cifar 10 docs/head_to_head/ours_s10_sobol_crn.json "--n_images 8 --codebook sobol"
echo "=== STAGE 9 COMPLETE ===" >> /tmp/r3_stage9.log

# stage 10: resume the audio retrain with the remaining round time
echo "=== stage 10: audio retrain resume ===" >> /tmp/r3_stage9.log
python scripts/babysit.py --log docs/rd_full_audio_r3.log --stall 1500 -- \
  python -m recombiner_tpu.cli.rd_sweep --dataset audio --synthetic 64 \
    --synthetic_kind speech --test_wav /root/reference/examples/ground_truth.wav \
    --bitrates 22.11 5.17 --em_chunk 1 --export_dir docs/media_r3 \
    --save_prior_dir docs/audio_state_r3 --train_state_dir docs/audio_state_r3 \
    --state_dir docs/audio_state_r3 \
    --out docs/rd_full_audio_r3.json >> /tmp/r3_stage9.log 2>&1
echo "=== stage 10 rc=$? ===" >> /tmp/r3_stage9.log
