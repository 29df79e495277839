#!/bin/bash
# Round-3 stage 7: precision ablations after the 4-seed shipping-default
# cifar band (42.225 +- 0.015) landed 0.12 dB below torch while global-f32
# was 42.33 +- 0.10 — and the kodak_mini patch path showed a 0.45 dB gap
# (phase-1 -0.36, w-coding -0.50, h-level recovers). Questions:
#   1. kodak_mini at global 'highest': is the patch gap precision?
#   2. cifar at 'scoped' NOW THAT scoped covers the stitch/PE convs too
#      (encoder.predict threads precision into lpe_to_pe): does exact-f32
#      finetuning recover the last ~0.1 dB at ~1.15x wall?
#   3. kodak_mini default seeds 8/9: noise bound on the patch gap.
set -u
cd /root/repo

run_km () {
  seed=$1; mode=$2; out=docs/head_to_head/ours_kodak_mini_s${seed}_${mode}.json
  if [ -s "$out" ]; then echo "skip $out" >> /tmp/r3_stage7.log; return; fi
  echo "=== stage 7: kodak_mini seed ${seed} ${mode} ===" >> /tmp/r3_stage7.log
  python scripts/babysit.py --log /tmp/ours_km_s${seed}_${mode}.log --stall 1800 -- \
    python scripts/head_to_head.py --side ours --geometry kodak_mini \
      --n_images 1 --enc_seed ${seed} --precision ${mode} \
      --state /tmp/h2h_km_s${seed}_${mode} \
      --out ${out} >> /tmp/r3_stage7.log 2>&1
  echo "=== kodak_mini s${seed} ${mode} rc=$? ===" >> /tmp/r3_stage7.log
  sleep 20
}

run_cf () {
  seed=$1; mode=$2; out=docs/head_to_head/ours_s${seed}_sobol_${mode}_conv.json
  if [ -s "$out" ]; then echo "skip $out" >> /tmp/r3_stage7.log; return; fi
  echo "=== stage 7: cifar seed ${seed} ${mode}+conv ===" >> /tmp/r3_stage7.log
  python scripts/babysit.py --log /tmp/h2h_${mode}conv_s${seed}.log --stall 1800 -- \
    python scripts/head_to_head.py --side ours --n_images 8 --enc_seed ${seed} \
      --codebook sobol --precision ${mode} \
      --state /tmp/h2h_state_${mode}conv_${seed} \
      --out ${out} >> /tmp/r3_stage7.log 2>&1
  echo "=== cifar s${seed} ${mode}+conv rc=$? ===" >> /tmp/r3_stage7.log
  sleep 20
}

run_km 7 highest     # patch gap: precision or structural?
run_cf 8 scoped      # finetunes fully exact (INR einsums + convs)
run_cf 9 scoped
run_cf 10 scoped
run_cf 7 scoped
run_km 8 default     # patch noise bound
run_km 9 default
run_km 7 scoped      # patch finetune-only precision
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
