#!/bin/bash
# Round-3 TPU stage 5 (restructured): certify the SHIPPING DEFAULT operating
# point (ambient-precision epochs + unconditional exact-f32 A* scoring and
# decode — docs/HEAD_TO_HEAD.md round 3) on both geometries, then profile +
# bench. Runs after the audio chain is stopped; the leading sleep waits out
# the device-grant wedge a killed TPU client leaves behind (CLAUDE.md).
set -u
cd /root/repo

sleep 540

echo "=== stage 5: ours patch h2h (kodak_mini, shipping default) ===" >> /tmp/r3_stage5.log
python scripts/babysit.py --log /tmp/ours_kodak_mini.log --stall 1500 -- \
  python scripts/head_to_head.py --side ours --geometry kodak_mini \
    --n_images 1 --enc_seed 7 --precision default \
    --state /tmp/h2h_state_kodak_mini \
    --out docs/head_to_head/ours_kodak_mini_s7.json >> /tmp/r3_stage5.log 2>&1
echo "=== ours patch h2h rc=$? ===" >> /tmp/r3_stage5.log
sleep 30

# 3 more cifar seeds of the shipping default (seed 8 = 42.246 dB already
# captured as ours_s8_sobol_default_hpdec.json, same operating point)
for seed in 7 9 10; do
  out=docs/head_to_head/ours_s${seed}_sobol_default_hpdec.json
  if [ -s "$out" ]; then echo "skip $out" >> /tmp/r3_stage5.log; continue; fi
  echo "=== stage 5: cifar h2h default seed ${seed} ===" >> /tmp/r3_stage5.log
  python scripts/babysit.py --log /tmp/h2h_default_s${seed}.log --stall 1500 -- \
    python scripts/head_to_head.py --side ours --n_images 8 --enc_seed ${seed} \
      --codebook sobol --precision default \
      --state /tmp/h2h_state_default_${seed} \
      --out ${out} >> /tmp/r3_stage5.log 2>&1
  echo "=== cifar default seed ${seed} rc=$? ===" >> /tmp/r3_stage5.log
  sleep 30
done

echo "=== stage 5: epoch profile ===" >> /tmp/r3_stage5.log
timeout 1500 python scripts/epoch_profile.py > docs/epoch_profile.json 2>> /tmp/r3_stage5.log
echo "=== epoch profile rc=$? ===" >> /tmp/r3_stage5.log
sleep 30

echo "=== stage 5: bench ===" >> /tmp/r3_stage5.log
timeout 1500 python bench.py > /tmp/bench_r3.log 2>&1
echo "=== bench rc=$? ===" >> /tmp/r3_stage5.log
echo "=== STAGE 5 COMPLETE ===" >> /tmp/r3_stage5.log

# stage 6: resume the audio retrain with whatever round time remains
# (chunk=1 programs, snapshots every iteration -> the next round resumes it)
echo "=== stage 6: audio retrain resume ===" >> /tmp/r3_stage4b.log
python scripts/babysit.py --log docs/rd_full_audio_r3.log --stall 1500 -- \
  python -m recombiner_tpu.cli.rd_sweep --dataset audio --synthetic 64 \
    --synthetic_kind speech --test_wav /root/reference/examples/ground_truth.wav \
    --bitrates 22.11 5.17 --em_chunk 1 --export_dir docs/media_r3 \
    --save_prior_dir docs/audio_state_r3 --train_state_dir docs/audio_state_r3 \
    --state_dir docs/audio_state_r3 \
    --out docs/rd_full_audio_r3.json >> /tmp/r3_stage4b.log 2>&1
echo "=== stage 6 rc=$? ===" >> /tmp/r3_stage4b.log
