#!/bin/bash
# Round-3 stage 4b: audio retrain relaunch with --em_chunk 1.
# The chunk-of-10 nested-scan EM program crashed the remote TPU worker
# deterministically on the audio geometry (docs/rd_full_audio_r3.log,
# 4 attempts, same site); chunk=1 is the round-2-proven per-iteration
# program shape. Resumes from docs/audio_state_r3 (22.11 point, 1 iter done).
# Chains into stage 5 (ours patch h2h + epoch profile + bench) when done.
set -u
cd /root/repo

echo "=== stage 4b: audio retrain r3 (em_chunk=1) ===" >> /tmp/r3_stage4b.log
python scripts/babysit.py --log docs/rd_full_audio_r3.log --stall 1500 -- \
  python -m recombiner_tpu.cli.rd_sweep --dataset audio --synthetic 64 \
    --synthetic_kind speech --test_wav /root/reference/examples/ground_truth.wav \
    --bitrates 22.11 5.17 --em_chunk 1 --export_dir docs/media_r3 \
    --save_prior_dir docs/audio_state_r3 --train_state_dir docs/audio_state_r3 \
    --state_dir docs/audio_state_r3 \
    --out docs/rd_full_audio_r3.json >> /tmp/r3_stage4b.log 2>&1
echo "=== stage 4b rc=$? ===" >> /tmp/r3_stage4b.log
sleep 60

bash /root/repo/scripts/r3_stage5.sh
echo "=== STAGE 4B+5 COMPLETE ===" >> /tmp/r3_stage4b.log
