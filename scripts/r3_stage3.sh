#!/bin/bash
# Round-3 TPU stages 3-4 (serialized on the one chip):
#   3. kodak_mini full-EM prior for the patch-mode head-to-head (VERDICT #4)
#   4. audio retrain on the glottal-pulse generator at both published rate
#      points, with closed-loop rate control (VERDICT #2 + #3)
set -u
cd /root/repo

echo "=== stage 3: kodak_mini prior ===" >> /tmp/r3_stage3.log
python scripts/babysit.py --log /tmp/patch_prior.log --stall 1500 -- \
  python -m recombiner_tpu.cli.rd_sweep --dataset kodak_mini --synthetic 32 \
    --bitrates 2 --skip_encode --save_prior_dir docs/schedule_priors \
    --train_state_dir docs/schedule_priors_state \
    --out /tmp/kodak_mini_rd.json >> /tmp/r3_stage3.log 2>&1
echo "=== stage 3 rc=$? ===" >> /tmp/r3_stage3.log
sleep 60

echo "=== stage 4: audio retrain r3 ===" >> /tmp/r3_stage3.log
python scripts/babysit.py --log docs/rd_full_audio_r3.log --stall 1500 -- \
  python -m recombiner_tpu.cli.rd_sweep --dataset audio --synthetic 64 \
    --synthetic_kind speech --test_wav /root/reference/examples/ground_truth.wav \
    --bitrates 22.11 5.17 --export_dir docs/media_r3 \
    --save_prior_dir docs/audio_state_r3 --train_state_dir docs/audio_state_r3 \
    --state_dir docs/audio_state_r3 \
    --out docs/rd_full_audio_r3.json >> /tmp/r3_stage3.log 2>&1
echo "=== stage 4 rc=$? ===" >> /tmp/r3_stage3.log
echo "=== STAGE 3-4 COMPLETE ===" >> /tmp/r3_stage3.log
