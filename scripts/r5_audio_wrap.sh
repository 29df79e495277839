#!/bin/bash
# Round-5 wrapper for the audio 5.17 retrain: recycle-enabled babysit
# (the tunnel wedges clients ~45-50 min in; planned restarts beat 25-min
# stall detection). Holds the TPU until done; r5_tpu_queue waits on this
# script's pid via /tmp/r4_tpu_queue.pid.
set -u
cd /root/repo
python scripts/babysit.py --log docs/rd_full_audio_r4.log --stall 900 \
  --cooldown 640 --recycle 2400 --max_restarts 12 -- \
  python -m recombiner_tpu.cli.rd_sweep --dataset audio --synthetic 64 \
    --synthetic_kind speech --test_wav /root/reference/examples/ground_truth.wav \
    --bitrates 5.17 --em_chunk 1 --export_dir docs/media_r4 \
    --save_prior_dir docs/audio_state_r4 --train_state_dir docs/audio_state_r4 \
    --state_dir docs/audio_state_r4 \
    --out docs/rd_full_audio_r4.json >> /tmp/audio_r5_outer.log 2>&1
echo "=== AUDIO WRAP DONE rc=$? ($(date +%H:%M:%S)) ==="
