#!/bin/bash
# Round-4 TPU queue (session 2), sequential (one chip, one grant):
#   1. ours engine on audio_mini at the SAME matched reduced schedule the
#      CPU queue runs the torch engine at (n_opt 3000) — the h2h pair.
#   2. the audio 5.17 kbps retrain (VERDICT r3 next #2) at the round-4
#      quality level (rate-control deadband + terminal nearest-rate
#      selection), full resume state persisted in-repo so a round boundary
#      loses <=10 EM iters / one fused chunk.
set -u
cd /root/repo
H=docs/head_to_head

if [ ! -s $H/ours_audio_mini_s7_n3000.json ]; then
  echo "=== ours audio_mini n_opt=3000 ($(date +%H:%M:%S)) ==="
  python scripts/head_to_head.py --side ours --geometry audio_mini \
    --n_images 4 --enc_seed 7 --codebook sobol --precision default \
    --n_opt 3000 --out $H/ours_audio_mini_s7_n3000.json \
    > /tmp/ours_audio_mini_n3000.log 2>&1 || echo "ours audio_mini rc=$?"
fi

echo "=== audio 5.17 retrain ($(date +%H:%M:%S)) ==="
mkdir -p docs/audio_state_r4 docs/media_r4
python scripts/babysit.py --log docs/rd_full_audio_r4.log --stall 1500 -- \
  python -m recombiner_tpu.cli.rd_sweep --dataset audio --synthetic 64 \
    --synthetic_kind speech --test_wav /root/reference/examples/ground_truth.wav \
    --bitrates 5.17 --em_chunk 1 --export_dir docs/media_r4 \
    --save_prior_dir docs/audio_state_r4 --train_state_dir docs/audio_state_r4 \
    --state_dir docs/audio_state_r4 \
    --out docs/rd_full_audio_r4.json >> /tmp/audio_r4_outer.log 2>&1
echo "=== TPU QUEUE DONE rc=$? ($(date +%H:%M:%S)) ==="
