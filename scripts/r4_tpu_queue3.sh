#!/bin/bash
# Round-4 TPU queue stage 3 (after stage 2): does the adaptive preset
# generalize beyond cifar? Run the kodak_mini patch h2h at the shipped
# `--schedule adaptive` knobs and compare against the full-schedule CRN
# results (46.92 s7 / 47.19 s8) and torch (47.073 s42). A big drop means
# the preset must stay documented as cifar-tuned.
set -u
cd /root/repo
H=docs/head_to_head

while kill -0 "$(cat /tmp/r4_tpu_queue2.pid)" 2>/dev/null; do sleep 60; done

for s in 7 8; do
  out=$H/ours_kodak_mini_s${s}_adaptive.json
  if [ -s "$out" ]; then echo "skip s$s"; continue; fi
  echo "=== kodak_mini adaptive s$s ($(date +%H:%M:%S)) ==="
  python scripts/head_to_head.py --side ours --geometry kodak_mini \
    --n_images 1 --enc_seed $s --precision default \
    --n_opt 15000 --p1_lr 6e-4 2e-5 --p1_samples 3 \
    --ft_stop 40 0.001 80 --fused_steps 8 \
    --out "$out" > /tmp/kodak_adaptive_s${s}.log 2>&1 || echo "s$s rc=$?"
  sleep 15
done
echo "=== TPU QUEUE3 DONE ($(date +%H:%M:%S)) ==="
