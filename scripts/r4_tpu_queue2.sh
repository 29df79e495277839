#!/bin/bash
# Round-4 TPU queue stage 2: fires after r4_tpu_queue.sh (the audio 5.17
# retrain) releases the chip. Seed replicates of the finetune-cosine-lr
# point (42.451 @ seed 7, docs/SCHEDULE.md §3b) — if the band holds at or
# above the torch two-seed band (42.297-42.348), ship it as a
# `--schedule quality` preset next to the throughput-leaning `adaptive`.
set -u
cd /root/repo
H=docs/head_to_head

while kill -0 "$(cat /tmp/r4_tpu_queue.pid)" 2>/dev/null; do sleep 60; done

run () {
  s=$1
  out=$H/ours_s${s}_r4_p115k_lr6_ftlr.json
  if [ -s "$out" ]; then echo "skip s$s"; return; fi
  echo "=== ftlr s$s ($(date +%H:%M:%S)) ==="
  python scripts/head_to_head.py --side ours --n_images 8 --enc_seed $s \
    --codebook sobol --precision default --n_opt 15000 --p1_lr 6e-4 2e-5 \
    --ft_stop 40 0.001 80 --fused_steps 8 --ft_lr 4e-4 --ft_lr_schedule cosine \
    --out "$out" > /tmp/ftlr_s${s}.log 2>&1 || echo "ftlr s$s rc=$?"
  sleep 15
}

for s in 8 9 10; do run $s; done
echo "=== TPU QUEUE2 DONE ($(date +%H:%M:%S)) ==="
