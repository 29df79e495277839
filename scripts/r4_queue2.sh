#!/bin/bash
# Round-4 TPU queue, stage 2: wait for the p1lr grid, then (a) seed
# replicates of the p115k_lr6 winner (bounds run-to-run noise of the
# candidate shipped adaptive preset), (b) the ours side of the audio_mini
# 1-D head-to-head at the FULL reference schedule.
set -u
cd /root/repo
H=docs/head_to_head

while kill -0 "$(cat /tmp/p1lr_grid.pid)" 2>/dev/null; do sleep 30; done

run () {
  name=$1; shift
  out=$H/${name}.json
  if [ -s "$out" ]; then echo "skip $name"; return; fi
  echo "=== $name ($(date +%H:%M:%S)) ==="
  python scripts/head_to_head.py --side ours --out "$out" "$@" || echo "$name rc=$?"
  sleep 15
}

for s in 8 9 10; do
  run ours_s${s}_r4_p115k_lr6 --n_images 8 --enc_seed $s --codebook sobol \
    --precision default --n_opt 15000 --p1_lr 6e-4 2e-5 \
    --ft_stop 40 0.001 80 --fused_steps 8
done

# ours side of the 1-D h2h: full reference schedule, one 4-row datapoint
run ours_audio_mini_s7 --geometry audio_mini --n_images 4 --enc_seed 7 \
  --codebook sobol --precision default
echo "=== QUEUE2 DONE ($(date +%H:%M:%S)) ==="
