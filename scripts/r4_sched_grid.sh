#!/bin/bash
# Round-4 adaptive-schedule grid: cifar head-to-head (seed 7, 8 images,
# sobol codebook, shipped default precision) across early-stop operating
# points calibrated on docs/schedule_trajectory.json. Each run prints PSNR
# at the grouping-pinned 1.953 bpp plus the epochs actually spent.
set -u
cd /root/repo
H=docs/head_to_head

run () {
  name=$1; shift
  out=$H/ours_s7_r4_${name}.json
  if [ -s "$out" ]; then echo "skip $name"; return; fi
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout 1500 python scripts/head_to_head.py --side ours --n_images 8 \
    --enc_seed 7 --codebook sobol --precision default \
    --out "$out" "$@" || echo "$name rc=$?"
  sleep 20
}

# finetune early-stop only (two aggressiveness levels)
run ft40   --ft_stop 40 0.001 80
run ft20   --ft_stop 20 0.001 40
# phase-1 early-stop only
run p1only --p1_stop 2000 0.001 8000
# combined (the candidate 2.3x point)
run both   --p1_stop 2000 0.001 8000 --ft_stop 40 0.001 80
# combined + exact-f32 phase 1 (the +0.1 dB hypothesis: the default's
# residual RD gap lives in phase-1 bf16 passes — HEAD_TO_HEAD r3 ladder)
run both_f32p1 --p1_stop 2000 0.001 8000 --ft_stop 40 0.001 80 --p1_precision highest
echo "=== GRID DONE ($(date +%H:%M:%S)) ==="
