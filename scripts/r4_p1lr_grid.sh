#!/bin/bash
# Round-4 shortened-phase-1 grid: cosine phase-1 lr (peak -> floor over the
# cap) vs the reference's constant 2e-4 x 30k. cifar h2h prior, seed 7,
# 8 images, shipped default precision, ft_stop(40,1e-3,80) + fused 8 on all
# runs (the already-validated finetune-side operating point). Baselines:
# full-schedule 42.209 (s7 default), ft40-only 42.114, hard 12k cap at
# constant lr 41.733 (ours_s7_r4_p112k_ft40.json).
set -u
cd /root/repo
H=docs/head_to_head

run () {
  name=$1; shift
  out=$H/ours_s7_r4_${name}.json
  if [ -s "$out" ]; then echo "skip $name"; return; fi
  echo "=== $name ($(date +%H:%M:%S)) ==="
  python scripts/head_to_head.py --side ours --n_images 8 \
    --enc_seed 7 --codebook sobol --precision default \
    --ft_stop 40 0.001 80 --fused_steps 8 \
    --out "$out" "$@" || echo "$name rc=$?"
  sleep 15
}

run p115k_lr6   --n_opt 15000 --p1_lr 6e-4 2e-5
run p112k_lr6   --n_opt 12000 --p1_lr 6e-4 2e-5
run p115k_lr4   --n_opt 15000 --p1_lr 4e-4 2e-5
echo "=== P1LR GRID DONE ($(date +%H:%M:%S)) ==="
