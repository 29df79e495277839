#!/bin/bash
# Round-4 TPU queue, stage 3: phase-1 sample-size ablation on top of the
# p115k_lr6 frontier point (epoch cost ~linear in S; finetunes keep S=5),
# then a finetune-lr-schedule probe. Each vs the 4-seed band 42.188+/-0.147.
set -u
cd /root/repo
H=docs/head_to_head

run () {
  name=$1; shift
  out=$H/ours_${name}.json
  if [ -s "$out" ]; then echo "skip $name"; return; fi
  echo "=== $name ($(date +%H:%M:%S)) ==="
  python scripts/head_to_head.py --side ours --codebook sobol \
    --precision default --out "$out" "$@" || echo "$name rc=$?"
  sleep 15
}

for s in 7 8; do
  run s${s}_r4_p115k_lr6_S3 --n_images 8 --enc_seed $s \
    --n_opt 15000 --p1_lr 6e-4 2e-5 --p1_samples 3 \
    --ft_stop 40 0.001 80 --fused_steps 8
done
run s7_r4_p115k_lr6_S2 --n_images 8 --enc_seed 7 \
  --n_opt 15000 --p1_lr 6e-4 2e-5 --p1_samples 2 \
  --ft_stop 40 0.001 80 --fused_steps 8
# finetune cosine lr: can the plateau stop fire earlier at held quality?
run s7_r4_p115k_lr6_ftlr --n_images 8 --enc_seed 7 \
  --n_opt 15000 --p1_lr 6e-4 2e-5 \
  --ft_stop 40 0.001 80 --fused_steps 8 --ft_lr 4e-4 --ft_lr_schedule cosine
echo "=== QUEUE3 DONE ($(date +%H:%M:%S)) ==="
