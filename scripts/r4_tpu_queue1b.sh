#!/bin/bash
# Round-4 TPU queue 1b: relaunch after the matched-budget fix in
# head_to_head.py (rev 1 of ours_audio_mini n3000 silently kept the FULL
# finetune budgets — kept as ours_audio_mini_s7_p13000_fullft.json, a
# phase-1-budget ablation). Order:
#   1. corrected ours audio_mini at the matched n_opt=3000 schedule
#   2. the audio 5.17 retrain (resumes from docs/audio_state_r4 if present)
set -u
cd /root/repo
H=docs/head_to_head

if [ ! -s $H/ours_audio_mini_s7_n3000.json ]; then
  echo "=== ours audio_mini n_opt=3000 MATCHED ($(date +%H:%M:%S)) ==="
  python scripts/head_to_head.py --side ours --geometry audio_mini \
    --n_images 4 --enc_seed 7 --codebook sobol --precision default \
    --n_opt 3000 --out $H/ours_audio_mini_s7_n3000.json \
    > /tmp/ours_audio_mini_n3000b.log 2>&1 || echo "ours audio_mini rc=$?"
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
echo "=== TPU QUEUE1B DONE rc=$? ($(date +%H:%M:%S)) ==="
