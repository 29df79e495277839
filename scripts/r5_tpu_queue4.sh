#!/bin/bash
# Round-5 TPU queue, stage 4 — evidence for SCHEDULE.md's preset routing
# advice ("use quality on audio-family content"), which currently has no
# audio_mini quality datapoint behind it. Waits on queue3's pid.
#   1. audio_mini quality-knobs encode s7 (pairs vs adaptive 68.833 and
#      full-schedule 69.785)
#   2. kodak_mini quality-knobs encode s7 (pairs vs adaptive 46.746 and
#      full-schedule CRN 46.923)
# Quality preset = adaptive with S=5 phase 1 + cosine finetune lr 4e-4
# (cli/compress.py::resolve_schedule), spelled out as explicit h2h knobs;
# ft_stop ceilings stay reference-based under --n_opt (ADVICE r4 medium).
set -u
cd /root/repo
H=docs/head_to_head
PIDF=/tmp/r5q3.pid

[ -f "$PIDF" ] || { echo "no $PIDF — refusing to race the device grant"; exit 1; }
PREV=$(cat "$PIDF")
while [ -n "$PREV" ] && [ "$(ps -o comm= -p "$PREV" 2>/dev/null)" = "bash" ]; do
  sleep 60
done
echo "=== chip free, starting R5 TPU queue4 ($(date +%H:%M:%S)) ==="

for g in audio_mini kodak_mini; do
  # mirror each geometry's ADAPTIVE invocation exactly (r5_tpu_queue.sh E,
  # r4_tpu_queue3.sh) so the pair isolates the quality-preset deltas
  case $g in
    audio_mini) n=4; cb="--codebook sobol" ;;
    kodak_mini) n=1; cb="" ;;
  esac
  out=$H/ours_${g}_s7_quality.json
  [ -s "$out" ] && continue
  echo "=== $g quality s7 ($(date +%H:%M:%S)) ==="
  python scripts/head_to_head.py --side ours --geometry $g \
    --n_images $n --enc_seed 7 $cb --precision default \
    --n_opt 15000 --p1_lr 6e-4 2e-5 --p1_samples 5 \
    --ft_stop 40 0.001 80 --fused_steps 8 \
    --ft_lr 4e-4 --ft_lr_schedule cosine \
    --out "$out" > /tmp/${g}_quality_s7.log 2>&1 \
    || echo "$g quality rc=$?"
  sleep 10
done

echo "=== R5 TPU QUEUE4 DONE ($(date +%H:%M:%S)) ==="
