#!/bin/bash
# Round-5 TPU queue, stage 3 (fresh session): the EM-adaptive audio_mini
# demo that queue2 did not reach (VERDICT r4 #6 demo geometry).
#   1. EM-adaptive audio_mini prior (resolve_em_schedule('adaptive'))
#   2. demo encode s7 on that prior (pairs vs ours_audio_mini_s7.json 69.785)
#   3. baseline full-550-prior full-schedule encode s8 (second baseline seed)
#   4. demo encode s8 on the EM-adaptive prior
set -u
cd /root/repo
H=docs/head_to_head

if [ ! -s docs/r5_em_adaptive/PRIOR_rd_audio_mini_bitrate=2.npz ]; then
  echo "=== EM-adaptive audio_mini prior ($(date +%H:%M:%S)) ==="
  python scripts/r5_em_adaptive_audio.py > /tmp/em_adaptive_audio.log 2>&1 \
    || echo "em-adaptive audio prior rc=$?"
fi

for job in s7_demo s8_base s8_demo; do
  case $job in
    s7_demo) out=$H/ours_audio_mini_s7_em_adaptive.json; seed=7
             prior="--prior docs/r5_em_adaptive/PRIOR_rd_audio_mini_bitrate=2.npz"
             log=/tmp/em_adaptive_audio_s7.log
             [ -s docs/r5_em_adaptive/PRIOR_rd_audio_mini_bitrate=2.npz ] || continue ;;
    s8_base) out=$H/ours_audio_mini_s8.json; seed=8; prior=""
             log=/tmp/ours_audio_mini_s8_full.log ;;
    s8_demo) out=$H/ours_audio_mini_s8_em_adaptive.json; seed=8
             prior="--prior docs/r5_em_adaptive/PRIOR_rd_audio_mini_bitrate=2.npz"
             log=/tmp/em_adaptive_audio_s8.log
             [ -s docs/r5_em_adaptive/PRIOR_rd_audio_mini_bitrate=2.npz ] || continue ;;
  esac
  [ -s "$out" ] && continue
  echo "=== $job ($(date +%H:%M:%S)) ==="
  python scripts/head_to_head.py --side ours --geometry audio_mini \
    --n_images 4 --enc_seed $seed --codebook sobol --precision default \
    $prior --out "$out" > "$log" 2>&1 || echo "$job rc=$?"
  sleep 10
done

echo "=== R5 TPU QUEUE3 DONE ($(date +%H:%M:%S)) ==="
