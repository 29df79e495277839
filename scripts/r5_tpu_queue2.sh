#!/bin/bash
# Round-5 TPU queue, stage 2 — fires when the audio 5.17 encode releases
# the chip (waits on the r5_audio_wrap pid in /tmp/r4_tpu_queue.pid).
#   1. SOLO rerun of the measured 500-row adaptive encode (the 09:15 run
#      shared the chip with the audio EM + two h2h runs; the committed
#      record must be the uncontended wall) -> docs/adaptive500.json
#   2. measured 500-row QUALITY-preset encode -> docs/quality500.json
#   3. EM-adaptive audio_mini prior (VERDICT #6 demo geometry)
#   4. baseline second seed: full-550-prior full-schedule encode s8
#   5. demo encodes s7/s8 on the EM-adaptive prior (same knobs as baseline)
set -u
cd /root/repo
H=docs/head_to_head
PIDF=/tmp/r4_tpu_queue.pid

[ -f "$PIDF" ] || { echo "no $PIDF — refusing to race the device grant"; exit 1; }
PREV=$(cat "$PIDF")
while [ -n "$PREV" ] && [ "$(ps -o comm= -p "$PREV" 2>/dev/null)" = "bash" ]; do
  sleep 60
done
echo "=== chip free, starting R5 TPU queue2 ($(date +%H:%M:%S)) ==="

if [ -s docs/adaptive500_contended.json ] && [ ! -s docs/adaptive500_solo_done ]; then
  echo "=== SOLO 500-row adaptive encode ($(date +%H:%M:%S)) ==="
  rm -f docs/adaptive500.json docs/r5_state/encode_state_cifar_2*
  python scripts/babysit.py --log /tmp/adaptive500b.log --stall 1200 --recycle 2400 -- \
    python -m recombiner_tpu.cli.rd_sweep --dataset cifar --synthetic 500 \
      --n_test 500 --bitrates 2.0 --load_prior_dir docs/schedule_priors \
      --schedule adaptive --state_dir docs/r5_state \
      --out docs/adaptive500.json > /tmp/adaptive500b_outer.log 2>&1 \
    || echo "adaptive500 solo rc=$?"
  [ -s docs/adaptive500.json ] && touch docs/adaptive500_solo_done
fi

if [ ! -s docs/quality500.json ]; then
  echo "=== 500-row QUALITY encode ($(date +%H:%M:%S)) ==="
  rm -f docs/r5_state/encode_state_cifar_2*
  python scripts/babysit.py --log /tmp/quality500.log --stall 1200 --recycle 2400 -- \
    python -m recombiner_tpu.cli.rd_sweep --dataset cifar --synthetic 500 \
      --n_test 500 --bitrates 2.0 --load_prior_dir docs/schedule_priors \
      --schedule quality --state_dir docs/r5_state \
      --out docs/quality500.json > /tmp/quality500_outer.log 2>&1 \
    || echo "quality500 rc=$?"
fi

if [ ! -s docs/r5_em_adaptive/PRIOR_rd_audio_mini_bitrate=2.npz ]; then
  echo "=== EM-adaptive audio_mini prior ($(date +%H:%M:%S)) ==="
  python scripts/r5_em_adaptive_audio.py > /tmp/em_adaptive_audio.log 2>&1 \
    || echo "em-adaptive audio prior rc=$?"
fi

out=$H/ours_audio_mini_s8.json
if [ ! -s "$out" ]; then
  echo "=== baseline full-prior full-schedule s8 ($(date +%H:%M:%S)) ==="
  python scripts/head_to_head.py --side ours --geometry audio_mini \
    --n_images 4 --enc_seed 8 --codebook sobol --precision default \
    --out "$out" > /tmp/ours_audio_mini_s8_full.log 2>&1 || echo "rc=$?"
  sleep 10
fi

for s in 7 8; do
  out=$H/ours_audio_mini_s${s}_em_adaptive.json
  [ -s "$out" ] && continue
  [ -s docs/r5_em_adaptive/PRIOR_rd_audio_mini_bitrate=2.npz ] || break
  echo "=== EM-adaptive-prior encode s$s ($(date +%H:%M:%S)) ==="
  python scripts/head_to_head.py --side ours --geometry audio_mini \
    --n_images 4 --enc_seed $s --codebook sobol --precision default \
    --prior docs/r5_em_adaptive/PRIOR_rd_audio_mini_bitrate=2.npz \
    --out "$out" > /tmp/em_adaptive_audio_s${s}.log 2>&1 || echo "rc=$?"
  sleep 10
done

echo "=== R5 TPU QUEUE2 DONE ($(date +%H:%M:%S)) ==="
