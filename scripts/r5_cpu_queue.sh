#!/bin/bash
# Round-5 CPU queue: torch-side runs for the two open parity items, run
# sequentially on the single core after the round-4 CPU queue (torch
# kodak_mini s43) finishes.
#   1. torch audio_mini seed 43 at the matched n_opt=3000 schedule — bounds
#      the torch side's own seed spread on the 1-D geometry (VERDICT r5 #1:
#      is the 68.02 single-seed number ±0.1 or ±1?).
#   2. third torch cifar seed (44) at the full schedule — bounds the torch
#      band the cifar −0.10 dB residual is judged against (VERDICT r5 #7).
# Guarded waiting (ADVICE r4, low): a missing pid file must NOT fail open.
set -u
cd /root/repo
H=docs/head_to_head
PIDF=/tmp/r4_cpu_queue.pid

if [ -f "$PIDF" ]; then
  PREV=$(cat "$PIDF")
  # only wait on a live bash process (stale pid reuse check: comm must match)
  while [ -n "$PREV" ] && [ "$(ps -o comm= -p "$PREV" 2>/dev/null)" = "bash" ]; do
    sleep 60
  done
fi

if [ ! -s $H/torch_audio_mini_s43_n3000.json ]; then
  echo "=== torch audio_mini s43 n_opt=3000 ($(date +%H:%M:%S)) ==="
  python scripts/head_to_head.py --side torch --geometry audio_mini \
    --n_images 4 --n_opt 3000 --enc_seed 43 \
    --out $H/torch_audio_mini_s43_n3000.json \
    > /tmp/torch_audio_mini_s43.log 2>&1 || echo "torch audio_mini s43 rc=$?"
fi

if [ ! -s $H/torch_full_s44.json ]; then
  echo "=== torch cifar s44 full schedule ($(date +%H:%M:%S)) ==="
  python scripts/head_to_head.py --side torch --n_images 8 --enc_seed 44 \
    --out $H/torch_full_s44.json \
    > /tmp/torch_full_s44.log 2>&1 || echo "torch cifar s44 rc=$?"
fi
echo "=== R5 CPU QUEUE DONE ($(date +%H:%M:%S)) ==="
