#!/bin/bash
# Round-4 CPU queue (session 2): the torch sides of the two open VERDICT
# items, run sequentially on the single core.
#   1. torch engine on the 1-D audio_mini geometry at a matched REDUCED
#      schedule (n_opt 3000; full schedule measured ~8h CPU for phase 1
#      alone — docs/HEAD_TO_HEAD.md round 4). Pairs with
#      ours_audio_mini_s7_n3000.json from the TPU queue: same prior, same
#      schedule -> the engine component of the audio RD gap on 1-D.
#   2. second torch seed on the kodak_mini patch h2h (--enc_seed 43),
#      bounding torch's own patch-path seed spread (VERDICT r3 next #3).
set -u
cd /root/repo
H=docs/head_to_head

if [ ! -s $H/torch_audio_mini_n3000.json ]; then
  echo "=== torch audio_mini n_opt=3000 ($(date +%H:%M:%S)) ==="
  python scripts/head_to_head.py --side torch --geometry audio_mini \
    --n_images 4 --n_opt 3000 --out $H/torch_audio_mini_n3000.json \
    > /tmp/torch_audio_mini.log 2>&1 || echo "torch audio_mini rc=$?"
fi

if [ ! -s $H/torch_kodak_mini_s43.json ]; then
  echo "=== torch kodak_mini s43 ($(date +%H:%M:%S)) ==="
  python scripts/head_to_head.py --side torch --geometry kodak_mini \
    --n_images 1 --enc_seed 43 --out $H/torch_kodak_mini_s43.json \
    > /tmp/torch_kodak_s43.log 2>&1 || echo "torch kodak s43 rc=$?"
fi
echo "=== CPU QUEUE DONE ($(date +%H:%M:%S)) ==="
