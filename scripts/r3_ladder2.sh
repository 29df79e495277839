#!/bin/bash
# Round-3 ladder stage 2: decode now renders at exact f32 (canonical).
# Two discriminating runs first:
#   scoped  s8: coding-phase finetunes at exact f32 + exact-f32 decode
#   default s8: finetunes at TPU default + exact-f32 decode (isolates how
#               much of the 0.35 dB was decode-time rendering alone)
set -u
cd /root/repo

run_h2h () {
  mode=$1; seed=$2; out=$3
  if [ -s "$out" ]; then echo "skip $out" >> /tmp/r3_ladder2.log; return; fi
  echo "=== h2h $mode seed $seed ===" >> /tmp/r3_ladder2.log
  python scripts/babysit.py --log /tmp/h2h2_${mode}_s${seed}.log --stall 1500 -- \
    python scripts/head_to_head.py --side ours --n_images 8 --enc_seed ${seed} \
      --codebook sobol --precision ${mode} --out ${out} \
      --state /tmp/h2h2_state_${mode}_${seed} >> /tmp/r3_ladder2.log 2>&1
  echo "=== h2h $mode seed $seed rc=$? ===" >> /tmp/r3_ladder2.log
  sleep 60
}

run_h2h scoped 8 docs/head_to_head/ours_s8_sobol_scoped_v2.json
run_h2h default 8 docs/head_to_head/ours_s8_sobol_default_hpdec.json
echo "=== LADDER2 STAGE A COMPLETE ===" >> /tmp/r3_ladder2.log
touch /tmp/r3_ladder2_done
