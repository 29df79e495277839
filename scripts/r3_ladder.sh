#!/bin/bash
# Round-3 TPU pipeline, stage 1: precision-epoch costs + the scoped-precision
# head-to-head ladder (VERDICT r3 item 1). Sequential: one chip.
set -u
cd /root/repo
mkdir -p docs/head_to_head

echo "=== precision_epoch ===" >> /tmp/r3_ladder.log
python scripts/precision_epoch.py > docs/precision_epoch.json 2>> /tmp/r3_ladder.log
echo "=== precision_epoch done rc=$? ===" >> /tmp/r3_ladder.log

run_h2h () {
  mode=$1; seed=$2
  out=docs/head_to_head/ours_s${seed}_sobol_${mode}.json
  if [ -s "$out" ]; then echo "skip $out" >> /tmp/r3_ladder.log; return; fi
  echo "=== h2h $mode seed $seed ===" >> /tmp/r3_ladder.log
  python scripts/babysit.py --log /tmp/h2h_${mode}_s${seed}.log --stall 900 -- \
    python scripts/head_to_head.py --side ours --n_images 8 --enc_seed ${seed} \
      --codebook sobol --precision ${mode} --out ${out} \
      --state /tmp/h2h_state_${mode}_${seed} >> /tmp/r3_ladder.log 2>&1
  echo "=== h2h $mode seed $seed rc=$? ===" >> /tmp/r3_ladder.log
}

run_h2h scoped 8
run_h2h scoped 7
run_h2h scoped 9
run_h2h scoped 10
run_h2h scoped_high 8
echo "=== LADDER COMPLETE ===" >> /tmp/r3_ladder.log
