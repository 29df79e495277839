#!/bin/bash
# Encode-schedule efficiency study (results: docs/PERF.md, "Schedule" section).
#
# The reference's encode budget (30,000 posterior epochs + max(30000/n,50)-
# epoch per-group finetunes, main_compression.py:148-162) sets the throughput
# denominator. This study trains ONE cifar prior at 2 bpp (full reference EM
# schedule), then encodes the same 250-image test set at the reference
# schedule and at 1/2, 1/4, 1/8 of it — measuring how much PSNR the schedule
# actually buys at fixed bpp (same grouping => identical bitstream size).
set -e
cd "$(dirname "$0")/.."
P=docs/schedule_priors

python -m recombiner_tpu.cli.rd_sweep --dataset cifar --synthetic 500 --n_test 125 \
  --bitrates 2.0 --n_em_iters 200 --save_prior_dir $P --train_state_dir $P --out docs/sched_ref.json

NG=$(python -c "import json;print(json.load(open('docs/sched_ref.json'))['points'][0]['n_groups']['w'])")
REF_FT=$(python -c "print(max(30000//$NG,50))")
echo "n_groups=$NG reference finetune=$REF_FT"

for frac in 2 4 8; do
  python -m recombiner_tpu.cli.rd_sweep --dataset cifar --synthetic 500 --n_test 125 \
    --bitrates 2.0 --load_prior_dir $P \
    --n_encode_epochs $((30000 / frac)) --finetune_epochs $((REF_FT / frac)) \
    --out "docs/sched_frac$frac.json"
done
