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

python -m recombiner_tpu.cli.rd_sweep --dataset cifar --synthetic 500 --n_test 250 \
  --bitrates 2.0 --save_prior_dir $P --out docs/sched_ref.json

# n_groups at 2 bpp is ~128 => reference finetune = max(30000/128,50) ~= 234
for pair in "15000 117 half" "7500 58 quarter" "3750 29 eighth"; do
  set -- $pair
  python -m recombiner_tpu.cli.rd_sweep --dataset cifar --synthetic 500 --n_test 250 \
    --bitrates 2.0 --load_prior_dir $P --n_encode_epochs "$1" --finetune_epochs "$2" \
    --out "docs/sched_$3.json"
done
