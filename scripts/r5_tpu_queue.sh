#!/bin/bash
# Round-5 TPU queue: fires when the audio 5.17 retrain (round-4 queue1b,
# pid file /tmp/r4_tpu_queue.pid) releases the chip. Ordered by VERDICT r4
# priority. Guarded waiting (ADVICE r4, low): a missing pid file fails
# CLOSED (exit) rather than racing the device grant.
#
#  A. 1-D engine-gap ablations (VERDICT #1) — each ~10 min. The new h2h
#     diagnostics (psnr_decode_f32/psnr_decode_default/psnr_internal_final)
#     disambiguate decode-precision co-adaptation from index bugs; the
#     precision knobs then locate the phase-1 share of the gap.
#  B. measured 500-row adaptive encode (VERDICT #3) -> docs/adaptive500.json
#     (bench.py's measured-headline record)
#  C. shipped-preset seeds 9/10 at S=3 (VERDICT #2a)
#  D. kodak_mini adaptive generalization s7/s8 (VERDICT #2b; reference
#     ceilings preserved by the ft_stop override rule — ADVICE r4 medium)
#  E. audio_mini adaptive spot check (VERDICT #2c)
#  F. EM-adaptive demo on cifar (VERDICT #6): 200-iter-ceiling adaptive
#     prior + 2 full-schedule encode seeds vs the 42.225 +/- 0.017 band
set -u
cd /root/repo
H=docs/head_to_head
PIDF=/tmp/r4_tpu_queue.pid

[ -f "$PIDF" ] || { echo "no $PIDF — refusing to race the device grant"; exit 1; }
PREV=$(cat "$PIDF")
while [ -n "$PREV" ] && [ "$(ps -o comm= -p "$PREV" 2>/dev/null)" = "bash" ]; do
  sleep 60
done
echo "=== chip free, starting R5 TPU queue ($(date +%H:%M:%S)) ==="

am () {  # audio_mini h2h run: am <out-stem> [extra flags...]
  out=$H/$1.json; shift
  [ -s "$out" ] && { echo "skip $out"; return; }
  echo "=== $out ($(date +%H:%M:%S)) ==="
  python scripts/head_to_head.py --side ours --geometry audio_mini \
    --n_images 4 --codebook sobol --n_opt 3000 --out "$out" "$@" \
    > /tmp/$(basename "$out" .json).log 2>&1 || echo "rc=$? for $out"
  sleep 10
}

# --- A. audio_mini gap ablations (seed 7 unless stated)
am ours_audio_mini_s7_n3000_diag --enc_seed 7 --precision default
am ours_audio_mini_s7_n3000_scoped --enc_seed 7 --precision scoped
am ours_audio_mini_s7_n3000_p1hp --enc_seed 7 --precision default --p1_precision highest
am ours_audio_mini_s8_n3000_diag --enc_seed 8 --precision default
am ours_audio_mini_s9_n3000_diag --enc_seed 9 --precision default
am ours_audio_mini_s7_n3000_full_f32 --enc_seed 7 --precision scoped --p1_precision highest

# --- C. shipped S=3 preset seeds 9/10 (cifar, matched bpp)
for s in 9 10; do
  out=$H/ours_s${s}_r4_p115k_lr6_S3.json
  [ -s "$out" ] && { echo "skip s$s S3"; continue; }
  echo "=== cifar adaptive S3 s$s ($(date +%H:%M:%S)) ==="
  python scripts/head_to_head.py --side ours --n_images 8 --enc_seed $s \
    --codebook sobol --precision default --n_opt 15000 --p1_lr 6e-4 2e-5 \
    --p1_samples 3 --ft_stop 40 0.001 80 --fused_steps 8 \
    --out "$out" > /tmp/cifar_S3_s${s}.log 2>&1 || echo "S3 s$s rc=$?"
  sleep 10
done

# --- B. measured 500-row adaptive encode (headline record)
if [ ! -s docs/adaptive500.json ]; then
  echo "=== 500-row adaptive encode ($(date +%H:%M:%S)) ==="
  mkdir -p docs/r5_state
  python scripts/babysit.py --log /tmp/adaptive500.log --stall 1200 -- \
    python -m recombiner_tpu.cli.rd_sweep --dataset cifar --synthetic 500 \
      --n_test 500 --bitrates 2.0 --load_prior_dir docs/schedule_priors \
      --schedule adaptive --state_dir docs/r5_state \
      --out docs/adaptive500.json > /tmp/adaptive500_outer.log 2>&1 \
    || echo "adaptive500 rc=$?"
fi

# --- D. kodak_mini adaptive generalization (reference ceilings)
for s in 7 8; do
  out=$H/ours_kodak_mini_s${s}_adaptive.json
  [ -s "$out" ] && { echo "skip kodak adaptive s$s"; continue; }
  echo "=== kodak_mini adaptive s$s ($(date +%H:%M:%S)) ==="
  python scripts/head_to_head.py --side ours --geometry kodak_mini \
    --n_images 1 --enc_seed $s --precision default \
    --n_opt 15000 --p1_lr 6e-4 2e-5 --p1_samples 3 \
    --ft_stop 40 0.001 80 --fused_steps 8 \
    --out "$out" > /tmp/kodak_adaptive_s${s}.log 2>&1 || echo "kadapt s$s rc=$?"
  sleep 10
done

# --- E. audio_mini adaptive spot check (vs full-schedule 69.785 s7)
out=$H/ours_audio_mini_s7_adaptive.json
if [ ! -s "$out" ]; then
  echo "=== audio_mini adaptive s7 ($(date +%H:%M:%S)) ==="
  python scripts/head_to_head.py --side ours --geometry audio_mini \
    --n_images 4 --enc_seed 7 --codebook sobol --precision default \
    --n_opt 15000 --p1_lr 6e-4 2e-5 --p1_samples 3 \
    --ft_stop 40 0.001 80 --fused_steps 8 \
    --out "$out" > /tmp/audio_mini_adaptive.log 2>&1 || echo "aadapt rc=$?"
  sleep 10
fi

# --- F. EM-adaptive demo (cifar, 200-iter ceiling like the baseline prior)
if [ ! -s docs/r5_em_adaptive/PRIOR_rd_cifar_bitrate=2.npz ]; then
  echo "=== EM-adaptive cifar prior ($(date +%H:%M:%S)) ==="
  mkdir -p docs/r5_em_adaptive
  python -m recombiner_tpu.cli.rd_sweep --dataset cifar --synthetic 500 \
    --n_test 125 --bitrates 2.0 --n_em_iters 200 --em_schedule adaptive \
    --save_prior_dir docs/r5_em_adaptive --train_state_dir docs/r5_em_adaptive \
    --skip_encode --out /tmp/em_adaptive_prior.json \
    > /tmp/em_adaptive_prior.log 2>&1 || echo "em-adaptive prior rc=$?"
fi
for s in 7 8; do
  out=$H/ours_s${s}_em_adaptive_prior.json
  [ -s "$out" ] && continue
  echo "=== encode on EM-adaptive prior s$s ($(date +%H:%M:%S)) ==="
  python scripts/head_to_head.py --side ours --n_images 8 --enc_seed $s \
    --codebook sobol --precision default \
    --prior docs/r5_em_adaptive/PRIOR_rd_cifar_bitrate=2.npz \
    --out "$out" > /tmp/em_adaptive_s${s}.log 2>&1 || echo "emadapt s$s rc=$?"
  sleep 10
done

echo "=== R5 TPU QUEUE DONE ($(date +%H:%M:%S)) ==="
