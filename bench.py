"""Headline benchmark: CIFAR-10 encode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "cifar_encode_datapoints_per_sec", "value": ..., "unit": ...,
   "vs_baseline": ..., "details": {...}}

What is measured (all on the real chip, warm-exact-executable discipline —
see CLAUDE.md):
  1. encode epoch_s: steady-state S=5 posterior-optimization epoch, R=500;
  2. code_step_s: one on-device A* coding step (all 500 rows);
  3. prior_epoch_s: steady-state S=1 prior-training epoch (BASELINE.md's
     "prior-training steps/sec" metric);
  4. a COMPLETE reduced-schedule compress() (2,000 optimize epochs +
     per-group finetunes + coding for every group), wall-clock — the
     host-overhead cross-check on extrapolating from (1) and (2).

The headline value extrapolates the reference's FULL schedule (30,000
optimize epochs + max(30000/n_groups, 50)-epoch finetunes,
main_compression.py:148-162) from the measured rates, multiplied by the
measured host-overhead factor from (4).

Baselines (no GPU exists in this environment; the reference publishes no
throughput numbers — BASELINE.md):
  - vs_cpu_measured: the torch reference driven on this host (1 CPU core):
    prior epoch 1.459 s at R=500, S=5 encode epoch = 4.6x that (both
    measured round 1 by importing the reference).
  - vs_baseline (headline): a DERIVED GPU-equivalent baseline. Assumption,
    stated explicitly: a well-utilized data-center GPU runs this torch
    workload ~150x faster than one CPU core (batched f32 matmul dominated;
    A100-class). That puts the reference encode epoch at ~44.8 ms vs our
    26.9 ms — the honest per-chip multiple is O(1), NOT O(100): both
    implementations sit at the same K=32 matmul-occupancy roofline
    (docs/PERF.md), so large per-chip multiples vs a GPU are physically
    impossible at equal precision; the framework's throughput story is the
    on-device coder (code_step_s below vs the reference's per-row host
    loop) and DP scale-out (cli/compress.py --n_devices).

Roofline context in details: analytic model FLOPs per epoch and achieved
TF/s (the chip runs at ~85-90% of the K=32 MXU-occupancy ceiling).
"""

from __future__ import annotations

import json
import time

import numpy as np

# torch reference on this host (measured round 1, see module docstring)
REF_CPU_PRIOR_EPOCH_S = 1.459  # S=1, R=500
REF_CPU_ENCODE_EPOCH_S = REF_CPU_PRIOR_EPOCH_S * 4.6  # S=5 measured ratio
REF_CPU_CODE_STEP_S = 2.0  # 500-row host coding loop (conservative)
GPU_SPEEDUP_ASSUMPTION = 150.0  # derived GPU baseline = CPU / this factor

N_IMAGES = 500
N_OPT_EPOCHS = 30000
N_GROUPS_TARGET = 128  # 2 bpp


def full_schedule_epochs(n_groups: int) -> int:
    return N_OPT_EPOCHS + n_groups * max(N_OPT_EPOCHS // n_groups, 50)


def model_flops_per_encode_epoch(cfg, R: int, S: int) -> float:
    """Analytic useful FLOPs of one S-sample ELBO epoch (fwd+bwd = 3x fwd):
    INR pixel matmuls + A transforms + phase-decomposed upsampler convs."""
    B = R * S
    P = cfg.n_pixels
    dims = cfg.net_dims
    inr = sum(2 * B * P * dims[i] * dims[i + 1] for i in range(cfg.n_layers))
    a_mm = sum(
        2 * B * (dims[i + 1] * (dims[i] + 1)) ** 2 for i in range(cfg.n_layers)
    )
    # upsampler: conv1 128->64 k5 at P/(s2*s3)^d, conv2 64->64 k3 at P/(s3)^d,
    # conv3 64->16 k3 at P (phase-decomposed: each output computed once)
    s = cfg.layerwise_scale_factors
    d = cfg.data_dim
    k = lambda ksz: ksz**d
    sp3 = P
    sp2 = P // (int(np.prod([s[2]] * d)) if np.isscalar(s[2]) else int(np.prod(s[2])))
    sp1 = sp2 // (int(np.prod([s[1]] * d)) if np.isscalar(s[1]) else int(np.prod(s[1])))
    convs = 2 * B * (sp1 * k(5) * 128 * 64 + sp2 * k(3) * 64 * 64 + sp3 * k(3) * 64 * 16)
    return 3.0 * (inr + a_mm + convs)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from recombiner_tpu.coding.encoder import encode_step, init_codec, optimize
    from recombiner_tpu.coding.progressive import compress
    from recombiner_tpu.config import CIFAR
    from recombiner_tpu.coords import grid_fourier_features
    from recombiner_tpu.data.synthetic import synthetic_dataset
    from recombiner_tpu.io.checkpoint import LevelArtifact, PriorArtifact
    from recombiner_tpu.priors.grouping import compute_grouping
    from recombiner_tpu.priors.trainer import init_prior_state, init_priors, sgd_epochs
    from recombiner_tpu.utils.timing import sync

    cfg = CIFAR
    rng = np.random.default_rng(0)
    D = cfg.n_coded_params

    # synthetic artifact with a realistic 2 bpp grouping (~128 groups)
    target_bits = N_GROUPS_TARGET * cfg.bits_per_group
    kl_bits = rng.lognormal(0.0, 1.0, D)
    kl_bits *= target_bits / kl_bits.sum()
    grouping = compute_grouping(kl_bits, max_bits=cfg.bits_per_group)
    art = PriorArtifact(
        config=cfg,
        kl_beta=1e-6,
        w=LevelArtifact(
            p_loc=rng.normal(0, 0.02, D).astype(np.float32),
            p_scale=np.abs(rng.normal(0.02, 0.005, D)).astype(np.float32) + 1e-3,
            avg_log_scale=np.full(D, -4.0, np.float32),
            grouping=grouping,
        ),
        h=None,
        hh=None,
        A=_init_A(cfg),
        up=_init_up(cfg),
    )

    X, Y = synthetic_dataset(cfg, N_IMAGES, seed=1)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    codec, state = init_codec(art, n_rows=N_IMAGES)
    n_groups = int(codec.w.n_groups)

    # -------- 1. encode (S=5) epoch rate
    # First execution of each compiled executable costs ~8 s on this tunnel
    # and block_until_ready does not sync — warm the exact executable twice
    # and sync via device_get (utils.timing.sync).
    n_meas = 100
    for k in (1, 2):
        state = optimize(codec, state, Xj, Yj, jax.random.key(k), cfg=cfg,
                         n_epochs=n_meas, lr=2e-4, sample_size=5)
        sync(state.w.q.loc)
    t0 = time.perf_counter()
    state = optimize(codec, state, Xj, Yj, jax.random.key(3), cfg=cfg,
                     n_epochs=n_meas, lr=2e-4, sample_size=5)
    sync(state.w.q.loc)
    epoch_s = (time.perf_counter() - t0) / n_meas

    # -------- 2. coding step rate
    s = encode_step(codec, state, "w")
    s = encode_step(codec, s, "w")
    sync(s.w.indices)
    t0 = time.perf_counter()
    n_steps = 5
    for _ in range(n_steps):
        s = encode_step(codec, s, "w")
    sync(s.w.indices)
    step_s = (time.perf_counter() - t0) / n_steps
    del s

    # -------- 3. prior-training epoch rate (S=1)
    pstate = init_prior_state(jax.random.key(0), cfg, N_IMAGES)
    priors = init_priors(cfg)
    feats = grid_fourier_features(cfg.pixel_sizes, cfg.fourier_dim)
    Xp = jnp.broadcast_to(jnp.asarray(feats), (N_IMAGES, *feats.shape))

    def prior_chunk(st, k):
        st, _ = sgd_epochs(st, Xp, Yj, priors, jnp.float32(1e-8),
                           jax.random.key(k), cfg=cfg, n_epochs=50, lr=2e-4)
        return st

    pstate = prior_chunk(pstate, 1)
    pstate = prior_chunk(pstate, 2)
    sync(pstate.w.loc)
    t0 = time.perf_counter()
    pstate = prior_chunk(pstate, 3)
    sync(pstate.w.loc)
    prior_epoch_s = (time.perf_counter() - t0) / 50
    del pstate

    # -------- 4. COMPLETE reduced-schedule compress (host overhead check)
    # Run twice: the first (cold) wall includes jit compiles and this
    # tunnel's ~8 s first-execution cost per executable — one-time costs
    # that amortize to <5% over the 30k-epoch full schedule. The second
    # (warm) run measures the true steady-state host overhead of the
    # progressive loop, which is what scales with the schedule.
    red_opt = 1500
    red_ft = max(N_OPT_EPOCHS // n_groups, 50) // 20  # ~1/20 reference finetune
    walls = []
    for k in (7, 8):
        codec2, state2 = init_codec(art, n_rows=N_IMAGES)
        t0 = time.perf_counter()
        compress(codec2, state2, Xj, Yj, cfg, jax.random.key(k),
                 n_optimize_epochs=red_opt, finetune_overrides={"w": red_ft},
                 sample_size=5)
        walls.append(time.perf_counter() - t0)
    cold_wall, measured_wall = walls
    red_epochs = red_opt + n_groups * red_ft
    predicted_wall = red_epochs * epoch_s + n_groups * step_s
    host_factor = measured_wall / predicted_wall

    # -------- 5. receiver-side decode throughput (serving path)
    from recombiner_tpu.coding.encoder import decode

    fake_indices = {"w": rng.integers(0, 2**cfg.bits_per_group,
                                      (N_IMAGES, n_groups)).astype(np.int32)}
    y = decode(codec, fake_indices, Xj, cfg)
    y = decode(codec, fake_indices, Xj, cfg)
    sync(y)
    t0 = time.perf_counter()
    n_dec = 10
    for _ in range(n_dec):
        y = decode(codec, fake_indices, Xj, cfg)
    sync(y)
    decode_dp_s = N_IMAGES / ((time.perf_counter() - t0) / n_dec)

    # -------- headline: full reference schedule, host overhead applied
    total_epochs = full_schedule_epochs(n_groups)
    total_s = (total_epochs * epoch_s + n_groups * step_s) * host_factor
    ours_dp_s = N_IMAGES / total_s

    # baselines
    ref_cpu_total = (
        total_epochs * REF_CPU_ENCODE_EPOCH_S + n_groups * REF_CPU_CODE_STEP_S
    )
    ref_cpu_dp_s = N_IMAGES / ref_cpu_total
    ref_gpu_total = (
        total_epochs * REF_CPU_ENCODE_EPOCH_S / GPU_SPEEDUP_ASSUMPTION
        + n_groups * REF_CPU_CODE_STEP_S / GPU_SPEEDUP_ASSUMPTION
    )
    ref_gpu_dp_s = N_IMAGES / ref_gpu_total

    # roofline context
    flops_epoch = model_flops_per_encode_epoch(cfg, N_IMAGES, 5)
    achieved_tfs = flops_epoch / epoch_s / 1e12

    print(
        json.dumps(
            {
                "metric": "cifar_encode_datapoints_per_sec",
                "value": round(ours_dp_s, 4),
                "unit": "datapoints/s (500-image batch, 2bpp reference schedule, 1 chip)",
                "vs_baseline": round(ours_dp_s / ref_gpu_dp_s, 2),
                "details": {
                    "epoch_s": round(epoch_s, 5),
                    "prior_epoch_s": round(prior_epoch_s, 5),
                    "prior_training_steps_per_sec": round(1.0 / prior_epoch_s, 2),
                    "code_step_s": round(step_s, 5),
                    "decode_datapoints_per_sec": round(decode_dp_s, 1),
                    "n_groups": n_groups,
                    "reduced_compress_wall_cold_s": round(cold_wall, 2),
                    "reduced_compress_wall_warm_s": round(measured_wall, 2),
                    "reduced_compress_predicted_s": round(predicted_wall, 2),
                    "host_overhead_factor": round(host_factor, 4),
                    "model_tflops_per_epoch": round(flops_epoch / 1e12, 4),
                    "achieved_tflops_per_sec": round(achieved_tfs, 2),
                    "roofline_note": "INR chain at K=32 MXU-occupancy ceiling (~3 TF/s useful); convs dominate analytic FLOPs and run in bf16 MXU passes; see docs/PERF.md",
                    "vs_cpu_measured": round(ours_dp_s / ref_cpu_dp_s, 1),
                    "baseline_gpu_derived_dp_per_sec": round(ref_gpu_dp_s, 5),
                    "baseline_gpu_assumption": f"torch reference on 1 CPU core measured {REF_CPU_ENCODE_EPOCH_S:.2f} s/encode-epoch; GPU assumed {GPU_SPEEDUP_ASSUMPTION:.0f}x that core",
                    "baseline_cpu_measured_dp_per_sec": round(ref_cpu_dp_s, 6),
                    "platform": jax.devices()[0].platform,
                },
            }
        )
    )


def _init_A(cfg):
    import jax

    from recombiner_tpu.models.inr import init_linear_transform

    return [np.asarray(a) for a in init_linear_transform(jax.random.key(3), cfg.net_dims)]


def _init_up(cfg):
    import jax

    from recombiner_tpu.models.upsample import init_upsample_params

    p = init_upsample_params(jax.random.key(4), cfg.data_dim)
    return {k: {"w": np.asarray(v["w"]), "b": np.asarray(v["b"])} for k, v in p.items()}


if __name__ == "__main__":
    main()
