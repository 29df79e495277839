"""Headline benchmark: CIFAR-10 encode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "cifar_encode_datapoints_per_sec", "value": ..., "unit": ...,
   "vs_baseline": ...}

Method: the encode cost of the reference schedule is dominated by posterior
optimization epochs — 30,000 ELBO epochs plus ~n_groups * max(30000/n_groups,
50) finetune epochs at 5 MC samples over a 500-image batch
(main_compression.py:148-162), plus one A* coding step per group. We measure
the steady-state epoch rate and the per-group coding-step rate on real
hardware and derive full-encode datapoints/sec for the standard 500-image
CIFAR batch at 2 bpp (128 groups).

Baseline: the PyTorch reference measured on this host (torch 1-thread CPU:
prior epoch 1.459 s at R=500 — measured 2026-08-16 by driving the imported
reference PriorBNNmodel; encode epochs use sample_size=5, scaling the
measured epoch by the 4.6x fwd/bwd cost ratio measured the same way). No GPU
exists in this environment; the reference's own repo publishes no throughput
numbers (BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np

# torch reference on this host (see module docstring): seconds per full-batch
# epoch at R=500 CIFAR rows.
REF_PRIOR_EPOCH_S = 1.459  # sample_size=1
REF_ENCODE_EPOCH_S = REF_PRIOR_EPOCH_S * 4.6  # sample_size=5 measured ratio
REF_CODE_STEP_S = 2.0  # 500 rows x sample_group host loop (conservative)

N_IMAGES = 500
N_OPT_EPOCHS = 30000
N_GROUPS = 128  # 2 bpp
N_FINETUNE = max(30000 // N_GROUPS, 50) * N_GROUPS


def reference_encode_dp_per_sec() -> float:
    total_s = (N_OPT_EPOCHS + N_FINETUNE) * REF_ENCODE_EPOCH_S + N_GROUPS * REF_CODE_STEP_S
    return N_IMAGES / total_s


def main() -> None:
    import jax
    import jax.numpy as jnp

    from recombiner_tpu.config import CIFAR
    from recombiner_tpu.coding.encoder import encode_step, init_codec, optimize
    from recombiner_tpu.coords import grid_fourier_features
    from recombiner_tpu.data.synthetic import synthetic_dataset
    from recombiner_tpu.io.checkpoint import LevelArtifact, PriorArtifact
    from recombiner_tpu.priors.grouping import compute_grouping

    cfg = CIFAR
    rng = np.random.default_rng(0)
    D = cfg.n_coded_params

    # synthetic artifact with a realistic 2 bpp grouping (~128 groups)
    target_bits = N_GROUPS * cfg.bits_per_group
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

    from recombiner_tpu.utils.timing import sync

    # -------- measure optimize epoch rate
    # NOTE: on this TPU tunnel, the FIRST execution of each compiled
    # executable carries several seconds of one-time overhead, and
    # block_until_ready does not synchronize — so warm the exact executable
    # twice and sync via device_get (utils.timing.sync).
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

    # -------- measure encode step rate (same warm-up discipline)
    s = encode_step(codec, state, "w")
    s = encode_step(codec, s, "w")
    sync(s.w.indices)
    t0 = time.perf_counter()
    n_steps = 5
    for _ in range(n_steps):
        s = encode_step(codec, s, "w")
    sync(s.w.indices)
    step_s = (time.perf_counter() - t0) / n_steps

    total_s = (N_OPT_EPOCHS + N_FINETUNE) * epoch_s + codec.w.n_groups * step_s
    ours = N_IMAGES / total_s
    ref = reference_encode_dp_per_sec()
    print(
        json.dumps(
            {
                "metric": "cifar_encode_datapoints_per_sec",
                "value": round(ours, 4),
                "unit": "datapoints/s (500-image batch, 2bpp reference schedule)",
                "vs_baseline": round(ours / ref, 2),
                "details": {
                    "epoch_s": round(epoch_s, 5),
                    "code_step_s": round(step_s, 5),
                    "n_groups": int(codec.w.n_groups),
                    "baseline_dp_per_sec": round(ref, 6),
                    "baseline_note": "torch reference on this host CPU (no GPU available)",
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
