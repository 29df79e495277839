#!/usr/bin/env python3
"""Measure the R=500 S=5 encode-epoch wall at each matmul-precision point.

The scoped-precision operating point (VERDICT r3 item 1) splits the encode
schedule into phase-1 epochs at the TPU default (single bf16 pass) and
coding-phase finetune epochs at 'highest' (exact f32, 6 passes) on the INR
einsums only. This script measures the per-epoch cost of each rung at the
bench geometry (CIFAR, R=500, warm-exact-executable discipline,
device_get sync) and prints the implied full-schedule encode walls:

    python scripts/precision_epoch.py > docs/precision_epoch.json
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import N_IMAGES, _init_A, _init_up

    from recombiner_tpu.coding.encoder import init_codec, optimize
    from recombiner_tpu.config import CIFAR
    from recombiner_tpu.data.synthetic import synthetic_dataset
    from recombiner_tpu.io.checkpoint import LevelArtifact, PriorArtifact
    from recombiner_tpu.priors.grouping import compute_grouping
    from recombiner_tpu.utils.timing import sync

    cfg = CIFAR
    rng = np.random.default_rng(0)
    D = cfg.n_coded_params
    kl_bits = rng.lognormal(0.0, 1.0, D)
    kl_bits *= 128 * cfg.bits_per_group / kl_bits.sum()
    art = PriorArtifact(
        config=cfg,
        kl_beta=1e-6,
        w=LevelArtifact(
            p_loc=rng.normal(0, 0.02, D).astype(np.float32),
            p_scale=np.abs(rng.normal(0.02, 0.005, D)).astype(np.float32) + 1e-3,
            avg_log_scale=np.full(D, -4.0, np.float32),
            grouping=compute_grouping(kl_bits, max_bits=cfg.bits_per_group),
        ),
        h=None,
        hh=None,
        A=_init_A(cfg),
        up=_init_up(cfg),
    )
    X, Y = synthetic_dataset(cfg, N_IMAGES, seed=1)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    codec, state0 = init_codec(art, n_rows=N_IMAGES)

    sync(jnp.zeros(8) + 1.0)  # pay the device grant before timing
    n_meas = 60
    out = {"R": N_IMAGES, "S": 5, "n_meas_epochs": n_meas,
           "platform": jax.devices()[0].platform}
    for prec in (None, "high", "highest"):
        # real device copies: optimize() DONATES its state argument
        state = jax.tree_util.tree_map(jnp.copy, state0)
        kw = dict(cfg=cfg, n_epochs=n_meas, lr=2e-4, sample_size=5,
                  return_opt_state=True, precision=prec)
        for k in (1, 2):  # warm the EXACT executable twice (tunnel first-run cost)
            state, _ = optimize(codec, state, Xj, Yj, jax.random.key(k), **kw)
            sync(state.w.q.loc)
        t0 = time.perf_counter()
        state, _ = optimize(codec, state, Xj, Yj, jax.random.key(3), **kw)
        sync(state.w.q.loc)
        out[f"epoch_s_{prec or 'default'}"] = (time.perf_counter() - t0) / n_meas
        print(f"# {prec or 'default'}: {out[f'epoch_s_{prec or 'default'}']*1e3:.2f} ms/epoch",
              file=sys.stderr, flush=True)

    # implied full-schedule walls (30k phase-1 + 30k finetune epochs, 2 bpp)
    d, hp, h = out["epoch_s_default"], out["epoch_s_highest"], out["epoch_s_high"]
    out["wall_default_s"] = 60000 * d
    out["wall_scoped_s"] = 30000 * d + 30000 * hp
    out["wall_scoped_high_s"] = 30000 * d + 30000 * h
    out["wall_global_highest_s"] = 60000 * hp
    out["scoped_vs_default"] = out["wall_scoped_s"] / out["wall_default_s"]
    out["scoped_high_vs_default"] = out["wall_scoped_high_s"] / out["wall_default_s"]
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
