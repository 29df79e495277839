#!/usr/bin/env python3
"""Record the full loss trajectory of a reference-schedule cifar encode —
the calibration data for the adaptive early-stop schedule (VERDICT r3 #1).

Phase 1 (30k epochs) runs in 1000-epoch chunks with optimize(return_loss=
True), logging per-epoch ELBO plus per-chunk distortion and group-KL
settling stats; the coding phase records every finetune's per-epoch loss
(n_groups x 240 for cifar 2 bpp). Output JSON feeds the offline stop-rule
simulation (docs/SCHEDULE.md): for candidate (window, rel_tol, min) specs,
replay the recorded trajectories and report where each would have stopped.

    python scripts/schedule_trajectory.py --out docs/schedule_trajectory.json

Same prior/data as scripts/head_to_head.py (docs/schedule_priors cifar
2 bpp, 8 synthetic images, seed 7).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/schedule_trajectory.json")
    p.add_argument("--n_images", type=int, default=8)
    p.add_argument("--enc_seed", type=int, default=7)
    p.add_argument("--n_opt", type=int, default=30000)
    p.add_argument("--geometry", default="cifar")
    args = p.parse_args()

    from recombiner_tpu.utils.platform import apply_platform_override

    apply_platform_override()

    import jax
    import jax.numpy as jnp

    from scripts.head_to_head import PRIORS
    from recombiner_tpu.coding.encoder import encode_step, init_codec, optimize
    from recombiner_tpu.coding.progressive import (
        distortion_of,
        finetune_epochs,
        kl_bits_summary,
    )
    from recombiner_tpu.data.synthetic import synthetic_dataset
    from recombiner_tpu.io.checkpoint import load_prior_artifact
    from recombiner_tpu.utils.timing import sync

    art = load_prior_artifact(PRIORS[args.geometry])
    cfg = art.config
    X, Y = synthetic_dataset(cfg, args.n_images, seed=43)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    codec, state = init_codec(art, n_rows=args.n_images)
    key = jax.random.key(args.enc_seed)

    t0 = time.perf_counter()
    out = {"geometry": args.geometry, "n_images": args.n_images,
           "enc_seed": args.enc_seed, "phase1": [], "finetunes": []}

    # ---- phase 1: mirror compress()'s chunked path, plus instrumentation
    chunk = 1000
    done = 0
    opt_state = None
    while done < args.n_opt:
        n = min(chunk, args.n_opt - done)
        key, sub = jax.random.split(key)
        state, opt_state, losses = optimize(
            codec, state, Xj, Yj, sub, cfg=cfg, n_epochs=n, lr=2e-4,
            sample_size=5, opt_state=opt_state, return_opt_state=True,
            return_loss=True,
        )
        done += n
        losses = np.asarray(jax.device_get(losses), np.float64)
        d = float(np.mean(distortion_of(codec, state, Xj, Yj, cfg)))
        out["phase1"].append({
            "epochs": done,
            "loss_mean_by_50": np.mean(losses.reshape(-1, 50), axis=1).tolist(),
            "distortion": d,
            "kl": kl_bits_summary(codec, state),
        })
        print(f"phase1 {done}/{args.n_opt}: distortion {d:.3f} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)

    # ---- coding phase: reference budgets, record every finetune trajectory
    for level in (("hh", "h", "w") if cfg.patch else ("w",)):
        meta = codec.meta(level)
        n_ft = finetune_epochs(cfg, meta.n_groups, level)
        for step_i in range(meta.n_groups):
            state = encode_step(codec, state, level)
            key, sub = jax.random.split(key)
            state, losses = optimize(
                codec, state, Xj, Yj, sub, cfg=cfg, n_epochs=n_ft, lr=2e-4,
                sample_size=5, return_loss=True,
            )
            losses = np.asarray(jax.device_get(losses), np.float64)
            rec = {"level": level, "step": step_i, "n_ft": n_ft,
                   "loss": losses.tolist()}
            if step_i % 10 == 0 or step_i == meta.n_groups - 1:
                rec["distortion"] = float(
                    np.mean(distortion_of(codec, state, Xj, Yj, cfg)))
                print(f"[{level}] {step_i + 1}/{meta.n_groups} "
                      f"distortion {rec.get('distortion'):.3f} "
                      f"({time.perf_counter() - t0:.0f}s)", flush=True)
            out["finetunes"].append(rec)
            sync(state.level(level).indices)

    d_final = float(np.mean(distortion_of(codec, state, Xj, Yj, cfg)))
    out["final_distortion"] = d_final
    out["wall_s"] = round(time.perf_counter() - t0, 1)
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"final distortion {d_final:.4f}; wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
