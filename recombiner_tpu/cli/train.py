"""Prior-training CLI, flag-compatible with the reference's
main_prior_training.py:11-21.

    python -m recombiner_tpu.cli.train --train_dir DIR --dataset cifar \
        --max_bitrate 2.0 --train_size 2000 --saving_dir out/
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from recombiner_tpu.config import get_config
from recombiner_tpu.data.load_data import load_training_set
from recombiner_tpu.io.checkpoint import save_prior_artifact
from recombiner_tpu.metrics import batch_psnr
from recombiner_tpu.parallel.launch import is_primary, maybe_initialize_distributed
from recombiner_tpu.parallel.mesh import make_mesh, shard_rows
from recombiner_tpu.priors.artifact import build_prior_artifact
from recombiner_tpu.priors.trainer import em_train, forward, resolve_em_schedule


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train a RECOMBINER-TPU prior")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--train_dir", required=True)
    p.add_argument(
        "--train_size",
        type=int,
        default=10_000_000_000,
        help="number of training rows (patches in patch mode); capped at the dataset size",
    )
    p.add_argument("--dataset", required=True, help="cifar|kodak|video|audio|protein (or a test config name)")
    p.add_argument("--device", default=None, help="accepted for reference-CLI parity; ignored (JAX selects devices)")
    p.add_argument("--max_bitrate", type=float, required=True)
    p.add_argument("--saving_dir", default="./")
    p.add_argument("--n_em_iters", type=int, default=550)
    p.add_argument("--first_epochs", type=int, default=200)
    p.add_argument("--later_epochs", type=int, default=100)
    p.add_argument("--em_schedule", default="reference",
                   choices=("reference", "adaptive"),
                   help="prior-training schedule preset: 'adaptive' stops EM "
                        "early once the windowed mse plateaus AND the realized "
                        "rate sits in the controller deadband "
                        "(priors/trainer.resolve_em_schedule; --n_em_iters "
                        "becomes a ceiling)")
    p.add_argument("--em_stop", type=float, nargs=3, default=None,
                   metavar=("WINDOW", "REL_TOL", "MIN_ITERS"),
                   help="explicit adaptive EM stop spec (overrides "
                        "--em_schedule's preset)")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--n_devices", type=int, default=None, help="data-parallel device count (default: all)")
    p.add_argument("--rate_control", action=argparse.BooleanOptionalAction, default=True,
                   help="closed-loop budget aim-off: steer the EM KL window so the "
                        "REALIZED post-grouping bitrate lands within ~1.5%% of "
                        "--max_bitrate (greedy 16-bit packing otherwise overshoots 4-8%%)")
    return p.parse_args(argv)


def main(argv=None):
    from recombiner_tpu.utils.platform import apply_platform_override

    apply_platform_override()  # RECOMBINER_TPU_PLATFORM=cpu etc. (utils/platform.py)
    args = parse_args(argv)
    maybe_initialize_distributed()  # no-op unless RECOMBINER_TPU_MULTIHOST=1
    cfg = get_config(args.dataset)

    n_datapoints = (
        args.train_size // cfg.patches_per_datapoint if cfg.patch else args.train_size
    )
    X, Y = load_training_set(args.train_dir, cfg, args.seed, n_datapoints)
    train_size = X.shape[0]
    print(f"Prior is trained on {train_size} patches/datapoints.", flush=True)

    mesh = make_mesh(args.n_devices)
    Xj = shard_rows(jnp.asarray(X), mesh)
    Yj = shard_rows(jnp.asarray(Y), mesh)

    os.makedirs(args.saving_dir, exist_ok=True)
    ckpt_path = os.path.join(
        args.saving_dir,
        f"PRIOR_train_size_{train_size}_max_bitrate={args.max_bitrate:.3f}.npz",
    )

    t0 = time.perf_counter()

    def checkpoint_fn(em_iter, state, priors, kl_beta, controller):
        if not is_primary():  # multi-host: host 0 owns the artifact
            return
        art = build_prior_artifact(state, priors, kl_beta, cfg, codebook_seed=args.seed)
        save_prior_artifact(ckpt_path, art)

    def log_fn(em_iter, rec, state, priors):
        y_hat = np.asarray(forward(state, Xj, jax.random.key(em_iter), cfg)[:, 0])
        if cfg.name == "protein":
            mses = ((y_hat - Y) ** 2).reshape(train_size, -1).mean(1) * 3
            print(
                f"[{em_iter}] Training RMSD {np.mean(mses ** 0.5) * 25:.4f}; "
                f"KL {rec['kl_bits']:.2f} bits; beta {rec['kl_beta']:.3g}; "
                f"{time.perf_counter() - t0:.0f}s",
                flush=True,
            )
        else:
            psnr = batch_psnr(Y, y_hat, round8=False).mean()
            print(
                f"[{em_iter}] Training PSNR {psnr:.4f}; KL {rec['kl_bits']:.2f} bits; "
                f"beta {rec['kl_beta']:.3g}; {time.perf_counter() - t0:.0f}s",
                flush=True,
            )

    history_path = os.path.join(
        args.saving_dir,
        f"LOSS_train_size_{train_size}_max_bitrate={args.max_bitrate:.3f}.json",
    )

    res = em_train(
        jax.random.key(args.seed),
        cfg,
        Xj,
        Yj,
        max_bitrate=args.max_bitrate,
        n_em_iters=args.n_em_iters,
        first_epochs=args.first_epochs,
        later_epochs=args.later_epochs,
        lr=args.lr,
        checkpoint_fn=checkpoint_fn,
        log_fn=log_fn,
        rate_control=args.rate_control,
        em_stop=resolve_em_schedule(
            args.em_schedule,
            tuple(args.em_stop) if args.em_stop else None,
            args.n_em_iters),
    )
    stp = (res.controller or {}).get("em_stop")
    if stp:
        print(f"em_stop: plateau+rate-settled at EM {stp['stopped_at']}/"
              f"{stp['schedule']}", flush=True)
    import json

    with open(history_path, "w") as f:
        json.dump(res.elbo_history, f)
    print(f"Saved prior artifact to {ckpt_path}", flush=True)
    return res


if __name__ == "__main__":
    main()
