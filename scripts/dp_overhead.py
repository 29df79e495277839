#!/usr/bin/env python3
"""Measure the per-group serialization cost of the multi-device encode loop
(VERDICT round 1, item 8: 'measure, don't assert, DP behavior').

compress()'s progressive loop serializes a sync per coded group: on one
device it fetches the small per-level index matrix (flow control against
the remote tunnel's unbounded-queue wedge), and on a multi-device mesh it
fetches the sharded posterior loc (rendezvous barrier against concurrent
collective programs deadlocking the in-process CPU communicator —
progressive.py:157-195). This script runs the SAME group loop (encode_step
-> finetune -> sync) over 1/2/4/8 virtual CPU devices and isolates the
fixed per-group cost from the finetune compute.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 (set in-process)
    python scripts/dp_overhead.py --out docs/dp_overhead.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_prng_impl", "threefry2x32")

import jax.numpy as jnp  # noqa: E402


def build(cfg, n_rows, n_groups_target=24, seed=0):
    from recombiner_tpu.io.checkpoint import LevelArtifact, PriorArtifact
    from recombiner_tpu.models.inr import init_linear_transform
    from recombiner_tpu.models.upsample import init_upsample_params
    from recombiner_tpu.priors.grouping import compute_grouping

    rng = np.random.default_rng(seed)
    D = cfg.n_coded_params
    kl_bits = rng.lognormal(0.0, 1.0, D)
    kl_bits *= n_groups_target * cfg.bits_per_group / kl_bits.sum()
    grouping = compute_grouping(kl_bits, max_bits=cfg.bits_per_group)
    A = [np.asarray(a) for a in init_linear_transform(jax.random.key(3), cfg.net_dims)]
    upp = init_upsample_params(jax.random.key(4), cfg.data_dim)
    up = {k: {"w": np.asarray(v["w"]), "b": np.asarray(v["b"])} for k, v in upp.items()}
    return PriorArtifact(
        config=cfg, kl_beta=1e-6,
        w=LevelArtifact(
            p_loc=rng.normal(0, 0.02, D).astype(np.float32),
            p_scale=np.abs(rng.normal(0.02, 0.005, D)).astype(np.float32) + 1e-3,
            avg_log_scale=np.full(D, -4.0, np.float32),
            grouping=grouping,
        ),
        h=None, hh=None, A=A, up=up,
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/dp_overhead.json")
    p.add_argument("--n_rows", type=int, default=16)
    p.add_argument("--finetune_epochs", type=int, default=5)
    p.add_argument("--n_groups", type=int, default=12, help="group steps measured")
    args = p.parse_args()

    from recombiner_tpu.coding.encoder import encode_step, init_codec, optimize
    from recombiner_tpu.config import TINY
    from recombiner_tpu.data.synthetic import synthetic_dataset
    from recombiner_tpu.parallel.mesh import make_mesh, shard_rows
    from recombiner_tpu.utils.timing import sync

    cfg = TINY
    art = build(cfg, args.n_rows)
    X, Y = synthetic_dataset(cfg, args.n_rows, seed=1)

    results = []
    for n_dev in (1, 2, 4, 8):
        mesh = make_mesh(n_dev)
        codec, state = init_codec(art, n_rows=args.n_rows)
        Xs = shard_rows(jnp.asarray(X), mesh)
        Ys = shard_rows(jnp.asarray(Y), mesh)
        codec = shard_rows(codec, mesh)
        state = shard_rows(state, mesh)
        opt_kw = dict(cfg=cfg, n_epochs=args.finetune_epochs, lr=2e-4,
                      sample_size=2, opt_state=None, return_opt_state=True)

        def group_step(state):
            # exactly compress()'s per-group pattern (progressive.py:174-195)
            state = encode_step(codec, state, "w")
            state, _ = optimize(codec, state, Xs, Ys, jax.random.key(9), **opt_kw)
            if n_dev > 1:
                sync(state.w.q.loc)
            else:
                sync(state.w.indices)
            return state

        # warm both executables
        state = group_step(state)
        state = group_step(state)

        # Interleave the two measurements (per-step medians) so slow drift on
        # the contended single host core cancels instead of biasing one side.
        finetune_ts, loop_ts = [], []
        for k in range(args.n_groups):
            t0 = time.perf_counter()
            state, _ = optimize(codec, state, Xs, Ys, jax.random.key(k), **opt_kw)
            sync(state.w.q.loc)
            finetune_ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            state = group_step(state)
            loop_ts.append(time.perf_counter() - t0)
        finetune_s = float(np.median(finetune_ts))
        loop_s = float(np.median(loop_ts))

        # Sync-batching probe: K finetunes with ONE sync vs K with K syncs.
        # If per-step syncs cost real time, batching them would show it here.
        K = args.n_groups
        t0 = time.perf_counter()
        for k in range(K):
            state, _ = optimize(codec, state, Xs, Ys, jax.random.key(100 + k), **opt_kw)
        sync(state.w.q.loc)
        one_sync_s = (time.perf_counter() - t0) / K
        t0 = time.perf_counter()
        for k in range(K):
            state, _ = optimize(codec, state, Xs, Ys, jax.random.key(200 + k), **opt_kw)
            sync(state.w.q.loc)
        per_sync_s = (time.perf_counter() - t0) / K

        rec = {
            "n_devices": n_dev,
            "finetune_only_s": round(finetune_s, 4),
            "group_step_s": round(loop_s, 4),
            "encode_step_overhead_s": round(loop_s - finetune_s, 4),
            "sync_every_step_s": round(per_sync_s, 4),
            "sync_batched_s": round(one_sync_s, 4),
            "sync_cost_per_step_s": round(per_sync_s - one_sync_s, 4),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    out = {
        "config": "tiny",
        "n_rows": args.n_rows,
        "finetune_epochs": args.finetune_epochs,
        "note": (
            "virtual 8-device CPU mesh on one core: absolute times are "
            "host-bound; the quantity of interest is per_group_overhead_s "
            "(encode_step dispatch + sync barrier) vs finetune compute, "
            "and its growth with device count"
        ),
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"-> {args.out}", flush=True)


if __name__ == "__main__":
    main()
