"""Compression CLI, flag-compatible with the reference's
main_compression.py:12-23, plus a real binary bitstream output.

    python -m recombiner_tpu.cli.compress --test_dir DIR --test_idx 0 \
        --dataset cifar --prior_path out/PRIOR_....npz --save_dir out/
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from recombiner_tpu.coding.encoder import init_codec
from recombiner_tpu.coding.progressive import compress
from recombiner_tpu.data.load_data import load_test_set
from recombiner_tpu.io.bitstream import write_bitstream
from recombiner_tpu.io.checkpoint import load_prior_artifact
from recombiner_tpu.parallel.launch import is_primary, maybe_initialize_distributed
from recombiner_tpu.parallel.mesh import make_mesh, shard_rows
from recombiner_tpu.utils.memory import resolve_remat


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Compress test datapoints with a trained prior")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--test_dir", required=True)
    p.add_argument("--test_idx", type=int, required=True)
    p.add_argument("--dataset", default=None, help="must match the prior artifact if given")
    p.add_argument("--device", default=None, help="accepted for reference-CLI parity; ignored")
    p.add_argument("--prior_path", required=True)
    p.add_argument("--save_dir", required=True)
    p.add_argument("--save_bitstream", default=True)
    p.add_argument("--n_epochs", type=int, default=None,
                   help="posterior optimization epochs (default: the "
                        "reference's 30000, main_compression.py:148; the "
                        "adaptive preset defaults to 15000 with cosine lr — "
                        "see --schedule)")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--sample_size", type=int, default=5)
    p.add_argument("--finetune_epochs", type=int, default=None, help="override per-group finetune epochs (default: reference schedule)")
    p.add_argument("--state_path", default=None, help="encode-state snapshot path: written every --save_every groups and resumed from if it exists")
    p.add_argument("--save_every", type=int, default=10)
    p.add_argument("--n_devices", type=int, default=None, help="data-parallel device count (default: all)")
    p.add_argument("--sync_every", type=int, default=1,
                   help="batch the per-group flow-control fetch over K group "
                        "steps (bounded dispatch queue of K; results identical). "
                        "K>1 weakens the per-group liveness heartbeat: progress "
                        "lines mean dispatch, not device completion, so stall "
                        "watchdogs see a wedged device up to K groups late. "
                        "Capped at 8 on multi-device meshes")
    p.add_argument("--remat", action=argparse.BooleanOptionalAction, default=None,
                   help="rematerialize the ELBO forward in backward (fits kodak/video-"
                        "scale encodes in HBM for ~1.3x epoch cost). Default: auto — "
                        "enabled when the stored-activation estimate exceeds 8 GB/device "
                        "(an HBM OOM here crashes the TPU worker, it does not raise). "
                        "--no-remat forces it off.")
    p.add_argument("--finetune_crn", action=argparse.BooleanOptionalAction, default=None,
                   help="reuse one noise key for every coding-phase finetune "
                        "(the reference's train(random_seed=epoch) common-"
                        "random-numbers semantics, test_model.py:621-623). "
                        "Default auto: ON for patch/hierarchical configs "
                        "(+0.15/+0.30 dB on the kodak_mini head-to-head), OFF "
                        "otherwise (fresh draws measured ~0.1 dB better on "
                        "non-patch cifar; docs/HEAD_TO_HEAD.md round 3)")
    p.add_argument("--schedule", default="reference",
                   choices=("reference", "adaptive", "quality"),
                   help="encode schedule. 'reference' spends the reference's "
                        "fixed budgets unconditionally (30k phase-1 epochs + "
                        "max(30000/n,50)-epoch finetunes at constant lr, "
                        "main_compression.py:148-158). 'adaptive' is the "
                        "THROUGHPUT preset: 15000-epoch S=3 phase 1 under "
                        "cosine lr 6e-4->2e-5, finetune budgets become "
                        "plateau-stop ceilings, 8 group steps fused per "
                        "compiled program (~30k total epochs; 4-seed band "
                        "42.139 +/- 0.096 @ 1.953 bpp vs torch's "
                        "42.297-42.348 @ 60k — docs/SCHEDULE.md). 'quality' "
                        "additionally runs S=5 phase 1 and cosine finetune "
                        "lr (the stop then fires later): 4-seed mean 42.40 "
                        "@ 1.953 bpp in ~42k epochs — above the torch band "
                        "mean at 1.4x fewer epochs. Explicit "
                        "--n_epochs/--p1_lr/--p1_samples/--p1_stop/"
                        "--ft_stop/--fused_steps/--ft_lr override the "
                        "preset.")
    p.add_argument("--ft_lr", type=float, default=None,
                   help="coding-finetune peak lr (fused path; reference: "
                        "constant 2e-4)")
    p.add_argument("--ft_lr_schedule", default=None, choices=(None, "cosine"),
                   help="coding-finetune lr schedule (fused path)")
    p.add_argument("--p1_stop", type=float, nargs=3, default=None,
                   metavar=("WINDOW", "REL_TOL", "MIN_EPOCHS"),
                   help="adaptive phase-1 stop spec (see --schedule)")
    p.add_argument("--ft_stop", type=float, nargs=3, default=None,
                   metavar=("WINDOW", "REL_TOL", "MIN_EPOCHS"),
                   help="adaptive per-group finetune stop spec")
    p.add_argument("--p1_lr", type=float, nargs=2, default=None,
                   metavar=("PEAK", "FLOOR"),
                   help="cosine-decay phase-1 Adam lr from PEAK to FLOOR "
                        "over --n_epochs (reference: constant --lr for 30k, "
                        "main_compression.py:148-151). Encoder-side only — "
                        "the shortened-phase-1 lever (docs/SCHEDULE.md); "
                        "pair with a reduced --n_epochs.")
    p.add_argument("--p1_samples", type=int, default=None,
                   help="phase-1 MC sample size (default: --sample_size, "
                        "the reference's 5 — main_compression.py:151). "
                        "Epoch cost is ~linear in S; finetunes always use "
                        "--sample_size.")
    p.add_argument("--p1_monitor", default="mse", choices=("mse", "loss"),
                   help="phase-1 plateau statistic: 'mse' (distortion term; "
                        "default — the beta-annealed ELBO never plateaus on "
                        "long runs) or 'loss' (full ELBO)")
    p.add_argument("--fused_steps", type=int, default=None,
                   help="fuse K group steps + their finetunes per compiled "
                        "program (bit-identical; snapshot cadence moves to "
                        "chunk boundaries)")
    p.add_argument("--precision", default=None,
                   choices=("scoped", "scoped_high", "default", "high", "highest"),
                   help="matmul precision. The default is already the measured "
                        "RD-parity point: TPU-native bf16-pass optimization with "
                        "unconditional exact-f32 A* scoring + decode "
                        "(docs/HEAD_TO_HEAD.md round 3). 'scoped'/'scoped_high' "
                        "additionally run the coding-phase finetune einsums at "
                        "exact-f32/3-pass (measured RD-neutral, +15-31%% epoch "
                        "cost); 'high'/'highest' = process-global.")
    return p.parse_args(argv)


# Encode-schedule presets, measured on the cifar head-to-head at the
# matched-RD frontier (docs/SCHEDULE.md) — presets, not format fields.
#   adaptive: the THROUGHPUT point — S=3 cosine-lr phase 1 + plateau-stopped
#     finetunes; 4-seed band 42.139 +/- 0.096 @ 1.953 bpp in ~30k epochs
#     (torch's own band 42.297-42.348 @ 60k; overlap at ~2 sigma).
#   quality: the RD-PARITY point — S=5 phase 1 + cosine finetune lr 4e-4;
#     the plateau stop then fires later (~27k finetune epochs): 4-seed band
#     mean 42.40 @ 1.953 bpp in ~42k epochs — ABOVE the torch band mean at
#     1.4x fewer epochs than the reference schedule (round 5).
ADAPTIVE_PRESET = {
    "n_epochs": 15000,
    "p1_lr": (6e-4, 2e-5),
    "p1_samples": 3,  # RD-neutral at ~0.6x phase-1 epoch cost
    "p1_stop": (2000.0, 2e-3, 8000.0),
    "ft_stop": (40.0, 1e-3, 80.0),
    "fused_steps": 8,
    "ft_lr": None,
    "ft_lr_schedule": None,
}
QUALITY_PRESET = {
    **ADAPTIVE_PRESET,
    "p1_samples": None,  # S = --sample_size (the reference's 5)
    "ft_lr": 4e-4,
    "ft_lr_schedule": "cosine",
}
SCHEDULE_PRESETS = {"adaptive": ADAPTIVE_PRESET, "quality": QUALITY_PRESET}


def resolve_schedule(args):
    """Resolve schedule knobs: explicit flags beat the --schedule preset.

    Returns (n_epochs, p1_lr, p1_samples, p1_stop, ft_stop, fused_steps,
    ft_lr, ft_lr_schedule); the 'reference' schedule leaves everything at
    the reference's fixed budgets (30k phase-1 epochs,
    main_compression.py:148).
    """
    p1_stop, ft_stop, fused_steps = args.p1_stop, args.ft_stop, args.fused_steps
    n_epochs, p1_lr, p1_samples = args.n_epochs, args.p1_lr, args.p1_samples
    ft_lr = getattr(args, "ft_lr", None)
    ft_lr_schedule = getattr(args, "ft_lr_schedule", None)
    if args.schedule in SCHEDULE_PRESETS:
        preset = SCHEDULE_PRESETS[args.schedule]
        if n_epochs is None:
            n_epochs = preset["n_epochs"]
        if p1_lr is None:
            p1_lr = preset["p1_lr"]
        if p1_samples is None:
            p1_samples = preset["p1_samples"]
        if p1_stop is None:
            p1_stop = preset["p1_stop"]
        if ft_stop is None:
            ft_stop = preset["ft_stop"]
        if fused_steps is None:
            fused_steps = preset["fused_steps"]
        if ft_lr is None:
            ft_lr = preset["ft_lr"]
        if ft_lr_schedule is None:
            ft_lr_schedule = preset["ft_lr_schedule"]
    if n_epochs is None:
        n_epochs = 30000  # main_compression.py:148
    return (n_epochs, p1_lr, p1_samples, p1_stop, ft_stop, fused_steps,
            ft_lr, ft_lr_schedule)


def main(argv=None):
    from recombiner_tpu.utils.platform import (
        apply_platform_override,
        apply_precision_mode,
    )

    apply_platform_override()  # RECOMBINER_TPU_PLATFORM=cpu etc. (utils/platform.py)
    args = parse_args(argv)
    coding_precision = apply_precision_mode(args.precision)
    maybe_initialize_distributed()  # no-op unless RECOMBINER_TPU_MULTIHOST=1
    art = load_prior_artifact(args.prior_path)
    cfg = art.config
    if args.dataset is not None and args.dataset != cfg.name:
        raise SystemExit(
            f"--dataset {args.dataset} does not match the prior artifact ({cfg.name})"
        )

    X, Y = load_test_set(args.test_dir, args.test_idx, cfg)
    n_rows = X.shape[0]
    codec, state = init_codec(art, n_rows)
    from recombiner_tpu.io.checkpoint import accepted_fingerprints, prior_fingerprint

    fingerprint = prior_fingerprint(art)
    resume = {}
    if args.state_path:
        from recombiner_tpu.io.atomic import load_snapshot_or_none
        from recombiner_tpu.io.encode_state import load_encode_state_full

        from recombiner_tpu.io.encode_state import FingerprintMismatch

        try:
            loaded, reason = load_snapshot_or_none(
                args.state_path,
                lambda p: load_encode_state_full(p, accepted_fingerprints(art)),
            )
        except FingerprintMismatch as e:
            # snapshot from a different prior: refusing beats silently wrong
            # bitrate/distortion (frozen samples index the old codebooks)
            loaded, reason = None, str(e)
        if reason:
            print(f"WARNING: {reason}; encoding from scratch", flush=True)
        if loaded is not None:
            state, header, opt_leaves = loaded
            resume = {
                "phase1_epochs_done": int(header.get("phase1_epochs_done", 0)),
                "phase1_opt_leaves": opt_leaves,
                "resume_key": header.get("resume_key"),
            }
            print(f"Resumed encode state from {args.state_path}", flush=True)

    # data-parallel encode: posterior rows shard over the device mesh (same
    # layout as cli/train.py); codebooks/mappings and the small hierarchical
    # levels replicate. Single-device meshes place arrays as before.
    mesh = make_mesh(args.n_devices)
    X = shard_rows(jnp.asarray(X), mesh)
    Y = shard_rows(jnp.asarray(Y), mesh)
    codec = shard_rows(codec, mesh)
    state = shard_rows(state, mesh)
    if resume.get("phase1_opt_leaves") is not None:
        resume["phase1_opt_leaves"] = shard_rows(resume["phase1_opt_leaves"], mesh)
    if mesh.devices.size > 1:
        print(f"Encoding on {mesh.devices.size} devices (rows sharded)", flush=True)
    args.remat = resolve_remat(
        args.remat, cfg, n_rows, args.sample_size, mesh.devices.size
    )
    print(
        f"Model initialized. Expected bitrate "
        f"{cfg.bitrate_of_groups(codec.w.n_groups, 0 if codec.h is None else codec.h.n_groups, 0 if codec.hh is None else codec.hh.n_groups):.3f}",
        flush=True,
    )

    (n_epochs, p1_lr, p1_samples, p1_stop, ft_stop, fused_steps,
     ft_lr, ft_lr_schedule) = resolve_schedule(args)

    result = compress(
        codec,
        state,
        X,
        Y,
        cfg,
        jax.random.key(args.seed),
        n_optimize_epochs=n_epochs,
        lr=args.lr,
        sample_size=args.sample_size,
        phase1_stop=tuple(p1_stop) if p1_stop is not None else None,
        finetune_stop=tuple(ft_stop) if ft_stop is not None else None,
        phase1_monitor=args.p1_monitor,
        phase1_lr=tuple(p1_lr) if p1_lr else None,
        phase1_sample_size=p1_samples,
        fused_steps=fused_steps,
        finetune_lr=ft_lr,
        finetune_lr_schedule=ft_lr_schedule,
        finetune_overrides=(
            None
            if args.finetune_epochs is None
            else {k: args.finetune_epochs for k in ("w", "h", "hh")}
        ),
        verbose=True,
        state_path=args.state_path,
        save_every=args.save_every,
        sync_every=args.sync_every,
        remat=args.remat,
        state_extra={"prior_fingerprint": fingerprint},
        coding_precision=coding_precision,
        finetune_crn=args.finetune_crn,
        **resume,
    )

    if not is_primary():  # multi-host: host 0 owns the outputs
        return result
    os.makedirs(args.save_dir, exist_ok=True)
    dist = result.distortion
    if dist.ndim == 0:
        dist = dist.reshape(1, 1)
    np.savetxt(
        os.path.join(args.save_dir, f"Distortion_test_id_{args.test_idx}.csv"),
        np.atleast_2d(dist),
        delimiter=",",
    )
    if int(bool(args.save_bitstream)):
        # CSV group indices for reference-output parity
        prefix = {"w": "", "h": "H_", "hh": "HH_"}
        for name, idx in result.indices.items():
            np.savetxt(
                os.path.join(
                    args.save_dir, f"{prefix[name]}GroupIndex_test_id_{args.test_idx}.csv"
                ),
                idx,
                delimiter=",",
            )
        # the actual binary bitstream
        n = write_bitstream(
            os.path.join(args.save_dir, f"bitstream_test_id_{args.test_idx}.rctb"),
            result.indices,
            config_name=cfg.name,
            codebook_seed=art.codebook_seed,
            codebook_kind=getattr(art, "codebook_kind", "threefry"),
            bits_per_group=cfg.bits_per_group,
            extra={"test_idx": args.test_idx},
        )
        print(f"Bitstream: {n} bytes", flush=True)
    print(
        f"Distortion {np.mean(result.distortion):.4f} @ {result.bitrate:.4f} "
        f"(optimize {result.timings['optimize_s']:.1f}s, code {result.timings['code_s']:.1f}s)",
        flush=True,
    )
    return result


if __name__ == "__main__":
    main()
