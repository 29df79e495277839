"""Rate-distortion sweep: train priors at several bitrate targets and encode a
test set at each, producing an RD curve (the experiment behind the reference
paper's headline figures).

    python -m recombiner_tpu.cli.rd_sweep --dataset cifar --train_dir ... \
        --test_dir ... --bitrates 0.5 1.0 2.0 --out rd.json

With --synthetic N, runs on N synthetic datapoints (no data required) —
useful for smoke-testing the full RD pipeline on any machine.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from recombiner_tpu.coding.encoder import init_codec
from recombiner_tpu.coding.progressive import compress
from recombiner_tpu.config import get_config
from recombiner_tpu.data.load_data import load_test_set, load_training_set
from recombiner_tpu.data.synthetic import synthetic_dataset
from recombiner_tpu.parallel.launch import maybe_initialize_distributed
from recombiner_tpu.parallel.mesh import make_mesh, shard_rows
from recombiner_tpu.priors.artifact import build_prior_artifact
from recombiner_tpu.priors.trainer import em_train
from recombiner_tpu.utils.memory import resolve_remat


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="RD sweep")
    p.add_argument("--dataset", required=True)
    p.add_argument("--train_dir", default=None)
    p.add_argument("--test_dir", default=None)
    p.add_argument("--test_idx", type=int, default=0)
    p.add_argument("--synthetic", type=int, default=0, help="use N synthetic datapoints")
    p.add_argument("--synthetic_kind", default="smooth", choices=("smooth", "speech", "backbone"),
                   help="synthetic signal family (speech: audio; backbone: protein)")
    p.add_argument("--test_wav", default=None,
                   help="encode this WAV file as the test datum (audio geometries); "
                        "overrides the synthetic/loaded test set")
    p.add_argument("--bitrates", type=float, nargs="+", required=True)
    p.add_argument("--train_size", type=int, default=10_000_000_000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--n_em_iters", type=int, default=550)
    p.add_argument("--first_epochs", type=int, default=200)
    p.add_argument("--later_epochs", type=int, default=100)
    p.add_argument("--em_schedule", default="reference",
                   choices=("reference", "adaptive"),
                   help="prior-training schedule preset: 'adaptive' stops EM "
                        "early once the windowed mse plateaus AND the realized "
                        "rate sits in the controller deadband "
                        "(priors/trainer.resolve_em_schedule; --n_em_iters "
                        "becomes a ceiling). 'reference' = the fixed "
                        "550x(200/100) schedule (main_prior_training.py:106-107)")
    p.add_argument("--em_stop", type=float, nargs=3, default=None,
                   metavar=("WINDOW", "REL_TOL", "MIN_ITERS"),
                   help="explicit adaptive EM stop spec (overrides "
                        "--em_schedule's preset)")
    p.add_argument("--n_encode_epochs", type=int, default=None,
                   help="phase-1 posterior-optimization epochs (default: the "
                        "reference's 30000, main_compression.py:148; the "
                        "adaptive preset uses 15000 with cosine lr)")
    p.add_argument("--finetune_epochs", type=int, default=None)
    p.add_argument("--sample_size", type=int, default=5)
    p.add_argument("--schedule", default="reference",
                   choices=("reference", "adaptive", "quality"),
                   help="encode-schedule preset, same semantics as "
                        "cli/compress: 'adaptive' = the throughput point "
                        "(15k cosine-lr S=3 phase 1 + plateau-stopped "
                        "finetunes + fused coding chunks, ~0.5x the "
                        "reference epochs); 'quality' = S=5 phase 1 + "
                        "cosine finetune lr (4-seed mean above the torch "
                        "band at 1.4x fewer epochs — docs/SCHEDULE.md); "
                        "the explicit knobs below override preset fields")
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
                   help="adaptive per-finetune stop spec")
    p.add_argument("--p1_lr", type=float, nargs=2, default=None,
                   metavar=("PEAK", "FLOOR"),
                   help="phase-1 cosine lr schedule PEAK->FLOOR over the "
                        "phase-1 epochs (reference: constant --lr)")
    p.add_argument("--p1_samples", type=int, default=None,
                   help="phase-1 MC sample size (finetunes keep "
                        "--sample_size; S=3 measured RD-neutral on cifar)")
    p.add_argument("--p1_monitor", default="mse", choices=("mse", "loss"),
                   help="statistic the adaptive phase-1 stop watches")
    p.add_argument("--fused_steps", type=int, default=None,
                   help="coding-phase group steps + finetunes compiled per "
                        "program (adaptive preset: 8)")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--out", default="rd_curve.json")
    p.add_argument("--n_devices", type=int, default=None, help="data-parallel device count (default: all)")
    p.add_argument("--n_test", type=int, default=None,
                   help="with --synthetic: number of synthetic test datapoints (default: synthetic//2)")
    p.add_argument("--remat", action=argparse.BooleanOptionalAction, default=None,
                   help="rematerialize the encode forward (memory for compute); "
                        "default: auto — on when stored activations exceed 8 GB/device")
    p.add_argument("--export_dir", default=None,
                   help="write decoded media (PNG/WAV/PDB/NPZ) per RD point here")
    p.add_argument("--save_prior_dir", default=None,
                   help="save the trained prior artifact per bitrate here")
    p.add_argument("--load_prior_dir", default=None,
                   help="load prior artifacts saved by --save_prior_dir instead of "
                        "training (encode-schedule studies: train once, encode many)")
    p.add_argument("--state_dir", default=None,
                   help="snapshot encode state here every 10 groups and resume from "
                        "it after a crash (pair with --load_prior_dir/--save_prior_dir)")
    p.add_argument("--skip_encode", action="store_true",
                   help="train + save the prior per bitrate and stop (no encode); "
                        "pair with --save_prior_dir")
    p.add_argument("--em_chunk", type=int, default=None,
                   help="EM iterations per compiled program (trainer checkpoint_every). "
                        "1 = one program per EM iteration — the conservative mode that "
                        "sidesteps a tunnel-side worker fault observed on long nested-scan "
                        "programs for the audio geometry (docs/rd_full_audio_r3.log). "
                        "Default auto: 1 for audio, 10 otherwise")
    p.add_argument("--rate_control", action=argparse.BooleanOptionalAction, default=True,
                   help="closed-loop budget aim-off: steer the EM KL window so the "
                        "REALIZED post-grouping bitrate lands within ~1.5%% of the "
                        "target (greedy 16-bit packing otherwise overshoots 4-8%%)")
    p.add_argument("--train_state_dir", default=None,
                   help="snapshot full EM training state here every 10 iterations "
                        "and resume mid-EM from it after a crash")
    p.add_argument("--probe_every", type=int, default=10,
                   help="minimum EM iterations between realized-rate probes once "
                        "rate control engages (each probe runs the full host-side "
                        "greedy grouping; decoupled from --em_chunk so em_chunk=1 "
                        "doesn't pay a grouping per iteration)")
    p.add_argument("--finetune_crn", action=argparse.BooleanOptionalAction, default=None,
                   help="reuse one noise key for every coding-phase finetune "
                        "(the reference's train(random_seed=epoch) common-"
                        "random-numbers semantics, test_model.py:621-623). "
                        "Default auto: ON for patch/hierarchical configs "
                        "(+0.15/+0.30 dB on the kodak_mini head-to-head), OFF "
                        "otherwise (fresh draws measured ~0.1 dB better on "
                        "non-patch cifar; docs/HEAD_TO_HEAD.md round 3)")
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


def resolve_schedule_args(args):
    """Resolve the encode-schedule knobs through cli/compress's preset
    logic — ONE preset definition shared by every CLI. Returns
    (n_epochs, p1_lr, p1_samples, p1_stop, ft_stop, fused_steps, ft_lr,
    ft_lr_schedule)."""
    from types import SimpleNamespace

    from recombiner_tpu.cli.compress import resolve_schedule

    return resolve_schedule(SimpleNamespace(
        schedule=args.schedule, n_epochs=args.n_encode_epochs,
        p1_lr=args.p1_lr, p1_samples=args.p1_samples,
        p1_stop=args.p1_stop, ft_stop=args.ft_stop,
        fused_steps=args.fused_steps,
        ft_lr=args.ft_lr, ft_lr_schedule=args.ft_lr_schedule,
    ))


def main(argv=None):
    from recombiner_tpu.utils.platform import (
        apply_platform_override,
        apply_precision_mode,
    )

    apply_platform_override()  # RECOMBINER_TPU_PLATFORM=cpu etc. (utils/platform.py)
    args = parse_args(argv)
    coding_precision = apply_precision_mode(args.precision)
    maybe_initialize_distributed()  # no-op unless RECOMBINER_TPU_MULTIHOST=1
    cfg = get_config(args.dataset)
    if args.em_chunk is None:
        # audio's long nested-scan em_iters program faulted the tunnel-side
        # TPU worker (docs/rd_full_audio_r3.log) — auto-default the
        # conservative one-program-per-iteration mode there, like the
        # remat/finetune_crn per-config auto-defaults
        args.em_chunk = 1 if cfg.name == "audio" else 10

    if args.synthetic:
        Xtr, Ytr = synthetic_dataset(cfg, args.synthetic, seed=args.seed,
                                     kind=args.synthetic_kind)
        n_te = args.n_test if args.n_test is not None else max(args.synthetic // 2, 1)
        Xte, Yte = synthetic_dataset(cfg, n_te, seed=args.seed + 1,
                                     kind=args.synthetic_kind)
    else:
        n = args.train_size // cfg.patches_per_datapoint if cfg.patch else args.train_size
        Xtr, Ytr = load_training_set(args.train_dir, cfg, args.seed, n)
        Xte, Yte = load_test_set(args.test_dir, args.test_idx, cfg)

    if args.test_wav is not None:
        from recombiner_tpu.data.audio import load_wav_clip

        Xte, Yte = load_wav_clip(args.test_wav, cfg)

    # data-parallel: training and encode rows shard over the device mesh
    # (same layout as cli/train.py and cli/compress.py)
    mesh = make_mesh(args.n_devices)
    Xtr_s = shard_rows(jnp.asarray(Xtr), mesh)
    Ytr_s = shard_rows(jnp.asarray(Ytr), mesh)
    Xte_s = shard_rows(jnp.asarray(Xte), mesh)
    Yte_s = shard_rows(jnp.asarray(Yte), mesh)

    remat = resolve_remat(args.remat, cfg, Xte.shape[0], args.sample_size,
                          mesh.devices.size)

    points = []
    for max_bitrate in args.bitrates:
        print(f"=== bitrate target {max_bitrate} ===", flush=True)
        prior_name = f"PRIOR_rd_{cfg.name}_bitrate={max_bitrate:g}.npz"
        if args.load_prior_dir is not None:
            from recombiner_tpu.io.checkpoint import load_prior_artifact

            art = load_prior_artifact(f"{args.load_prior_dir}/{prior_name}")
        else:
            state0, priors0, kl_beta0, done = None, None, 1e-8, 0
            controller0 = None
            ts_path = None
            if args.train_state_dir is not None:
                import os

                from recombiner_tpu.io.train_state import (
                    load_train_state,
                    save_train_state,
                )

                from recombiner_tpu.io.atomic import load_snapshot_or_none

                ts_path = os.path.join(
                    args.train_state_dir, f"train_state_{cfg.name}_{max_bitrate:g}"
                )
                loaded, reason = load_snapshot_or_none(
                    ts_path, lambda p: load_train_state(p, cfg)
                )
                if reason:
                    print(f"WARNING: {reason}; training from scratch", flush=True)
                if loaded is not None:
                    state0, priors0, kl_beta0, done, extra = loaded
                    controller0 = extra.get("controller")
                    state0 = shard_rows(state0, mesh)
                    print(f"Resumed EM state from {ts_path} ({done} iters done, "
                          f"controller {controller0})", flush=True)

            def _log(em_iter, rec, state, priors):
                rate = (
                    f" rate {rec['realized_bitrate']:.3f} aim {rec['budget_aim']:.3f}"
                    if "realized_bitrate" in rec else ""
                )
                print(
                    f"  EM {done + em_iter + 1}/{args.n_em_iters}: mse {rec['mse']:.5f} "
                    f"kl {rec['kl_bits']:.1f} bits beta {rec['kl_beta']:.2e}{rate}",
                    flush=True,
                )

            def _ckpt(em_iter, state, priors, kl_beta, controller):
                if ts_path is not None:
                    save_train_state(ts_path, state, priors, kl_beta,
                                     done + em_iter + 1, controller=controller,
                                     schedule_total=args.n_em_iters)

            from recombiner_tpu.priors.trainer import resolve_em_schedule

            res = em_train(
                jax.random.key(args.seed + done), cfg, Xtr_s, Ytr_s,
                em_stop=resolve_em_schedule(
                    args.em_schedule,
                    tuple(args.em_stop) if args.em_stop else None,
                    args.n_em_iters),
                max_bitrate=max_bitrate, n_em_iters=args.n_em_iters - done,
                first_epochs=(args.first_epochs if done == 0 else args.later_epochs),
                later_epochs=args.later_epochs,
                lr=args.lr, log_fn=_log,
                checkpoint_fn=(_ckpt if ts_path is not None else None),
                state=state0, priors=priors0, kl_beta=kl_beta0,
                rate_control=args.rate_control,
                checkpoint_every=args.em_chunk,
                probe_every=args.probe_every,
                controller=controller0,
                em_iter_offset=done,
                schedule_total=args.n_em_iters,
            )
            stp = (res.controller or {}).get("em_stop")
            if stp:
                print(f"  em_stop: plateau+rate-settled at EM "
                      f"{stp['stopped_at']}/{stp['schedule']} "
                      f"(last realized {stp['last_realized']})", flush=True)
            sel = (res.controller or {}).get("selected")
            if sel:
                print(f"  rate_select: EM {sel['em_iter']} state selected "
                      f"(realized {sel['realized']:.3f} vs final "
                      f"{sel['final_realized']:.3f})", flush=True)
            art = build_prior_artifact(res.state, res.priors, res.kl_beta, cfg,
                                       codebook_seed=args.seed)
            if args.save_prior_dir is not None:
                import os

                from recombiner_tpu.io.checkpoint import save_prior_artifact

                os.makedirs(args.save_prior_dir, exist_ok=True)
                save_prior_artifact(f"{args.save_prior_dir}/{prior_name}", art)
        if args.skip_encode:
            if args.load_prior_dir is not None:
                print(f"(--skip_encode) prior loaded for bitrate {max_bitrate}; "
                      "nothing to do", flush=True)
            elif args.save_prior_dir is not None:
                print(f"(--skip_encode) prior saved for bitrate {max_bitrate}",
                      flush=True)
            else:
                print(f"(--skip_encode) WARNING: trained prior for bitrate "
                      f"{max_bitrate} DISCARDED — pass --save_prior_dir to keep it",
                      flush=True)
            continue
        codec, state = init_codec(art, n_rows=Xte.shape[0])
        from recombiner_tpu.io.checkpoint import (
            accepted_fingerprints,
            prior_fingerprint,
        )

        fingerprint = prior_fingerprint(art)
        state_path = None
        resume = {}
        if args.state_dir is not None:
            import os

            from recombiner_tpu.io.atomic import load_snapshot_or_none
            from recombiner_tpu.io.encode_state import load_encode_state_full

            os.makedirs(args.state_dir, exist_ok=True)
            state_path = os.path.join(
                args.state_dir, f"encode_state_{cfg.name}_{max_bitrate:g}"
            )
            from recombiner_tpu.io.encode_state import FingerprintMismatch

            try:
                loaded, reason = load_snapshot_or_none(
                    state_path,
                    lambda p: load_encode_state_full(p, accepted_fingerprints(art)),
                )
            except FingerprintMismatch as e:
                # different prior than the snapshot's: its frozen samples
                # index the OLD codebooks — resuming would silently corrupt
                # the bitstream. Start over (loud), don't crash-loop babysit.
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
                if header.get("phase1_es") is not None:
                    resume["phase1_es"] = tuple(header["phase1_es"])
                print(f"Resumed encode state from {state_path}", flush=True)
        codec = shard_rows(codec, mesh)
        state = shard_rows(state, mesh)
        if resume.get("phase1_opt_leaves") is not None:
            resume["phase1_opt_leaves"] = shard_rows(resume["phase1_opt_leaves"], mesh)
        (n_encode_epochs, p1_lr, p1_samples, p1_stop, ft_stop,
         fused_steps, ft_lr, ft_lr_schedule) = resolve_schedule_args(args)
        enc = compress(
            codec, state, Xte_s, Yte_s, cfg,
            jax.random.key(args.seed + 1),
            n_optimize_epochs=n_encode_epochs, lr=args.lr,
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
                None if args.finetune_epochs is None
                else {k: args.finetune_epochs for k in ("w", "h", "hh")}
            ),
            verbose=True,
            remat=remat,
            state_path=state_path,
            state_extra={"prior_fingerprint": fingerprint},
            coding_precision=coding_precision,
            finetune_crn=args.finetune_crn,
            **resume,
        )
        point = {
            "target_bitrate": max_bitrate,
            "actual_bitrate": enc.bitrate,
            "distortion_mean": float(np.mean(enc.distortion)),
            "n_rows": int(Xte.shape[0]),
            "n_groups": {n: int(codec.meta(n).n_groups) for n in codec.level_names},
            "timings": enc.timings,
        }
        if args.export_dir is not None:
            from recombiner_tpu.data.export import export_reconstructions

            point["exported"] = export_reconstructions(
                enc.reconstruction, cfg, args.export_dir,
                stem=f"decoded_{cfg.name}_{max_bitrate:g}",
            )
        points.append(point)
        print(json.dumps(point), flush=True)

    with open(args.out, "w") as f:
        json.dump({"dataset": args.dataset, "points": points}, f, indent=2)
    print(f"RD curve -> {args.out}", flush=True)
    return points


if __name__ == "__main__":
    main()
