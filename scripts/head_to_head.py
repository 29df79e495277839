#!/usr/bin/env python3
"""Full-schedule encode head-to-head: our engine vs the imported PyTorch
reference, SAME prior, SAME data, SAME schedule (VERDICT round 1, item 7).

One prior trained by this framework (docs/schedule_priors, full-EM cifar
2 bpp) is exported to the reference pickle format (io/export_reference.py);
both engines then encode the SAME synthetic cifar test images at the FULL
reference schedule — 30,000 optimize epochs + max(30000/n_groups, 50)-epoch
per-group finetunes (main_compression.py:148-162) — and report PSNR at the
bpp fixed by the shared grouping.

    python scripts/head_to_head.py --side torch --n_images 8 --out t.json
    python scripts/head_to_head.py --side ours  --n_images 8 --out o.json

The torch side runs the reference's own TestBNNmodel end to end
(optimize_posteriors + compress_posteriors, test_model.py:621-856) wired
exactly like main_compression.py:37-145. Codebooks differ by design (torch
Sobol vs our threefry spec — SURVEY §7), so parity is at the RD level.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"
PRIORS = {
    "cifar": "docs/schedule_priors/PRIOR_rd_cifar_bitrate=2.npz",
    # full-EM kodak-topology prior (2x2 patches of 32x32, 3-level hierarchy)
    # trained by scripts/r3_patch_prior.sh — the patch-mode h2h geometry
    "kodak_mini": "docs/schedule_priors/PRIOR_rd_kodak_mini_bitrate=2.npz",
    # full-EM audio-topology prior (1-D, 4x800-sample patches, 3-level
    # hierarchy) trained by scripts/audio_mini_prior.py — the 1-D h2h
    # geometry (VERDICT r3 next #5)
    "audio_mini": "docs/schedule_priors/PRIOR_rd_audio_mini_bitrate=2.npz",
}
N_OPT = 30000
# the reference's fixed phase-1 budget (main_compression.py:148) — the base
# for proportional finetune scaling under --n_opt. N_OPT itself is mutated
# by --n_opt in main(), so it must NOT be used as the scaling base.
N_OPT_REFERENCE = 30000


def load_shared(n_images: int, geometry: str = "cifar",
                prior_path: str | None = None):
    import jax

    from recombiner_tpu.io.checkpoint import load_prior_artifact
    from recombiner_tpu.data.synthetic import synthetic_dataset

    art = load_prior_artifact(prior_path or PRIORS[geometry])
    # the schedule study's test set is synthetic_dataset(cfg, 125, seed=43)
    # (rd_sweep --synthetic 500 => test seed 42+1); its first n_images rows
    # are generator-prefix-stable
    X, Y = synthetic_dataset(art.config, n_images, seed=43)
    return art, X, Y


def matched_budgets(n1, n_w, n_h=None, n_hh=None):
    """Per-group finetune budgets of the reference schedule
    (main_compression.py:156-158: w max(30000/n, 50); h/hh
    max(15000/n, 20)), scaled proportionally to a reduced matched phase-1
    budget n1 (--n_opt). The ONE formula both sides of the head-to-head
    use — a one-sided scaling bug here silently unlevels the comparison
    (round-4 session 1 shipped exactly that: the torch side scaled h/hh
    off the mutated N_OPT global instead of the 30000 reference base)."""
    b = {"w": max(int(n1) // int(n_w), 50)}
    if n_h is not None:
        h_budget = int(15000 * n1 / N_OPT_REFERENCE)
        b["h"] = max(h_budget // int(n_h), 20)
        b["hh"] = max(h_budget // int(n_hh), 20)
    return b


def _ft_overrides(codec, n_opt, ft_epochs, finetune_stop=None):
    """Match run_torch's finetune budgets. --ft_epochs: one explicit value
    for every level. Otherwise, when a reduced matched schedule is requested
    (--n_opt), scale the reference budgets via matched_budgets — without
    this the ours side would keep the full 30000-based budgets and the
    'matched' comparison would be lopsided.

    EXCEPT when an adaptive --ft_stop is in force: then the budgets are
    plateau-stop CEILINGS, and the preset's evidence base (docs/SCHEDULE.md)
    used the reference 30000-based ceilings — scaling them by a reduced
    --n_opt makes the ceilings bind before the stop fires and silently
    clips quality (ADVICE r4, medium)."""
    if ft_epochs is not None:
        return {k: ft_epochs for k in ("w", "h", "hh")}
    if n_opt is None or finetune_stop is not None:
        return None
    return matched_budgets(
        n_opt, codec.w.n_groups,
        codec.h.n_groups if codec.h is not None else None,
        codec.hh.n_groups if codec.h is not None else None,
    )


def run_ours(art, X, Y, out_path: str, state_path: str | None = None,
             seed: int = 7, codebook: str | None = None,
             coding_precision: str | None = None,
             finetune_crn: bool | None = None,
             phase1_stop: tuple | None = None,
             finetune_stop: tuple | None = None,
             phase1_precision: str | None = None,
             phase1_monitor: str = "mse",
             phase1_lr: tuple | None = None,
             phase1_sample_size: int | None = None,
             n_opt: int | None = None,
             fused_steps: int | None = None,
             finetune_lr: float | None = None,
             finetune_lr_schedule: str | None = None,
             ft_epochs: int | None = None) -> dict:
    import jax
    import jax.numpy as jnp

    from recombiner_tpu.coding.encoder import init_codec
    from recombiner_tpu.coding.progressive import compress, finetune_epochs
    from recombiner_tpu.io.checkpoint import prior_fingerprint
    from recombiner_tpu.metrics import metric

    cfg = art.config
    codec, state = init_codec(art, n_rows=X.shape[0], codebook_kind=codebook)
    n_groups = int(codec.w.n_groups)
    fingerprint = prior_fingerprint(art)
    resume = {}
    if state_path:
        from recombiner_tpu.io.atomic import load_snapshot_or_none
        from recombiner_tpu.io.encode_state import (
            FingerprintMismatch,
            load_encode_state_full,
        )

        try:
            loaded, reason = load_snapshot_or_none(
                state_path, lambda p: load_encode_state_full(p, fingerprint)
            )
        except FingerprintMismatch as e:
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
    t0 = time.perf_counter()
    res = compress(
        codec, state, jnp.asarray(X), jnp.asarray(Y), cfg, jax.random.key(seed),
        n_optimize_epochs=(n_opt or N_OPT), sample_size=5, verbose=True,
        state_path=state_path, state_extra={"prior_fingerprint": fingerprint},
        coding_precision=coding_precision,
        finetune_crn=finetune_crn,
        phase1_stop=phase1_stop,
        finetune_stop=finetune_stop,
        phase1_precision=phase1_precision,
        phase1_monitor=phase1_monitor,
        phase1_lr=phase1_lr,
        phase1_sample_size=phase1_sample_size,
        fused_steps=fused_steps,
        finetune_lr=finetune_lr,
        finetune_lr_schedule=finetune_lr_schedule,
        finetune_overrides=_ft_overrides(codec, n_opt, ft_epochs, finetune_stop),
        **resume,
    )
    wall = time.perf_counter() - t0

    # Decode-precision diagnostics (VERDICT r4 #1): render the SAME
    # transmitted indices at exact f32 (the shipped canonical decode) AND at
    # the ambient TPU default (bf16 passes — the function the coding-phase
    # finetunes actually optimized through). A spread between the two decodes
    # is precision co-adaptation; a spread between same-precision decode and
    # the final encoder-internal forward would be an index/value bug.
    from recombiner_tpu.coding.encoder import decode, predict as enc_predict

    Xj = jnp.asarray(X)
    y_hi = decode(codec, res.indices, Xj, cfg, precision="highest")
    y_df = decode(codec, res.indices, Xj, cfg, precision=None)
    y_int = enc_predict(codec, res.state, Xj, jax.random.key(0), cfg,
                        sample_size=1)[:, 0]
    psnr_hi = float(np.mean(metric(Y, np.asarray(y_hi), cfg.name)))
    psnr_df = float(np.mean(metric(Y, np.asarray(y_df), cfg.name)))
    psnr_int = float(np.mean(metric(Y, np.asarray(y_int), cfg.name)))

    ovr = _ft_overrides(codec, n_opt, ft_epochs, finetune_stop)
    rec = {
        "side": "ours",
        "psnr": float(np.mean(res.distortion)),
        "psnr_decode_f32": psnr_hi,
        "psnr_decode_default": psnr_df,
        "psnr_internal_final": psnr_int,
        "bitrate_bpp": res.bitrate,
        "n_groups": n_groups,
        # per-w-group budget actually in force (override-aware; the true
        # spend is timings.finetune_epochs). 'is not None' check: an explicit
        # --ft_epochs 0 must not fall through to the reference budget
        # (ADVICE r4, low)
        "finetune_epochs": (
            ovr["w"] if ovr is not None and "w" in ovr
            else finetune_epochs(cfg, n_groups, "w")),
        "wall_s": round(wall, 1),
        "n_images": int(X.shape[0]),
        "timings": {k: (round(v, 1) if isinstance(v, float) else v)
                    for k, v in res.timings.items()},
    }
    return rec


def run_torch(art, X, Y, out_path: str, seed: int = 42,
              n_opt: int | None = None) -> dict:
    """The reference's own TestBNNmodel end to end, geometry taken from the
    artifact config — wires BOTH the nonpatch branch (main_compression.py:
    37-145) and the 3-level patch branch (h/hh priors reordered by their own
    param2group, hierarchical_patch_nums, reference finetune budgets
    main_compression.py:156-158)."""
    import sys

    import torch

    torch.manual_seed(0)
    torch.set_num_threads(1)
    sys.path.insert(0, REF)
    try:
        import test_model as ref_test_model
    finally:
        sys.path.remove(REF)

    from recombiner_tpu.io.export_reference import export_reference_checkpoint
    from recombiner_tpu.metrics import metric
    import pickle

    cfg = art.config
    pkl = out_path + ".prior.pkl"
    export_reference_checkpoint(art, pkl, reference_path=REF)

    with open(pkl, "rb") as f:
        g1 = pickle.load(f)
        prior_loc, prior_scale, kl_beta, avg_ls = pickle.load(f)
        gh = pickle.load(f)
        h_prior = pickle.load(f)
        ghh = pickle.load(f)
        hh_prior = pickle.load(f)
        lt = pickle.load(f)
        up = pickle.load(f)

    def reorder(loc, scale, avg, p2g):
        # main_compression.py:47-73 wiring: group-order priors, inv-softplus
        return (loc.clone()[p2g],
                torch.log(torch.exp(scale * 6) - 1).clone()[p2g],
                avg[p2g].cpu().detach())

    (group_idx, group_start, group_end, group2param, param2group,
     n_groups, *_r) = g1
    _p_loc, _p_ls, _avg = reorder(prior_loc, prior_scale, avg_ls, param2group)
    kw = dict(
        in_dim=cfg.input_dim, hidden_dims=list(cfg.hidden_dims),
        out_dim=cfg.output_dim, number_of_datapoints=X.shape[0],
        upsample_factors=list(cfg.upsample_factors), latent_dim=cfg.latent_dim,
        data_dim=cfg.data_dim, pixel_sizes=list(cfg.pixel_sizes),
        patch=cfg.patch,
        patch_nums=list(cfg.patch_nums) if cfg.patch else None,
        hierarchical_patch_nums=(
            {"level2": list(cfg.level2_patch_nums),
             "level3": list(cfg.level3_patch_nums)} if cfg.patch else None
        ),
        # the reference keys ONLY its metric + a bpp/kbps print on `dataset`
        # (test_model.py:249-251, utils.py:200-213; unknown names make its
        # metric return None and crash verbose logging): kodak_mini scores
        # like kodak (scalar PSNR), audio_mini like audio (PSNR round=False,
        # = our metric for audio_mini; its kbps-converted bpp print is
        # cosmetic — the recorded bitrate below is ours, bits/sample)
        dataset={"kodak_mini": "kodak", "audio_mini": "audio"}.get(
            cfg.name, cfg.name),
        linear_transform=lt, upsample_net=up,
        p_loc=_p_loc, p_log_scale=_p_ls, init_log_scale=_avg,
        param_to_group=param2group, group_to_param=group2param,
        n_groups=n_groups, group_start_index=group_start,
        group_end_index=group_end, group_idx=group_idx,
        w0=30., c=6., random_seed=seed, device="cpu",
        kl_upper_buffer=0., kl_lower_buffer=0.4, kl_adjust_gap=10,
        initial_beta=kl_beta, beta_step_size=0.05,
    )
    h_n = hh_n = 0
    if cfg.patch:
        (h_gi, h_gs, h_ge, h_g2p, h_p2g, h_n, *_r) = gh
        (hh_gi, hh_gs, hh_ge, hh_g2p, hh_p2g, hh_n, *_r) = ghh
        _h_loc, _h_ls, _h_avg = reorder(h_prior[0], h_prior[1], h_prior[3], h_p2g)
        _hh_loc, _hh_ls, _hh_avg = reorder(hh_prior[0], hh_prior[1], hh_prior[3], hh_p2g)
        kw.update(
            h_p_loc=_h_loc, h_p_log_scale=_h_ls, h_init_log_scale=_h_avg,
            h_param_to_group=h_p2g, h_group_to_param=h_g2p, h_n_groups=h_n,
            h_group_start_index=h_gs, h_group_end_index=h_ge, h_group_idx=h_gi,
            hh_p_loc=_hh_loc, hh_p_log_scale=_hh_ls, hh_init_log_scale=_hh_avg,
            hh_param_to_group=hh_p2g, hh_group_to_param=hh_g2p, hh_n_groups=hh_n,
            hh_group_start_index=hh_gs, hh_group_end_index=hh_ge,
            hh_group_idx=hh_gi,
        )
    m = ref_test_model.TestBNNmodel(**kw)
    x, y = torch.from_numpy(X), torch.from_numpy(Y)
    # reference finetune budgets (main_compression.py:156-158), scaled
    # proportionally when a reduced matched schedule is requested (--n_opt:
    # audio-geometry torch encodes cost ~8 h CPU at the full schedule)
    n1 = n_opt or N_OPT
    b = matched_budgets(n1, n_groups, h_n if cfg.patch else None,
                        hh_n if cfg.patch else None)
    n_ft, h_ft, hh_ft = b["w"], b.get("h"), b.get("hh")
    t0 = time.perf_counter()
    m.optimize_posteriors(x, y, n_epochs=n1, lr=2e-4, verbose=1)
    m.compress_posteriors(
        x, y, n_epochs_finetune=n_ft, h_n_epochs_finetune=h_ft,
        hh_n_epochs_finetune=hh_ft, verbose=1, lr=2e-4, fine_tune_gap=1,
        compress_from_group_with_largest_kl=True,
    )
    wall = time.perf_counter() - t0
    with torch.no_grad():
        y_pred = m.predict(x, random_seed=0, sample_size=1)
    psnr = metric(Y, y_pred.numpy(), cfg.name)
    rec = {
        "side": "torch_reference",
        "psnr": float(np.mean(psnr)),
        "bitrate_bpp": float(cfg.bitrate_of_groups(int(n_groups), int(h_n), int(hh_n))),
        "n_groups": int(n_groups),
        "finetune_epochs": n_ft,
        "n_opt": n1,
        "wall_s": round(wall, 1),
        "n_images": int(X.shape[0]),
    }
    return rec


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--side", required=True, choices=("torch", "ours"))
    p.add_argument("--geometry", default="cifar", choices=tuple(PRIORS),
                   help="cifar: nonpatch 32x32; kodak_mini: 3-level patch "
                        "hierarchy (2x2 patches of 32x32, VERDICT r3 #4); "
                        "audio_mini: 1-D 3-level hierarchy (4x800-sample "
                        "patches, VERDICT r3 next #5). n_images counts patch "
                        "ROWS for patch geometries.")
    p.add_argument("--n_images", type=int, default=8)
    p.add_argument("--prior", default=None,
                   help="override the geometry's published prior artifact "
                        "path (EM-schedule studies: encode with an "
                        "alternatively-trained prior at the same geometry)")
    p.add_argument("--out", required=True)
    p.add_argument("--n_opt", type=int, default=None,
                   help="override the 30000-epoch schedule (smoke tests only)")
    p.add_argument("--state", default=None,
                   help="ours side: encode-state snapshot path (crash resume)")
    p.add_argument("--enc_seed", type=int, default=None,
                   help="encode RNG seed (seed-variance studies). Default: the "
                        "side's published-baseline seed — torch 42 (every "
                        "pre-round-3 torch record), ours 7")
    p.add_argument("--codebook", default=None, choices=(None, "threefry", "sobol"),
                   help="ours side: override the artifact's codebook kind")
    p.add_argument("--finetune_crn", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="ours side: reuse one noise key for every coding-phase "
                        "finetune (the reference's train(random_seed=epoch) "
                        "common-random-numbers semantics). Default None = the "
                        "library auto (ON for patch configs)")
    p.add_argument("--p1_stop", nargs=3, type=float, default=None,
                   metavar=("WINDOW", "REL_TOL", "MIN_EPOCHS"),
                   help="ours side: adaptive phase-1 early stop "
                        "(window, rel_tol, min_epochs)")
    p.add_argument("--ft_stop", nargs=3, type=float, default=None,
                   metavar=("WINDOW", "REL_TOL", "MIN_EPOCHS"),
                   help="ours side: adaptive per-group finetune early stop")
    p.add_argument("--p1_precision", default=None,
                   choices=(None, "high", "highest"),
                   help="ours side: phase-1 optimization matmul precision "
                        "(None = ambient bf16-pass default)")
    p.add_argument("--p1_lr", type=float, nargs=2, default=None,
                   metavar=("PEAK", "FLOOR"),
                   help="ours side: cosine-decay phase-1 Adam lr from PEAK "
                        "to FLOOR over --n_opt epochs (reference: constant "
                        "2e-4 for 30k — the shortened-phase-1 lever, "
                        "docs/SCHEDULE.md)")
    p.add_argument("--p1_samples", type=int, default=None,
                   help="ours side: phase-1 MC sample size (reference: 5 "
                        "everywhere; epoch cost ~linear in S, finetunes "
                        "keep S=5)")
    p.add_argument("--p1_monitor", default="mse", choices=("mse", "loss"),
                   help="ours side: phase-1 plateau statistic (mse = the "
                        "distortion term; loss = full beta-annealed ELBO, "
                        "which never plateaus on long runs — docs/SCHEDULE.md)")
    p.add_argument("--fused_steps", type=int, default=None,
                   help="ours side: fuse K group steps + finetunes per "
                        "compiled program (encoder.encode_chunk)")
    p.add_argument("--ft_lr", type=float, default=None,
                   help="ours side: finetune peak lr (fused path only)")
    p.add_argument("--ft_lr_schedule", default=None, choices=(None, "cosine"),
                   help="ours side: finetune lr schedule (fused path only)")
    p.add_argument("--ft_epochs", type=int, default=None,
                   help="ours side: override the per-group finetune budget "
                        "for all levels (reference: max(30000/n,50))")
    p.add_argument("--precision", default="default",
                   choices=("scoped", "scoped_high", "default", "high", "highest"),
                   help="ours side: matmul precision mode. 'scoped'[_high] = "
                        "coding-phase finetune INR einsums only (the shipped "
                        "default operating point); 'high'/'highest' = "
                        "process-global; 'default' = bf16 passes everywhere "
                        "(torch-CPU is exact f32 — 'highest'/'scoped' removes "
                        "that asymmetry)")
    args = p.parse_args()
    if args.enc_seed is None:
        # per-side baseline seeds: changing either silently forks the
        # published records (torch_full.json etc. are all torch seed 42)
        args.enc_seed = 42 if args.side == "torch" else 7
    from recombiner_tpu.utils.platform import apply_precision_mode

    # same mapping as the shipped CLIs — the head-to-head must measure the
    # exact operating point the flag of the same name selects there
    coding_precision = apply_precision_mode(args.precision)
    if args.n_opt is not None:
        global N_OPT
        N_OPT = args.n_opt

    from recombiner_tpu.utils.platform import apply_platform_override

    apply_platform_override()  # RECOMBINER_TPU_PLATFORM=cpu etc. (utils/platform.py)
    if args.side == "torch":
        # torch side never needs a device; keep jax off the TPU
        import jax

        jax.config.update("jax_platforms", "cpu")

    def stop_spec(v):
        return None if v is None else (int(v[0]), float(v[1]), int(v[2]))

    art, X, Y = load_shared(args.n_images, args.geometry, args.prior)
    rec = run_torch(
        art, X, Y, args.out, seed=args.enc_seed, n_opt=args.n_opt,
    ) if args.side == "torch" else run_ours(
        art, X, Y, args.out, state_path=args.state,
        # n_opt must reach run_ours explicitly: the N_OPT global mutation
        # above only scales phase 1 — _ft_overrides needs the value to
        # scale the finetune budgets too (ours_audio_mini_s7_n3000.json
        # rev 1 silently spent the FULL 59,930 finetune epochs without it)
        n_opt=args.n_opt,
        seed=args.enc_seed, codebook=args.codebook,
        finetune_crn=args.finetune_crn,
        coding_precision=coding_precision,
        phase1_stop=stop_spec(args.p1_stop),
        finetune_stop=stop_spec(args.ft_stop),
        phase1_precision=args.p1_precision,
        phase1_monitor=args.p1_monitor,
        phase1_lr=tuple(args.p1_lr) if args.p1_lr else None,
        phase1_sample_size=args.p1_samples,
        fused_steps=args.fused_steps,
        finetune_lr=args.ft_lr,
        finetune_lr_schedule=args.ft_lr_schedule,
        ft_epochs=args.ft_epochs,
    )
    rec["geometry"] = args.geometry
    rec["prior"] = args.prior or PRIORS[args.geometry]
    rec["enc_seed"] = args.enc_seed
    if args.side == "ours":
        rec["codebook"] = args.codebook or "artifact-default"
        rec["matmul_precision"] = args.precision
        rec["p1_stop"] = args.p1_stop
        rec["ft_stop"] = args.ft_stop
        rec["p1_precision"] = args.p1_precision
        rec["p1_monitor"] = args.p1_monitor
        rec["p1_lr"] = args.p1_lr
        rec["p1_samples"] = args.p1_samples
        rec["fused_steps"] = args.fused_steps
        rec["ft_lr"] = args.ft_lr
        rec["ft_lr_schedule"] = args.ft_lr_schedule
        rec["ft_epochs"] = args.ft_epochs
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
