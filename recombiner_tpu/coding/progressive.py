"""Progressive encode driver: coarse-to-fine A* coding with interleaved
posterior finetuning.

Orchestrates the jitted kernels in encoder.py following the reference
schedule (test_model.py:687-856, main_compression.py:148-162): optimize
posteriors, then per level (hh -> h -> w) repeatedly code every row's
highest-KL group and refinetune the remaining posteriors. Each python-loop
iteration is two compiled calls (encode_step + optimize); no per-group host
work remains.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from recombiner_tpu.config import ModalityConfig
from recombiner_tpu.coding.encoder import (
    Codec,
    CodecState,
    decode,
    encode_chunk,
    encode_step,
    group_kl,
    optimize,
    optimize_adaptive,
    predict,
)
from recombiner_tpu.metrics import UNROUNDED_PSNR, metric
from recombiner_tpu.parallel.launch import fetch_global
from recombiner_tpu.utils.timing import sync


@dataclasses.dataclass
class EncodeResult:
    state: CodecState
    indices: Dict[str, np.ndarray]
    distortion: np.ndarray
    bitrate: float
    reconstruction: np.ndarray
    timings: Dict[str, float]


def distortion_of(
    codec: Codec, state: CodecState, X: jax.Array, Y: jax.Array, cfg: ModalityConfig
):
    y_pred = predict(codec, state, X, jax.random.key(0), cfg, sample_size=1)[:, 0]
    return metric(fetch_global(Y), fetch_global(y_pred), cfg.name)


def resolve_coding_precision(
    coding_precision: Optional[str], cfg: ModalityConfig
) -> Optional[str]:
    """Per-modality auto for the coding-phase finetune matmul precision.

    The canonical decode renders in exact f32 unconditionally; the
    finetunes must optimize THROUGH the same function, or the posteriors
    co-adapt to the ambient bf16-pass forward and the f32 decode renders a
    measurably different reconstruction. The mismatch is ~6e-8 absolute
    mse — invisible under 8-bit-rounded PSNR (cifar/kodak/video) and at
    <=55 dB operating points, but −1.2/−1.8 dB on the 66-71 dB audio_mini
    head-to-head (docs/HEAD_TO_HEAD.md round 5). So: unrounded-PSNR
    (audio-family) configs default to exact-f32 coding finetunes
    ('highest', the `--precision scoped` operating point, +15-31% finetune
    epoch cost); everything else keeps the RD-parity bf16 default. The
    explicit sentinel 'default' (from `--precision default`) forces the
    ambient path — the ablation escape hatch.
    """
    if coding_precision == "default":
        return None
    if coding_precision is None and cfg.name in UNROUNDED_PSNR:
        return "highest"
    return coding_precision


def kl_bits_summary(codec: Codec, state: CodecState) -> Dict[str, float]:
    out = {}
    for name in codec.level_names:
        ls = state.level(name)
        bits = fetch_global(group_kl(ls, codec.meta(name))) / np.log(2.0)
        mask = ~fetch_global(ls.compressed)
        if mask.any():
            out[f"{name}_max_bits"] = float(bits[mask].max())
            out[f"{name}_ave_bits"] = float(bits[mask].mean())
    return out


def finetune_epochs(cfg: ModalityConfig, n_groups: int, level: str) -> int:
    """Reference finetune budgets (main_compression.py:156-158)."""
    if level == "w":
        return max(30000 // n_groups, 50)
    return max(15000 // n_groups, 20)


def compress(
    codec: Codec,
    state: CodecState,
    X: jax.Array,
    Y: jax.Array,
    cfg: ModalityConfig,
    key: jax.Array,
    *,
    n_optimize_epochs: int = 30000,
    lr: float = 2e-4,
    sample_size: int = 5,
    finetune_overrides: Optional[Dict[str, int]] = None,
    verbose: bool = False,
    log_fn: Optional[Callable] = None,
    state_path: Optional[str] = None,
    save_every: int = 10,
    remat: bool = False,
    state_extra: Optional[Dict] = None,
    phase1_epochs_done: int = 0,
    phase1_opt_leaves=None,
    resume_key=None,
    chunk_epochs: int = 1000,
    sync_every: int = 1,
    coding_precision: Optional[str] = None,
    finetune_crn: Optional[bool] = None,
    phase1_stop: Optional[tuple] = None,
    finetune_stop: Optional[tuple] = None,
    phase1_es: Optional[tuple] = None,
    phase1_precision: Optional[str] = None,
    phase1_monitor: str = "mse",
    phase1_lr: Optional[tuple] = None,
    phase1_sample_size: Optional[int] = None,
    fused_steps: Optional[int] = None,
    finetune_lr: Optional[float] = None,
    finetune_lr_schedule: Optional[str] = None,
) -> EncodeResult:
    """Full encode: posterior optimization + progressive coding of all levels.

    Resume contract (all snapshot fields written by this function itself via
    io.encode_state): ``phase1_epochs_done``/``phase1_opt_leaves``/
    ``resume_key`` restore a mid-phase-1 optimization (the 30,000-epoch run
    the reference cannot persist at all — its encode state dies with the
    process, test_model.py:700-803); a state whose ``compressed`` masks are
    partially set resumes the group-coding loop. ``state_extra`` is merged
    into every snapshot header (callers put the prior fingerprint there).

    ``coding_precision`` sets the matmul precision of the CODING-PHASE
    finetune einsums only (phase-1 optimization always runs at the ambient
    default). The round-3 precision ladder (docs/HEAD_TO_HEAD.md) located
    the reference's full ~0.35 dB RD edge in the two surfaces that now run
    exact f32 UNCONDITIONALLY — A* candidate scoring
    (encoder.encode_step_level) and decode rendering (encoder.decode) —
    and measured finetune precision itself RD-neutral once those are
    exact, so None (the default) is already the RD-parity operating point
    at ~1.0x encode wall. 'highest'/'high' additionally raise the finetune
    einsums (+15-31% epoch cost, docs/PERF.md) as a belt-and-braces knob.
    Bitstream format is precision-independent either way.
    None additionally applies a per-modality AUTO (resolve_coding_precision):
    unrounded-PSNR audio-family configs run the finetunes at 'highest' so
    the exact-f32 decode renders the function they optimized (the round-5
    co-adaptation fix, −1.2/−1.8 dB at 66-71 dB operating points); the
    sentinel 'default' forces the ambient bf16 path.

    ``phase1_stop`` / ``finetune_stop``: adaptive early-stop specs
    ``(window, rel_tol, min_epochs)`` for phase-1 optimization and the
    per-group coding finetunes respectively (None = the reference's fixed
    budgets). Each optimization then runs optimize_adaptive — a device-side
    lax.while_loop that halts when the windowed mean ELBO stops improving
    by rel_tol relative per window — and n_optimize_epochs / the finetune
    budgets become CEILINGS rather than exact schedules. The reference
    spends its budgets unconditionally (main_compression.py:148-158); the
    measured trajectories (docs/SCHEDULE.md) show most of each finetune is
    flat, which is where the matched-RD throughput headline comes from.
    ``phase1_es`` restores the (prev_window_mean, window_sum) accumulator
    of an interrupted adaptive phase-1 (from the snapshot header).
    ``phase1_precision`` scopes matmul precision for phase-1 optimization
    only (the finetunes take ``coding_precision``).
    ``phase1_monitor``: the statistic phase-1's plateau test watches —
    'mse' (default: the distortion term; the beta-annealed ELBO is
    nonstationary over a 30k-epoch phase 1 and never plateaus, measured in
    docs/SCHEDULE.md) or 'loss' (the full ELBO, as the finetunes use).
    ``phase1_lr=(peak, floor)``: cosine-decay phase-1's Adam lr from peak to
    floor over ``n_optimize_epochs`` instead of the reference's constant
    ``lr`` (main_compression.py:148-151) — the matched-RD lever for a
    SHORTENED phase 1 (docs/SCHEDULE.md); encoder-side only, the schedule
    counter rides opt_state so chunked/resumed runs continue it exactly.
    ``phase1_sample_size``: MC sample count for phase-1 epochs only (the
    reference uses S=5 everywhere, main_compression.py:151; epoch cost is
    ~linear in S). Finetunes keep ``sample_size``.

    ``fused_steps=K`` fuses K group steps + their finetunes per compiled
    program (encoder.encode_chunk) for levels whose finetune budget fits one
    chunk (n_ft <= chunk_epochs), dividing the ~per-group dispatch overhead
    by K at bit-identical numerics; None keeps the 2-programs-per-group
    loop. Snapshot/flow-control cadence moves to chunk boundaries."""
    timings = {}
    t0 = time.perf_counter()
    coding_precision = resolve_coding_precision(coding_precision, cfg)

    if verbose:
        d0 = distortion_of(codec, state, X, Y, cfg)
        print(f"Initialization: average distortion {np.mean(d0):.4f}", flush=True)

    # resuming a restored mid-encode state: phase-1 optimization already ran
    resuming = any(
        bool(fetch_global(state.level(n).compressed).any()) for n in codec.level_names
    )
    if resuming and verbose:
        print("Resuming encode from restored state; skipping phase-1 optimization", flush=True)

    # Chunk EVERY optimization into <=1000-epoch programs. Two reasons, both
    # observed on the v5e tunnel: (a) multi-minute single programs trip
    # device watchdogs; (b) a 7500-epoch finetune program CRASHED the TPU
    # worker outright at audio h-level geometry while the identical call
    # chunked at 1000 epochs runs clean (repro 2026-08-17, kept the fix).
    # Adam state carries across chunks, so the math equals one long call
    # (modulo per-epoch RNG stream splits, which are encoder-side only).
    def optimize_chunked(state, key, n_epochs, label=None,
                         done=0, opt_state=None, snapshot_path=None,
                         precision=None, lr_schedule=None, n_samples=None):
        """Returns (state, advanced key): the outer key chain continues from
        where the chunks left off, so finetune substreams never re-derive
        (key, sub) pairs phase-1 already consumed.

        With ``snapshot_path``, persists (state, Adam state, epochs_done,
        key) after every chunk — a kill mid-phase-1 loses at most one
        ~1000-epoch chunk on resume."""
        chunk = chunk_epochs
        while done < n_epochs:
            n = min(chunk, n_epochs - done)
            key, sub = jax.random.split(key)
            state, opt_state = optimize(
                codec, state, X, Y, sub,
                cfg=cfg, n_epochs=n, lr=lr,
                sample_size=(n_samples or sample_size),
                opt_state=opt_state, return_opt_state=True, remat=remat,
                precision=precision, lr_schedule=lr_schedule,
            )
            done += n
            sync(state.w.kl_beta)  # flow control: one in-flight chunk (small fetch)
            if snapshot_path is not None:
                from recombiner_tpu.io.encode_state import save_encode_state

                save_encode_state(
                    snapshot_path, state,
                    extra={
                        "phase1_epochs_done": done,
                        "resume_key": np.asarray(
                            jax.random.key_data(key)).tolist(),
                        **(state_extra or {}),
                    },
                    opt_leaves=jax.tree_util.tree_leaves(opt_state),
                )
            if verbose and label is not None:
                # every chunk: the log doubles as the liveness signal for
                # stall watchdogs (scripts/babysit.py) — chunks are synced,
                # so each line means real device progress
                print(f"  {label} {done}/{n_epochs} epochs "
                      f"({time.perf_counter() - t0:.0f}s)", flush=True)
        return state, key

    def optimize_chunked_adaptive(state, key, n_epochs, stop, label=None,
                                  done=0, opt_state=None, es=None,
                                  snapshot_path=None, precision=None,
                                  monitor="loss", lr_schedule=None,
                                  n_samples=None):
        """Early-stop variant of optimize_chunked: the same <=chunk_epochs
        per-program bound (tunnel watchdog safety, above) but each chunk is
        one optimize_adaptive while_loop, and the outer loop ends as soon as
        the device reports the windowed plateau. The per-chunk epoch-count
        fetch doubles as the flow-control sync. Returns
        (state, key, epochs_done)."""
        window, rel_tol, min_epochs = stop
        if es is None:
            es = (np.inf, 0.0)
        while done < n_epochs:
            n = min(chunk_epochs, n_epochs - done)
            state, opt_state, key, es, i, stopped = optimize_adaptive(
                codec, state, X, Y, key, done, done + n, min_epochs, rel_tol,
                es, cfg=cfg, lr=lr, sample_size=(n_samples or sample_size),
                window=window,
                remat=remat, precision=precision, opt_state=opt_state,
                monitor=monitor, lr_schedule=lr_schedule,
            )
            done, stopped = (int(v) for v in jax.device_get((i, stopped)))
            if snapshot_path is not None:
                from recombiner_tpu.io.encode_state import save_encode_state

                es_host = [float(v) for v in jax.device_get(es)]
                save_encode_state(
                    snapshot_path, state,
                    extra={
                        "phase1_epochs_done": done,
                        "resume_key": np.asarray(
                            jax.random.key_data(key)).tolist(),
                        "phase1_es": es_host,
                        **(state_extra or {}),
                    },
                    opt_leaves=jax.tree_util.tree_leaves(opt_state),
                )
            if verbose and label is not None:
                print(f"  {label} {done}/{n_epochs} epochs"
                      f"{' (plateau stop)' if stopped else ''} "
                      f"({time.perf_counter() - t0:.0f}s)", flush=True)
            if stopped:
                break
        return state, key, done

    if resume_key is not None:
        key = jax.random.wrap_key_data(jnp.asarray(resume_key, jnp.uint32))
    timings["phase1_epochs"] = 0
    p1_sched = (
        ("cosine", float(phase1_lr[0]), float(phase1_lr[1]), n_optimize_epochs)
        if phase1_lr is not None else None
    )
    if n_optimize_epochs > phase1_epochs_done and not resuming:
        opt_state0 = None
        if phase1_opt_leaves is not None:
            from recombiner_tpu.coding.encoder import _make_opt, _trainables

            treedef = jax.tree_util.tree_structure(
                _make_opt(lr, p1_sched).init(_trainables(state))
            )
            opt_state0 = jax.tree_util.tree_unflatten(treedef, phase1_opt_leaves)
            if verbose:
                print(
                    f"Resuming phase-1 optimization at {phase1_epochs_done}/"
                    f"{n_optimize_epochs} epochs", flush=True)
        if phase1_stop is not None:
            state, key, p1_done = optimize_chunked_adaptive(
                state, key, n_optimize_epochs, phase1_stop, label="optimize",
                done=phase1_epochs_done, opt_state=opt_state0,
                es=phase1_es, snapshot_path=state_path,
                precision=phase1_precision, monitor=phase1_monitor,
                lr_schedule=p1_sched, n_samples=phase1_sample_size,
            )
            timings["phase1_epochs"] = p1_done
        else:
            state, key = optimize_chunked(
                state, key, n_optimize_epochs, label="optimize",
                done=phase1_epochs_done, opt_state=opt_state0,
                snapshot_path=state_path, precision=phase1_precision,
                lr_schedule=p1_sched, n_samples=phase1_sample_size,
            )
            timings["phase1_epochs"] = n_optimize_epochs
        sync(state.w.q.loc)  # true sync: timings must not lie on the tunnel
    timings["optimize_s"] = time.perf_counter() - t0

    if verbose:
        d1 = distortion_of(codec, state, X, Y, cfg)
        print(
            f"Optimization finished: average distortion {np.mean(d1):.4f} "
            f"{kl_bits_summary(codec, state)}",
            flush=True,
        )

    t1 = time.perf_counter()
    # Multi-device: serialize the per-group dispatches. Concurrently-running
    # compiled programs that both contain collectives can interleave their
    # rendezvous across devices and deadlock on the CPU in-process
    # communicator (observed at ~20-40 async group steps on the 8-virtual-
    # device mesh); on TPU the per-group sync costs microseconds against the
    # multi-second per-group finetune, so it is enabled whenever the state
    # spans more than one device.
    multi_device = len(state.w.q.loc.sharding.device_set) > 1
    # The multi-device rendezvous deadlock appeared at ~20-40 concurrently
    # dispatched collective programs; cap the un-synced window well below
    # that regardless of what the caller asked for (ADVICE r2).
    if multi_device and sync_every > 8:
        print(f"sync_every {sync_every} capped at 8 on a "
              f"{len(state.w.q.loc.sharding.device_set)}-device mesh "
              "(collective-program rendezvous safety)", flush=True)
        sync_every = 8
    # Single-device flow control: an unbounded async dispatch queue wedged
    # the remote TPU tunnel mid-encode (video run 2026-08-16: host blocked
    # 30+ min in a device fetch with the device silent — see
    # docs/rd_full_video_wedge.log). Fetch the small per-level index matrix
    # each group step: bounds the in-flight queue to ~one finetune while
    # moving only (R, n_groups) i32, microseconds against a multi-second
    # group step.

    # coarse-to-fine: hh -> h -> w (test_model.py:701-848)
    # crn_key is derived WITHOUT consuming the main chain (fold_in), so
    # finetune_crn toggling does not shift phase-1 or A* coding streams.
    # Default AUTO = on for patch configs: CRN measured +0.15/+0.30 dB on the
    # kodak_mini hierarchy but -0.05/-0.13 on non-patch cifar, where fresh
    # per-finetune draws act as extra MC samples (docs/HEAD_TO_HEAD.md r3)
    if finetune_crn is None:
        finetune_crn = bool(cfg.patch)
    crn_key = jax.random.fold_in(key, 0x0C12)
    order = ("hh", "h", "w") if cfg.patch else ("w",)
    timings["finetune_epochs"] = 0
    timings["finetune_budget"] = 0
    for level in order:
        meta = codec.meta(level)
        n_ft = (finetune_overrides or {}).get(level, finetune_epochs(cfg, meta.n_groups, level))
        report_at = set(np.linspace(0, meta.n_groups - 1, 10).astype(int).tolist())
        # resume support: groups already coded (restored state) are skipped
        already = int(fetch_global(state.level(level).compressed).sum(axis=1).max())

        if (finetune_lr or finetune_lr_schedule) and n_ft > 0 and not (
                fused_steps and n_ft <= chunk_epochs):
            raise ValueError(
                "finetune_lr/finetune_lr_schedule require the fused coding "
                "path (fused_steps with n_ft <= chunk_epochs)")
        if fused_steps and 0 < n_ft <= chunk_epochs:
            # ---- fused path: K group steps + finetunes per compiled program
            if finetune_stop is not None:
                ft_w, ft_tol, ft_min = finetune_stop
            else:
                ft_w, ft_tol, ft_min = 0, 0.0, 0
            step_i = already
            while step_i < meta.n_groups:
                k_steps = min(int(fused_steps), meta.n_groups - step_i)
                state, key, rans = encode_chunk(
                    codec, state, X, Y, key, crn_key, ft_min, ft_tol,
                    cfg=cfg, level=level, n_steps=k_steps, n_ft=n_ft,
                    lr=(finetune_lr or lr), sample_size=sample_size,
                    window=int(ft_w),
                    remat=remat, precision=coding_precision,
                    crn=bool(finetune_crn),
                    lr_schedule=finetune_lr_schedule,
                )
                step_i += k_steps
                timings["finetune_budget"] += n_ft * k_steps
                timings["finetune_epochs"] += int(np.sum(fetch_global(rans)))
                if multi_device:
                    sync(state.level(level).q.loc)  # rendezvous barrier (below)
                else:
                    sync(state.level(level).indices)  # flow control (below)
                if verbose:
                    if report_at & set(range(step_i - k_steps, step_i)):
                        d = distortion_of(codec, state, X, Y, cfg)
                        print(
                            f"[{level}] {step_i}/{meta.n_groups} groups coded; "
                            f"distortion {np.mean(d):.4f}",
                            flush=True,
                        )
                    else:
                        print(f"[{level}] {step_i}/{meta.n_groups}", flush=True)
                if log_fn is not None:
                    log_fn(level, step_i - 1, state)
                if state_path is not None:
                    from recombiner_tpu.io.encode_state import save_encode_state

                    save_encode_state(
                        state_path, state,
                        extra={"level": level, "step": step_i - 1,
                               "phase1_epochs_done": n_optimize_epochs,
                               "resume_key": np.asarray(
                                   jax.random.key_data(key)).tolist(),
                               **(state_extra or {})},
                    )
            continue

        for step_i in range(already, meta.n_groups):
            state = encode_step(codec, state, level)
            if n_ft > 0:
                if finetune_crn:
                    # common random numbers: EVERY finetune (all levels, all
                    # group steps) reuses one fixed key, so per-epoch noise
                    # draws repeat across finetunes — exactly the reference's
                    # train(random_seed=epoch) semantics (test_model.py:
                    # 621-623: epoch indexes the torch seed, restarting at 0
                    # each finetune). Variance reduction that compounds over
                    # ~180 group steps on the patch path.
                    sub = crn_key
                else:
                    key, sub = jax.random.split(key)
                # beta annealing CONTINUES during finetune (every
                # kl_adjust_gap epochs, like the reference's
                # update_annealing_factors call inside train,
                # test_model.py:631-632); frozen groups keep beta=0 because
                # update_betas skips compressed groups. Pinned by
                # test_coding.py::test_finetune_annealing_continues.
                # Fresh Adam per group (reference: fresh optimizer each
                # finetune) — optimize_chunked threads opt_state across its
                # internal chunks only.
                timings["finetune_budget"] += n_ft
                if finetune_stop is not None:
                    state, _, ft_done = optimize_chunked_adaptive(
                        state, sub, n_ft, finetune_stop,
                        precision=coding_precision)
                    timings["finetune_epochs"] += ft_done
                else:
                    state, _ = optimize_chunked(state, sub, n_ft,
                                                precision=coding_precision)
                    timings["finetune_epochs"] += n_ft
            # sync_every batches the flow-control fetch over K group steps:
            # the dispatch queue stays bounded at <=K in-flight finetune
            # programs (K=1 reproduces the original per-group barrier; keep
            # K small — the multi-device rendezvous deadlock above appeared
            # at ~20-40 un-synced collective programs).
            if (step_i + 1) % max(sync_every, 1) == 0 or step_i == meta.n_groups - 1:
                if multi_device:
                    # utils.timing.sync (device_get), NOT block_until_ready:
                    # the latter does not synchronize on this image's axon
                    # TPU tunnel (CLAUDE.md), which would make the barrier a
                    # no-op exactly where it matters
                    sync(state.level(level).q.loc)
                else:
                    sync(state.level(level).indices)  # flow control (see above)
            if verbose:
                if step_i in report_at:
                    d = distortion_of(codec, state, X, Y, cfg)
                    print(
                        f"[{level}] {step_i + 1}/{meta.n_groups} groups coded; "
                        f"distortion {np.mean(d):.4f}",
                        flush=True,
                    )
                else:  # liveness heartbeat: one short line/group (real device
                    # progress when sync_every=1; dispatch progress otherwise)
                    print(f"[{level}] {step_i + 1}/{meta.n_groups}", flush=True)
            if log_fn is not None:
                log_fn(level, step_i, state)
            if state_path is not None and (step_i + 1) % save_every == 0:
                from recombiner_tpu.io.encode_state import save_encode_state

                # resume_key: a crash-resume mid-coding continues the exact
                # finetune RNG chain, making the resumed run bit-identical to
                # an uninterrupted one (mirrors the phase-1 contract; ADVICE r2)
                save_encode_state(
                    state_path, state,
                    extra={"level": level, "step": step_i,
                           "phase1_epochs_done": n_optimize_epochs,
                           "resume_key": np.asarray(
                               jax.random.key_data(key)).tolist(),
                           **(state_extra or {})},
                )
    sync(state.w.indices)  # true sync: timings must not lie on the tunnel
    timings["code_s"] = time.perf_counter() - t1

    indices = {
        name: fetch_global(state.level(name).indices) for name in codec.level_names
    }
    # final reconstruction through the REAL decoder path (indices only), so the
    # reported distortion is exactly what a receiver would measure. A receiver
    # decodes unsharded, and sharded layouts change f32 fusion order, so the
    # canonical decode always runs on unsharded arrays regardless of the
    # encode mesh (pinned by test_cli.py's encoder/decoder bit-equality).
    if multi_device:
        def _unshard(a):
            return jnp.asarray(fetch_global(a)) if isinstance(a, jax.Array) else a

        codec_u = jax.tree_util.tree_map(_unshard, codec)
        y_pred = decode(codec_u, indices, _unshard(X), cfg)
    else:
        y_pred = decode(codec, indices, X, cfg)
    dist = metric(fetch_global(Y), np.asarray(y_pred), cfg.name)
    n_groups = {name: codec.meta(name).n_groups for name in codec.level_names}
    bitrate = cfg.bitrate_of_groups(
        n_groups["w"], n_groups.get("h", 0), n_groups.get("hh", 0)
    )
    if verbose:
        print(f"Encode finished: distortion {np.mean(dist):.4f} @ {bitrate:.4f}", flush=True)
    return EncodeResult(
        state=state,
        indices=indices,
        distortion=np.asarray(dist),
        bitrate=bitrate,
        reconstruction=np.asarray(y_pred),
        timings=timings,
    )
