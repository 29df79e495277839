import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recombiner_tpu.coding.encoder import encode_step, init_codec
from recombiner_tpu.coding.progressive import compress
from recombiner_tpu.config import TINY
from recombiner_tpu.data.synthetic import synthetic_dataset
from recombiner_tpu.io.encode_state import load_encode_state, save_encode_state
from recombiner_tpu.priors.artifact import build_prior_artifact
from recombiner_tpu.priors.trainer import em_train
from recombiner_tpu.utils.tracing import StepTimer, log_jsonl, trace


@pytest.fixture(scope="module")
def artifact():
    cfg = TINY
    X, Y = synthetic_dataset(cfg, 2, seed=20)
    res = em_train(
        jax.random.key(0), cfg, jnp.array(X), jnp.array(Y), max_bitrate=4.0,
        n_em_iters=2, first_epochs=15, later_epochs=10, lr=2e-3,
    )
    return cfg, build_prior_artifact(res.state, res.priors, res.kl_beta, cfg), X, Y


def test_encode_state_roundtrip(artifact, tmp_path):
    cfg, art, X, Y = artifact
    codec, state = init_codec(art, n_rows=2)
    for _ in range(3):
        state = encode_step(codec, state, "w")
    path = str(tmp_path / "enc.npz")
    save_encode_state(path, state, extra={"note": "mid-encode"})
    restored = load_encode_state(path)
    np.testing.assert_array_equal(np.asarray(state.w.indices), np.asarray(restored.w.indices))
    np.testing.assert_array_equal(
        np.asarray(state.w.compressed), np.asarray(restored.w.compressed)
    )
    np.testing.assert_allclose(np.asarray(state.w.q.loc), np.asarray(restored.w.q.loc))
    np.testing.assert_allclose(
        np.asarray(state.w.frozen_val), np.asarray(restored.w.frozen_val)
    )
    assert restored.h is None


def test_resume_compress_skips_coded_groups(artifact, tmp_path):
    """Kill-and-restart mid-encode: the resumed run codes only the remaining
    groups and never re-codes finished ones."""
    cfg, art, X, Y = artifact
    Xj, Yj = jnp.array(X), jnp.array(Y)
    codec, state = init_codec(art, n_rows=2)

    # phase 1 + 4 groups, then "crash"
    from recombiner_tpu.coding.encoder import optimize

    state = optimize(codec, state, Xj, Yj, jax.random.key(1), cfg=cfg,
                     n_epochs=10, lr=2e-3, sample_size=2)
    for _ in range(4):
        state = encode_step(codec, state, "w")
    idx_before = np.asarray(state.w.indices).copy()
    comp_before = np.asarray(state.w.compressed).copy()
    path = str(tmp_path / "enc.npz")
    save_encode_state(path, state)

    # restart from disk
    restored = load_encode_state(path)
    result = compress(
        codec, restored, Xj, Yj, cfg, jax.random.key(2),
        n_optimize_epochs=10,  # must be skipped on resume
        lr=2e-3, sample_size=2, finetune_overrides={"w": 1},
    )
    assert bool(np.asarray(result.state.w.compressed).all())
    # previously coded groups keep their transmitted indices
    np.testing.assert_array_equal(
        np.asarray(result.state.w.indices)[comp_before], idx_before[comp_before]
    )


def test_encode_step_noop_when_all_coded(artifact):
    cfg, art, X, Y = artifact
    codec, state = init_codec(art, n_rows=2)
    for _ in range(codec.w.n_groups):
        state = encode_step(codec, state, "w")
    idx = np.asarray(state.w.indices).copy()
    extra = encode_step(codec, state, "w")  # one step too many
    np.testing.assert_array_equal(np.asarray(extra.w.indices), idx)
    np.testing.assert_array_equal(
        np.asarray(extra.w.frozen_val), np.asarray(state.w.frozen_val)
    )


def test_step_timer():
    t = StepTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b", sync_on=jnp.zeros(3)):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["b"]["count"] == 1
    assert s["a"]["total_s"] >= 0


def test_trace_noop_and_log_jsonl(tmp_path):
    with trace(None):
        x = jnp.ones(3) * 2
    assert float(x.sum()) == 6.0
    p = str(tmp_path / "log.jsonl")
    log_jsonl(p, {"step": 1, "psnr": 30.5})
    log_jsonl(p, {"step": 2, "psnr": 31.0})
    recs = [json.loads(l) for l in open(p)]
    assert recs[1]["psnr"] == 31.0


def test_resolve_remat_tristate(capsys):
    from recombiner_tpu.config import CIFAR, KODAK
    from recombiner_tpu.utils.memory import resolve_remat, stored_activation_gb

    # cifar 500 rows, S=5: ~2.3 GB -> auto stays off
    assert stored_activation_gb(CIFAR, 500, 5) < 8.0
    assert resolve_remat(None, CIFAR, 500, 5) is False
    # kodak-scale 384 rows, S=5: the documented OOM case -> auto turns on
    assert stored_activation_gb(KODAK, 384, 5) > 8.0
    assert resolve_remat(None, KODAK, 384, 5) is True
    # sharding 8-ways brings it back under
    assert resolve_remat(None, KODAK, 384, 5, n_devices=8) is False
    # explicit values pass through (with a warning for the risky one)
    assert resolve_remat(False, KODAK, 384, 5) is False
    assert "WARNING" in capsys.readouterr().out
    assert resolve_remat(True, CIFAR, 500, 5) is True


def test_train_state_roundtrip_and_em_resume(tmp_path):
    """save/load the full EM state and continue training from it: the
    resumed run must produce finite progress and identical structure."""
    import jax
    import jax.numpy as jnp

    from recombiner_tpu.config import TINY
    from recombiner_tpu.io.train_state import load_train_state, save_train_state
    from recombiner_tpu.priors.trainer import em_train

    from recombiner_tpu.data.synthetic import synthetic_dataset

    X, Y = synthetic_dataset(TINY, 2, seed=0)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    res1 = em_train(jax.random.key(0), TINY, Xj, Yj, max_bitrate=4.0,
                    n_em_iters=2, first_epochs=6, later_epochs=3, lr=2e-3)
    p = str(tmp_path / "ts")
    save_train_state(p, res1.state, res1.priors, res1.kl_beta, 2,
                     controller=res1.controller, schedule_total=550)

    state, priors, kl_beta, done, extra = load_train_state(p, TINY)
    assert done == 2 and kl_beta == res1.kl_beta
    # rate-controller state persists across the snapshot (ADVICE r3 medium):
    # a relaunch must resume with the adapted aim, not reset to 1.0
    assert extra["controller"] == res1.controller
    assert extra["schedule_total"] == 550
    for a, b in zip(jax.tree_util.tree_leaves(res1.state),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    res2 = em_train(jax.random.key(1), TINY, Xj, Yj, max_bitrate=4.0,
                    n_em_iters=1, first_epochs=3, later_epochs=3, lr=2e-3,
                    state=state, priors=priors, kl_beta=kl_beta)
    assert np.isfinite(res2.elbo_history[-1]["mse"])


def test_phase1_snapshot_resume_bit_identical(artifact, tmp_path):
    """Kill-and-restart MID-phase-1: the resumed run (restored posteriors,
    Adam state, epoch counter, and RNG key) must reproduce the uninterrupted
    run bit-for-bit — losing at most one optimization chunk. The reference
    has nothing here: its encode state dies with the process
    (test_model.py:700-803)."""
    from recombiner_tpu.io.encode_state import load_encode_state_full

    cfg, art, X, Y = artifact
    Xj, Yj = jnp.array(X), jnp.array(Y)

    # uninterrupted run: 10 phase-1 epochs in 2 chunks of 5
    codec, state_a = init_codec(art, n_rows=2)
    res_a = compress(
        codec, state_a, Xj, Yj, cfg, jax.random.key(5),
        n_optimize_epochs=10, lr=2e-3, sample_size=2,
        finetune_overrides={"w": 1}, chunk_epochs=5,
    )

    # interrupted run: crash after the first chunk (simulated by raising out
    # of the snapshot hook via a 1-chunk schedule), resume from the snapshot
    codec, state_b = init_codec(art, n_rows=2)
    p = str(tmp_path / "enc_phase1")

    class Boom(RuntimeError):
        pass

    import recombiner_tpu.io.encode_state as es_mod

    orig_save = es_mod.save_encode_state
    calls = {"n": 0}

    def crash_after_first(path, state, **kw):
        orig_save(path, state, **kw)
        calls["n"] += 1
        if calls["n"] == 1:
            raise Boom()

    es_mod.save_encode_state = crash_after_first
    try:
        with pytest.raises(Boom):
            compress(
                codec, state_b, Xj, Yj, cfg, jax.random.key(5),
                n_optimize_epochs=10, lr=2e-3, sample_size=2,
                finetune_overrides={"w": 1}, chunk_epochs=5, state_path=p,
            )
    finally:
        es_mod.save_encode_state = orig_save

    state_l, header, opt_leaves = load_encode_state_full(p)
    assert header["phase1_epochs_done"] == 5
    assert opt_leaves is not None and len(opt_leaves) > 0
    res_b = compress(
        codec, state_l, Xj, Yj, cfg, jax.random.key(5),
        n_optimize_epochs=10, lr=2e-3, sample_size=2,
        finetune_overrides={"w": 1}, chunk_epochs=5,
        phase1_epochs_done=int(header["phase1_epochs_done"]),
        phase1_opt_leaves=opt_leaves,
        resume_key=header["resume_key"],
    )
    np.testing.assert_array_equal(
        np.asarray(res_a.state.w.indices), np.asarray(res_b.state.w.indices)
    )
    np.testing.assert_allclose(
        np.asarray(res_a.state.w.q.loc), np.asarray(res_b.state.w.q.loc), rtol=0, atol=0
    )


def test_fingerprint_guards_resume(artifact, tmp_path):
    """An encode snapshot written under a different prior must be refused at
    resume (ADVICE round 1: silent acceptance yields subtly wrong
    bitrate/distortion), and must NOT be quarantined as corrupt."""
    import dataclasses

    from recombiner_tpu.io.atomic import load_snapshot_or_none
    from recombiner_tpu.io.checkpoint import prior_fingerprint
    from recombiner_tpu.io.encode_state import (
        FingerprintMismatch,
        load_encode_state_full,
    )

    cfg, art, X, Y = artifact
    fp = prior_fingerprint(art)
    codec, state = init_codec(art, n_rows=2)
    p = str(tmp_path / "enc_fp")
    save_encode_state(p, state, extra={"prior_fingerprint": fp})

    # same prior: loads fine
    st, header, _ = load_encode_state_full(p, fp)
    assert header["prior_fingerprint"] == fp

    # perturbed prior: different fingerprint, load refused, file kept
    art2 = dataclasses.replace(
        art, w=dataclasses.replace(art.w, p_loc=art.w.p_loc + 0.1)
    )
    fp2 = prior_fingerprint(art2)
    assert fp2 != fp
    with pytest.raises(FingerprintMismatch):
        load_encode_state_full(p, fp2)
    with pytest.raises(FingerprintMismatch):
        load_snapshot_or_none(p, lambda q: load_encode_state_full(q, fp2))
    assert os.path.exists(p + ".npz")  # not quarantined: it isn't corrupt

    # missing fingerprint in an old snapshot: accepted (back compat)
    save_encode_state(p, state)
    load_encode_state_full(p, fp2)


def test_load_wav_clip_dtypes(tmp_path):
    """uint8 / int16 / float32 / stereo WAVs all normalize to the same
    [0, 1] domain (reference preprocessing data/audio.py:96-99)."""
    from scipy.io import wavfile

    from recombiner_tpu.config import get_config
    from recombiner_tpu.data.audio import load_wav_clip

    cfg = get_config("tiny_audio")
    n = cfg.patches_per_datapoint * cfg.pixel_sizes[0] if cfg.patch else cfg.pixel_sizes[0]
    t = np.linspace(0, 1, max(n, 64), endpoint=False)
    sig = (0.5 * np.sin(2 * np.pi * 5 * t)).astype(np.float32)

    paths = {}
    wavfile.write(str(tmp_path / "f32.wav"), 16000, sig)
    wavfile.write(str(tmp_path / "i16.wav"), 16000, (sig * 32767).astype(np.int16))
    wavfile.write(
        str(tmp_path / "u8.wav"), 16000, (sig * 127 + 128).clip(0, 255).astype(np.uint8)
    )
    wavfile.write(str(tmp_path / "stereo.wav"), 16000, np.stack([sig, sig * 0], 1))

    ref = load_wav_clip(str(tmp_path / "f32.wav"), cfg)[1]
    for name, tol in (("i16", 1e-3), ("u8", 1e-2), ("stereo", 1e-6)):
        _, y = load_wav_clip(str(tmp_path / f"{name}.wav"), cfg)
        assert np.all((y >= 0) & (y <= 1))
        np.testing.assert_allclose(y, ref, atol=tol)

    # full-scale negative int16 must clamp to 0, not below
    wavfile.write(str(tmp_path / "full.wav"), 16000,
                  np.full(max(n, 64), -32768, np.int16))
    _, y = load_wav_clip(str(tmp_path / "full.wav"), cfg)
    assert float(y.min()) == 0.0


def test_atomic_snapshot_and_corrupt_tolerance(tmp_path):
    from recombiner_tpu.io.atomic import atomic_savez, load_snapshot_or_none

    p = str(tmp_path / "snap")
    atomic_savez(p, {"a": np.arange(3)})
    assert os.path.exists(p + ".npz") and not os.path.exists(p + ".npz.tmp")

    def loader(path):
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        return z["a"]

    val, reason = load_snapshot_or_none(p, loader)
    assert reason is None and val.tolist() == [0, 1, 2]

    # torn write: truncated npz must be quarantined, not crash-loop
    with open(p + ".npz", "wb") as f:
        f.write(b"PK\x03\x04 torn")
    val, reason = load_snapshot_or_none(p, loader)
    assert val is None and "unreadable" in reason
    assert os.path.exists(p + ".npz.corrupt") and not os.path.exists(p + ".npz")
    # absent now -> silent None
    val, reason = load_snapshot_or_none(p, loader)
    assert val is None and reason is None


def test_apply_matmul_precision_plumbing():
    """--precision flows CLI -> apply_matmul_precision -> jax config.

    The knob recovers the measured ~0.35 dB the TPU's default bf16-pass f32
    matmuls cost in the coding phase (docs/HEAD_TO_HEAD.md); this pins the
    plumbing so the flag can't silently detach."""
    from recombiner_tpu.cli.compress import parse_args as compress_args
    from recombiner_tpu.cli.rd_sweep import parse_args as sweep_args
    from recombiner_tpu.utils.platform import apply_matmul_precision

    a = compress_args([
        "--test_dir", "x", "--test_idx", "0", "--prior_path", "p",
        "--save_dir", "s", "--precision", "highest",
    ])
    assert a.precision == "highest"
    a = sweep_args(["--dataset", "tiny", "--bitrates", "2.0"])
    assert a.precision is None  # default stays TPU-native

    prev = jax.config.jax_default_matmul_precision
    try:
        apply_matmul_precision(None)  # no-op
        assert jax.config.jax_default_matmul_precision == prev
        apply_matmul_precision("highest")
        assert jax.config.jax_default_matmul_precision == "highest"
    finally:
        jax.config.update("jax_default_matmul_precision", prev)


def test_apply_precision_mode_mapping():
    """None must raise nothing globally: the RD-parity surfaces — A* scoring
    (encode_step_level) and decode rendering — are exact f32 unconditionally,
    and the round-3 ladder measured finetune precision RD-neutral once they
    are (docs/HEAD_TO_HEAD.md round 3). Round 5: None and 'default' DIFFER —
    None lets compress() apply the per-modality auto (audio-family finetunes
    at exact f32, the decode co-adaptation fix), while 'default' is the
    explicit ambient-bf16 sentinel that suppresses the auto (the ablation
    escape hatch, progressive.resolve_coding_precision). Neither touches the
    global config; the opt-in modes scope or globalize extra matmul passes."""
    from recombiner_tpu.utils.platform import apply_precision_mode

    prev = jax.config.jax_default_matmul_precision
    try:
        assert apply_precision_mode(None) is None
        assert apply_precision_mode("default") == "default"
        assert jax.config.jax_default_matmul_precision == prev  # no global change
        assert apply_precision_mode("scoped") == "highest"
        assert apply_precision_mode("scoped_high") == "high"
        assert jax.config.jax_default_matmul_precision == prev  # still scoped
        assert apply_precision_mode("highest") is None  # global knob instead
        assert jax.config.jax_default_matmul_precision == "highest"
    finally:
        jax.config.update("jax_default_matmul_precision", prev)


def test_encode_scoring_precision_is_unconditionally_exact():
    """encode_step_level's candidate-scoring einsums must stay
    Precision.HIGHEST regardless of any flag: a single-bf16-pass product
    (~2^-9 relative) mis-picks argmax winners among 2^16 candidates often
    enough to cost ~0.4 dB over a 125-group encode (round-3 ladder). Guarded
    structurally — the scoring dots in the jaxpr carry HIGHEST — so a
    refactor can't silently drop the precision argument."""
    import jax.numpy as jnp

    from recombiner_tpu.coding import encoder as enc

    eps = jnp.zeros((16, 4), jnp.float32)
    alpha = jnp.zeros((3, 4), jnp.float32)

    def scoring(e, a):
        return (
            jnp.einsum("nj,rj->nr", e * e, a,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
            + jnp.einsum("nj,rj->nr", e, a,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        )

    # the source of truth: encode_step_level contains exactly these einsums
    import inspect

    src = inspect.getsource(enc.encode_step_level)
    assert src.count("jax.lax.Precision.HIGHEST") >= 2, (
        "encode_step_level lost its unconditional exact-f32 scoring einsums"
    )
    jaxpr = str(jax.make_jaxpr(scoring)(eps, alpha))
    assert "HIGHEST" in jaxpr


def test_coding_loop_resume_bit_identical(artifact, tmp_path):
    """Kill-and-restart MID-CODING: the group-loop snapshot now persists the
    RNG key (ADVICE r2), so a resumed encode replays the remaining groups'
    finetune RNG chain exactly and the final bitstream + posteriors are
    bit-identical to the uninterrupted run — the same contract the phase-1
    test above pins."""
    import recombiner_tpu.io.encode_state as es_mod
    from recombiner_tpu.io.encode_state import load_encode_state_full

    cfg, art, X, Y = artifact
    Xj, Yj = jnp.array(X), jnp.array(Y)
    kw = dict(n_optimize_epochs=4, lr=2e-3, sample_size=2,
              finetune_overrides={"w": 1}, chunk_epochs=4)

    codec, state_a = init_codec(art, n_rows=2)
    res_a = compress(codec, state_a, Xj, Yj, cfg, jax.random.key(5), **kw)

    # interrupted run: crash right after the coding-loop snapshot at group 10
    codec, state_b = init_codec(art, n_rows=2)
    p = str(tmp_path / "enc_coding")

    class Boom(RuntimeError):
        pass

    orig_save = es_mod.save_encode_state
    calls = {"n": 0}

    def crash_on_coding_snapshot(path, state, **kwargs):
        orig_save(path, state, **kwargs)
        if "level" in (kwargs.get("extra") or {}):  # group-loop snapshots only
            calls["n"] += 1
            if calls["n"] == 1:
                raise Boom()

    es_mod.save_encode_state = crash_on_coding_snapshot
    try:
        with pytest.raises(Boom):
            compress(codec, state_b, Xj, Yj, cfg, jax.random.key(5),
                     state_path=p, save_every=10, **kw)
    finally:
        es_mod.save_encode_state = orig_save

    state_l, header, _ = load_encode_state_full(p)
    assert header["level"] == "w" and "resume_key" in header
    res_b = compress(codec, state_l, Xj, Yj, cfg, jax.random.key(5),
                     resume_key=header["resume_key"], **kw)
    np.testing.assert_array_equal(
        np.asarray(res_a.state.w.indices), np.asarray(res_b.state.w.indices)
    )
    np.testing.assert_array_equal(res_a.reconstruction, res_b.reconstruction)
    np.testing.assert_array_equal(
        np.asarray(res_a.state.w.q.loc), np.asarray(res_b.state.w.q.loc)
    )


def test_version_rejection_not_quarantined(artifact, tmp_path):
    """A snapshot with a NEWER format version is valid data the caller must
    see (SnapshotRejected), never silently quarantined as corruption."""
    import recombiner_tpu.io.encode_state as es_mod
    from recombiner_tpu.io.atomic import SnapshotRejected, load_snapshot_or_none
    from recombiner_tpu.io.encode_state import load_encode_state_full

    cfg, art, X, Y = artifact
    codec, state = init_codec(art, n_rows=2)
    p = str(tmp_path / "enc_vers")
    orig = es_mod.STATE_VERSION
    es_mod.STATE_VERSION = orig + 1
    try:
        save_encode_state(p, state)
    finally:
        es_mod.STATE_VERSION = orig
    with pytest.raises(SnapshotRejected):
        load_snapshot_or_none(p, load_encode_state_full)
    assert os.path.exists(p + ".npz")  # kept in place


def test_quarantine_covers_torn_header_and_members(tmp_path):
    """Corruption shapes beyond BadZipFile — a torn json __header__ and a
    truncated npy member — must quarantine and report, not crash-loop the
    babysit relaunch cycle (ADVICE r2)."""
    import zipfile

    from recombiner_tpu.io.atomic import atomic_savez, load_snapshot_or_none

    def loader(path):
        z = np.load(path + ".npz")
        header = json.loads(bytes(z["__header__"]).decode())
        return header, z["a"][:]

    # torn header json
    p = str(tmp_path / "torn_header")
    atomic_savez(p, {"__header__": np.frombuffer(b'{"version": 1', np.uint8),
                     "a": np.arange(4)})
    got, reason = load_snapshot_or_none(p, loader)
    assert got is None and "unreadable" in reason
    assert os.path.exists(p + ".npz.corrupt")

    # valid zip whose npy members are truncated (numpy raises ValueError)
    p2 = str(tmp_path / "torn_member")
    with zipfile.ZipFile(p2 + ".npz", "w") as z:
        z.writestr("__header__.npy", b"\x93NUMPY\x01\x00")  # truncated header
        z.writestr("a.npy", b"\x93NUMPY\x01\x00")
    got, reason = load_snapshot_or_none(p2, loader)
    assert got is None and os.path.exists(p2 + ".npz.corrupt")


def test_legacy_fingerprint_accepted_on_resume(artifact, tmp_path):
    """A snapshot written under the pre-round-3 fingerprint formula (no
    avg_log_scale / up-net weights in the hash) must resume against the SAME
    artifact under the widened formula — the formula change is a code
    migration, not a prior change, and discarding hours of coded groups over
    it is the failure mode this guards (code review r3)."""
    import dataclasses

    from recombiner_tpu.io.atomic import load_snapshot_or_none
    from recombiner_tpu.io.checkpoint import accepted_fingerprints, prior_fingerprint
    from recombiner_tpu.io.encode_state import (
        FingerprintMismatch,
        load_encode_state_full,
    )

    cfg, art, X, Y = artifact
    legacy_fp = prior_fingerprint(art, _legacy=True)
    current_fp = prior_fingerprint(art)
    assert legacy_fp != current_fp  # the formulas genuinely differ
    codec, state = init_codec(art, n_rows=2)
    p = str(tmp_path / "enc_legacy_fp")
    # as written by a pre-migration run
    save_encode_state(p, state, extra={"prior_fingerprint": legacy_fp})

    accepted = accepted_fingerprints(art)
    assert accepted == (current_fp, legacy_fp)
    st, header, _ = load_encode_state_full(p, accepted)  # resumes
    assert header["prior_fingerprint"] == legacy_fp

    # a genuinely DIFFERENT prior is still refused under either formula
    art2 = dataclasses.replace(
        art, w=dataclasses.replace(art.w, p_loc=art.w.p_loc + 0.1)
    )
    with pytest.raises(FingerprintMismatch):
        load_snapshot_or_none(
            p, lambda q: load_encode_state_full(q, accepted_fingerprints(art2))
        )
    assert os.path.exists(p + ".npz")  # refused loudly, never quarantined


def test_loader_bug_over_intact_npz_reraises(tmp_path):
    """A bare ValueError raised by the LOADER over a structurally sound npz
    is a code bug (geometry mismatch, pytree rebuild error) — it must
    re-raise, not quarantine the evidence and silently restart hours of work
    (code review r3). Only a genuinely torn file quarantines."""
    from recombiner_tpu.io.atomic import atomic_savez, load_snapshot_or_none

    p = str(tmp_path / "intact")
    atomic_savez(p, {"a": np.arange(6)})

    def buggy_loader(path):
        np.load(path + ".npz")["a"]
        raise ValueError("cannot reshape array of size 6 into shape (4,4)")

    with pytest.raises(ValueError, match="cannot reshape"):
        load_snapshot_or_none(p, buggy_loader)
    assert os.path.exists(p + ".npz")  # evidence preserved
    assert not os.path.exists(p + ".npz.corrupt")
