import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recombiner_tpu.config import TINY, TINY_PATCH
from recombiner_tpu.data.synthetic import synthetic_dataset
from recombiner_tpu.io.checkpoint import load_prior_artifact, save_prior_artifact
from recombiner_tpu.priors.artifact import build_prior_artifact
from recombiner_tpu.priors.trainer import (
    adjust_kl_beta,
    em_train,
    forward,
    init_prior_state,
    init_priors,
    m_step,
    sgd_epochs,
    total_kl,
)


def test_forward_shapes_nonpatch():
    cfg = TINY
    X, Y = synthetic_dataset(cfg, 2, seed=0)
    state = init_prior_state(jax.random.key(0), cfg, X.shape[0])
    y = forward(state, jnp.array(X), jax.random.key(1), cfg, sample_size=2)
    assert y.shape == (2, 2, cfg.n_pixels, cfg.output_dim)


def test_forward_shapes_patch():
    cfg = TINY_PATCH
    X, Y = synthetic_dataset(cfg, 2, seed=0)  # 8 rows
    state = init_prior_state(jax.random.key(0), cfg, X.shape[0])
    assert state.h.loc.shape[0] == 4
    assert state.hh.loc.shape[0] == 2
    y = forward(state, jnp.array(X), jax.random.key(1), cfg, sample_size=1)
    assert y.shape == (8, 1, cfg.n_pixels, cfg.output_dim)


def test_sgd_epochs_decreases_mse():
    cfg = TINY
    X, Y = synthetic_dataset(cfg, 2, seed=1)
    state = init_prior_state(jax.random.key(0), cfg, X.shape[0])
    priors = init_priors(cfg)
    Xj, Yj = jnp.array(X), jnp.array(Y)

    state1, m1 = sgd_epochs(
        state, Xj, Yj, priors, jnp.float32(1e-8), jax.random.key(1),
        cfg=cfg, n_epochs=5, lr=2e-3,
    )
    state2, m2 = sgd_epochs(
        state1, Xj, Yj, priors, jnp.float32(1e-8), jax.random.key(2),
        cfg=cfg, n_epochs=60, lr=2e-3,
    )
    assert float(m2.mse) < float(m1.mse)


def test_m_step_moment_matching():
    cfg = TINY
    state = init_prior_state(jax.random.key(3), cfg, 4)
    priors = m_step(state, cfg)
    loc = np.asarray(state.w.loc)
    np.testing.assert_allclose(np.asarray(priors.w.loc), loc.mean(0), rtol=1e-5)
    # scale^2 = E[sigma^2] + Var(loc) with ddof=1 (torch var default)
    from recombiner_tpu.models.gaussian import scale_transform

    sig2 = np.asarray(scale_transform(state.w.log_scale)) ** 2
    expect = np.sqrt(sig2.mean(0) + loc.var(0, ddof=1))
    np.testing.assert_allclose(np.asarray(priors.w.scale), expect, rtol=1e-5)


def test_adjust_kl_beta_controller():
    assert adjust_kl_beta(0.1, kl_bits_per_row=100, budget_min=10, budget_max=50) == pytest.approx(0.15)
    assert adjust_kl_beta(0.1, kl_bits_per_row=5, budget_min=10, budget_max=50) == pytest.approx(0.1 / 1.5)
    assert adjust_kl_beta(0.9, 100, 1, 50) == 1.0  # clamped at 1
    assert adjust_kl_beta(1e-20, 0, 10, 50) == pytest.approx(1e-20)  # clamped low


def test_em_train_and_artifact_roundtrip(tmp_path):
    cfg = TINY
    X, Y = synthetic_dataset(cfg, 2, seed=2)
    res = em_train(
        jax.random.key(0), cfg, jnp.array(X), jnp.array(Y), max_bitrate=2.0,
        n_em_iters=3, first_epochs=20, later_epochs=10, lr=2e-3,
    )
    assert len(res.elbo_history) == 3
    assert res.elbo_history[-1]["mse"] < res.elbo_history[0]["mse"] * 1.5

    art = build_prior_artifact(res.state, res.priors, res.kl_beta, cfg)
    assert art.w.p_loc.shape == (cfg.n_coded_params,)
    assert art.w.grouping.n_params == cfg.n_coded_params

    path = str(tmp_path / "prior.npz")
    save_prior_artifact(path, art)
    art2 = load_prior_artifact(path)
    assert art2.config == cfg
    np.testing.assert_allclose(art2.w.p_loc, art.w.p_loc)
    np.testing.assert_allclose(art2.w.p_scale, art.w.p_scale)
    np.testing.assert_array_equal(art2.w.grouping.param2group, art.w.grouping.param2group)
    np.testing.assert_allclose(art2.A[0], art.A[0])
    np.testing.assert_allclose(art2.up["conv0"]["w"], art.up["conv0"]["w"])
    assert art2.kl_beta == pytest.approx(res.kl_beta)


def test_em_train_patch_mode():
    cfg = TINY_PATCH
    X, Y = synthetic_dataset(cfg, 2, seed=3)
    res = em_train(
        jax.random.key(0), cfg, jnp.array(X), jnp.array(Y), max_bitrate=2.0,
        n_em_iters=2, first_epochs=10, later_epochs=5, lr=2e-3,
    )
    art = build_prior_artifact(res.state, res.priors, res.kl_beta, cfg)
    assert art.h is not None and art.hh is not None
    assert art.h.p_loc.shape == (cfg.n_inr_params,)
    assert art.h.grouping.n_params == cfg.n_inr_params


def test_total_kl_zero_when_matched():
    cfg = TINY
    state = init_prior_state(jax.random.key(1), cfg, 2)
    # prior exactly equal to each posterior row => KL = 0 requires identical rows;
    # instead check positivity and scale
    priors = init_priors(cfg)
    kl = float(total_kl(state, priors))
    assert kl > 0


def test_realized_bitrate_probe_matches_artifact():
    """The rate-control probe (mean-KL grouping on device reductions) must
    predict EXACTLY the bitrate the built artifact will report — it is the
    controlled variable of the closed loop (VERDICT r2 weak #3)."""
    from recombiner_tpu.priors.trainer import realized_bitrate

    cfg = TINY_PATCH
    X, Y = synthetic_dataset(cfg, 2, seed=3)
    res = em_train(
        jax.random.key(0), cfg, jnp.array(X), jnp.array(Y), max_bitrate=2.0,
        n_em_iters=2, first_epochs=10, later_epochs=5, lr=2e-3,
    )
    art = build_prior_artifact(res.state, res.priors, res.kl_beta, cfg)
    probe = realized_bitrate(res.state, res.priors, cfg)
    expect = cfg.bitrate_of_groups(
        art.w.grouping.n_groups, art.h.grouping.n_groups, art.hh.grouping.n_groups
    )
    assert probe == pytest.approx(expect)


def test_rate_control_engages_and_clamps():
    """Once the KL has entered the budget window, every chunk logs the
    realized rate and moves the aim toward the target within its clamps
    (undershoot here: aim rises, capped at 1.1)."""
    cfg = TINY
    X, Y = synthetic_dataset(cfg, 2, seed=4)
    res = em_train(
        jax.random.key(0), cfg, jnp.array(X), jnp.array(Y), max_bitrate=30.0,
        n_em_iters=6, first_epochs=10, later_epochs=5, lr=2e-3,
        checkpoint_every=2, rate_control=True,
    )
    recs = [h for h in res.elbo_history if "realized_bitrate" in h]
    assert recs, "rate control never engaged"
    for r in recs:
        assert 0.5 <= r["budget_aim"] <= 1.1
    # the tiny posterior's realized rate is far below a 30 bpp target, so
    # the controller must push the aim UP (clamped at 1.1)
    assert recs[-1]["budget_aim"] == pytest.approx(1.1)


def test_aim_update_settles_on_quantized_plant():
    """The rate controller against a synthetic QUANTIZED plant (realized rate
    = quantum * round of the continuous response, the shape greedy 16-bit
    packing produces): the aim must settle monotonically onto the nearest
    achievable rate and STOP — not orbit between the two rates bracketing
    the target, which is what the round-3 audio 5.17 kbps run did
    (4.99 <-> 5.41 kbps, docs/rd_full_audio_r3.log; VERDICT r3 weak #4)."""
    from recombiner_tpu.priors.trainer import aim_update

    # audio-5.17-like numbers: target between two achievable rates a whole
    # quantum apart, neither within the 1.5% relative tolerance
    target, quantum, tol = 5.17, 0.32, 0.015

    def plant(aim):
        # continuous response ~ linear in aim around the operating point,
        # then quantized to whole groups (floor: packing rounds the KL that
        # fits into N groups down)
        continuous = 5.6 * aim
        return quantum * np.floor(continuous / quantum + 0.5)

    aim, trace = 1.0, []
    for _ in range(50):
        realized = plant(aim)
        trace.append((aim, realized))
        aim = aim_update(aim, realized, target, tol, quantum)

    aims = np.array([t[0] for t in trace])
    rates = np.array([t[1] for t in trace])
    # settles: the last 30 probes hold ONE aim and ONE realized rate
    assert np.all(aims[-30:] == aims[-1]), f"aim still moving: {aims[-35:]}"
    assert np.all(rates[-30:] == rates[-1])
    # and the settled rate is the achievable rate nearest the target
    achievable = quantum * np.arange(10, 25)
    assert rates[-1] == achievable[np.argmin(np.abs(achievable - target))]
    # within the quantum-limited error bound (<=2% here: 5.12 vs 5.17)
    assert abs(rates[-1] - target) <= 0.5 * quantum
    # no limit cycle anywhere after first reaching the settled rate
    first = int(np.argmax(rates == rates[-1]))
    assert np.all(rates[first:] == rates[-1]), "controller re-orbited"


def test_aim_update_holds_inside_tolerance_and_clamps():
    from recombiner_tpu.priors.trainer import aim_update

    # inside relative tolerance: hold exactly
    assert aim_update(0.93, 2.01, 2.0, 0.015, 0.001) == 0.93
    # inside half a quantum (coarse geometry): hold even though the relative
    # error exceeds the tolerance
    assert aim_update(0.93, 5.077, 5.17, 0.015, 0.32) == 0.93
    # outside both: sqrt-damped move toward the target, clamped to [0.5, 1.1]
    up = aim_update(1.0, 1.0, 2.0, 0.015, 0.001)
    assert up == pytest.approx(min(1.1, np.sqrt(2.0)))
    down = aim_update(0.5, 10.0, 2.0, 0.015, 0.001)
    assert down == 0.5  # already at the floor


def test_em_train_controller_resume_continuity():
    """em_train resumed with the persisted controller dict + schedule anchors
    must CONTINUE adapting from the stored aim (not re-engage from 1.0) —
    the ADVICE r3 medium finding: babysit relaunches reset the KL window to
    the uncontrolled base mid-schedule."""
    cfg = TINY
    X, Y = synthetic_dataset(cfg, 2, seed=4)
    Xj, Yj = jnp.array(X), jnp.array(Y)
    res1 = em_train(
        jax.random.key(0), cfg, Xj, Yj, max_bitrate=30.0,
        n_em_iters=4, first_epochs=10, later_epochs=5, lr=2e-3,
        checkpoint_every=2, rate_control=True, probe_every=1,
        schedule_total=8,
    )
    assert res1.controller is not None and res1.controller["in_window"]
    assert res1.controller["aim"] > 1.0  # undershoot pushed the aim up

    res2 = em_train(
        jax.random.key(1), cfg, Xj, Yj, max_bitrate=30.0,
        n_em_iters=4, first_epochs=5, later_epochs=5, lr=2e-3,
        checkpoint_every=2, rate_control=True, probe_every=1,
        state=res1.state, priors=res1.priors, kl_beta=res1.kl_beta,
        controller=res1.controller, em_iter_offset=4, schedule_total=8,
    )
    recs = [h for h in res2.elbo_history if "realized_bitrate" in h]
    assert recs, "resumed run never probed"
    # resumed from the stored aim: every probe's aim stays at/above it
    # (still undershooting a 30-bpp target, so it can only hold or rise)
    for r in recs:
        assert r["budget_aim"] >= res1.controller["aim"] - 1e-12


def test_em_iters_matches_per_iter_loop():
    """The chunked EM program (em_iters: scan of iterations with on-device
    beta control + M-step) must reproduce the per-iteration host loop
    (sgd_epochs + adjust_kl_beta + m_step) to float tolerance — same RNG
    stream, same math, one compile."""
    from recombiner_tpu.models.gaussian import scale_transform  # noqa: F401
    from recombiner_tpu.priors.trainer import (
        adjust_kl_beta,
        em_iters,
        init_priors,
        m_step,
        sgd_epochs,
    )

    cfg = TINY
    X, Y = synthetic_dataset(cfg, 2, seed=6)
    Xj, Yj = jnp.array(X), jnp.array(Y)
    budget_min, budget_max = cfg.bits_budget(4.0)

    # host-loop reference (the round-2 em_train body)
    key = jax.random.key(9)
    state_a = init_prior_state(jax.random.key(1), cfg, 2)
    priors_a = init_priors(cfg)
    beta_a = 1e-8
    for _ in range(3):
        key, sub = jax.random.split(key)
        state_a, metrics = sgd_epochs(
            state_a, Xj, Yj, priors_a, jnp.float32(beta_a), sub,
            cfg=cfg, n_epochs=4, lr=2e-3,
        )
        kl_bits = float(metrics.kl) / np.log(2.0) / 2
        beta_a = adjust_kl_beta(beta_a, kl_bits, budget_min, budget_max)
        priors_a = m_step(state_a, cfg)

    state_b = init_prior_state(jax.random.key(1), cfg, 2)
    state_b, priors_b, beta_b, _, hist = em_iters(
        state_b, Xj, Yj, init_priors(cfg), jnp.float32(1e-8), jax.random.key(9),
        jnp.float32(budget_min), jnp.float32(budget_max),
        cfg=cfg, n_iters=3, n_epochs=4, lr=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(state_a.w.loc), np.asarray(state_b.w.loc), rtol=0, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(priors_a.w.scale), np.asarray(priors_b.w.scale), rtol=1e-6)
    assert float(beta_b) == pytest.approx(beta_a, rel=1e-6)


def test_rate_select_returns_nearest_probed_state(monkeypatch):
    """Terminal rate selection (VERDICT r3 next #6): when the final EM state
    realizes a WORSE rate than an earlier probe (the KL micro-drift across a
    packing boundary that landed the round-4 audio run at +4.6%), em_train
    must return the probed state nearest the target, and say so in
    controller['selected']."""
    import recombiner_tpu.priors.trainer as trainer_mod

    cfg = TINY
    X, Y = synthetic_dataset(cfg, 2, seed=5)
    target = 30.0
    # quantized plant: the 2nd engaged probe hits the target exactly; later
    # probes and the final state sit CLEARLY outside the controller deadband
    # (within-deadband differences tie and the final state would win — see
    # test_rate_select_deadband_tie_keeps_final)
    from recombiner_tpu.priors.trainer import rate_quantum
    db = max(0.015 * target, 0.5 * rate_quantum(cfg))
    far = target + 4 * db
    rates = [far, 30.0, far, far, far, far, far]
    captured = []

    def fake_realized(state, priors, cfg_):
        captured.append(np.asarray(state.w.loc).copy())
        return rates[len(captured) - 1]

    monkeypatch.setattr(trainer_mod, "realized_bitrate", fake_realized)
    res = em_train(
        jax.random.key(0), cfg, jnp.array(X), jnp.array(Y),
        max_bitrate=target, n_em_iters=6, first_epochs=10, later_epochs=5,
        lr=2e-3, checkpoint_every=1, probe_every=1, rate_control=True,
    )
    sel = res.controller.get("selected")
    assert sel is not None, "selection must fire when the final probe is worse"
    assert sel["realized"] == pytest.approx(30.0)
    assert sel["final_realized"] == pytest.approx(far)
    # the returned state IS the snapshot taken at the winning probe
    best_call = rates.index(30.0)
    np.testing.assert_allclose(
        np.asarray(res.state.w.loc), captured[best_call], rtol=0, atol=0)
    # the final-state probe is recorded on the last history record (no extra
    # record: consumers read elbo_history[-1]["mse"])
    assert res.elbo_history[-1]["final_realized_bitrate"] == pytest.approx(far)
    assert len(res.elbo_history) == 6


def test_rate_select_keeps_final_state_when_it_is_best(monkeypatch):
    """No selection when the final state ties or beats every probe: the most
    converged state must win ties."""
    import recombiner_tpu.priors.trainer as trainer_mod

    cfg = TINY
    X, Y = synthetic_dataset(cfg, 2, seed=5)
    calls = []

    def fake_realized(state, priors, cfg_):
        calls.append(np.asarray(state.w.loc).copy())
        return 30.0  # every probe (and the final state) realizes the target

    monkeypatch.setattr(trainer_mod, "realized_bitrate", fake_realized)
    res = em_train(
        jax.random.key(0), cfg, jnp.array(X), jnp.array(Y),
        max_bitrate=30.0, n_em_iters=6, first_epochs=10, later_epochs=5,
        lr=2e-3, checkpoint_every=1, probe_every=1, rate_control=True,
    )
    assert "selected" not in res.controller
    # final state returned as-is (device arrays, not the host snapshot)
    np.testing.assert_allclose(np.asarray(res.state.w.loc), calls[-1])


def test_resolve_em_schedule():
    from recombiner_tpu.priors.trainer import resolve_em_schedule

    # reference (or None) -> no stop
    assert resolve_em_schedule("reference", None, 550) is None
    assert resolve_em_schedule(None, None, 550) is None
    # adaptive preset: 40-iter window, 1% rel tol, quarter-schedule floor
    assert resolve_em_schedule("adaptive", None, 550) == (40, 0.01, 138)
    # the floor never drops below 100
    assert resolve_em_schedule("adaptive", None, 100) == (40, 0.01, 100)
    # explicit spec wins over the preset, cast to (int, float, int)
    assert resolve_em_schedule("adaptive", (5.0, 0.5, 7.0), 550) == (5, 0.5, 7)
    with pytest.raises(ValueError):
        resolve_em_schedule("bogus", None, 550)


def test_em_stop_plateau_without_rate_control():
    """em_stop fires at the first chunk boundary where BOTH min_iters and
    2*window of history exist and the windowed mse 'improvement' is within
    rel_tol (a huge rel_tol makes any trajectory count as plateaued);
    n_em_iters is then a ceiling, not the spend."""
    cfg = TINY
    X, Y = synthetic_dataset(cfg, 2, seed=5)
    res = em_train(
        jax.random.key(0), cfg, jnp.array(X), jnp.array(Y),
        max_bitrate=30.0, n_em_iters=20, first_epochs=5, later_epochs=5,
        lr=2e-3, checkpoint_every=1, rate_control=False,
        em_stop=(2, 10.0, 3),
    )
    stp = res.controller.get("em_stop")
    assert stp is not None
    # window=2 needs 4 records; min_iters=3 is already met then
    assert stp["stopped_at"] == 4
    assert len(res.elbo_history) == 4
    assert res.elbo_history[-1]["em_early_stop"] == 4


def test_em_stop_blocked_when_mse_still_improving():
    """An impossible rel_tol (negative) means the plateau test never passes:
    the run must spend the full ceiling."""
    cfg = TINY
    X, Y = synthetic_dataset(cfg, 2, seed=5)
    res = em_train(
        jax.random.key(0), cfg, jnp.array(X), jnp.array(Y),
        max_bitrate=30.0, n_em_iters=8, first_epochs=5, later_epochs=5,
        lr=2e-3, checkpoint_every=1, rate_control=False,
        em_stop=(2, -10.0, 3),
    )
    assert "em_stop" not in res.controller
    assert len(res.elbo_history) == 8


def test_em_stop_requires_rate_in_deadband(monkeypatch):
    """With rate_control on, the plateau alone must NOT stop the run: the
    latest realized-rate probe has to sit inside the controller deadband
    (max(tol*target, quantum/2)). Outside it the run spends the ceiling;
    on-target it stops early."""
    import recombiner_tpu.priors.trainer as trainer_mod
    from recombiner_tpu.priors.trainer import rate_quantum

    cfg = TINY
    X, Y = synthetic_dataset(cfg, 2, seed=5)
    target = 30.0
    q = rate_quantum(cfg)
    far = target + max(0.015 * target, 0.5 * q) * 4

    def run(rate):
        monkeypatch.setattr(
            trainer_mod, "realized_bitrate", lambda s, p, c: rate)
        return em_train(
            jax.random.key(0), cfg, jnp.array(X), jnp.array(Y),
            max_bitrate=target, n_em_iters=12, first_epochs=5,
            later_epochs=5, lr=2e-3, checkpoint_every=1, probe_every=1,
            rate_control=True, em_stop=(2, 10.0, 3),
        )

    res_far = run(far)
    assert "em_stop" not in res_far.controller
    assert len(res_far.elbo_history) == 12

    res_near = run(target)
    stp = res_near.controller.get("em_stop")
    assert stp is not None
    assert stp["last_realized"] == pytest.approx(target)
    assert len(res_near.elbo_history) < 12


def test_em_stop_settled_off_target_rate(monkeypatch):
    """The cifar@2.0 geometry: NO achievable rate inside the deadband (the
    nearest quantized rate sits 2.4% low), so the deadband gate alone would
    never fire. Once the aim hits its clamp and consecutive probes realize
    the same rate (controller equilibrium), em_stop must treat the rate as
    settled and stop."""
    import recombiner_tpu.priors.trainer as trainer_mod

    cfg = TINY
    X, Y = synthetic_dataset(cfg, 2, seed=5)
    target = 30.0

    # constant realized rate FAR above target: err=2 drives aim to the 0.5
    # clamp in two probes, after which (rate, aim) is frozen -> stability
    monkeypatch.setattr(
        trainer_mod, "realized_bitrate", lambda s, p, c: 2 * target)
    res = em_train(
        jax.random.key(0), cfg, jnp.array(X), jnp.array(Y),
        max_bitrate=target, n_em_iters=20, first_epochs=5,
        later_epochs=5, lr=2e-3, checkpoint_every=1, probe_every=1,
        rate_control=True, em_stop=(2, 10.0, 3),
    )
    stp = res.controller.get("em_stop")
    assert stp is not None
    assert len(res.elbo_history) < 20


def test_rate_select_deadband_tie_keeps_final(monkeypatch):
    """Within-deadband rate differences are NOISE (the aim holds there), so
    a mid-run probe at the exact target must NOT beat a more-converged
    final state that also sits inside the deadband. Round-5 measured the
    cost of the old strict-nearest rule: the audio_mini EM study selected
    EM 300 (realized 2.000) over a ~1 dB-better final state (2.005,
    deadband 0.03)."""
    import recombiner_tpu.priors.trainer as trainer_mod
    from recombiner_tpu.priors.trainer import rate_quantum

    cfg = TINY
    X, Y = synthetic_dataset(cfg, 2, seed=5)
    target = 30.0
    db = max(0.015 * target, 0.5 * rate_quantum(cfg))
    inside = target + 0.5 * db  # within the deadband, not exact
    calls = []

    def fake_realized(state, priors, cfg_):
        calls.append(np.asarray(state.w.loc).copy())
        # earlier probes hit the target EXACTLY; the final state is merely
        # inside the deadband
        return target if len(calls) < 5 else inside

    monkeypatch.setattr(trainer_mod, "realized_bitrate", fake_realized)
    res = em_train(
        jax.random.key(0), cfg, jnp.array(X), jnp.array(Y),
        max_bitrate=target, n_em_iters=6, first_epochs=10, later_epochs=5,
        lr=2e-3, checkpoint_every=1, probe_every=1, rate_control=True,
    )
    assert "selected" not in res.controller
    np.testing.assert_allclose(np.asarray(res.state.w.loc), calls[-1])
