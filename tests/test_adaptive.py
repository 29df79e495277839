"""Adaptive encode schedule: device-side early stop (optimize_adaptive) and
its wiring through compress(phase1_stop/finetune_stop).

The reference spends fixed budgets unconditionally (main_compression.py:
148-158); the adaptive schedule turns them into ceilings with a windowed-
plateau stop — the matched-RD throughput lever of VERDICT r3 #1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recombiner_tpu.coding.encoder import init_codec, optimize, optimize_adaptive
from recombiner_tpu.coding.progressive import compress
from recombiner_tpu.config import TINY
from recombiner_tpu.data.synthetic import synthetic_dataset
from recombiner_tpu.priors.artifact import build_prior_artifact
from recombiner_tpu.priors.trainer import em_train


@pytest.fixture(scope="module")
def tiny_setup():
    X, Y = synthetic_dataset(TINY, 2, seed=0)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    res = em_train(jax.random.key(0), TINY, Xj, Yj, max_bitrate=2.0,
                   n_em_iters=2, first_epochs=10, later_epochs=5, lr=2e-3)
    art = build_prior_artifact(res.state, res.priors, res.kl_beta, TINY)
    return art, Xj, Yj


def _fresh(art, n_rows):
    return init_codec(art, n_rows=n_rows)


def test_adaptive_never_stops_with_impossible_tol(tiny_setup):
    """rel_tol = -inf makes the plateau test unsatisfiable: the adaptive loop
    must run exactly to max_epoch, like the fixed-budget path."""
    art, Xj, Yj = tiny_setup
    codec, state = _fresh(art, 2)
    state, _opt, _key, _es, i, stopped = optimize_adaptive(
        codec, state, Xj, Yj, jax.random.key(1), 0, 37, 0, -np.inf,
        (np.inf, 0.0), cfg=TINY, lr=2e-3, window=10,
    )
    assert int(i) == 37 and not bool(stopped)


def test_adaptive_stops_at_first_eligible_boundary(tiny_setup):
    """rel_tol = +inf declares every window a plateau: the loop must stop at
    the first window boundary after min_epoch with a full previous window."""
    art, Xj, Yj = tiny_setup
    codec, state = _fresh(art, 2)
    state, _opt, _key, _es, i, stopped = optimize_adaptive(
        codec, state, Xj, Yj, jax.random.key(1), 0, 200, 25, np.inf,
        (np.inf, 0.0), cfg=TINY, lr=2e-3, window=10,
    )
    # windows end at 10, 20, 30...; first with a finite prev window AND
    # >= min_epoch(25) is epoch 30
    assert int(i) == 30 and bool(stopped)


def test_adaptive_chunked_carry_matches_single_program(tiny_setup):
    """Splitting an adaptive run into chunks (es_carry + key threading, the
    crash-resume contract) must reproduce the single-program run exactly:
    same epochs run, bit-identical posteriors."""
    art, Xj, Yj = tiny_setup
    args = dict(cfg=TINY, lr=2e-3, window=10)

    codec, state = _fresh(art, 2)
    s1, o1, k1, es1, i1, st1 = optimize_adaptive(
        codec, state, Xj, Yj, jax.random.key(3), 0, 40, 0, -np.inf,
        (np.inf, 0.0), **args)

    codec, state = _fresh(art, 2)
    sa, oa, ka, esa, ia, _ = optimize_adaptive(
        codec, state, Xj, Yj, jax.random.key(3), 0, 15, 0, -np.inf,
        (np.inf, 0.0), **args)
    sb, ob, kb, esb, ib, _ = optimize_adaptive(
        codec, sa, Xj, Yj, ka, ia, 40, 0, -np.inf, esa,
        opt_state=oa, **args)

    assert int(i1) == int(ib) == 40
    np.testing.assert_array_equal(np.asarray(s1.w.q.loc), np.asarray(sb.w.q.loc))
    np.testing.assert_array_equal(np.asarray(s1.w.kl_beta), np.asarray(sb.w.kl_beta))
    for a, b in zip(jax.tree_util.tree_leaves(es1), jax.tree_util.tree_leaves(esb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_adaptive_loss_tracks_fixed_budget(tiny_setup):
    """On an ALREADY-converged problem (a 400-epoch fixed pre-run) a real
    finite-tol adaptive continuation must detect the plateau and stop early,
    ending within noise of spending the full extra budget."""
    art, Xj, Yj = tiny_setup

    def final_loss(state):
        from recombiner_tpu.coding.encoder import (
            _elbo_loss_fn,
            _trainables,
        )
        codec, _ = _fresh(art, 2)
        f = _elbo_loss_fn(codec, Xj, Yj, TINY, 5, None, False)
        return float(f(_trainables(state), state, jax.random.key(9)))

    codec, state = _fresh(art, 2)
    warm = optimize(codec, state, Xj, Yj, jax.random.key(5),
                    cfg=TINY, n_epochs=400, lr=2e-3)
    warm_leaves = [np.asarray(v) for v in jax.tree_util.tree_leaves(warm)]

    def rewarm():
        treedef = jax.tree_util.tree_structure(warm)
        return jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(v) for v in warm_leaves])

    fixed = optimize(codec, rewarm(), Xj, Yj, jax.random.key(6),
                     cfg=TINY, n_epochs=300, lr=2e-3)
    adapt, _o, _k, _es, i, stopped = optimize_adaptive(
        codec, rewarm(), Xj, Yj, jax.random.key(6), 0, 300, 50, 2e-2,
        (np.inf, 0.0), cfg=TINY, lr=2e-3, window=25,
    )
    assert bool(stopped) and int(i) < 300, \
        f"converged problem should plateau (ran {int(i)})"
    lf, la = final_loss(fixed), final_loss(adapt)
    assert la <= lf * 1.15, (la, lf, int(i))


def test_monitor_changes_stop_statistic_not_math(tiny_setup):
    """monitor='mse' must change ONLY the watched plateau statistic: with an
    unsatisfiable tol both monitors run to max_epoch with bit-identical
    posteriors (gradients always come from the full ELBO)."""
    art, Xj, Yj = tiny_setup
    args = dict(cfg=TINY, lr=2e-3, window=10)

    codec, state = _fresh(art, 2)
    s_loss, _o, _k, _es, i_loss, _ = optimize_adaptive(
        codec, state, Xj, Yj, jax.random.key(7), 0, 40, 0, -np.inf,
        (np.inf, 0.0), monitor="loss", **args)
    codec, state = _fresh(art, 2)
    s_mse, _o, _k, _es, i_mse, _ = optimize_adaptive(
        codec, state, Xj, Yj, jax.random.key(7), 0, 40, 0, -np.inf,
        (np.inf, 0.0), monitor="mse", **args)
    assert int(i_loss) == int(i_mse) == 40
    np.testing.assert_array_equal(
        np.asarray(s_loss.w.q.loc), np.asarray(s_mse.w.q.loc))


def test_monitor_mse_stop_fires(tiny_setup):
    """monitor='mse' wiring: an always-plateau tol stops at the first
    eligible window boundary, same as the loss monitor."""
    art, Xj, Yj = tiny_setup
    codec, state = _fresh(art, 2)
    _s, _o, _k, _es, i, stopped = optimize_adaptive(
        codec, state, Xj, Yj, jax.random.key(1), 0, 200, 25, np.inf,
        (np.inf, 0.0), cfg=TINY, lr=2e-3, window=10, monitor="mse",
    )
    assert int(i) == 30 and bool(stopped)


def test_compress_adaptive_end_to_end(tiny_setup):
    """compress() with adaptive stops runs end to end, reports the epochs
    actually spent (<= budgets), and still codes every group."""
    art, Xj, Yj = tiny_setup
    codec, state = _fresh(art, 2)
    res = compress(
        codec, state, Xj, Yj, TINY, jax.random.key(2),
        n_optimize_epochs=200, lr=2e-3, sample_size=2,
        finetune_overrides={"w": 60, "h": 60, "hh": 60},
        phase1_stop=(25, 1e-3, 50), finetune_stop=(10, 1e-3, 20),
    )
    assert bool(np.asarray(res.state.w.compressed).all())
    n_groups = int(codec.w.n_groups)
    assert res.timings["phase1_epochs"] <= 200
    assert res.timings["finetune_budget"] == 60 * n_groups
    assert 0 < res.timings["finetune_epochs"] <= res.timings["finetune_budget"]
    assert np.isfinite(res.distortion).all()
