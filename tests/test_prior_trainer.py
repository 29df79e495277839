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
