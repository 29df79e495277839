"""Multi-device tests on the 8-virtual-CPU mesh: data parallelism, pixel-axis
(sequence) parallelism, and parity of sharded vs single-device training."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from recombiner_tpu.config import TINY, TINY_PATCH
from recombiner_tpu.data.synthetic import synthetic_dataset
from recombiner_tpu.parallel.mesh import (
    DATA_AXIS,
    PIXEL_AXIS,
    make_mesh,
    make_mesh_2d,
    shard_data_and_pixels,
    shard_rows,
)
from recombiner_tpu.priors.trainer import (
    init_prior_state,
    init_priors,
    m_step,
    sgd_epochs,
)


def test_mesh_helpers():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh_2d(2, 4)
    assert mesh2.shape == {DATA_AXIS: 2, PIXEL_AXIS: 4}


def test_dp_training_matches_single_device():
    """The sharded training step must compute the same numbers as unsharded
    (GSPMD inserts the collectives; math is identical up to f32 reduction
    order)."""
    cfg = TINY
    X, Y = synthetic_dataset(cfg, 8, seed=0)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    priors = init_priors(cfg)

    state0 = init_prior_state(jax.random.key(0), cfg, 8)
    s_ref, m_ref = sgd_epochs(
        state0, Xj, Yj, priors, jnp.float32(1e-8), jax.random.key(1),
        cfg=cfg, n_epochs=5, lr=2e-3,
    )

    mesh = make_mesh()
    state1 = shard_rows(init_prior_state(jax.random.key(0), cfg, 8), mesh)
    Xs = shard_rows(Xj, mesh)
    Ys = shard_rows(Yj, mesh)
    s_dp, m_dp = sgd_epochs(
        state1, Xs, Ys, priors, jnp.float32(1e-8), jax.random.key(1),
        cfg=cfg, n_epochs=5, lr=2e-3,
    )
    assert np.isclose(float(m_ref.mse), float(m_dp.mse), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s_ref.w.loc), np.asarray(s_dp.w.loc), atol=2e-5
    )
    # shared mappings stayed replicated and identical
    np.testing.assert_allclose(
        np.asarray(s_ref.A[0]), np.asarray(s_dp.A[0]), atol=2e-5
    )
    # M-step moments reduce over the sharded axis
    p_ref = m_step(s_ref, cfg)
    p_dp = m_step(s_dp, cfg)
    np.testing.assert_allclose(
        np.asarray(p_ref.w.scale), np.asarray(p_dp.w.scale), rtol=1e-4
    )


def test_pixel_axis_sharding():
    """SP: shard the coordinate-grid axis (the 'long context' analogue) over a
    2x4 (data, pixels) mesh — the training step runs and matches unsharded."""
    cfg = TINY
    X, Y = synthetic_dataset(cfg, 2, seed=1)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    priors = init_priors(cfg)

    state0 = init_prior_state(jax.random.key(0), cfg, 2)
    _, m_ref = sgd_epochs(
        state0, Xj, Yj, priors, jnp.float32(1e-8), jax.random.key(1),
        cfg=cfg, n_epochs=3, lr=2e-3,
    )

    mesh = make_mesh_2d(2, 4)
    Xs = shard_data_and_pixels(Xj, mesh)
    Ys = shard_data_and_pixels(Yj, mesh)
    state1 = jax.device_put(
        init_prior_state(jax.random.key(0), cfg, 2),
        NamedSharding(mesh, P()),
    )
    _, m_sp = sgd_epochs(
        state1, Xs, Ys, priors, jnp.float32(1e-8), jax.random.key(1),
        cfg=cfg, n_epochs=3, lr=2e-3,
    )
    assert np.isclose(float(m_ref.mse), float(m_sp.mse), rtol=1e-4)


def test_dp_patch_mode_with_hierarchy():
    """Hierarchical levels have different row counts; the expand_level
    broadcasts become collectives under sharding — must still run + match."""
    cfg = TINY_PATCH
    X, Y = synthetic_dataset(cfg, 4, seed=2)  # 16 rows, h=8, hh=4
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    priors = init_priors(cfg)

    state0 = init_prior_state(jax.random.key(0), cfg, 16)
    _, m_ref = sgd_epochs(
        state0, Xj, Yj, priors, jnp.float32(1e-8), jax.random.key(1),
        cfg=cfg, n_epochs=3, lr=2e-3,
    )
    mesh = make_mesh(4)
    state1 = shard_rows(init_prior_state(jax.random.key(0), cfg, 16), mesh)
    _, m_dp = sgd_epochs(
        state1, shard_rows(Xj, mesh), shard_rows(Yj, mesh), priors,
        jnp.float32(1e-8), jax.random.key(1), cfg=cfg, n_epochs=3, lr=2e-3,
    )
    assert np.isclose(float(m_ref.mse), float(m_dp.mse), rtol=1e-4)
