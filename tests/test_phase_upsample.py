"""Phase-decomposed upsample+conv: exact parity with the naive path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recombiner_tpu.models.upsample import apply_upsample, init_upsample_params
from recombiner_tpu.ops.phase_upsample import apply_upsample_phased, phase_kernel_matrix


def test_phase_kernel_matrix_conserves_taps():
    # every learned tap lands in exactly one (tau, phi) cell per phase
    M, ext, pads = phase_kernel_matrix(3, (2, 2), 1)
    assert M.shape == (np.prod(ext) * 4, 9)
    np.testing.assert_array_equal(M.sum(axis=0), np.full(9, 4.0))  # k^d taps x f^d phases
    M5, ext5, pads5 = phase_kernel_matrix(5, (4, 4), 2)
    np.testing.assert_array_equal(M5.sum(axis=0), np.full(25, 16.0))


@pytest.mark.parametrize(
    "data_dim,spatial,factors",
    [
        (1, (4,), (4, 2, 2)),
        (2, (2, 2), (4, 2, 2)),
        (2, (4, 6), (4, 2, 2)),
        (3, (1, 1, 1), ((6, 4, 4), 2, 2)),
        (3, (2, 2, 2), ((6, 4, 4), 2, 2)),
    ],
)
def test_phased_matches_naive(data_dim, spatial, factors):
    key = jax.random.key(0)
    params = init_upsample_params(key, data_dim)
    x = jax.random.normal(jax.random.key(1), (2, *spatial, 128))
    ref = np.asarray(apply_upsample(params, x, data_dim, factors, (2, 1, 1)))
    got = np.asarray(apply_upsample_phased(params, x, data_dim, factors, (2, 1, 1)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def test_phased_gradients_match():
    key = jax.random.key(2)
    params = init_upsample_params(key, 2)
    x = jax.random.normal(jax.random.key(3), (2, 2, 2, 128))

    def loss_naive(p):
        return jnp.mean(apply_upsample(p, x, 2, (4, 2, 2), (2, 1, 1)) ** 2)

    def loss_phased(p):
        return jnp.mean(apply_upsample_phased(p, x, 2, (4, 2, 2), (2, 1, 1)) ** 2)

    g_ref = jax.grad(loss_naive)(params)
    g_got = jax.grad(loss_phased)(params)
    for name in g_ref:
        np.testing.assert_allclose(
            np.asarray(g_got[name]["w"]), np.asarray(g_ref[name]["w"]),
            atol=1e-5, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(g_got[name]["b"]), np.asarray(g_ref[name]["b"]),
            atol=1e-5, rtol=1e-3,
        )
