"""Pallas fused INR kernel: golden parity with the jnp reference (interpret
mode on CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from recombiner_tpu.config import CIFAR, TINY
from recombiner_tpu.models.inr import init_linear_transform, inr_forward
from recombiner_tpu.ops.pallas_inr import inr_forward_fused, materialize_weights


def test_materialize_weights_matches_per_layer():
    cfg = TINY
    A = init_linear_transform(jax.random.key(0), cfg.net_dims)
    hw = jax.random.normal(jax.random.key(1), (5, cfg.n_inr_params))
    wbs = materialize_weights(hw, A, cfg)
    assert len(wbs) == cfg.n_layers
    # layer 0: bias-first packing of hw[:, :c0] @ A0 (prior_model.py:121-127)
    c0 = cfg.cum_param_sizes[0]
    lat0 = np.asarray(hw[:, :c0] @ A[0])
    o0 = cfg.net_dims[1]
    np.testing.assert_allclose(np.asarray(wbs[0][1][:, 0]), lat0[:, :o0], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(wbs[0][0]), lat0[:, o0:].reshape(5, cfg.net_dims[0], o0), atol=1e-5
    )


def test_pallas_kernel_matches_reference_cifar():
    cfg = CIFAR
    A = init_linear_transform(jax.random.key(0), cfg.net_dims)
    R, S, P = 2, 2, 1024
    x = jax.random.normal(jax.random.key(1), (R, S, P, cfg.input_dim))
    hw = 0.02 * jax.random.normal(jax.random.key(2), (R, S, cfg.n_inr_params))
    ref = np.asarray(inr_forward(x, hw, A, cfg))
    got = np.asarray(inr_forward_fused(x, hw, A, cfg, tile_p=256, interpret=True))
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-5)


def test_pallas_kernel_tiny_config():
    cfg = TINY
    A = init_linear_transform(jax.random.key(3), cfg.net_dims)
    R, S, P = 4, 1, 256
    x = jax.random.normal(jax.random.key(4), (R, S, P, cfg.input_dim))
    hw = 0.05 * jax.random.normal(jax.random.key(5), (R, S, cfg.n_inr_params))
    ref = np.asarray(inr_forward(x, hw, A, cfg))
    got = np.asarray(inr_forward_fused(x, hw, A, cfg, tile_p=128, interpret=True))
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-5)
