import jax
import jax.numpy as jnp
import numpy as np

from recombiner_tpu.config import CIFAR, TINY
from recombiner_tpu.models.inr import init_linear_transform, inr_forward
from recombiner_tpu.ops.blocked_inr import _block_diag, inr_forward_blocked


def test_block_diag_layout():
    w = jnp.arange(2 * 4 * 2 * 3, dtype=jnp.float32).reshape(2, 4, 2, 3)
    bd = np.asarray(_block_diag(w))
    assert bd.shape == (2, 8, 12)
    for g in range(2):
        for s in range(4):
            blk = bd[g, s * 2 : (s + 1) * 2, s * 3 : (s + 1) * 3]
            np.testing.assert_array_equal(blk, np.asarray(w[g, s]))
    # off-diagonal zero
    assert bd[0, 0:2, 3:6].sum() == 0


def test_blocked_matches_reference_forward():
    cfg = CIFAR
    key = jax.random.key(0)
    A = init_linear_transform(key, cfg.net_dims)
    R, S, P = 4, 2, 64  # R*S = 8 divisible by 4
    x = jax.random.normal(jax.random.key(1), (R, S, P, cfg.input_dim))
    hw = 0.02 * jax.random.normal(jax.random.key(2), (R, S, cfg.n_inr_params))
    ref = np.asarray(inr_forward(x, hw, A, cfg))
    blk = np.asarray(inr_forward_blocked(x, hw, A, cfg))
    np.testing.assert_allclose(blk, ref, atol=2e-5, rtol=1e-5)


def test_blocked_fallback_non_multiple():
    cfg = TINY
    key = jax.random.key(0)
    A = init_linear_transform(key, cfg.net_dims)
    R, S, P = 3, 1, 16  # R*S = 3, not divisible by 4
    x = jax.random.normal(jax.random.key(1), (R, S, P, cfg.input_dim))
    hw = 0.02 * jax.random.normal(jax.random.key(2), (R, S, cfg.n_inr_params))
    ref = np.asarray(inr_forward(x, hw, A, cfg))
    blk = np.asarray(inr_forward_blocked(x, hw, A, cfg))
    np.testing.assert_allclose(blk, ref, atol=1e-6)


def test_blocked_gradients_match():
    cfg = TINY
    A = init_linear_transform(jax.random.key(0), cfg.net_dims)
    R, S, P = 4, 1, 16
    x = jax.random.normal(jax.random.key(1), (R, S, P, cfg.input_dim))
    hw = 0.02 * jax.random.normal(jax.random.key(2), (R, S, cfg.n_inr_params))

    def loss_ref(hw):
        return jnp.mean(inr_forward(x, hw, A, cfg) ** 2)

    def loss_blk(hw):
        return jnp.mean(inr_forward_blocked(x, hw, A, cfg) ** 2)

    g_ref = np.asarray(jax.grad(loss_ref)(hw))
    g_blk = np.asarray(jax.grad(loss_blk)(hw))
    np.testing.assert_allclose(g_blk, g_ref, atol=1e-6, rtol=1e-4)
