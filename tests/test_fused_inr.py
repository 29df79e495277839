"""Golden tests for the fused fwd+bwd INR kernel (ops/fused_inr.py) against
the einsum reference path, in Pallas interpret mode on CPU (compiled-mode
parity was verified on the real chip — docs/PERF.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from recombiner_tpu.config import TINY
from recombiner_tpu.models.inr import init_linear_transform, inr_forward
from recombiner_tpu.ops.fused_inr import inr_forward_fused


def _setup(R=2, S=3):
    cfg = TINY
    A = [jnp.asarray(a) for a in init_linear_transform(jax.random.key(2), cfg.net_dims)]
    h_w = jax.random.normal(jax.random.key(4), (R, S, cfg.n_inr_params)) * 0.05
    x = jax.random.normal(jax.random.key(6), (R, S, cfg.n_pixels, cfg.input_dim))
    Y = jax.random.uniform(jax.random.key(1), (R, cfg.n_pixels, cfg.output_dim))
    return cfg, A, h_w, x, Y


def test_fused_forward_bit_exact():
    cfg, A, h_w, x, _ = _setup()
    y_ref = inr_forward(x, h_w, A, cfg)
    y_fused = inr_forward_fused(x, h_w, A, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_fused))


def test_fused_backward_matches_autodiff():
    """The hand-written backward kernel (recompute + chain) must agree with
    XLA autodiff through the einsum path for every input: h_w, A, and x."""
    cfg, A, h_w, x, Y = _setup()

    def loss(fwd):
        def f(h_w, A, x):
            y = fwd(x, h_w, A, cfg) if fwd is inr_forward else fwd(
                x, h_w, A, cfg, interpret=True
            )
            return jnp.mean((y - Y[:, None]) ** 2)
        return f

    g_ref = jax.grad(loss(inr_forward), argnums=(0, 1, 2))(h_w, A, x)
    g_fus = jax.grad(loss(inr_forward_fused), argnums=(0, 1, 2))(h_w, A, x)

    np.testing.assert_allclose(
        np.asarray(g_ref[0]), np.asarray(g_fus[0]), rtol=1e-5, atol=1e-10
    )
    for a_ref, a_fus in zip(g_ref[1], g_fus[1]):
        np.testing.assert_allclose(
            np.asarray(a_ref), np.asarray(a_fus), rtol=1e-5, atol=1e-10
        )
    np.testing.assert_allclose(
        np.asarray(g_ref[2]), np.asarray(g_fus[2]), rtol=1e-5, atol=1e-10
    )


def test_fused_tile_fallback_shapes():
    """Non-power-of-two batch: _pick_tiles reduces tile_b; pixel tiling
    accumulates dW across tiles correctly (multi-tile grid path)."""
    cfg, A, _, _, Y = _setup()
    R, S = 3, 1  # B=3 -> tile_b falls back to 1
    h_w = jax.random.normal(jax.random.key(7), (R, S, cfg.n_inr_params)) * 0.05
    x = jax.random.normal(jax.random.key(8), (R, S, cfg.n_pixels, cfg.input_dim))

    y_ref = inr_forward(x, h_w, A, cfg)
    y_fus = inr_forward_fused(x, h_w, A, cfg, tile_p=cfg.n_pixels // 2, interpret=True)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_fus))

    def f_ref(h_w):
        return jnp.sum(inr_forward(x, h_w, A, cfg) ** 2)

    def f_fus(h_w):
        return jnp.sum(
            inr_forward_fused(x, h_w, A, cfg, tile_p=cfg.n_pixels // 2, interpret=True) ** 2
        )

    g_ref = jax.grad(f_ref)(h_w)
    g_fus = jax.grad(f_fus)(h_w)
    # two-tile dW accumulation reorders f32 sums vs the single einsum
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_fus), rtol=1e-5, atol=5e-8)


def test_fused_odd_pixel_count_full_coverage():
    """P not divisible by 8 must fall back to a full-P tile, never an
    under-covering grid (which silently leaves uninitialized output)."""
    import dataclasses

    from recombiner_tpu.config import TINY

    cfg = dataclasses.replace(TINY, pixel_sizes=(3, 4))  # P = 12
    A = [jnp.asarray(a) for a in init_linear_transform(jax.random.key(2), cfg.net_dims)]
    h_w = jax.random.normal(jax.random.key(4), (2, 1, cfg.n_inr_params)) * 0.05
    x = jax.random.normal(jax.random.key(6), (2, 1, 12, cfg.input_dim))
    y_ref = inr_forward(x, h_w, A, cfg)
    y_fus = inr_forward_fused(x, h_w, A, cfg, interpret=True)
    assert np.isfinite(np.asarray(y_fus)).all()
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_fus))
