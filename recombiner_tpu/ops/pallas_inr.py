"""Pallas TPU kernel: fused SIREN-MLP forward over pixel tiles.

Fuses the whole per-sample coordinate-MLP — every layer's x @ W + b and the
sin(w0 x) activations — into one kernel so intermediate activations live in
VMEM instead of round-tripping through HBM (the epoch is HBM-bandwidth-bound;
see ops/blocked_inr.py notes). The learned A-transform matmuls stay in XLA
(they are large dense matmuls the MXU already handles at full tilt); the
kernel consumes the materialized per-sample weights.

Grid: (B, P / TILE_P) over flattened (row, MC-sample) batch and pixel tiles.
Per program: load an x tile (TILE_P, in_dim) and this sample's packed weight
vector, unpack W_l/b_l per layer, chain the matmuls in VMEM.

A jnp reference fallback (models/inr.py) is golden-tested against this kernel
in tests/test_pallas_inr.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from recombiner_tpu.config import ModalityConfig
from recombiner_tpu.models.inr import slice_layer


def _kernel(x_ref, w_ref, out_ref, *, cfg: ModalityConfig):
    """x_ref: (1, TILE_P, in_dim); w_ref: (1, 1, n_w); out: (1, TILE_P, out)."""
    dims = cfg.net_dims
    cum = (0,) + cfg.cum_param_sizes
    x = x_ref[0]
    w_all = w_ref[0, 0]
    for li in range(cfg.n_layers):
        i_dim, o_dim = dims[li], dims[li + 1]
        seg = w_all[cum[li] : cum[li + 1]]
        b = seg[:o_dim]
        w = seg[o_dim:].reshape(i_dim, o_dim)
        x = (
            jnp.dot(x, w, preferred_element_type=jnp.float32)
            + b[None, :]
        )
        if li != cfg.n_layers - 1:
            x = jnp.sin(cfg.w0 * x)
    out_ref[0] = x


@functools.partial(jax.jit, static_argnames=("cfg", "tile_p", "interpret"))
def inr_forward_pallas(
    x: jax.Array,
    weights: jax.Array,
    cfg: ModalityConfig,
    tile_p: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Fused forward on materialized per-sample weights.

    Args:
        x: (B, P, in_dim) flattened (row, sample) batch of feature grids.
        weights: (B, n_w) packed per-layer [bias | W] vectors, i.e. the
            result of the A-transform: concat_l(h_w_l @ A_l).
    Returns:
        (B, P, out_dim) predictions.
    """
    B, P, Fin = x.shape
    n_w = weights.shape[-1]
    assert P % tile_p == 0, (P, tile_p)
    grid = (B, P // tile_p)
    # Mosaic block constraint: last two dims must be (8k, 128k) or equal the
    # array dims — give weights a unit sublane axis so (1, n_w) is "equal".
    weights3 = weights.reshape(B, 1, n_w)
    return pl.pallas_call(
        functools.partial(_kernel, cfg=cfg),
        out_shape=jax.ShapeDtypeStruct((B, P, cfg.output_dim), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_p, Fin), lambda b, p: (b, p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_w), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_p, cfg.output_dim), lambda b, p: (b, p, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x, weights3)


def transform_latents(h_w: jax.Array, A: Sequence[jax.Array], cfg: ModalityConfig) -> jax.Array:
    """Apply the learned linear reparameterization: (B, D) latents ->
    (B, D) packed per-layer weights (concat of h_w_l @ A_l)."""
    outs = []
    for li in range(cfg.n_layers):
        lat = slice_layer(h_w, li, cfg.cum_param_sizes)
        outs.append(
            jnp.einsum("bd,de->be", lat, A[li], preferred_element_type=jnp.float32)
        )
    return jnp.concatenate(outs, axis=-1)


def inr_forward_fused(
    x: jax.Array,
    h_w: jax.Array,
    A: Sequence[jax.Array],
    cfg: ModalityConfig,
    tile_p: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for models.inr.inr_forward using the Pallas kernel.

    x: (R, S, P, in), h_w: (R, S, D) -> (R, S, P, out).
    """
    R, S, P, Fin = x.shape
    B = R * S
    w = transform_latents(h_w.reshape(B, -1), A, cfg)
    y = inr_forward_pallas(
        x.reshape(B, P, Fin), w, cfg, tile_p=tile_p, interpret=interpret
    )
    return y.reshape(R, S, P, cfg.output_dim)
