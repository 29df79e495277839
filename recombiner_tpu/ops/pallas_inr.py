"""Pallas TPU kernel: fused SIREN-MLP forward over pixel tiles.

Fuses the whole per-sample coordinate-MLP — every layer's x @ W + b and the
sin(w0 x) activations — into one kernel so intermediate activations live in
VMEM instead of round-tripping through HBM (the ELBO epoch is
HBM-bandwidth-bound; see ops/blocked_inr.py notes). The learned A-transform
matmuls stay in XLA (large dense matmuls the MXU already handles at full
tilt); per-layer weight matrices are materialized outside the kernel because
Mosaic does not support 1-D -> 2-D vector reshapes in-kernel.

Grid: (B, P / TILE_P) over the flattened (row, MC-sample) batch and pixel
tiles. Per program: load an x tile (TILE_P, in_dim) plus this sample's
per-layer (in, out) weights and biases, chain the matmuls in VMEM.

A jnp reference fallback (models/inr.py) is golden-tested against this kernel
in tests/test_pallas_inr.py (interpret mode on CPU, compiled on TPU).

Measured on v5e (CIFAR, B=2500, P=1024): bit-exact parity with the einsum
path (max abs diff 0.0), but 32 ms vs 8.4 ms forward — the (B, P/TILE) grid
of 5000 small programs pays more in per-program weight reloads than it saves
in activation traffic; XLA's batched-einsum pipelining wins at this size.
Not wired into the default path; kept as the kernel substrate for a future
fused forward+backward (where the residual-traffic savings are 3x larger).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from recombiner_tpu.config import ModalityConfig
from recombiner_tpu.models.inr import latent_to_weights, slice_layer


def _kernel(*refs, cfg: ModalityConfig):
    """refs = (x, W_0, b_0, ..., W_{L-1}, b_{L-1}, out).

    x: (1, TILE_P, in); W_l: (1, in_l, out_l); b_l: (1, 1, out_l);
    out: (1, TILE_P, out_dim).
    """
    x_ref = refs[0]
    out_ref = refs[-1]
    x = x_ref[0]
    for li in range(cfg.n_layers):
        w = refs[1 + 2 * li][0]
        b = refs[2 + 2 * li][0]
        x = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
        if li != cfg.n_layers - 1:
            x = jnp.sin(cfg.w0 * x)
    out_ref[0] = x


def materialize_weights(
    h_w: jax.Array, A: Sequence[jax.Array], cfg: ModalityConfig
) -> List[Tuple[jax.Array, jax.Array]]:
    """A-transform + unpack: (B, D) latents -> [(W_l (B,in,out), b_l (B,1,out))]."""
    dims = cfg.net_dims
    out = []
    for li in range(cfg.n_layers):
        lat = slice_layer(h_w, li, cfg.cum_param_sizes)
        lat = jnp.einsum("bd,de->be", lat, A[li], preferred_element_type=jnp.float32)
        w, b = latent_to_weights(lat, dims[li], dims[li + 1])
        out.append((w, b[:, None, :]))
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "tile_p", "interpret"))
def _pallas_forward(x, wbs_flat, cfg: ModalityConfig, tile_p: int, interpret: bool):
    B, P, Fin = x.shape
    assert P % tile_p == 0, (P, tile_p)
    grid = (B, P // tile_p)
    dims = cfg.net_dims

    in_specs = [
        pl.BlockSpec((1, tile_p, Fin), lambda b, p: (b, p, 0), memory_space=pltpu.VMEM)
    ]
    for li in range(cfg.n_layers):
        i_dim, o_dim = dims[li], dims[li + 1]
        in_specs.append(
            pl.BlockSpec((1, i_dim, o_dim), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM)
        )
        in_specs.append(
            pl.BlockSpec((1, 1, o_dim), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM)
        )

    return pl.pallas_call(
        functools.partial(_kernel, cfg=cfg),
        out_shape=jax.ShapeDtypeStruct((B, P, cfg.output_dim), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tile_p, cfg.output_dim), lambda b, p: (b, p, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x, *wbs_flat)


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
    wbs = materialize_weights(h_w.reshape(B, -1), A, cfg)
    flat = []
    for w, b in wbs:
        flat += [w, b]
    y = _pallas_forward(x.reshape(B, P, Fin), tuple(flat), cfg, tile_p, interpret)
    return y.reshape(R, S, P, cfg.output_dim)
