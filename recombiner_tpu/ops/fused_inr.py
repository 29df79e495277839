"""Fused forward+backward Pallas kernel for the per-sample SIREN MLP.

The encode-epoch bottleneck is the pixel-matmul chain's fwd+bwd — measured
17.85 ms of the 26.6 ms CIFAR S=5 epoch (R=500): XLA stores every layer's
pre-activation and activation, (2500, 1024, 32) f32 each, and re-reads them
in the backward pass, while the MXU runs at K=32 occupancy. This kernel:

- forward: chains all layers in VMEM per (sample-block, pixel-tile), writes
  only the output — no intermediate ever touches HBM;
- backward (custom_vjp): RECOMPUTES the forward in VMEM from the saved
  inputs (x, W, b — all kernel inputs, zero extra residual traffic), then
  chains the gradient: dW_l = a_l^T dz_l (K = pixel tile, MXU-friendly),
  db_l = sum dz_l, da = dz_l W_l^T, dz_{l-1} = da * w0 cos(w0 z_{l-1}).

The learned A-transform and its gradients stay in XLA (they are dense
1056-square matmuls the MXU already handles); autodiff chains through the
materialized per-sample weights automatically.

Contrast with ops/pallas_inr.py (round-1 forward-only experiment, kept for
its measurements): that kernel ran a (B, P/256) grid of 10k tiny programs
and lost to per-program overhead. Here TILE_B samples share one program
(default grid ~ (B/8) x (P/1024)), amortizing weight loads 8x and giving the
backward K=P matmuls full MXU tiles.

Measured on v5e (CIFAR encode shapes, R=500, S=5): fwd+bwd 17.85 -> see
tests/CLAUDE.md bench notes; bit-parity with the einsum path pinned in
tests/test_fused_inr.py (interpret mode on CPU, compiled on TPU).

Reference semantics: prior_model.py:168-179 / test_model.py:347-353.
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

# (TILE_B, TILE_P) defaults: 8 samples x 1024 pixels/program keeps the whole
# activation chain (7 x TILE_B x TILE_P x 32 f32 = ~7 MB) plus the padded
# dy tile inside the ~16 MB VMEM budget.
DEFAULT_TILE_B = 8
DEFAULT_TILE_P = 1024


def _fwd_kernel(*refs, n_layers: int, w0: float):
    """refs = (x, W_0, b_0, ..., W_{L-1}, b_{L-1}, out)."""
    x_ref, out_ref = refs[0], refs[-1]
    tile_b = x_ref.shape[0]
    for s in range(tile_b):
        x = x_ref[s]
        for li in range(n_layers):
            w = refs[1 + 2 * li][s]
            b = refs[2 + 2 * li][s]
            x = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
            if li != n_layers - 1:
                x = jnp.sin(w0 * x)
        out_ref[s] = x


def _bwd_kernel(*refs, n_layers: int, w0: float, n_ptiles: int):
    """refs = (x, dy, W_0, b_0, ..., out: dx, dW_0, db_0, ...).

    Recomputes the forward chain for this tile, then backpropagates. dW/db
    accumulate across pixel tiles: the grid iterates p fastest (sequential on
    TPU), so p == 0 initializes and later tiles add.
    """
    x_ref, dy_ref = refs[0], refs[1]
    dx_ref = refs[2 + 2 * n_layers]
    p_idx = pl.program_id(1)
    tile_b = x_ref.shape[0]
    for s in range(tile_b):
        # forward recompute, keeping pre-activations z and activations a
        acts = [x_ref[s]]  # a_0 = x
        zs = []
        a = acts[0]
        for li in range(n_layers):
            w = refs[2 + 2 * li][s]
            b = refs[3 + 2 * li][s]
            z = jnp.dot(a, w, preferred_element_type=jnp.float32) + b
            zs.append(z)
            a = jnp.sin(w0 * z) if li != n_layers - 1 else z
            acts.append(a)

        # backward chain
        dz = dy_ref[s]
        for li in range(n_layers - 1, -1, -1):
            w = refs[2 + 2 * li][s]
            a_in = acts[li]
            # dW = a_in^T @ dz without explicit transpose (contract pixels)
            dw = jax.lax.dot_general(
                a_in, dz, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            db = jnp.sum(dz, axis=0, keepdims=True)
            dw_ref = refs[3 + 2 * n_layers + 2 * li]
            db_ref = refs[4 + 2 * n_layers + 2 * li]

            @pl.when(p_idx == 0)
            def _init(dw_ref=dw_ref, db_ref=db_ref, s=s, dw=dw, db=db):
                dw_ref[s] = dw
                db_ref[s] = db

            @pl.when(p_idx != 0)
            def _acc(dw_ref=dw_ref, db_ref=db_ref, s=s, dw=dw, db=db):
                dw_ref[s] += dw
                db_ref[s] += db

            # da wrt the layer input; chain through sin for li > 0
            da = jax.lax.dot_general(
                dz, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if li > 0:
                dz = da * (w0 * jnp.cos(w0 * zs[li - 1]))
            else:
                dx_ref[s] = da


def _pick_tiles(B: int, P: int, tile_b: int, tile_p: int) -> Tuple[int, int]:
    while tile_b > 1 and B % tile_b != 0:
        tile_b //= 2
    while tile_p > 8 and P % tile_p != 0:
        tile_p //= 2
    if P % tile_p != 0:
        # the grid must cover every pixel — an under-covering grid silently
        # leaves uninitialized output. tile_p == P is always legal for Mosaic
        # (block dim equal to the array dim).
        tile_p = P
    return tile_b, tile_p


@functools.partial(
    jax.jit, static_argnames=("n_layers", "w0", "tile_b", "tile_p", "interpret")
)
def _fwd_call(x, wbs, n_layers, w0, tile_b, tile_p, interpret):
    B, P, Fin = x.shape
    out_dim = wbs[-1].shape[-1]
    grid = (B // tile_b, P // tile_p)
    in_specs = [
        pl.BlockSpec((tile_b, tile_p, Fin), lambda b, p: (b, p, 0), memory_space=pltpu.VMEM)
    ]
    for li in range(n_layers):
        i_dim, o_dim = wbs[2 * li].shape[1], wbs[2 * li].shape[2]
        in_specs.append(
            pl.BlockSpec((tile_b, i_dim, o_dim), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM)
        )
        in_specs.append(
            pl.BlockSpec((tile_b, 1, o_dim), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM)
        )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_layers=n_layers, w0=w0),
        out_shape=jax.ShapeDtypeStruct((B, P, out_dim), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile_b, tile_p, out_dim), lambda b, p: (b, p, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x, *wbs)


@functools.partial(
    jax.jit, static_argnames=("n_layers", "w0", "tile_b", "tile_p", "interpret")
)
def _bwd_call(x, dy, wbs, n_layers, w0, tile_b, tile_p, interpret):
    B, P, Fin = x.shape
    grid = (B // tile_b, P // tile_p)
    n_ptiles = P // tile_p

    in_specs = [
        pl.BlockSpec((tile_b, tile_p, Fin), lambda b, p: (b, p, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (tile_b, tile_p, dy.shape[-1]), lambda b, p: (b, p, 0), memory_space=pltpu.VMEM
        ),
    ]
    out_shapes = [jax.ShapeDtypeStruct((B, P, Fin), jnp.float32)]
    out_specs = [
        pl.BlockSpec((tile_b, tile_p, Fin), lambda b, p: (b, p, 0), memory_space=pltpu.VMEM)
    ]
    for li in range(n_layers):
        i_dim, o_dim = wbs[2 * li].shape[1], wbs[2 * li].shape[2]
        in_specs.append(
            pl.BlockSpec((tile_b, i_dim, o_dim), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM)
        )
        in_specs.append(
            pl.BlockSpec((tile_b, 1, o_dim), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct((B, i_dim, o_dim), jnp.float32))
        out_specs.append(
            pl.BlockSpec((tile_b, i_dim, o_dim), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct((B, 1, o_dim), jnp.float32))
        out_specs.append(
            pl.BlockSpec((tile_b, 1, o_dim), lambda b, p: (b, 0, 0), memory_space=pltpu.VMEM)
        )

    return pl.pallas_call(
        functools.partial(_bwd_kernel, n_layers=n_layers, w0=w0, n_ptiles=n_ptiles),
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(x, dy, *wbs)


def _make_fused(n_layers: int, w0: float, tile_b: int, tile_p: int, interpret: bool):
    @jax.custom_vjp
    def fused(x, wbs):
        return _fwd_call(x, tuple(wbs), n_layers, w0, tile_b, tile_p, interpret)

    def fwd(x, wbs):
        y = fused(x, wbs)
        return y, (x, tuple(wbs))

    def bwd(res, dy):
        x, wbs = res
        # the bwd holds the full recomputed activation chain + the padded dy
        # tile in VMEM — half the sample tile vs the forward (measured:
        # tile_b=8 overflows the 16 MB budget by 2.9 MB at P-tile 1024)
        tile_b_bwd = max(tile_b // 2, 1)
        while tile_b_bwd > 1 and x.shape[0] % tile_b_bwd != 0:
            tile_b_bwd //= 2
        outs = _bwd_call(x, dy, wbs, n_layers, w0, tile_b_bwd, tile_p, interpret)
        dx, dwbs = outs[0], list(outs[1:])
        return dx, dwbs

    fused.defvjp(fwd, bwd)
    return fused


_FUSED_CACHE = {}


def fused_mlp(
    x: jax.Array,
    wbs: Sequence[jax.Array],
    n_layers: int,
    w0: float,
    tile_b: int = DEFAULT_TILE_B,
    tile_p: int = DEFAULT_TILE_P,
    interpret: bool = False,
) -> jax.Array:
    """(B, P, in) x per-sample weights [(B,in,out),(B,1,out)]*L -> (B, P, out),
    differentiable w.r.t. x and every W/b through the fused backward kernel."""
    B, P, _ = x.shape
    tile_b, tile_p = _pick_tiles(B, P, tile_b, tile_p)
    key = (n_layers, float(w0), tile_b, tile_p, interpret)
    if key not in _FUSED_CACHE:
        _FUSED_CACHE[key] = _make_fused(*key)
    return _FUSED_CACHE[key](x, list(wbs))


def materialize_weights(
    h_w: jax.Array, A: Sequence[jax.Array], cfg: ModalityConfig
) -> List[jax.Array]:
    """A-transform + unpack: (B, D) latents -> [W_0 (B,in,out), b_0 (B,1,out), ...].
    Stays in XLA: dense square matmuls the MXU handles, and autodiff chains
    dW/db -> dh_w, dA through it automatically."""
    dims = cfg.net_dims
    out = []
    for li in range(cfg.n_layers):
        lat = slice_layer(h_w, li, cfg.cum_param_sizes)
        lat = jnp.einsum("bd,de->be", lat, A[li], preferred_element_type=jnp.float32)
        w, b = latent_to_weights(lat, dims[li], dims[li + 1])
        out += [w, b[:, None, :]]
    return out


def inr_forward_fused(
    x: jax.Array,
    h_w: jax.Array,
    A: Sequence[jax.Array],
    cfg: ModalityConfig,
    tile_b: int = DEFAULT_TILE_B,
    tile_p: int = DEFAULT_TILE_P,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for models.inr.inr_forward with a fused fwd+bwd.

    x: (R, S, P, in), h_w: (R, S, D) -> (R, S, P, out).
    """
    R, S, P, Fin = x.shape
    B = R * S
    wbs = materialize_weights(h_w.reshape(B, -1), A, cfg)
    y = fused_mlp(
        x.reshape(B, P, Fin), wbs, cfg.n_layers, cfg.w0, tile_b, tile_p, interpret
    )
    return y.reshape(R, S, P, cfg.output_dim)
