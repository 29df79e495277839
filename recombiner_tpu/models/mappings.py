"""Latent-PE -> INR-input mapping and hierarchical latent broadcasting.

TPU-native rewrite of utils.py:4-120 (stitched patch upsampling) and
utils.py:122-198 (3-level hierarchical weight-latent sampling). Channel-last,
fully shape-static, vmap/shard-friendly.

Row convention: posterior row r = datapoint d * prod(patch_nums) + p where p
is the row-major flattened patch-grid index — identical to the loader order
(data/image.py:31-44).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from recombiner_tpu.config import ModalityConfig


def _upsample(x: jax.Array, cfg: ModalityConfig, params, precision=None) -> jax.Array:
    # default path: phase-decomposed upsample+conv (exact rewrite that never
    # materializes the nearest-upsampled grids; measured 26.8 vs 27.7 ms/epoch
    # on the CIFAR encode workload). models/upsample.py stays the reference
    # implementation, golden-tested against this one.
    from recombiner_tpu.ops.phase_upsample import apply_upsample_phased

    return apply_upsample_phased(
        params, x, cfg.data_dim, cfg.layerwise_scale_factors, cfg.paddings,
        compute_dtype=cfg.compute_dtype, precision=precision,
    )


def lpe_to_pe(
    upsample_params,
    lpe: jax.Array,
    cfg: ModalityConfig,
    precision=None,
) -> jax.Array:
    """Upsample latent positional encodings into per-pixel PEs.

    Args:
        upsample_params: conv parameter pytree.
        lpe: (R, S, *lpe_spatial, latent_dim) — R rows (datapoints or patches),
             S Monte-Carlo samples.
    Returns:
        (R, S, n_pixels, upsample_out) per-pixel positional encodings.

    In patch mode the patch LPEs of one datapoint are stitched into the full
    canvas, upsampled jointly, and re-split (utils.py:60-116), so information
    flows across patch borders through the conv receptive field.
    """
    d = cfg.data_dim
    R, S = lpe.shape[0], lpe.shape[1]
    ls = cfg.lpe_spatial

    if not cfg.patch:
        x = lpe.reshape(R * S, *ls, cfg.latent_dim)
        pe = _upsample(x, cfg, upsample_params, precision=precision)
        return pe.reshape(R, S, cfg.n_pixels, cfg.upsample_out)

    pn = cfg.patch_nums
    n_data = R // int(np.prod(pn))
    # (n_data, *pn, S, *ls, latent)
    x = lpe.reshape(n_data, *pn, S, *ls, cfg.latent_dim)
    # move S next to n_data: (n_data, S, *pn, *ls, latent)
    perm = [0, 1 + d] + list(range(1, 1 + d)) + list(range(2 + d, 2 + 2 * d)) + [2 + 2 * d]
    x = jnp.transpose(x, perm)
    # interleave patch grid with lpe grid: (n_data, S, pn0, ls0, pn1, ls1, ..., latent)
    perm = [0, 1]
    for i in range(d):
        perm += [2 + i, 2 + d + i]
    perm += [2 + 2 * d]
    x = jnp.transpose(x, perm)
    canvas = [pn[i] * ls[i] for i in range(d)]
    x = x.reshape(n_data * S, *canvas, cfg.latent_dim)

    pe = _upsample(x, cfg, upsample_params, precision=precision)  # (n_data*S, *(pn*ps), out)

    ps = cfg.pixel_sizes
    # re-split into patches
    interleaved = []
    for i in range(d):
        interleaved += [pn[i], ps[i]]
    pe = pe.reshape(n_data, S, *interleaved, cfg.upsample_out)
    # (n_data, S, pn0, ps0, ...) -> (n_data, S, pn..., ps..., out)
    perm = [0, 1] + [2 + 2 * i for i in range(d)] + [3 + 2 * i for i in range(d)] + [2 + 2 * d]
    pe = jnp.transpose(pe, perm)
    # (n_data, pn..., S, ps..., out): rows become leading
    perm = [0] + list(range(2, 2 + d)) + [1] + list(range(2 + d, 2 + 2 * d)) + [2 + 2 * d]
    pe = jnp.transpose(pe, perm)
    return pe.reshape(R, S, cfg.n_pixels, cfg.upsample_out)


def expand_level(
    x: jax.Array,
    patch_nums: Sequence[int],
    level_patch_nums: Sequence[int],
) -> jax.Array:
    """Broadcast per-group latents to per-patch rows.

    Args:
        x: (n_groups_total, ...) where groups are ordered (datapoint-major,
           then row-major over the coarse group grid patch_nums//level).
    Returns:
        (n_rows_total, ...) with each group's value repeated over its patches,
        in exact row order — the jnp equivalent of the repeat ladder in
        utils.py:151-182.
    """
    pn = tuple(patch_nums)
    lv = tuple(level_patch_nums)
    d = len(pn)
    ng = tuple(pn[i] // lv[i] for i in range(d))
    n_data = x.shape[0] // int(np.prod(ng))
    tail = x.shape[1:]

    y = x.reshape(n_data, *ng, *tail)
    # insert a repeat axis after each group axis: (n_data, g0, l0, g1, l1, ...)
    for i in range(d):
        axis = 1 + 2 * i  # current group axis position
        y = jnp.expand_dims(y, axis + 1)
        reps = [1] * y.ndim
        reps[axis + 1] = lv[i]
        y = jnp.tile(y, reps)
    return y.reshape(n_data * int(np.prod(pn)), *tail)


def sample_hierarchical_latents(
    key: jax.Array,
    loc: jax.Array,
    scale: jax.Array,
    h_loc: Optional[jax.Array],
    h_scale: Optional[jax.Array],
    hh_loc: Optional[jax.Array],
    hh_scale: Optional[jax.Array],
    sample_size: int,
    cfg: ModalityConfig,
) -> jax.Array:
    """Reparameterized sample of INR weight latents, summing 3 levels.

    loc/scale: (R, D); h_*: (R/prod(level2), D); hh_*: (R/prod(level3), D).
    Returns (R, S, D) = level1 + broadcast(level2) + broadcast(level3)
    (utils.py:122-198). Each level gets independent noise.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    S = sample_size
    eps = jax.random.normal(k1, (loc.shape[0], S, loc.shape[1]), loc.dtype)
    out = loc[:, None, :] + scale[:, None, :] * eps
    if not cfg.patch:
        return out

    h_eps = jax.random.normal(k2, (h_loc.shape[0], S, h_loc.shape[1]), loc.dtype)
    h = h_loc[:, None, :] + h_scale[:, None, :] * h_eps
    out = out + expand_level(h, cfg.patch_nums, cfg.level2_patch_nums)

    hh_eps = jax.random.normal(k3, (hh_loc.shape[0], S, hh_loc.shape[1]), loc.dtype)
    hh = hh_loc[:, None, :] + hh_scale[:, None, :] * hh_eps
    out = out + expand_level(hh, cfg.patch_nums, cfg.level3_patch_nums)
    return out
