"""Coordinate grids and Fourier featurization.

TPU-native rewrite of the reference's coordinate pipeline
(utils.py:265-298 plus the per-loader Fourier embedding,
data/image.py:25-27). Pure numpy/jnp, channel-LAST layout throughout.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def make_coord_grid(shape: Sequence[int], lo: float = -1.0, hi: float = 1.0) -> np.ndarray:
    """Centered coordinate grid in [lo, hi].

    Matches utils.py:265-284: per-axis coords (0.5 + arange(s)) / s mapped to
    the range, meshed with 'ij' indexing, stacked channel-last.

    Returns float32 array of shape (*shape, len(shape)).
    """
    axes = []
    for s in shape:
        l = (0.5 + np.arange(s, dtype=np.float64)) / s
        axes.append(lo + (hi - lo) * l)
    mesh = np.meshgrid(*axes, indexing="ij")
    return np.stack(mesh, axis=-1).astype(np.float32)


def fourier_features(coords: np.ndarray, fourier_dim: int) -> np.ndarray:
    """Geometric-frequency Fourier embedding of coordinates.

    Matches data/image.py:25-27: frequencies w = exp(linspace(0, log 1024, F))
    with F = fourier_dim // (2 * data_dim); features [cos(pi x w), sin(pi x w)].

    Args:
        coords: (..., data_dim) coordinates in [-1, 1].
        fourier_dim: total embedding width (16 for 1D/2D, 18 for 3D).

    Returns:
        (..., fourier_dim) float32 features.
    """
    data_dim = coords.shape[-1]
    n_freq = fourier_dim // (2 * data_dim)
    w = np.exp(np.linspace(0.0, np.log(1024.0), n_freq)).astype(np.float64)
    xw = coords[..., None].astype(np.float64) * w  # (..., data_dim, n_freq)
    xw = xw.reshape(*coords.shape[:-1], data_dim * n_freq)
    feats = np.concatenate([np.cos(np.pi * xw), np.sin(np.pi * xw)], axis=-1)
    return feats.astype(np.float32)


def grid_fourier_features(shape: Sequence[int], fourier_dim: int) -> np.ndarray:
    """Fourier features for a full flattened grid: (prod(shape), fourier_dim)."""
    coords = make_coord_grid(shape).reshape(-1, len(shape))
    return fourier_features(coords, fourier_dim)


def datum_to_points(datum: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Convert a channel-last datum (*spatial, C) into (coords, features).

    Row ordering matches the reference's channel-first
    ``datum.reshape(C, -1).T`` (utils.py:287-298): C-order flattening of the
    spatial axes.
    """
    spatial = datum.shape[:-1]
    coords = make_coord_grid(spatial).reshape(-1, len(spatial))
    feats = datum.reshape(-1, datum.shape[-1])
    return coords, feats


def patchify(datum: np.ndarray, patch_sizes: Sequence[int]) -> np.ndarray:
    """Split a channel-last datum (*spatial, C) into non-overlapping patches.

    Patch ordering is row-major over the patch grid, matching the reference's
    nested x/y(/t) loops (data/image.py:31-44, data/video.py:58-76).

    Returns (prod(patch_nums), *patch_sizes, C).
    """
    spatial = datum.shape[:-1]
    d = len(spatial)
    c = datum.shape[-1]
    patch_nums = [spatial[i] // patch_sizes[i] for i in range(d)]
    # reshape (n0, p0, n1, p1, ..., C), move patch-grid axes to the front
    interleaved = []
    for i in range(d):
        interleaved += [patch_nums[i], patch_sizes[i]]
    x = datum[tuple(slice(0, patch_nums[i] * patch_sizes[i]) for i in range(d))]
    x = x.reshape(*interleaved, c)
    perm = [2 * i for i in range(d)] + [2 * i + 1 for i in range(d)] + [2 * d]
    x = np.transpose(x, perm)
    return x.reshape(int(np.prod(patch_nums)), *patch_sizes, c)


def unpatchify(patches: np.ndarray, patch_nums: Sequence[int]) -> np.ndarray:
    """Inverse of :func:`patchify`: (prod(patch_nums), *patch_sizes, C) -> (*spatial, C)."""
    d = len(patch_nums)
    c = patches.shape[-1]
    patch_sizes = patches.shape[1 : 1 + d]
    x = patches.reshape(*patch_nums, *patch_sizes, c)
    perm = []
    for i in range(d):
        perm += [i, d + i]
    perm += [2 * d]
    x = np.transpose(x, perm)
    spatial = [patch_nums[i] * patch_sizes[i] for i in range(d)]
    return x.reshape(*spatial, c)
