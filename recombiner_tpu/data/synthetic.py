"""Synthetic datasets for tests and benchmarks.

Generates smooth band-limited signals (random low-frequency Fourier mixtures)
that tiny INRs can actually fit, for any modality geometry — used where the
reference would load CIFAR/LibriSpeech/UCF-101/PDB files.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from recombiner_tpu.config import ModalityConfig
from recombiner_tpu.coords import grid_fourier_features, make_coord_grid, patchify


def smooth_signal(
    rng: np.random.Generator, spatial: Tuple[int, ...], channels: int, n_modes: int = 6
) -> np.ndarray:
    """Random smooth signal in [0, 1], shape (*spatial, channels)."""
    d = len(spatial)
    coords = make_coord_grid(spatial)  # (*spatial, d)
    out = np.zeros((*spatial, channels), np.float64)
    for _ in range(n_modes):
        freq = rng.uniform(0.3, 2.0, size=(d,))
        phase = rng.uniform(0, 2 * np.pi)
        amp = rng.normal(size=(channels,)) / n_modes
        wave = np.sin(np.pi * (coords * freq).sum(-1) + phase)
        out += wave[..., None] * amp
    out = (out - out.min()) / (out.max() - out.min() + 1e-9)
    return out.astype(np.float32)


def synthetic_dataset(
    cfg: ModalityConfig, n_datapoints: int, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Build (X, Y) exactly as the data pipeline would: Fourier-embedded
    coordinates and per-point features, optionally split into patches.

    Returns X (R, P, fourier_dim), Y (R, P, out_dim) where R =
    n_datapoints * patches_per_datapoint.
    """
    rng = np.random.default_rng(seed)
    if cfg.patch:
        full_spatial = tuple(
            cfg.patch_nums[i] * cfg.pixel_sizes[i] for i in range(cfg.data_dim)
        )
    else:
        full_spatial = cfg.pixel_sizes

    feats = grid_fourier_features(cfg.pixel_sizes, cfg.fourier_dim)  # per patch/datum
    P = feats.shape[0]

    Xs, Ys = [], []
    for _ in range(n_datapoints):
        sig = smooth_signal(rng, full_spatial, cfg.output_dim)
        if cfg.patch:
            patches = patchify(sig, cfg.pixel_sizes)  # (n_patches, *ps, C)
            Ys.append(patches.reshape(patches.shape[0], P, cfg.output_dim))
            Xs.append(np.broadcast_to(feats, (patches.shape[0], P, cfg.fourier_dim)))
        else:
            Ys.append(sig.reshape(1, P, cfg.output_dim))
            Xs.append(feats[None])
    return np.concatenate(Xs).astype(np.float32), np.concatenate(Ys).astype(np.float32)
