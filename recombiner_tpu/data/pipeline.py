"""Shared host-side data pipeline: channel-last datum -> (X, Y) point sets.

Equivalent of the per-loader featurization in data/image.py:12-46 etc.:
Fourier-embedded grid coordinates + per-point features, with optional
non-overlapping patch splitting.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from recombiner_tpu.config import ModalityConfig
from recombiner_tpu.coords import grid_fourier_features, patchify


def points_from_datum(datum: np.ndarray, cfg: ModalityConfig) -> Tuple[np.ndarray, np.ndarray]:
    """datum: (*spatial, C) channel-last -> X (rows, P, fourier_dim), Y (rows, P, C).

    rows = 1 (non-patch) or patches_per_datapoint.
    """
    feats = grid_fourier_features(cfg.pixel_sizes, cfg.fourier_dim)
    P = feats.shape[0]
    if cfg.patch:
        patches = patchify(datum, cfg.pixel_sizes)
        rows = patches.shape[0]
        Y = patches.reshape(rows, P, cfg.output_dim)
        X = np.broadcast_to(feats, (rows, P, cfg.fourier_dim)).copy()
    else:
        Y = datum.reshape(1, P, cfg.output_dim)
        X = feats[None].copy()
    return X.astype(np.float32), Y.astype(np.float32)


def points_from_data(
    data: Sequence[np.ndarray], cfg: ModalityConfig
) -> Tuple[np.ndarray, np.ndarray]:
    Xs: List[np.ndarray] = []
    Ys: List[np.ndarray] = []
    for datum in data:
        x, y = points_from_datum(np.asarray(datum), cfg)
        Xs.append(x)
        Ys.append(y)
    return np.concatenate(Xs), np.concatenate(Ys)


def to_numpy_channel_last(t) -> np.ndarray:
    """Accept torch tensors (channel-first, as the reference's pickled
    datasets store them) or numpy arrays (channel-last, our native format)."""
    if hasattr(t, "detach"):  # torch tensor, channel-first (C, *spatial)
        arr = t.detach().cpu().numpy()
        return np.moveaxis(arr, 0, -1)
    return np.asarray(t)
