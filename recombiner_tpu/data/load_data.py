"""Dataset dispatcher: seeded training subsets and fixed test slices.

Equivalent of data/load_data.py:11-137, including the test batching units
(cifar: 500 images per test_idx; protein: 1000 chains; kodak/audio/video: 1).
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from recombiner_tpu.config import ModalityConfig
from recombiner_tpu.data import audio, image, protein, video

TEST_BATCH = {"cifar": 500, "kodak": 1, "audio": 1, "video": 1, "protein": 1000}


def _dataset_file(dir_: str, stem: str) -> str:
    for ext in (".npz", ".pkl"):
        p = os.path.join(dir_, stem + ext)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"no {stem}.npz/.pkl in {dir_}")


def _seeded_subset(items: List, seed: int, n: int) -> List:
    rng = np.random.RandomState(seed)
    n = min(len(items), n)
    idx = rng.choice(len(items), n, False)
    return [items[i] for i in idx]


def _image_paths(dir_: str) -> List[str]:
    return [os.path.join(dir_, f) for f in sorted(os.listdir(dir_))]


def load_training_set(
    train_dir: str,
    cfg: ModalityConfig,
    seed: int,
    n_datapoints: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Load a seeded random subset of n_datapoints whole datapoints; returns
    (X, Y) with rows = datapoints * patches_per_datapoint."""
    name = cfg.name
    if name in ("cifar", "kodak") or name not in ("audio", "video", "protein"):
        # image-style datasets (incl. tiny test configs): a directory of files
        paths = _seeded_subset(_image_paths(train_dir), seed, n_datapoints)
        return image.load_images(paths, cfg)
    if name == "audio":
        clips = audio.load_clip_list(_dataset_file(train_dir, "train_dataset"))
        return audio.load_audio(_seeded_subset(clips, seed, n_datapoints), cfg)
    if name == "video":
        clips = video.load_clip_list(_dataset_file(train_dir, "train_dataset"))
        return video.load_video(_seeded_subset(clips, seed, n_datapoints), cfg)
    if name == "protein":
        chains = protein.load_chain_list(_dataset_file(train_dir, "train_dataset"))
        return protein.load_protein(_seeded_subset(chains, seed, n_datapoints), cfg)
    raise ValueError(name)


def load_test_set(
    test_dir: str,
    test_idx: int,
    cfg: ModalityConfig,
) -> Tuple[np.ndarray, np.ndarray]:
    """Load the test batch for one test_idx (batch sizes per modality as in
    data/load_data.py:92-131)."""
    name = cfg.name
    b = TEST_BATCH.get(name, 1)
    lo, hi = test_idx * b, test_idx * b + b
    if name in ("cifar", "kodak") or name not in ("audio", "video", "protein"):
        paths = _image_paths(test_dir)[lo:hi]
        return image.load_images(paths, cfg)
    if name == "audio":
        clips = audio.load_clip_list(_dataset_file(test_dir, "test_dataset"))[lo:hi]
        return audio.load_audio(clips, cfg)
    if name == "video":
        clips = video.load_clip_list(_dataset_file(test_dir, "test_dataset"))[lo:hi]
        return video.load_video(clips, cfg)
    if name == "protein":
        chains = protein.load_chain_list(_dataset_file(test_dir, "test_dataset"))[lo:hi]
        return protein.load_protein(chains, cfg)
    raise ValueError(name)
