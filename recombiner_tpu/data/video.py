"""Video loading and preprocessing (UCF-101: 24 frames, center-crop 240,
resize 128, /255).

Equivalent of data/video.py:13-91. Clips are stored channel-last
(T, H, W, C); the reference's pickled channel-first torch clips also load.
"""

from __future__ import annotations

import pickle
from typing import List, Sequence, Tuple

import numpy as np

from recombiner_tpu.config import ModalityConfig
from recombiner_tpu.data.pipeline import points_from_data

N_FRAMES = 24
CROP = 240
SIZE = 128


def process_video_datasets(train_paths, test_paths, save_dir: str) -> None:
    """Offline preprocessor following VC-INR conventions (data/video.py:13-38).
    Requires torchvision for video decode."""
    from torchvision import io, transforms

    def process(paths):
        out = []
        for p in paths:
            video = io.read_video(p)[0].permute([0, 3, 1, 2])[:N_FRAMES]  # (T,C,H,W)
            if video.shape[-1] >= CROP and video.shape[-2] >= CROP:
                video = transforms.CenterCrop([CROP, CROP])(video)
                video = transforms.Resize(size=[SIZE, SIZE])(video)
                clip = video.numpy().astype(np.float32) / 255.0  # (T,C,H,W)
                out.append(np.moveaxis(clip, 1, -1))  # (T,H,W,C)
        return out

    np.savez(save_dir + "/test_dataset.npz", *process(test_paths))
    np.savez(save_dir + "/train_dataset.npz", *process(train_paths))


def load_clip_list(path: str) -> List[np.ndarray]:
    if path.endswith(".npz"):
        z = np.load(path)
        return [z[k] for k in z.files]
    with open(path, "rb") as f:
        tensors = pickle.load(f)
    out = []
    for t in tensors:
        arr = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
        if arr.shape[-1] not in (1, 3):  # (T, C, H, W) reference layout
            arr = np.moveaxis(arr, 1, -1)
        out.append(arr.astype(np.float32))
    return out


def load_video(clips: Sequence[np.ndarray], cfg: ModalityConfig) -> Tuple[np.ndarray, np.ndarray]:
    # clips: (T, H, W, C) channel-last
    return points_from_data([np.asarray(c, np.float32) for c in clips], cfg)
