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


def preprocess_clip(video_thwc: np.ndarray) -> np.ndarray | None:
    """(T, H, W, C) uint8/float frames -> (24, 128, 128, C) float32 in [0,1],
    or None when the frame is too small to center-crop — the per-clip math
    of the reference preprocessor (data/video.py:22-33: first 24 frames,
    CenterCrop 240, Resize 128, /255).

    The 240->128 downsample uses ANTIALIASED bilinear interpolation: the
    reference goes through torchvision.transforms.Resize on tensors, which
    applies antialias by default in modern torchvision (>=0.17) — matching
    plain interpolate(bilinear) would alias differently (ADVICE r2). Pinned
    as the corpus-regeneration convention in docs/FORMAT.md."""
    import torch

    video = torch.as_tensor(np.asarray(video_thwc)).permute([0, 3, 1, 2])[:N_FRAMES]
    if video.shape[-1] < CROP or video.shape[-2] < CROP:
        return None
    h0 = (video.shape[-2] - CROP) // 2
    w0 = (video.shape[-1] - CROP) // 2
    video = video[..., h0 : h0 + CROP, w0 : w0 + CROP].float()
    video = torch.nn.functional.interpolate(
        video, size=(SIZE, SIZE), mode="bilinear", align_corners=False,
        antialias=True,
    )
    clip = video.numpy().astype(np.float32) / 255.0  # (T,C,H,W)
    return np.moveaxis(clip, 1, -1)  # (T,H,W,C)


def process_video_datasets(train_paths, test_paths, save_dir: str, decode_fn=None) -> None:
    """Offline preprocessor following VC-INR conventions (data/video.py:13-38).

    ``decode_fn(path) -> (T, H, W, C) frame array``; the default uses
    torchvision's video reader. Injectable so the full process/dump path is
    testable without video codecs (this environment has none)."""
    if decode_fn is None:

        def decode_fn(p):
            from torchvision import io

            return io.read_video(p)[0].numpy()

    def process(paths):
        out = []
        for p in paths:
            clip = preprocess_clip(decode_fn(p))
            if clip is not None:
                out.append(clip)
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
