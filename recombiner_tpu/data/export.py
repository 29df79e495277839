"""Export decoded reconstructions to media files.

Decoded rows are (R, P, C) point sets (patch rows in patch mode); this module
reassembles datapoints (unpatchify) and writes PNG / WAV / NPZ / PDB, the
counterpart of the reference's shipped decoded examples (examples/*.wav).
"""

from __future__ import annotations

import os
import wave
from typing import List

import numpy as np

from recombiner_tpu.config import ModalityConfig
from recombiner_tpu.coords import unpatchify
from recombiner_tpu.data.protein import SCALE as PROTEIN_SCALE


def reassemble(y: np.ndarray, cfg: ModalityConfig) -> np.ndarray:
    """(R, P, C) decoded rows -> (n_data, *full_spatial, C)."""
    R = y.shape[0]
    per = cfg.patches_per_datapoint
    n_data = R // per
    y = y.reshape(R, *cfg.pixel_sizes, cfg.output_dim)
    if not cfg.patch:
        return y
    out = []
    for d in range(n_data):
        out.append(unpatchify(y[d * per : (d + 1) * per], cfg.patch_nums))
    return np.stack(out)


def write_png(path: str, img: np.ndarray) -> None:
    """img (H, W, C) in [0, 1] -> 8-bit PNG (the codec's 8-bit rounding,
    utils.py:238-239)."""
    from PIL import Image

    arr = np.round(np.clip(img, 0, 1) * 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


def write_wav(path: str, clip: np.ndarray, sample_rate: int = 16000) -> None:
    """clip (L,) or (L, 1) in [0, 1] (the loader's normalization) -> 16-bit PCM."""
    x = np.asarray(clip).reshape(-1)
    pcm = np.clip(x * 2.0 - 1.0, -1.0, 1.0)  # undo (wav+1)/2 (data/audio.py:53)
    pcm16 = np.round(pcm * 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm16.tobytes())


def read_wav(path: str) -> np.ndarray:
    with wave.open(path, "rb") as w:
        n = w.getnframes()
        pcm16 = np.frombuffer(w.readframes(n), "<i2").astype(np.float32) / 32767.0
    return (pcm16 + 1.0) / 2.0


def write_pdb(path: str, xyz_normalized: np.ndarray) -> None:
    """(L, 3) normalized backbone -> PDB ATOM/CA records (x25 de-normalized,
    data/protein.py:38-40)."""
    xyz = np.asarray(xyz_normalized) * PROTEIN_SCALE
    lines = []
    for i, (x, y, z) in enumerate(xyz):
        lines.append(
            f"ATOM  {i + 1:5d}  CA  ALA A{i + 1:4d}    "
            f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           C"
        )
    lines.append("END")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def export_reconstructions(
    y: np.ndarray, cfg: ModalityConfig, out_dir: str, stem: str = "decoded"
) -> List[str]:
    """Write one media file per decoded datapoint; returns the paths."""
    os.makedirs(out_dir, exist_ok=True)
    data = reassemble(y, cfg)
    paths = []
    for i, datum in enumerate(data):
        if cfg.name == "audio" or (cfg.data_dim == 1 and cfg.output_dim == 1):
            p = os.path.join(out_dir, f"{stem}_{i}.wav")
            write_wav(p, datum)
        elif cfg.name == "protein":
            p = os.path.join(out_dir, f"{stem}_{i}.pdb")
            write_pdb(p, datum)
        elif cfg.data_dim == 2:
            p = os.path.join(out_dir, f"{stem}_{i}.png")
            write_png(p, datum)
        else:  # video and anything else: raw npz
            p = os.path.join(out_dir, f"{stem}_{i}.npz")
            np.savez_compressed(p, data=datum)
        paths.append(p)
    return paths
