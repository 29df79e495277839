"""Audio loading and preprocessing (LibriSpeech, 3 s @ 16 kHz -> [0,1]).

Equivalent of data/audio.py:16-158. The offline preprocessor (which needs
torchaudio to download/decode LibriSpeech) is import-gated; loading works
from either our .npz dataset dumps or the reference's pickled tensor lists.
"""

from __future__ import annotations

import pickle
from typing import List, Sequence, Tuple

import numpy as np

from recombiner_tpu.config import ModalityConfig
from recombiner_tpu.data.pipeline import points_from_data, to_numpy_channel_last

SAMPLE_RATE = 16000
NUM_SECS = 3
CLIP_SAMPLES = SAMPLE_RATE * NUM_SECS  # 48000


def preprocess_clip(wav: np.ndarray) -> np.ndarray | None:
    """[-1,1] waveform -> [0,1] 48000-sample clip, or None if too short —
    the exact per-clip math of the reference preprocessor
    (data/audio.py:96-104: (wav+1)/2, truncate, keep only full clips)."""
    wav = np.asarray(wav, np.float32).reshape(-1)
    wav = (wav + 1.0) / 2.0
    wav = wav[:CLIP_SAMPLES]
    return wav.astype(np.float32) if wav.shape[0] == CLIP_SAMPLES else None


def process_audio_datasets(
    save_dir: str,
    root: str = "./",
    download_test: bool = False,
    corpus_fn=None,
) -> None:
    """Offline preprocessor: select clips, normalize to [0,1], dump datasets
    (data/audio.py:79-109).

    ``corpus_fn(url) -> indexable of 1-D [-1,1] float waveforms``; the
    default wraps torchaudio's LIBRISPEECH (download). Injectable so the
    full selection/processing/dump path is testable without the corpus
    (this environment has zero egress)."""
    if corpus_fn is None:

        def corpus_fn(url: str):
            import torchaudio

            ds = torchaudio.datasets.LIBRISPEECH(root=root, url=url, download=True)

            class _Corpus:
                def __len__(self):
                    return len(ds)

                def __getitem__(self, i):
                    return ds[int(i)][0].float().numpy()[0]  # (L,)

            return _Corpus()

    def clips_of(url: str, limit: int | None):
        ds = corpus_fn(url)
        n = len(ds)
        if limit is not None:
            # seeded subset selection, matching data/audio.py:85-88
            rng = np.random.RandomState(0)
            idx = rng.choice(n, min(limit, n), False)
        else:
            idx = np.arange(n)
        out = []
        for i in idx:
            clip = preprocess_clip(ds[int(i)])
            if clip is not None:
                out.append(clip)
        return out

    test = clips_of("test-clean", None)
    train = clips_of("train-clean-100", 12000 // 60)
    np.savez(save_dir + "/test_dataset.npz", *test)
    np.savez(save_dir + "/train_dataset.npz", *train)


def load_clip_list(path: str) -> List[np.ndarray]:
    """Load clips from .npz (ours) or .pkl (reference format: list of torch
    (1, 48000) tensors)."""
    if path.endswith(".npz"):
        z = np.load(path)
        return [z[k] for k in z.files]
    with open(path, "rb") as f:
        tensors = pickle.load(f)
    return [to_numpy_channel_last(t).reshape(-1) for t in tensors]


def load_audio(clips: Sequence[np.ndarray], cfg: ModalityConfig) -> Tuple[np.ndarray, np.ndarray]:
    data = [np.asarray(c, np.float32).reshape(CLIP_SAMPLES, 1) for c in clips]
    return points_from_data(data, cfg)


def load_wav_clip(path: str, cfg: ModalityConfig) -> Tuple[np.ndarray, np.ndarray]:
    """Load one WAV file as an encode target: (wav + 1) / 2 normalization
    exactly like the reference preprocessing (data/audio.py:96-99), truncated
    to the config's clip length. Handles IEEE-float WAVs (the reference's
    examples/ground_truth.wav is format 3, which stdlib wave rejects)."""
    from scipy.io import wavfile

    rate, wav = wavfile.read(path)
    if rate != SAMPLE_RATE:
        raise ValueError(f"{path}: sample rate {rate}, expected {SAMPLE_RATE}")
    if wav.ndim == 2:  # multi-channel: take channel 0 (reference clips are mono)
        wav = wav[:, 0]
    elif wav.ndim != 1:
        raise ValueError(f"{path}: unsupported WAV shape {wav.shape}")
    if wav.dtype == np.uint8:  # 8-bit WAV is unsigned, midpoint 128
        wav = (wav.astype(np.float32) - 128.0) / 128.0
    elif wav.dtype.kind == "i":  # signed PCM -> [-1, 1]
        wav = wav.astype(np.float32) / float(np.iinfo(wav.dtype).max)
    elif wav.dtype.kind != "f":
        raise ValueError(f"{path}: unsupported WAV dtype {wav.dtype}")
    # int PCM divides by iinfo.max, so full-scale negative lands slightly
    # below -1; clamp so (wav+1)/2 stays in [0, 1]
    wav = np.clip(np.asarray(wav, np.float32), -1.0, 1.0).reshape(-1)
    n = cfg.patches_per_datapoint * cfg.pixel_sizes[0] if cfg.patch else cfg.pixel_sizes[0]
    if wav.shape[0] < n:
        raise ValueError(f"{path}: {wav.shape[0]} samples, need {n}")
    clip = (wav[:n] + 1.0) / 2.0
    return points_from_data([clip[:, None]], cfg)
