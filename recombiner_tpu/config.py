"""Modality configurations for RECOMBINER-TPU.

A single frozen dataclass replaces the reference's loose ``configs`` dict
(reference: config.py:28-137) and its scattered magic constants
(main_prior_training.py:66-68, test_model.py:98, main_compression.py:141-158).
All five modality presets carry the exact geometry of the reference so RD
behaviour is comparable; everything is CLI-overridable via ``dataclasses.replace``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import numpy as np

ScaleFactor = Union[int, Tuple[int, ...]]


@dataclasses.dataclass(frozen=True)
class ModalityConfig:
    """Static hyperparameters for one data modality.

    Geometry mirrors reference config.py; training/coding constants mirror
    main_prior_training.py:66-68,106-107 and test_model.py:88-98.
    """

    name: str

    # INR geometry
    input_dim: int
    output_dim: int
    hidden_dims: Tuple[int, ...]

    # data / patch geometry
    data_dim: int
    pixel_sizes: Tuple[int, ...]
    patch: bool
    patch_nums: Optional[Tuple[int, ...]]
    level2_patch_nums: Optional[Tuple[int, ...]]  # patches grouped per level-2 latent
    level3_patch_nums: Optional[Tuple[int, ...]]  # patches grouped per level-3 latent

    # latent positional encodings / Fourier features / upsampler
    latent_dim: int = 128
    fourier_dim: int = 16
    paddings: Tuple[int, ...] = (2, 1, 1)
    layerwise_scale_factors: Tuple[ScaleFactor, ...] = (4, 2, 2)
    upsample_factors: Tuple[int, ...] = (16, 16)
    upsample_hidden: int = 64
    upsample_out: int = 16

    # bitrate window for the prior-training beta controller
    bitrate_range: float = 0.3
    lowest_bitrate: float = 0.1

    # SIREN / posterior constants (main_prior_training.py:66-68)
    w0: float = 30.0
    c: float = 6.0
    init_log_scale: float = -4.0

    # relative entropy coding block size (test_model.py:98)
    bits_per_group: int = 16

    # matmul/conv input precision: "float32" or "bfloat16" (accumulation is
    # always f32; posteriors/losses always f32). Part of the artifact config,
    # so encoder and decoder agree.
    compute_dtype: str = "float32"

    # ---------------------------------------------------------------- derived

    @property
    def net_dims(self) -> Tuple[int, ...]:
        return (self.input_dim, *self.hidden_dims, self.output_dim)

    @property
    def n_layers(self) -> int:
        return len(self.hidden_dims) + 1

    @property
    def layer_param_counts(self) -> Tuple[int, ...]:
        """Per-layer flattened parameter counts: out*(in+1) (utils.py:215-231)."""
        d = self.net_dims
        return tuple(d[i + 1] * (d[i] + 1) for i in range(len(d) - 1))

    @property
    def cum_param_sizes(self) -> Tuple[int, ...]:
        return tuple(np.cumsum(self.layer_param_counts).tolist())

    @property
    def n_inr_params(self) -> int:
        return self.cum_param_sizes[-1]

    @property
    def lpe_spatial(self) -> Tuple[int, ...]:
        """Latent positional-encoding grid: pixel_sizes // upsample_factors."""
        return tuple(
            self.pixel_sizes[i] // self.upsample_factors[i] for i in range(self.data_dim)
        )

    @property
    def n_lpe_params(self) -> int:
        return int(np.prod(self.lpe_spatial)) * self.latent_dim

    @property
    def n_coded_params(self) -> int:
        """Level-1 coded vector length: INR weight latents + flattened LPE."""
        return self.n_inr_params + self.n_lpe_params

    @property
    def n_pixels(self) -> int:
        return int(np.prod(self.pixel_sizes))

    @property
    def patches_per_datapoint(self) -> int:
        return int(np.prod(self.patch_nums)) if self.patch else 1

    @property
    def fourier_freqs_per_dim(self) -> int:
        return self.fourier_dim // (2 * self.data_dim)

    def rows_level2(self, rows: int) -> int:
        assert self.patch
        return rows // int(np.prod(self.level2_patch_nums))

    def rows_level3(self, rows: int) -> int:
        assert self.patch
        return rows // int(np.prod(self.level3_patch_nums))

    def validate(self) -> None:
        assert len(self.pixel_sizes) == self.data_dim
        assert len(self.upsample_factors) == self.data_dim
        assert self.fourier_dim % (2 * self.data_dim) == 0
        for i in range(self.data_dim):
            assert self.pixel_sizes[i] % self.upsample_factors[i] == 0
        if self.patch:
            assert self.patch_nums is not None
            assert self.level2_patch_nums is not None
            assert self.level3_patch_nums is not None
            for i in range(self.data_dim):
                assert self.patch_nums[i] % self.level2_patch_nums[i] == 0
            # level 3 is one global latent per datapoint in every reference
            # config (config.py:59,81,103); the hierarchy code relies on it.
            assert int(np.prod(self.level3_patch_nums)) == self.patches_per_datapoint

    def bits_budget(self, max_bitrate: float) -> Tuple[float, float]:
        """(budget_min, budget_max) in bits per datapoint/patch-row.

        Mirrors main_prior_training.py:75-83 including the audio kbps->bits
        conversion (3 s @ 16 kHz).
        """
        n = self.n_pixels
        if self.name == "audio":
            scale = n * (3.0 / 48000.0) * 1000.0
        else:
            scale = float(n)
        budget_max = max_bitrate * scale
        budget_min = max(self.lowest_bitrate, max_bitrate - self.bitrate_range) * scale
        return budget_min, budget_max

    def bitrate_of_groups(self, n_groups: int, h_n_groups: int = 0, hh_n_groups: int = 0) -> float:
        """Expected bitrate (bpp / kbps / bits-per-residue) from group counts
        (test_model.py:244-251)."""
        bpp = n_groups * self.bits_per_group / self.n_pixels
        if self.patch:
            bpp += (
                h_n_groups
                * self.bits_per_group
                / self.n_pixels
                / int(np.prod(self.level2_patch_nums))
            )
            bpp += (
                hh_n_groups
                * self.bits_per_group
                / self.n_pixels
                / int(np.prod(self.level3_patch_nums))
            )
        if self.name == "audio":
            bpp = bpp / (3.0 / 48000.0) / 1000.0
        return bpp


def config_to_dict(cfg: ModalityConfig) -> dict:
    return dataclasses.asdict(cfg)


def _tup(x):
    if isinstance(x, list):
        return tuple(_tup(i) for i in x)
    return x


def config_from_dict(d: dict) -> ModalityConfig:
    kw = {k: _tup(v) for k, v in d.items()}
    cfg = ModalityConfig(**kw)
    cfg.validate()
    return cfg


def _mk(name: str, **kw) -> ModalityConfig:
    cfg = ModalityConfig(name=name, **kw)
    cfg.validate()
    return cfg


CIFAR = _mk(
    "cifar",
    input_dim=32,
    output_dim=3,
    hidden_dims=(32, 32, 32),
    data_dim=2,
    pixel_sizes=(32, 32),
    patch=False,
    patch_nums=None,
    level2_patch_nums=None,
    level3_patch_nums=None,
    fourier_dim=16,
    upsample_factors=(16, 16),
    bitrate_range=0.3,
    lowest_bitrate=0.1,
)

KODAK = _mk(
    "kodak",
    input_dim=32,
    output_dim=3,
    hidden_dims=(32, 32, 32),
    data_dim=2,
    pixel_sizes=(64, 64),
    patch=True,
    patch_nums=(512 // 64, 768 // 64),
    level2_patch_nums=(4, 4),
    level3_patch_nums=(8, 12),
    fourier_dim=16,
    upsample_factors=(16, 16),
    bitrate_range=0.1,
    lowest_bitrate=0.05,
)

# Kodak's exact topology class (2-D, 3-level patch hierarchy, hidden 32^3)
# at 64x64-image scale: 2x2 patches of 32x32. Sized so the PyTorch reference
# engine finishes a FULL-schedule encode in ~2-4 h on one CPU core — the
# full-schedule patch-mode head-to-head geometry (VERDICT r2 next #4;
# scripts/head_to_head.py --geometry kodak_mini).
KODAK_MINI = _mk(
    "kodak_mini",
    input_dim=32,
    output_dim=3,
    hidden_dims=(32, 32, 32),
    data_dim=2,
    pixel_sizes=(32, 32),
    patch=True,
    patch_nums=(2, 2),
    level2_patch_nums=(2, 1),
    level3_patch_nums=(2, 2),
    fourier_dim=16,
    upsample_factors=(16, 16),
    bitrate_range=0.1,
    lowest_bitrate=0.05,
)

AUDIO = _mk(
    "audio",
    input_dim=32,
    output_dim=1,
    hidden_dims=(32, 32, 32),
    data_dim=1,
    pixel_sizes=(800,),
    patch=True,
    patch_nums=(48000 // 800,),
    level2_patch_nums=(4,),
    level3_patch_nums=(60,),
    fourier_dim=16,
    upsample_factors=(16,),
    bitrate_range=0.3,
    lowest_bitrate=0.1,
)

VIDEO = _mk(
    "video",
    input_dim=34,
    output_dim=3,
    hidden_dims=(32, 32, 32),
    data_dim=3,
    pixel_sizes=(24, 16, 16),
    patch=True,
    patch_nums=(24 // 24, 128 // 16, 128 // 16),
    level2_patch_nums=(1, 4, 4),
    level3_patch_nums=(1, 8, 8),
    fourier_dim=18,
    layerwise_scale_factors=((6, 4, 4), 2, 2),
    upsample_factors=(24, 16, 16),
    bitrate_range=0.3,
    lowest_bitrate=0.1,
)

PROTEIN = _mk(
    "protein",
    input_dim=32,
    output_dim=3,
    hidden_dims=(32, 32, 32),
    data_dim=1,
    pixel_sizes=(96,),
    patch=False,
    patch_nums=None,
    level2_patch_nums=None,
    level3_patch_nums=None,
    fourier_dim=16,
    upsample_factors=(16,),
    bitrate_range=0.3,
    lowest_bitrate=0.1,
)

# Tiny config for fast CPU tests: same topology class as cifar, 16x16 pixels.
TINY = _mk(
    "tiny",
    input_dim=32,
    output_dim=3,
    hidden_dims=(8, 8),
    data_dim=2,
    pixel_sizes=(16, 16),
    patch=False,
    patch_nums=None,
    level2_patch_nums=None,
    level3_patch_nums=None,
    fourier_dim=16,
    upsample_factors=(16, 16),
    bitrate_range=0.3,
    lowest_bitrate=0.1,
    bits_per_group=8,
)

# Tiny patched config exercising the full 3-level hierarchy on CPU.
TINY_PATCH = _mk(
    "tiny_patch",
    input_dim=32,
    output_dim=3,
    hidden_dims=(8, 8),
    data_dim=2,
    pixel_sizes=(16, 16),
    patch=True,
    patch_nums=(2, 2),
    level2_patch_nums=(2, 1),
    level3_patch_nums=(2, 2),
    fourier_dim=16,
    upsample_factors=(16, 16),
    bitrate_range=0.3,
    lowest_bitrate=0.1,
    bits_per_group=8,
)

# Audio's exact topology class (1-D, 3-level patch hierarchy, hidden 32^3,
# 800-sample patches, latent grid 50) at 4-patch scale: one 3200-sample
# (0.2 s @ 16 kHz) datapoint. Sized so the PyTorch reference engine
# finishes a FULL-schedule encode in ~2-3 h on one CPU core — the
# full-schedule 1-D head-to-head geometry (VERDICT r3 next #5;
# scripts/head_to_head.py --geometry audio_mini). Bitrate is per-sample
# (bits/px) here, not kbps — the kbps conversion is keyed on name=="audio"
# (main_prior_training.py:75-83).
AUDIO_MINI = _mk(
    "audio_mini",
    input_dim=32,
    output_dim=1,
    hidden_dims=(32, 32, 32),
    data_dim=1,
    pixel_sizes=(800,),
    patch=True,
    patch_nums=(4,),
    level2_patch_nums=(2,),
    level3_patch_nums=(4,),
    fourier_dim=16,
    upsample_factors=(16,),
    bitrate_range=0.3,
    lowest_bitrate=0.1,
)

# Tiny 1-D patched config: the audio topology class (data_dim=1, out=1,
# 3-level hierarchy) at test scale.
TINY_AUDIO = _mk(
    "tiny_audio",
    input_dim=32,
    output_dim=1,
    hidden_dims=(8, 8),
    data_dim=1,
    pixel_sizes=(64,),
    patch=True,
    patch_nums=(4,),
    level2_patch_nums=(2,),
    level3_patch_nums=(4,),
    fourier_dim=16,
    upsample_factors=(16,),
    bitrate_range=0.3,
    lowest_bitrate=0.1,
    bits_per_group=8,
)

# Tiny 3-D patched config: the video topology class (data_dim=3, anisotropic
# first-stage upsampling like video's (6,4,4), fourier_dim=18) at test scale.
TINY_VIDEO = _mk(
    "tiny_video",
    input_dim=34,
    output_dim=3,
    hidden_dims=(8, 8),
    data_dim=3,
    pixel_sizes=(4, 8, 8),
    patch=True,
    patch_nums=(1, 2, 2),
    level2_patch_nums=(1, 2, 1),
    level3_patch_nums=(1, 2, 2),
    fourier_dim=18,
    layerwise_scale_factors=((1, 2, 2), 2, 2),
    upsample_factors=(4, 8, 8),
    bitrate_range=0.3,
    lowest_bitrate=0.1,
    bits_per_group=8,
)

CONFIGS = {
    c.name: c
    for c in (
        CIFAR, KODAK, KODAK_MINI, AUDIO, AUDIO_MINI, VIDEO, PROTEIN,
        TINY, TINY_PATCH, TINY_AUDIO, TINY_VIDEO,
    )
}


def get_config(name: str) -> ModalityConfig:
    return CONFIGS[name]
