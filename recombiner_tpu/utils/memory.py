"""HBM footprint estimates for encode-time planning.

An out-of-memory in the S-sample ELBO backward does not raise on the remote
TPU worker — it crashes it and wedges the device grant (observed on a kodak-
scale encode, docs/RD_FULL.md). The CLIs therefore estimate the stored-
activation footprint up front and default to recompute-in-backward
(jax.checkpoint, ~1.3x epoch cost) when it would not fit.
"""

from __future__ import annotations

from recombiner_tpu.config import ModalityConfig

# ~7 live activation arrays of (rows*S, pixels, 32) f32 through the INR/PE
# chain, measured against the kodak OOM (384 rows, S=5 > 16 GB chip)
_CHAIN_ARRAYS = 7
_REMAT_THRESHOLD_GB = 8.0


def stored_activation_gb(
    cfg: ModalityConfig, n_rows: int, sample_size: int, n_devices: int = 1
) -> float:
    """Estimated stored-activation HBM per device for one ELBO backward.

    Patch mode adds the stitched-canvas positional-encoding buffers
    (models/mappings.py lpe_to_pe upsamples the FULL datapoint canvas before
    re-splitting): ~4 live arrays of (n_data*S, canvas_pixels, 16) f32.
    These were the difference between the formula saying 7 GB and the
    kodak-384 encode actually crashing a 16 GB chip (docs/RD_FULL.md).
    """
    rows_per_device = n_rows * sample_size / max(n_devices, 1)
    gb = _CHAIN_ARRAYS * rows_per_device * cfg.n_pixels * 32 * 4 / 1e9
    if cfg.patch:
        canvas_px = cfg.n_pixels * cfg.patches_per_datapoint
        data_per_device = rows_per_device / cfg.patches_per_datapoint
        gb += 4 * data_per_device * canvas_px * 16 * 4 / 1e9
    return gb


def resolve_remat(
    remat: bool | None,
    cfg: ModalityConfig,
    n_rows: int,
    sample_size: int,
    n_devices: int = 1,
) -> bool:
    """Tri-state --remat resolution: None = auto (on above the threshold)."""
    est = stored_activation_gb(cfg, n_rows, sample_size, n_devices)
    if remat is None:
        on = est > _REMAT_THRESHOLD_GB
        if on:
            print(
                f"~{est:.1f} GB of stored activations per device: enabling "
                "--remat (override with --no-remat)",
                flush=True,
            )
        return on
    if est > _REMAT_THRESHOLD_GB and not remat:
        print(
            f"WARNING: ~{est:.1f} GB of stored activations per device with "
            "--no-remat; expect an HBM OOM (crashes the TPU worker)",
            flush=True,
        )
    return remat
