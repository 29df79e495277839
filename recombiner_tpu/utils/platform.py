"""In-process platform selection for CLI entry points.

Measured pathology on this image (2026-08-17): with ``JAX_PLATFORMS=cpu``
set as an ENVIRONMENT variable, the first host transfer of any jax array
(``np.asarray``/``device_get``) blocks for 1-5 minutes — the sitecustomize-
registered axon TPU plugin still interposes on the transfer path. Setting
the platform IN-PROCESS via ``jax.config.update("jax_platforms", ...)``
(what tests/conftest.py does) is clean.

CLIs therefore honor ``RECOMBINER_TPU_PLATFORM=cpu`` (or any platform
string) by applying the config update before the first jax operation:

    RECOMBINER_TPU_PLATFORM=cpu python -m recombiner_tpu.cli.rd_sweep ...
"""

from __future__ import annotations

import os


def apply_platform_override() -> None:
    """Apply RECOMBINER_TPU_PLATFORM via jax.config (no-op when unset).

    Must run before the first jax operation of the process; importing jax
    is fine (this image imports it at interpreter start anyway)."""
    platform = os.environ.get("RECOMBINER_TPU_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def apply_matmul_precision(precision: str | None) -> None:
    """Set jax's default matmul precision process-wide (no-op when None).

    TPU f32 matmuls default to single bf16-pass multiplication (the
    accumulator is f32 regardless). Measured head-to-head vs the torch-CPU
    reference at the full encode schedule (docs/HEAD_TO_HEAD.md): that
    rounding costs ~0.35 dB in the progressive-coding phase — finetuning
    against frozen f32 codebook samples through sin(30x) is the one
    precision-sensitive regime in this framework (prior training and
    phase-1 optimization measure no effect). ``"highest"`` (exact f32,
    6-pass) recovers it at ~2.8x encode wall; the decoded bitstream format
    is precision-independent either way."""
    if precision:
        import jax

        jax.config.update("jax_default_matmul_precision", precision)


#: CLI choices for --precision. The DEFAULT (None/'default') is already the
#: measured RD-parity operating point: optimization/finetune matmuls at the
#: TPU-native bf16-pass rate, while the two precision-sensitive surfaces —
#: A* candidate scoring (coding/encoder.py::encode_step_level) and decode
#: rendering (encoder.decode) — run exact f32 unconditionally. The round-3
#: precision ladder (docs/HEAD_TO_HEAD.md) measured that with those two
#: exact, finetune precision is RD-neutral (42.25 dB default-finetunes vs
#: 42.13/42.29 highest/high-finetunes vs 42.27 global-f32, same seed), so
#: the parity point costs ~1.0x default encode wall. 'scoped'/'scoped_high'
#: additionally raise the coding-phase finetune einsums (the round-3 ladder
#: knobs); 'high'/'highest' raise everything process-globally.
PRECISION_CHOICES = ("scoped", "scoped_high", "default", "high", "highest")


def apply_precision_mode(precision: str | None) -> str | None:
    """Apply a --precision flag; returns the coding-phase precision to pass
    to ``compress(coding_precision=...)``.

    - None: nothing raised — compress() then applies its per-modality auto
      (unrounded-PSNR/audio configs get 'highest' coding finetunes so the
      exact-f32 canonical decode renders the function the finetunes
      optimized — the round-5 co-adaptation fix, docs/HEAD_TO_HEAD.md).
    - 'default': the explicit ambient-bf16 sentinel — compress() skips the
      per-modality auto (ablation escape hatch).
    - 'scoped': no global change; coding finetunes at 'highest' (6-pass).
    - 'scoped_high': no global change; coding finetunes at 'high' (3-pass).
    - 'high' / 'highest': process-global default_matmul_precision (the
      round-2 knob); coding_precision=None inherits it.
    """
    if precision is None:
        return None
    if precision == "default":
        return "default"
    if precision == "scoped":
        return "highest"
    if precision == "scoped_high":
        return "high"
    apply_matmul_precision(precision)
    return None
