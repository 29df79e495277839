"""Build a versioned PriorArtifact from a trained PriorState.

Mirrors the checkpoint-time computation in main_prior_training.py:186-341:
training-average log scales, KL-based groupings per level, priors in param
order.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import numpy as np

from recombiner_tpu.config import ModalityConfig
from recombiner_tpu.io.checkpoint import LevelArtifact, PriorArtifact
from recombiner_tpu.models.gaussian import scale_transform
from recombiner_tpu.priors.grouping import grouping_from_posteriors
from recombiner_tpu.priors.trainer import Priors, PriorState

# per level: (q_loc, q_log_scale_raw, p_loc, p_scale), all host numpy,
# rows leading on the q mats
LevelMats = Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]


def _level_raw_mats(
    state: PriorState, priors: Priors, cfg: ModalityConfig
) -> Dict[str, LevelMats]:
    """Fetch + assemble the per-level posterior/prior matrices the grouping
    runs on. Level 1 ("w") is INR weight latents + flattened LPE, jointly
    grouped (main_prior_training.py:198-212). Multi-host safe: global arrays
    are assembled on every host first (np.asarray raises on non-addressable
    shards)."""
    from recombiner_tpu.parallel.launch import fetch_global

    state = jax.tree_util.tree_map(fetch_global, state)
    priors = jax.tree_util.tree_map(fetch_global, priors)
    R = state.w.loc.shape[0]

    out: Dict[str, LevelMats] = {
        "w": (
            np.concatenate(
                [np.asarray(state.w.loc), np.asarray(state.lpe.loc).reshape(R, -1)], -1
            ),
            np.concatenate(
                [
                    np.asarray(state.w.log_scale),
                    np.asarray(state.lpe.log_scale).reshape(R, -1),
                ],
                -1,
            ),
            np.concatenate(
                [np.asarray(priors.w.loc), np.asarray(priors.lpe.loc).reshape(-1)]
            ),
            np.concatenate(
                [np.asarray(priors.w.scale), np.asarray(priors.lpe.scale).reshape(-1)]
            ),
        )
    }
    if cfg.patch:
        for name, g, pg in (("h", state.h, priors.h), ("hh", state.hh, priors.hh)):
            out[name] = (
                np.asarray(g.loc),
                np.asarray(g.log_scale),
                np.asarray(pg.loc),
                np.asarray(pg.scale),
            )
    return out


def level_posterior_mats(
    state: PriorState, priors: Priors, cfg: ModalityConfig
) -> Dict[str, LevelMats]:
    """Per-level (q_loc, q_scale, p_loc, p_scale) exactly as
    grouping_from_posteriors consumes them — the shared input of
    build_prior_artifact and the rate-control probe (realized_bitrate), so
    the probe's group counts match the built artifact bit-for-bit."""
    return {
        name: (ql, np.asarray(scale_transform(qr)), pl, ps)
        for name, (ql, qr, pl, ps) in _level_raw_mats(state, priors, cfg).items()
    }


def build_prior_artifact(
    state: PriorState,
    priors: Priors,
    kl_beta: float,
    cfg: ModalityConfig,
    codebook_seed: int = 42,
) -> PriorArtifact:
    raw = _level_raw_mats(state, priors, cfg)

    def level(mats: LevelMats) -> LevelArtifact:
        q_loc, q_raw, p_loc, p_scale = mats
        return LevelArtifact(
            p_loc=p_loc,
            p_scale=p_scale,
            avg_log_scale=q_raw.mean(0),
            grouping=grouping_from_posteriors(
                q_loc, np.asarray(scale_transform(q_raw)), p_loc, p_scale,
                max_bits=cfg.bits_per_group,
            ),
        )

    from recombiner_tpu.parallel.launch import fetch_global

    state = jax.tree_util.tree_map(fetch_global, state)
    return PriorArtifact(
        config=cfg,
        kl_beta=float(kl_beta),
        w=level(raw["w"]),
        h=level(raw["h"]) if cfg.patch else None,
        hh=level(raw["hh"]) if cfg.patch else None,
        A=[np.asarray(a) for a in state.A],
        up={k: {"w": np.asarray(v["w"]), "b": np.asarray(v["b"])} for k, v in state.up.items()},
        codebook_seed=codebook_seed,
    )
