"""Build a versioned PriorArtifact from a trained PriorState.

Mirrors the checkpoint-time computation in main_prior_training.py:186-341:
training-average log scales, KL-based groupings per level, priors in param
order.
"""

from __future__ import annotations

import jax
import numpy as np

from recombiner_tpu.config import ModalityConfig
from recombiner_tpu.io.checkpoint import LevelArtifact, PriorArtifact
from recombiner_tpu.models.gaussian import scale_transform
from recombiner_tpu.priors.grouping import grouping_from_posteriors
from recombiner_tpu.priors.trainer import Priors, PriorState


def build_prior_artifact(
    state: PriorState,
    priors: Priors,
    kl_beta: float,
    cfg: ModalityConfig,
    codebook_seed: int = 42,
) -> PriorArtifact:
    # multi-host safe: assemble row-sharded posteriors on every host first
    # (np.asarray raises on non-addressable global arrays)
    from recombiner_tpu.parallel.launch import fetch_global

    state = jax.tree_util.tree_map(fetch_global, state)
    priors = jax.tree_util.tree_map(fetch_global, priors)
    R = state.w.loc.shape[0]

    # ---- level 1: INR weight latents + flattened LPE, jointly grouped
    # (main_prior_training.py:198-212)
    q_loc = np.concatenate(
        [np.asarray(state.w.loc), np.asarray(state.lpe.loc).reshape(R, -1)], -1
    )
    q_raw = np.concatenate(
        [np.asarray(state.w.log_scale), np.asarray(state.lpe.log_scale).reshape(R, -1)], -1
    )
    q_scale = np.asarray(scale_transform(q_raw))
    p_loc = np.concatenate(
        [np.asarray(priors.w.loc), np.asarray(priors.lpe.loc).reshape(-1)]
    )
    p_scale = np.concatenate(
        [np.asarray(priors.w.scale), np.asarray(priors.lpe.scale).reshape(-1)]
    )
    w_level = LevelArtifact(
        p_loc=p_loc,
        p_scale=p_scale,
        avg_log_scale=q_raw.mean(0),
        grouping=grouping_from_posteriors(
            q_loc, q_scale, p_loc, p_scale, max_bits=cfg.bits_per_group
        ),
    )

    h_level = hh_level = None
    if cfg.patch:
        def level(g, pg):
            ql = np.asarray(g.loc)
            qr = np.asarray(g.log_scale)
            pl = np.asarray(pg.loc)
            ps = np.asarray(pg.scale)
            return LevelArtifact(
                p_loc=pl,
                p_scale=ps,
                avg_log_scale=qr.mean(0),
                grouping=grouping_from_posteriors(
                    ql, np.asarray(scale_transform(qr)), pl, ps,
                    max_bits=cfg.bits_per_group,
                ),
            )

        h_level = level(state.h, priors.h)
        hh_level = level(state.hh, priors.hh)

    return PriorArtifact(
        config=cfg,
        kl_beta=float(kl_beta),
        w=w_level,
        h=h_level,
        hh=hh_level,
        A=[np.asarray(a) for a in state.A],
        up={k: {"w": np.asarray(v["w"]), "b": np.asarray(v["b"])} for k, v in state.up.items()},
        codebook_seed=codebook_seed,
    )
