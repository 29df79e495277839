"""Convert a reference-format prior checkpoint (the 8-dump pickle written by
main_prior_training.py:283-341) into our versioned PriorArtifact.

Lets users of the original PyTorch implementation carry their trained priors
into this framework. Requires torch to unpickle, and the reference package on
sys.path to resolve its nn.Module classes (pass ``reference_path``).

Mapping notes:
- the pickle stores priors in PARAM order and scale in natural form; our
  artifact stores the same (no re-parameterization needed — the encoder does
  the group reordering itself, like main_compression.py:47-73).
- conv weights convert from torch's (out, in, *k) to our channel-last
  (*k, in, out); LinearTransform matrices carry over unchanged (both apply
  ``latent @ A``).
- the pickle's groupings are reused verbatim, so bit allocation matches what
  the reference would produce from the same checkpoint.
"""

from __future__ import annotations

import pickle
import sys
from typing import Optional

import numpy as np

from recombiner_tpu.config import ModalityConfig, get_config
from recombiner_tpu.io.checkpoint import LevelArtifact, PriorArtifact
from recombiner_tpu.priors.grouping import Grouping


def _grouping_from_tuple(t) -> Grouping:
    (group_idx, group_start, group_end, group2param, param2group,
     n_groups, group_kls, weights) = t
    return Grouping(
        n_groups=int(n_groups),
        group_start=np.asarray(group_start, np.int32),
        group_end=np.asarray(group_end, np.int32),
        group_idx=np.asarray(group_idx, np.int32),
        param2group=np.asarray(param2group, np.int32),
        group2param=np.asarray(group2param, np.int32),
        group_kls=np.asarray(group_kls, np.float64),
        weights=np.asarray(weights, np.float64),
    )


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def convert_reference_checkpoint(
    pickle_path: str,
    dataset: str,
    reference_path: Optional[str] = None,
    codebook_seed: int = 42,
) -> PriorArtifact:
    cfg: ModalityConfig = get_config(dataset)
    if reference_path and reference_path not in sys.path:
        sys.path.insert(0, reference_path)
    try:
        with open(pickle_path, "rb") as f:
            g1 = pickle.load(f)
            p_loc, p_scale, kl_beta, avg_log_scale = pickle.load(f)
            gh = pickle.load(f)
            h_p_loc, h_p_scale, _, h_avg_log_scale = pickle.load(f)
            ghh = pickle.load(f)
            hh_p_loc, hh_p_scale, _, hh_avg_log_scale = pickle.load(f)
            linear_transform = pickle.load(f)
            upsample_net = pickle.load(f)
    finally:
        if reference_path and reference_path in sys.path:
            sys.path.remove(reference_path)

    w = LevelArtifact(
        p_loc=_np(p_loc).astype(np.float32),
        p_scale=_np(p_scale).astype(np.float32),
        avg_log_scale=_np(avg_log_scale).astype(np.float32),
        grouping=_grouping_from_tuple(g1),
    )
    h = hh = None
    if cfg.patch:
        h = LevelArtifact(
            p_loc=_np(h_p_loc).astype(np.float32),
            p_scale=_np(h_p_scale).astype(np.float32),
            avg_log_scale=_np(h_avg_log_scale).astype(np.float32),
            grouping=_grouping_from_tuple(gh),
        )
        hh = LevelArtifact(
            p_loc=_np(hh_p_loc).astype(np.float32),
            p_scale=_np(hh_p_scale).astype(np.float32),
            avg_log_scale=_np(hh_avg_log_scale).astype(np.float32),
            grouping=_grouping_from_tuple(ghh),
        )

    A = [_np(a).astype(np.float32) for a in linear_transform.A]

    # torch convs: weight (out, in, *k), ours (*k, in, out)
    up = {}
    for i in range(3):
        conv = getattr(upsample_net, f"conv{i + 1}")
        wt = _np(conv.weight)
        k_axes = list(range(2, wt.ndim))
        up[f"conv{i}"] = {
            "w": np.transpose(wt, k_axes + [1, 0]).astype(np.float32),
            "b": _np(conv.bias).astype(np.float32),
        }

    return PriorArtifact(
        config=cfg,
        kl_beta=float(kl_beta),
        w=w,
        h=h,
        hh=hh,
        A=A,
        up=up,
        codebook_seed=codebook_seed,
    )
