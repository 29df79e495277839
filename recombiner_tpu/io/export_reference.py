"""Export a PriorArtifact to the reference's checkpoint format (the 8-dump
pickle main_prior_training.py:283-341 writes and main_compression.py:37-45
consumes) — the inverse of io/convert_reference.py.

Lets a prior trained with this framework be used by the original PyTorch
implementation (or by any tooling built around its pickle format). Requires
torch and the reference package on sys.path (pass ``reference_path``) to
instantiate its nn.Module classes for the two module dumps.

Mapping notes (mirroring convert_reference):
- priors are stored in PARAM order and natural-scale form, exactly as our
  artifact holds them;
- groupings re-emit the reference 8-tuple verbatim from our Grouping;
- LinearTransform matrices carry over unchanged (both conventions apply
  ``latent @ A``); conv weights convert from our channel-last (*k, in, out)
  back to torch's (out, in, *k).
"""

from __future__ import annotations

import pickle
import sys
from typing import Optional

import numpy as np

from recombiner_tpu.io.checkpoint import LevelArtifact, PriorArtifact
from recombiner_tpu.priors.grouping import Grouping


def _grouping_tuple(g: Grouping):
    """Our Grouping -> the reference's 8-tuple (prior_model.py:273-299)."""
    return (
        np.asarray(g.group_idx),
        np.asarray(g.group_start),
        np.asarray(g.group_end),
        np.asarray(g.group2param),
        np.asarray(g.param2group),
        int(g.n_groups),
        np.asarray(g.group_kls),
        np.asarray(g.weights),
    )


def _level_dumps(torch, lv: Optional[LevelArtifact], kl_beta: float):
    """(grouping_tuple, (p_loc, p_scale, kl_beta, avg_log_scale)) for one
    level; the reference stores (None, ...) rows for absent levels."""
    if lv is None:
        return (None,) * 8, (None, None, kl_beta, None)
    return (
        _grouping_tuple(lv.grouping),
        (
            torch.from_numpy(np.asarray(lv.p_loc, np.float32)),
            torch.from_numpy(np.asarray(lv.p_scale, np.float32)),
            kl_beta,
            torch.from_numpy(np.asarray(lv.avg_log_scale, np.float32)),
        ),
    )


def export_reference_checkpoint(
    artifact: PriorArtifact,
    pickle_path: str,
    reference_path: Optional[str] = None,
) -> str:
    import torch

    if reference_path and reference_path not in sys.path:
        sys.path.insert(0, reference_path)
    try:
        from prior_model import LinearTransform, Upsample
    finally:
        if reference_path and reference_path in sys.path:
            sys.path.remove(reference_path)

    cfg = artifact.config

    lt = LinearTransform(list(cfg.net_dims))
    with torch.no_grad():
        for i, a in enumerate(artifact.A):
            lt.A[i].data = torch.from_numpy(np.asarray(a, np.float32))

    # reference signature: Upsample(kernel_dim, paddings,
    # layerwise_scale_factors) — convNd 128->64 (k5), 64->64 (k3), 64->16
    # (k3) (prior_model.py:23-45); our conv params are channel-last
    # (*k, in, out)
    up = Upsample(cfg.data_dim, list(cfg.paddings), list(cfg.layerwise_scale_factors))
    with torch.no_grad():
        for i in range(3):
            conv = getattr(up, f"conv{i + 1}")
            w = np.asarray(artifact.up[f"conv{i}"]["w"], np.float32)
            k_axes = list(range(w.ndim - 2))
            # (*k, in, out) -> (out, in, *k)
            conv.weight.data = torch.from_numpy(
                np.transpose(w, [w.ndim - 1, w.ndim - 2] + k_axes).copy()
            )
            conv.bias.data = torch.from_numpy(
                np.asarray(artifact.up[f"conv{i}"]["b"], np.float32)
            )

    g_w, p_w = _level_dumps(torch, artifact.w, float(artifact.kl_beta))
    g_h, p_h = _level_dumps(torch, artifact.h, float(artifact.kl_beta))
    g_hh, p_hh = _level_dumps(torch, artifact.hh, float(artifact.kl_beta))

    with open(pickle_path, "wb") as f:  # dump order: main_prior_training.py:283-341
        pickle.dump(g_w, f)
        pickle.dump(p_w, f)
        pickle.dump(g_h, f)
        pickle.dump(p_h, f)
        pickle.dump(g_hh, f)
        pickle.dump(p_hh, f)
        pickle.dump(lt, f)
        pickle.dump(up, f)
    return pickle_path
