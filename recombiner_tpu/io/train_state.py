"""Persistent prior-training state: resumable EM across process restarts.

The reference checkpoints only the *prior artifact* every 10 EM iterations
(main_prior_training.py:175,283-341) — a crash mid-EM loses the per-row
posteriors and the coordinate-ascent position. Here the full PriorState
(posteriors + shared mappings), the M-step Priors, the kl_beta controller
value and the EM iteration counter snapshot to one flat npz, and em_train
re-enters from them exactly (same pytree structure, reconstructed from the
config's template).

Motivation beyond crash safety: the remote TPU tunnel in this environment
has twice wedged processes ~50 minutes in (docs/rd_full_video_wedge.log);
chunked, resumable phases keep every process under that horizon.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recombiner_tpu.config import ModalityConfig
from recombiner_tpu.io.atomic import SnapshotRejected, atomic_savez
from recombiner_tpu.parallel.launch import fetch_global
from recombiner_tpu.priors.trainer import (
    PriorState,
    Priors,
    init_prior_state,
    init_priors,
)

STATE_VERSION = 2


def save_train_state(
    path: str,
    state: PriorState,
    priors: Priors,
    kl_beta: float,
    em_iter: int,
    controller: dict | None = None,
    schedule_total: int | None = None,
) -> None:
    """``controller`` is em_train's rate-controller state dict
    (aim/in_window/seen_above) and ``schedule_total`` the FULL planned EM
    schedule length; both persist so a babysit crash-relaunch resumes the
    closed-loop rate control where it left off instead of resetting aim to
    1.0 (reverting the KL window to the uncontrolled base) and re-anchoring
    the 0.25/0.9 schedule fractions to the remaining iterations (ADVICE r3,
    medium)."""
    arrays = {}
    for name, tree in (("state", state), ("priors", priors)):
        leaves = jax.tree_util.tree_leaves(tree)
        for i, leaf in enumerate(leaves):
            arrays[f"{name}/{i}"] = fetch_global(leaf)
    header = {
        "version": STATE_VERSION,
        "kl_beta": float(kl_beta),
        "em_iter": int(em_iter),
        "train_size": int(jax.tree_util.tree_leaves(state)[0].shape[0]),
    }
    if controller is not None:
        header["controller"] = {
            "aim": float(controller.get("aim", 1.0)),
            "in_window": bool(controller.get("in_window", False)),
            "seen_above": bool(controller.get("seen_above", False)),
        }
    if schedule_total is not None:
        header["schedule_total"] = int(schedule_total)
    arrays["__header__"] = np.frombuffer(json.dumps(header).encode(), np.uint8)
    atomic_savez(path, arrays)


def load_train_state(
    path: str, cfg: ModalityConfig
) -> Tuple[PriorState, Priors, float, int, dict]:
    """Returns (state, priors, kl_beta, em_iters_done, extra) with extra =
    {"controller": dict | None, "schedule_total": int | None} (both None for
    version-1 snapshots, which predate controller persistence)."""
    z = np.load(path if str(path).endswith(".npz") else path + ".npz")
    header = json.loads(bytes(z["__header__"]).decode())
    if header["version"] > STATE_VERSION:
        raise SnapshotRejected(
            f"train state version {header['version']} unsupported"
        )

    # pytree structure is a pure function of (cfg, train_size): rebuild the
    # template and pour the stored leaves back in
    template_state = init_prior_state(
        jax.random.key(0), cfg, header["train_size"]
    )
    template_priors = init_priors(cfg)

    def refill(name: str, template):
        treedef = jax.tree_util.tree_structure(template)
        n = len(jax.tree_util.tree_leaves(template))
        leaves = [jnp.asarray(z[f"{name}/{i}"]) for i in range(n)]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    return (
        refill("state", template_state),
        refill("priors", template_priors),
        float(header["kl_beta"]),
        int(header["em_iter"]),
        {
            "controller": header.get("controller"),
            "schedule_total": header.get("schedule_total"),
        },
    )
