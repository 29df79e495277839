"""Persistent encode state: resumable compression across process restarts.

The reference can only resume within a live process (its ``*_compressed_num``
counters, test_model.py:700-803); a crash loses hours of encoding. Here the
full CodecState (posteriors, freeze masks, transmitted indices, betas) is a
flat npz snapshot; ``compress`` can be re-entered from it and will skip
already-coded groups (its group selection masks compressed groups).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from recombiner_tpu.coding.encoder import CodecState, LevelState
from recombiner_tpu.io.atomic import SnapshotRejected, atomic_savez
from recombiner_tpu.models.gaussian import Gaussian

STATE_VERSION = 2

_FIELDS = ("frozen_mask", "frozen_val", "kl_beta", "compressed", "indices")


def save_encode_state(
    path: str,
    state: CodecState,
    *,
    extra: Optional[dict] = None,
    opt_leaves: Optional[list] = None,
) -> None:
    """``opt_leaves``: flattened optimizer-state arrays (jax.tree_util leaf
    order of optax.adam's init over the trainables) — saved during phase-1
    so a mid-optimization resume continues the same Adam trajectory."""
    arrays = {}
    levels = []
    for name in ("w", "h", "hh"):
        ls = getattr(state, name)
        if ls is None:
            continue
        levels.append(name)
        # fetch_global: row-sharded multi-host arrays are non-addressable
        # and np.asarray would raise (parallel/launch.py)
        from recombiner_tpu.parallel.launch import fetch_global

        arrays[f"{name}/loc"] = fetch_global(ls.q.loc)
        arrays[f"{name}/log_scale"] = fetch_global(ls.q.log_scale)
        for f in _FIELDS:
            arrays[f"{name}/{f}"] = fetch_global(getattr(ls, f))
    if opt_leaves is not None:
        from recombiner_tpu.parallel.launch import fetch_global

        for i, leaf in enumerate(opt_leaves):
            arrays[f"__opt__/{i}"] = fetch_global(leaf)
    header = {
        "version": STATE_VERSION,
        "levels": levels,
        "n_opt_leaves": 0 if opt_leaves is None else len(opt_leaves),
        **(extra or {}),
    }
    arrays["__header__"] = np.frombuffer(json.dumps(header).encode(), np.uint8)
    # atomic: snapshot writers get SIGKILLed by stall watchdogs; a torn npz
    # would crash-loop every resume (io/atomic.py)
    atomic_savez(path, arrays)


def load_encode_state_full(path: str, expect_fingerprint=None):
    """-> (CodecState, header dict, opt_leaves list-or-None).

    ``expect_fingerprint``: the current prior artifact's
    io.checkpoint.prior_fingerprint — a str, or a collection of acceptable
    strs (io.checkpoint.accepted_fingerprints includes the pre-round-3
    legacy formula so old snapshots stay resumable). A snapshot written
    under a different prior is refused (its frozen samples/indices index
    the OLD codebooks — resuming it would silently corrupt the bitstream)."""
    z = np.load(path if str(path).endswith(".npz") else path + ".npz")
    header = json.loads(bytes(z["__header__"]).decode())
    if header["version"] > STATE_VERSION:
        raise SnapshotRejected(
            f"encode state version {header['version']} unsupported"
        )
    snap_fp = header.get("prior_fingerprint")
    # normalize ANY collection (set/generator/list) to a tuple: membership on
    # a generator would consume it and accepted[0] on a set raises TypeError,
    # turning the intended FingerprintMismatch into a crash (ADVICE r3)
    accepted = (
        None
        if expect_fingerprint is None
        else (expect_fingerprint,)
        if isinstance(expect_fingerprint, str)
        else tuple(expect_fingerprint)
    )
    if accepted is not None and snap_fp is not None and snap_fp not in accepted:
        raise FingerprintMismatch(
            f"encode snapshot {path} was written under prior {snap_fp}, current "
            f"prior accepts {list(accepted)}; refusing to resume (delete the "
            "snapshot or reload the matching prior)"
        )

    def level(name: str) -> Optional[LevelState]:
        if name not in header["levels"]:
            return None
        kw = {f: jnp.asarray(z[f"{name}/{f}"]) for f in _FIELDS}
        return LevelState(
            q=Gaussian(
                loc=jnp.asarray(z[f"{name}/loc"]),
                log_scale=jnp.asarray(z[f"{name}/log_scale"]),
            ),
            **kw,
        )

    n_opt = int(header.get("n_opt_leaves", 0))
    opt_leaves = (
        [jnp.asarray(z[f"__opt__/{i}"]) for i in range(n_opt)] if n_opt else None
    )
    return CodecState(w=level("w"), h=level("h"), hh=level("hh")), header, opt_leaves


class FingerprintMismatch(SnapshotRejected):
    """Snapshot belongs to a different prior artifact; never quarantined by
    io.atomic.load_snapshot_or_none (it is not corruption)."""


def load_encode_state(path: str) -> CodecState:
    return load_encode_state_full(path)[0]
