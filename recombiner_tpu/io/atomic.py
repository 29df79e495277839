"""Crash-safe snapshot IO.

Snapshot writers here get killed mid-write as a matter of course (stall
watchdogs SIGKILL wedged TPU clients — scripts/babysit.py), and a truncated
npz then crash-loops every subsequent resume (observed 2026-08-17: a
half-written train_state npz failed BadZipFile on four consecutive
relaunches). Writes go to a temp file in the same directory and os.replace
into place — readers see the old snapshot or the new one, never a torn one.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple, TypeVar

import numpy as np

T = TypeVar("T")


class SnapshotRejected(ValueError):
    """A snapshot that is VALID on disk but must not be used (newer format
    version, wrong prior fingerprint). Never quarantined by
    load_snapshot_or_none — quarantining would silently restart hours of
    work over a condition the caller needs to see."""


def _npz_path(path: str) -> str:
    return path if str(path).endswith(".npz") else str(path) + ".npz"


def atomic_savez(path: str, arrays: dict) -> None:
    """np.savez to `path` (npz suffix added like np.savez) atomically."""
    final = _npz_path(path)
    parent = os.path.dirname(final)
    if parent:
        os.makedirs(parent, exist_ok=True)
    tmp = final + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)


def load_snapshot_or_none(
    path: str, loader: Callable[[str], T]
) -> Tuple[Optional[T], Optional[str]]:
    """Run `loader(path)` if the snapshot exists; (None, reason) when absent
    or unreadable. A corrupt snapshot (pre-atomic writers, torn disks) is
    reported, renamed out of the way so the next snapshot can land, and
    treated as absent — losing ≤10 iterations/groups of rework beats a
    crash-loop."""
    import json
    import zipfile
    import zlib

    final = _npz_path(path)
    if not os.path.exists(final):
        return None, None
    try:
        return loader(path), None
    except (
        zipfile.BadZipFile,
        EOFError,
        KeyError,
        json.JSONDecodeError,  # torn __header__ json
        zlib.error,  # truncated deflate stream inside the zip
        ValueError,  # numpy "cannot reshape"/"truncated" on a torn member
    ) as e:
        # corruption-shaped only (torn/truncated npz, missing members).
        # SnapshotRejected (version/fingerprint mismatches — valid files the
        # caller must see) and anything else (transient memory errors)
        # re-raise: quarantining a VALID snapshot silently restarts hours
        # of work.
        if isinstance(e, SnapshotRejected):
            raise
        if type(e) is ValueError and _npz_intact(final):
            # bare ValueError from a loader over a STRUCTURALLY SOUND npz is
            # a code/geometry bug, not a torn file — quarantining it would
            # destroy the evidence and silently restart hours of work
            raise
        quarantine = final + ".corrupt"
        try:
            os.replace(final, quarantine)
        except OSError:
            pass
        return None, f"snapshot {final} unreadable ({e!r}); moved to {quarantine}"


def _npz_intact(final: str) -> bool:
    """True when the npz's zip structure AND every member's deflate stream +
    npy payload read back cleanly — i.e. a loader error over this file is
    the loader's fault, not torn-file corruption."""
    import zipfile

    try:
        with zipfile.ZipFile(final) as zf:
            if zf.testzip() is not None:
                return False
        with np.load(final, allow_pickle=False) as z:
            for k in z.files:
                z[k]
        return True
    except Exception:
        return False
