"""Timing helpers that actually synchronize.

On this machine's axon TPU tunnel, ``jax.block_until_ready`` returns before
device execution finishes; fetching bytes to the host (``device_get``) is the
only reliable sync. These helpers always force a real round trip.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def sync(tree) -> None:
    """Force completion of everything feeding ``tree`` (host round trip)."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    jax.device_get(jnp.ravel(leaf)[:1])


def time_fn(f: Callable, *args, iters: int = 10, warmup: int = 2, **kw) -> float:
    """Median-free steady-state seconds/call: chain ``iters`` calls, sync once,
    divide. Subtracts nothing — callers should use enough iters to amortize
    the ~25 ms sync overhead."""
    out = None
    for _ in range(warmup):
        out = f(*args, **kw)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args, **kw)
    sync(out)
    return (time.perf_counter() - t0) / iters
