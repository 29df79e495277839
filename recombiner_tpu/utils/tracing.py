"""Tracing / profiling / step-timing: the observability layer the reference
lacks (SURVEY §5.1 — it has only tqdm bars and prints).

- ``StepTimer``: per-phase wall-clock accounting with true device sync.
- ``trace``: context manager around ``jax.profiler`` for on-device traces
  (viewable in TensorBoard / Perfetto).
- ``log_jsonl``: structured metric records, one JSON object per line.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional

import jax

from recombiner_tpu.utils.timing import sync


class StepTimer:
    """Accumulates wall-clock per named phase; ``summary()`` gives totals,
    counts, and rates."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                sync(sync_on)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {
            k: {
                "total_s": round(self.totals[k], 4),
                "count": self.counts[k],
                "mean_s": round(self.totals[k] / max(self.counts[k], 1), 5),
            }
            for k in self.totals
        }


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace context; no-op when logdir is None (or when the
    backend doesn't support profiling, e.g. tunneled devices)."""
    if logdir is None:
        yield
        return
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def log_jsonl(path: str, record: dict) -> None:
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")
