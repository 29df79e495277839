"""Multi-host process bootstrap (DCN) for pod-scale runs.

The reference is strictly single-process (SURVEY §2.2: no torch.distributed,
no launcher anywhere); this framework's multi-host story is the standard JAX
process model: one Python process per host, `jax.distributed.initialize()`
wired over DCN, and the SAME GSPMD sharding annotations as single-host —
pjit sees the global device list, collectives ride ICI within a slice and
DCN across slices.

Opt-in via environment (so single-process behavior is byte-identical when
unset):

    RECOMBINER_TPU_MULTIHOST=1          # enable the initialize() call
    # optional explicit wiring (auto-detected on Cloud TPU pods):
    RECOMBINER_TPU_COORDINATOR=host0:8476
    RECOMBINER_TPU_NUM_PROCESSES=4
    RECOMBINER_TPU_PROCESS_ID=0

Launch recipe (one command per host, same binary):

    RECOMBINER_TPU_MULTIHOST=1 python -m recombiner_tpu.cli.train \
        --train_dir ... --dataset cifar --max_bitrate 2.0 --saving_dir out/

On Cloud TPU pods jax.distributed.initialize() discovers the coordinator
and process ids from the TPU metadata, so the three optional variables are
only needed on generic clusters. Real DCN cannot be exercised in this
repository's test environment (single host); tests cover that the code path
imports, is a no-op when disabled, and leaves single-process semantics
unchanged.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

_initialized = False


def multihost_enabled() -> bool:
    return os.environ.get("RECOMBINER_TPU_MULTIHOST", "0").lower() in ("1", "true", "yes")


def maybe_initialize_distributed() -> bool:
    """Idempotent, env-gated jax.distributed.initialize().

    Returns True iff the distributed runtime was (or already is) initialized
    by this call path. Single-process runs (the default) return False and
    touch nothing.
    """
    global _initialized
    if not multihost_enabled():
        return False
    if _initialized:
        return True

    kwargs = {}
    coord = os.environ.get("RECOMBINER_TPU_COORDINATOR")
    nproc = os.environ.get("RECOMBINER_TPU_NUM_PROCESSES")
    pid = os.environ.get("RECOMBINER_TPU_PROCESS_ID")
    if coord:
        kwargs["coordinator_address"] = coord
    if nproc:
        kwargs["num_processes"] = int(nproc)
    if pid:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return True


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """Host 0 does the artifact/bitstream writes; others skip."""
    return jax.process_index() == 0


def fetch_global(x) -> "np.ndarray":
    """Host copy of a possibly row-sharded global array, multi-host safe.

    Single-process this is np.asarray. In a multi-process run a row-sharded
    global jax.Array spans non-addressable devices and np.asarray raises —
    process_allgather assembles the full value on every host instead. Used
    by the encode loop's host-side reads (indices, distortion) and the
    artifact builder so the CLIs work under parallel/launch.py's recipe.
    """
    if isinstance(x, jax.Array) and jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(
            multihost_utils.process_allgather(x, tiled=True)
        )
    return np.asarray(x)


def shard_rows_global(x, mesh, spec: Optional[object] = None):
    """Multi-host-safe variant of mesh.shard_rows for HOST-LOCAL data.

    In a multi-host run each process holds only its shard of the training
    rows; jax.make_array_from_process_local_data assembles the global array
    without gathering everything onto one host. Single-process, this is
    exactly device_put with the row sharding.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from recombiner_tpu.parallel.mesh import DATA_AXIS

    sharding = NamedSharding(mesh, spec if spec is not None else P(DATA_AXIS))
    x = np.asarray(x)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x)
