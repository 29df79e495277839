"""Device mesh and sharding helpers for data-parallel training/encoding.

The reference is single-device (SURVEY §2.2); here data parallelism is a
first-class sharding annotation: posterior rows are sharded over a 1-D
``("data",)`` mesh, shared mappings (A, upsampler) and priors are replicated,
and GSPMD inserts the ICI all-reduces for shared-parameter gradients and the
M-step moments automatically.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
PIXEL_AXIS = "pixels"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"--n_devices {n_devices} requested but only {len(devices)} "
                f"devices are visible"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def make_mesh_2d(dp: int, sp: int) -> Mesh:
    """(data, pixels) mesh: rows sharded over ``dp`` devices, the coordinate
    grid (the framework's 'sequence' axis — SURVEY §2.2/§5.7) over ``sp``.

    Pixel-axis parallelism needs no bespoke code: the INR evaluation and MSE
    are pointwise/reductions in the pixel axis, so sharding X's pixel axis
    makes GSPMD shard the whole forward pass and psum the loss over ICI.
    """
    devices = np.array(jax.devices()[: dp * sp]).reshape(dp, sp)
    return Mesh(devices, (DATA_AXIS, PIXEL_AXIS))


def shard_data_and_pixels(X: jax.Array, mesh: Mesh) -> jax.Array:
    """Place (R, P, F) feature grids with rows over 'data' and the pixel axis
    over 'pixels'."""
    return jax.device_put(X, NamedSharding(mesh, P(DATA_AXIS, PIXEL_AXIS)))


def row_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _place(x, sharding) -> jax.Array:
    """device_put single-process; multi-process, build the global array from
    per-shard callbacks (device_put cannot target non-addressable devices).
    Assumes every process holds the full host value — true for everything
    this framework places (data loaded per host, codec/state built
    deterministically from the shared artifact)."""
    if jax.process_count() > 1:
        xv = np.asarray(x)
        return jax.make_array_from_callback(xv.shape, sharding, lambda idx: xv[idx])
    return jax.device_put(x, sharding)


def shard_rows(tree: Any, mesh: Mesh) -> Any:
    """Place every array leaf: shard the leading axis over the data mesh
    when divisible, replicate otherwise (e.g. tiny level-3 posteriors, priors,
    shared mappings)."""
    n = mesh.devices.size
    rs = row_sharding(mesh)
    rep = replicated(mesh)

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 0:
            return _place(x, rs)
        return _place(x, rep)

    return jax.tree_util.tree_map(place, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: _place(x, rep), tree)
