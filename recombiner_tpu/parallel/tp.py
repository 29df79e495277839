"""Optional tensor parallelism: weight-sharded linear-transform matmuls.

SURVEY §2.2's TP row: the only weight matrices worth sharding are the
per-layer linear transforms A_l (1056² x3 + out-layer, prior_model.py:16-21
— everything else is per-datapoint state that shards over the DATA axis).
This module shards each A_l's OUTPUT columns over a "model" mesh axis with
shard_map: every device holds the full latent activations (they are small:
(R·S, d_l)) and a 1/n column slice of A_l, computes its local (R·S, d_l/n)
product on the MXU, and the results are reassembled with one tiled
all-gather over ICI.

When to use it: A is only ~3.4 M params, so TP is NOT a throughput play at
reference scale (see COVERAGE.md §2.2 for the measured re-scope) — it exists
for the memory corner where (train_size, 3779) posteriors already fill HBM
and replicating A + its Adam state + grads on every chip is the marginal
allocation that no longer fits.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recombiner_tpu.config import ModalityConfig
from recombiner_tpu.models.inr import latent_to_weights, slice_layer

MODEL_AXIS = "model"


def make_mesh_tp(dp: int, tp: int) -> Mesh:
    """(data, model) mesh: posterior rows over ``dp`` devices, A columns
    over ``tp``."""
    import numpy as np

    devices = np.array(jax.devices()[: dp * tp]).reshape(dp, tp)
    from recombiner_tpu.parallel.mesh import DATA_AXIS

    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def shard_A(A: Sequence[jax.Array], mesh: Mesh) -> List[jax.Array]:
    """Place each A_l with its output (second) dim sharded over MODEL_AXIS.

    The output layer's matrix (e.g. 99² for cifar, out_dim*(hidden+1) squared)
    is usually not divisible by the TP degree — and is three orders of
    magnitude smaller than the hidden layers' 1056² — so it replicates."""
    tp = mesh.shape[MODEL_AXIS]
    sh = NamedSharding(mesh, P(None, MODEL_AXIS))
    rep = NamedSharding(mesh, P())
    return [jax.device_put(a, sh if a.shape[1] % tp == 0 else rep) for a in A]


def tp_matmul(lat: jax.Array, A_l: jax.Array, mesh: Mesh) -> jax.Array:
    """(..., d) @ (d, d) with A_l column-sharded over MODEL_AXIS.

    Activations replicate along the model axis (their leading axes may carry
    any other mesh axes — shard_map only partitions what the specs name);
    each device computes the full input against its column shard and one
    tiled all_gather reassembles the outputs.
    """

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, MODEL_AXIS)),
        out_specs=P(),
        # the tiled all_gather makes the output bitwise-equal on every model
        # shard, but VMA inference can't prove value equality — vouch for it
        check_vma=False,
    )
    def f(lat_b, A_b):
        y = jnp.einsum("...d,de->...e", lat_b, A_b, preferred_element_type=jnp.float32)
        return jax.lax.all_gather(y, MODEL_AXIS, axis=y.ndim - 1, tiled=True)

    return f(lat, A_l)


def tp_inr_forward(
    x: jax.Array,
    h_w: jax.Array,
    A: Sequence[jax.Array],
    cfg: ModalityConfig,
    mesh: Mesh,
) -> jax.Array:
    """models/inr.py::inr_forward with every latent @ A_l matmul sharded over
    the model axis. Numerically identical to the unsharded forward (pinned in
    test_parallel.py) — the per-layer x @ W + b stays local because W is a
    per-(row, sample) tensor, not a shared weight."""
    dims = cfg.net_dims
    cum = cfg.cum_param_sizes
    tp = mesh.shape[MODEL_AXIS]
    for idx in range(cfg.n_layers):
        lat = slice_layer(h_w, idx, cum)
        if A[idx].shape[1] % tp == 0:
            lat = tp_matmul(lat, A[idx], mesh)
        else:  # replicated small (output-layer) matrix
            lat = jnp.einsum(
                "...d,de->...e", lat, A[idx], preferred_element_type=jnp.float32
            )
        w, b = latent_to_weights(lat, dims[idx], dims[idx + 1])
        x = (
            jnp.einsum("rspi,rsio->rspo", x, w, preferred_element_type=jnp.float32)
            + b[:, :, None, :]
        )
        if idx != cfg.n_layers - 1:
            x = jnp.sin(cfg.w0 * x)
    return x
