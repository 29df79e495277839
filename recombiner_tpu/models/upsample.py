"""Hierarchical positional-encoding upsampler (1/2/3-D).

TPU-native re-design of the reference Upsample module (prior_model.py:23-59):
fixed topology latent_dim -> 64 -> 64 -> 16 with nearest-neighbour upsampling
before each conv. We use channel-LAST layout (XLA's preferred TPU layout) and
``lax.conv_general_dilated`` directly; parameters are a plain pytree so the
whole thing jits/shards without module machinery.

Topology per layer i: nearest-upsample(scale_i) -> conv(k_i, pad_i) -> leaky_relu
(no activation after the last conv). Kernels (5, 3, 3), paddings from config.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

ScaleFactor = Union[int, Tuple[int, ...]]

_KERNELS = (5, 3, 3)


def _conv_dim_numbers(data_dim: int):
    if data_dim == 1:
        return ("NWC", "WIO", "NWC")
    if data_dim == 2:
        return ("NHWC", "HWIO", "NHWC")
    if data_dim == 3:
        return ("NDHWC", "DHWIO", "NDHWC")
    raise ValueError(data_dim)


def init_upsample_params(
    key: jax.Array,
    data_dim: int,
    latent_dim: int = 128,
    hidden: int = 64,
    out: int = 16,
) -> Dict[str, Any]:
    """Initialize conv parameters.

    Uniform(-sqrt(k), sqrt(k)) with k = 1/(fan_in * prod(kernel)) for weights
    and biases — the distribution torch's Conv default init uses, which the
    reference relies on implicitly (prior_model.py:30-41).
    """
    chans = [(latent_dim, hidden), (hidden, hidden), (hidden, out)]
    params = {}
    for i, ((cin, cout), k) in enumerate(zip(chans, _KERNELS)):
        key, wk, bk = jax.random.split(key, 3)
        kshape = (k,) * data_dim + (cin, cout)
        bound = 1.0 / np.sqrt(cin * k**data_dim)
        params[f"conv{i}"] = {
            "w": jax.random.uniform(wk, kshape, jnp.float32, -bound, bound),
            "b": jax.random.uniform(bk, (cout,), jnp.float32, -bound, bound),
        }
    return params


def _nearest_upsample(x: jax.Array, factor: ScaleFactor, data_dim: int) -> jax.Array:
    """Nearest-neighbour upsample of (N, *spatial, C) by integer factor(s)."""
    if isinstance(factor, int):
        factors = (factor,) * data_dim
    else:
        factors = tuple(factor)
    for axis, f in enumerate(factors):
        if f != 1:
            x = jnp.repeat(x, f, axis=axis + 1)
    return x


def apply_upsample(
    params: Dict[str, Any],
    x: jax.Array,
    data_dim: int,
    layerwise_scale_factors: Sequence[ScaleFactor],
    paddings: Sequence[int],
    compute_dtype=jnp.float32,
    precision=None,
) -> jax.Array:
    """Map latent PEs (N, *lpe_spatial, latent_dim) -> (N, *pixel_sizes, out).

    Equivalent computation to prior_model.py:47-59 in channel-last layout.
    ``compute_dtype=bfloat16`` feeds the convs bf16 inputs (f32 accumulate) —
    halves HBM traffic of the dominant conv stack. ``precision`` sets the
    conv matmul precision (None = ambient default).
    """
    dn = _conv_dim_numbers(data_dim)
    cd = jnp.dtype(compute_dtype)
    for i in range(3):
        x = _nearest_upsample(x, layerwise_scale_factors[i], data_dim)
        p = int(paddings[i])
        # conv in compute_dtype end-to-end (the TPU MXU accumulates f32
        # internally either way); bias-add and activation back in f32
        x = jax.lax.conv_general_dilated(
            x.astype(cd),
            params[f"conv{i}"]["w"].astype(cd),
            window_strides=(1,) * data_dim,
            padding=[(p, p)] * data_dim,
            dimension_numbers=dn,
            precision=precision,
        ).astype(jnp.float32)
        x = x + params[f"conv{i}"]["b"]
        if i != 2:
            x = jax.nn.leaky_relu(x, negative_slope=0.01)
    return x
