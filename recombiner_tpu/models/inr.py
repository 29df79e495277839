"""SIREN-style coordinate-INR forward pass with learned linear reparameterization.

TPU-native rewrite of the reference inner kernel (prior_model.py:16-21,112-179;
test_model.py:260-355): per layer, slice the weight-latent vector, multiply by
the learned square matrix A_l, split into (W, b), apply x @ W + b and sin(w0*x).

All matmuls are batched einsums so XLA tiles them onto the MXU; an optional
fused Pallas path lives in recombiner_tpu.ops.fused_inr.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from recombiner_tpu.config import ModalityConfig


def resolve_precision(precision):
    """Map a precision flag ('default'/'high'/'highest'/None) to a
    jax.lax.Precision or None (= inherit jax_default_matmul_precision).

    On TPU, f32 matmuls default to one bf16 pass per operand product
    (f32 accumulate). HIGH = 3 bf16 passes (~tf32-grade products),
    HIGHEST = 6 passes (exact f32). Measured head-to-head vs the torch-CPU
    reference (docs/HEAD_TO_HEAD.md): the single-pass default costs
    ~0.35 dB in the progressive-coding phase only, so callers scope
    HIGHEST to the coding-phase finetunes instead of paying it globally.
    """
    if precision is None or isinstance(precision, jax.lax.Precision):
        return precision
    return {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[precision]


def init_linear_transform(key: jax.Array, net_dims: Sequence[int]) -> List[jax.Array]:
    """One learned square matrix per INR layer, shape (out*(in+1),)^2,
    init U(-1/d, 1/d) (prior_model.py:16-21)."""
    mats = []
    for i in range(1, len(net_dims)):
        d = net_dims[i] * (net_dims[i - 1] + 1)
        key, sub = jax.random.split(key)
        mats.append(jax.random.uniform(sub, (d, d), jnp.float32, -1.0 / d, 1.0 / d))
    return mats


def slice_layer(latents: jax.Array, layer_idx: int, cum_sizes: Sequence[int]) -> jax.Array:
    """Slice one layer's flattened params out of the full latent vector
    (prior_model.py:112-119)."""
    start = 0 if layer_idx == 0 else cum_sizes[layer_idx - 1]
    return latents[..., start : cum_sizes[layer_idx]]


def latent_to_weights(layer_param: jax.Array, in_dim: int, out_dim: int):
    """Split (..., out*(in+1)) into bias (..., out) and weights (..., in, out)
    (prior_model.py:121-127)."""
    bias = layer_param[..., :out_dim]
    weights = layer_param[..., out_dim:].reshape(*layer_param.shape[:-1], in_dim, out_dim)
    return weights, bias


def inr_forward(
    x: jax.Array,
    h_w: jax.Array,
    A: Sequence[jax.Array],
    cfg: ModalityConfig,
    precision=None,
) -> jax.Array:
    """Evaluate the INR on a batch of coordinate grids.

    Args:
        x: (R, S, P, input_dim) per-point features (Fourier + upsampled PE).
        h_w: (R, S, n_inr_params) sampled weight latents.
        A: list of per-layer linear-transform matrices.
        precision: per-op matmul precision for BOTH einsums (the latent @ A
            transform and the pixel chain x @ W) — None inherits the global
            default. The coding-phase finetunes pass 'highest' here (scoped
            RD-parity fix, docs/HEAD_TO_HEAD.md) so the rest of the pipeline
            keeps single-pass MXU throughput.
    Returns:
        (R, S, P, output_dim) predictions.
    """
    prec = resolve_precision(precision)
    dims = cfg.net_dims
    cum = cfg.cum_param_sizes
    # NOTE: measured on v5e — casting inputs to bf16 is a net LOSS here
    # (32.7 vs 27.5 ms/epoch): XLA's default f32 matmul already multiplies in
    # bf16 on the MXU, so the casts only add elementwise traffic, and the
    # epoch is HBM-bandwidth-bound. compute_dtype stays supported for the
    # conv stack (see models/upsample.py) but defaults to f32.
    for idx in range(cfg.n_layers):
        lat = slice_layer(h_w, idx, cum)
        lat = jnp.einsum("rsd,de->rse", lat, A[idx],
                         preferred_element_type=jnp.float32, precision=prec)
        w, b = latent_to_weights(lat, dims[idx], dims[idx + 1])
        x = (
            jnp.einsum("rspi,rsio->rspo", x, w,
                       preferred_element_type=jnp.float32, precision=prec)
            + b[:, :, None, :]
        )
        if idx != cfg.n_layers - 1:
            x = jnp.sin(cfg.w0 * x)
    return x
