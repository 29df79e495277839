"""Phase-decomposed upsample+conv: exact algebraic rewrite of
nearest-upsample(f) -> conv(k, pad p) that never materializes the upsampled
grid.

For output position f*s + phi:  out = sum_t K[t] * u[f*s + phi - p + t] with
u[j] = src[j // f] (zeros outside), and (f*s + a) // f = s + floor(a / f)
exactly, so each (phi, t) pair maps to ONE source offset tau:

    out[f*s + phi] = sum_tau K'_phi[tau] * src[s + tau],
    K'_phi[tau] = sum_{t : floor((phi - p + t)/f) = tau} K[t]

i.e. a small conv on the SOURCE grid with f^d phase kernels, whose outputs
interleave back (depth-to-space). Zero padding maps exactly: u[j] = 0 for
j < 0 iff src[s + tau] has s + tau < 0 (remainders are non-negative).

Why: the upsampler stack dominates the training epoch's HBM traffic — naive
conv2/conv3 read nearest-repeated intermediates of 164/655 MB per CIFAR
batch; the phase form reads the f^d-times-smaller sources and does
(k/ext)^d fewer MACs. The phase kernels are a static 0/1 matrix times the
learned kernel, so the rewrite is differentiable and exact (golden-tested
against models/upsample.py).
"""

from __future__ import annotations

import functools
import itertools
from typing import Any, Dict, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from recombiner_tpu.models.upsample import _conv_dim_numbers

ScaleFactor = Union[int, Tuple[int, ...]]
_KERNELS = (5, 3, 3)


@functools.lru_cache(maxsize=None)
def phase_kernel_matrix(
    k: int, factors: Tuple[int, ...], p: int
) -> Tuple[np.ndarray, Tuple[int, ...], Tuple[Tuple[int, int], ...]]:
    """Static mixing matrix M and geometry for one conv layer.

    Returns:
        M: (ext_prod * f_prod, k^d) 0/1 matrix with rows indexed by
           (tau_flat * f_prod + phi_flat).
        ext: per-dim source-kernel extent.
        pads: per-dim (lo, hi) source padding.
    """
    d = len(factors)
    taus_per_dim = []
    for f in factors:
        lo = (0 - p) // f  # floor
        hi = (f - 1 - p + k - 1) // f
        taus_per_dim.append((lo, hi))
    ext = tuple(hi - lo + 1 for lo, hi in taus_per_dim)
    f_prod = int(np.prod(factors))
    ext_prod = int(np.prod(ext))

    M = np.zeros((ext_prod * f_prod, k**d), np.float32)
    phis = list(itertools.product(*[range(f) for f in factors]))
    taps = list(itertools.product(*[range(k)] * d))
    for pi, phi in enumerate(phis):
        for ti, t in enumerate(taps):
            tau = tuple((phi[i] - p + t[i]) // factors[i] for i in range(d))
            tau_off = tuple(tau[i] - taus_per_dim[i][0] for i in range(d))
            tau_flat = int(np.ravel_multi_index(tau_off, ext))
            M[tau_flat * f_prod + pi, ti] = 1.0
    pads = tuple((-lo, hi) for lo, hi in taus_per_dim)
    return M, ext, pads


def _phased_layer(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    k: int,
    factors: Tuple[int, ...],
    p: int,
    data_dim: int,
    precision=None,
) -> jax.Array:
    """x (N, *S, cin) -> nearest-upsample(factors) + conv(k, pad p) + bias,
    computed as a phase conv on the source grid."""
    M, ext, pads = phase_kernel_matrix(k, factors, p)
    cin, cout = w.shape[-2], w.shape[-1]
    f_prod = int(np.prod(factors))

    # learned kernel -> phase kernel: (ext^d, cin, f^d * cout)
    # M rows are (tau_flat, phi_flat)-major; move phi next to cout so the
    # conv's output channels are phi-major (matching depth-to-space below)
    k_flat = w.reshape(k**data_dim, cin, cout)
    kp = jnp.einsum("ek,kio->eio", jnp.asarray(M), k_flat,
                    preferred_element_type=jnp.float32)
    ext_prod = int(np.prod(ext))
    kp = kp.reshape(ext_prod, f_prod, cin, cout)
    kp = jnp.transpose(kp, (0, 2, 1, 3))
    kp = kp.reshape(*ext, cin, f_prod * cout)

    dn = _conv_dim_numbers(data_dim)
    y = jax.lax.conv_general_dilated(
        x, kp,
        window_strides=(1,) * data_dim,
        padding=list(pads),
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (N, *S, f^d * cout)

    # depth-to-space: (N, *S, f^d*cout) -> (N, *(S*f), cout)
    N = y.shape[0]
    S = y.shape[1 : 1 + data_dim]
    y = y.reshape(N, *S, *factors, cout)
    perm = [0]
    for i in range(data_dim):
        perm += [1 + i, 1 + data_dim + i]
    perm += [1 + 2 * data_dim]
    y = jnp.transpose(y, perm)
    out_spatial = tuple(S[i] * factors[i] for i in range(data_dim))
    return y.reshape(N, *out_spatial, cout) + b


def apply_upsample_phased(
    params: Dict[str, Any],
    x: jax.Array,
    data_dim: int,
    layerwise_scale_factors: Sequence[ScaleFactor],
    paddings: Sequence[int],
    compute_dtype=jnp.float32,  # accepted for interface parity; f32 only
    precision=None,
) -> jax.Array:
    """Drop-in replacement for models.upsample.apply_upsample.

    ``precision`` sets the conv matmul precision (None = ambient default;
    jax.lax.Precision.HIGHEST = exact f32 passes — the torch reference's
    convs are exact f32 by construction)."""
    for i in range(3):
        f = layerwise_scale_factors[i]
        factors = (f,) * data_dim if isinstance(f, int) else tuple(f)
        x = _phased_layer(
            x, params[f"conv{i}"]["w"], params[f"conv{i}"]["b"],
            _KERNELS[i], factors, int(paddings[i]), data_dim,
            precision=precision,
        )
        if i != 2:
            x = jax.nn.leaky_relu(x, negative_slope=0.01)
    return x
