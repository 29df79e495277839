"""Diagonal Gaussian variational posteriors: scale transform, sampling, KL.

TPU-native equivalent of the reference's posterior math
(prior_model.py:88,181-200; test_model.py:101,357-377). Posteriors are plain
pytrees (flax.struct dataclasses) so they flow through jit/pjit/optax without
wrapper classes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

# Scale transform: sigma = softplus(raw) / 6 (prior_model.py:88).
# jax.nn.softplus is numerically stable, matching torch's threshold=20 variant.
SCALE_DIV = 6.0


def scale_transform(log_scale: jax.Array) -> jax.Array:
    return jax.nn.softplus(log_scale) / SCALE_DIV


def inverse_scale_transform(scale: jax.Array) -> jax.Array:
    """raw = log(exp(6*sigma) - 1); inverse of scale_transform.

    Mirrors the artifact re-parameterization in main_compression.py:51.
    Stable form: 6*sigma + log1p(-exp(-6*sigma)).
    """
    s6 = SCALE_DIV * scale
    return s6 + jnp.log1p(-jnp.exp(-s6))


@struct.dataclass
class Gaussian:
    """Diagonal Gaussian with raw (pre-softplus) scale parameterization."""

    loc: jax.Array
    log_scale: jax.Array

    @property
    def scale(self) -> jax.Array:
        return scale_transform(self.log_scale)

    def sample(self, key: jax.Array, sample_shape: tuple = ()) -> jax.Array:
        shape = tuple(sample_shape) + self.loc.shape
        eps = jax.random.normal(key, shape, dtype=self.loc.dtype)
        return self.loc + self.scale * eps


@struct.dataclass
class NaturalGaussian:
    """Diagonal Gaussian with direct (loc, scale) parameterization — used for
    priors, whose scale is produced in closed form by the M-step."""

    loc: jax.Array
    scale: jax.Array


def kl_gaussian(
    q_loc: jax.Array, q_scale: jax.Array, p_loc: jax.Array, p_scale: jax.Array
) -> jax.Array:
    """Elementwise KL( N(q_loc, q_scale) || N(p_loc, p_scale) ) in nats."""
    var_ratio = (q_scale / p_scale) ** 2
    t = ((q_loc - p_loc) / p_scale) ** 2
    return 0.5 * (var_ratio + t - 1.0 - jnp.log(var_ratio))


def kl_posterior_prior(q: Gaussian, p: NaturalGaussian) -> jax.Array:
    return kl_gaussian(q.loc, q.scale, p.loc, p.scale)


def gaussian_log_prob(x: jax.Array, loc: jax.Array, scale: jax.Array) -> jax.Array:
    """Elementwise log N(x; loc, scale)."""
    z = (x - loc) / scale
    return -0.5 * (z * z) - jnp.log(scale) - 0.5 * jnp.log(2.0 * jnp.pi)
