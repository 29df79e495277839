"""Shared pseudo-random codebooks for relative entropy coding.

The codebook is the implicit dictionary both encoder and decoder expand from
a seed: 2^bits standard-normal vectors per level, of width max_group_size.
Group g uses columns [0:size_g) of the shared matrix — the same reuse the
reference gets from caching one Sobol codebook per group size
(test_model.py:459-498).

Codebook spec (part of the bitstream format, versioned via the artifact):
  - "threefry": eps = jax.random.normal(threefry2x32 key folded with the
    level tag, (2^bits, width)). Platform-independent (threefry is bit-exact
    across CPU/TPU/GPU) and generated on device.
  - "sobol": scrambled Sobol + Phi^{-1}, clamped to +-100, generated on host
    with scipy (statistically closest to the reference's torch SobolEngine;
    exact torch parity is impossible, which is fine — parity is at the
    RD-curve level, SURVEY §7).

The width (max_group_size) is pinned by the grouping stored in the prior
artifact, so both sides always agree.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

LEVEL_TAGS = {"w": 0, "h": 1, "hh": 2}


def make_codebook(
    seed: int,
    level: str,
    n_samples: int,
    width: int,
    kind: str = "threefry",
) -> jax.Array:
    """(n_samples, width) float32 standard-normal codebook for one level."""
    if kind == "threefry":
        key = jax.random.key(seed, impl="threefry2x32")
        key = jax.random.fold_in(key, LEVEL_TAGS[level])
        return jax.random.normal(key, (n_samples, width), jnp.float32)
    if kind == "sobol":
        from scipy.stats import norm, qmc

        sob = qmc.Sobol(d=width, scramble=True, seed=seed + 1000 * LEVEL_TAGS[level])
        u = sob.random(n_samples)
        eps = norm.ppf(u)
        eps = np.clip(eps, -100.0, 100.0)
        return jnp.asarray(eps, jnp.float32)
    raise ValueError(f"unknown codebook kind {kind!r}")
