"""Deterministic truncated-Gumbel chain for A* (top-k Gumbel) coding.

The reference builds the running-maximum sequence of truncated Gumbels with a
65,536-step host loop (test_model.py:441-457). The chain has a closed form:
with E_i ~ Exp(1) arrival increments, b_i = -log(cumsum(E)_i) — the Gumbel
values of a Poisson arrival process — so we compute it vectorized.

The chain is part of the bitstream format: encoder and decoder share it via
the seed. (The decoder doesn't actually need the Gumbels — only the argmax
index is transmitted — but the spec pins them for reproducible encoding.)
"""

from __future__ import annotations

import numpy as np


def gumbel_chain(n: int, seed: int) -> np.ndarray:
    """Strictly decreasing top-n Gumbel perturbation sequence (float64).

    b_0 = -log(E_0); b_i = -log(E_i + exp(-b_{i-1}))  ==  -log(cumsum(E)_i)
    with E_i = -log(U_i), U ~ U(0,1) from a pinned RandomState stream.
    """
    rng = np.random.RandomState(seed)
    e = -np.log(rng.rand(n))
    return -np.log(np.cumsum(e))
