"""KL-based parameter grouping for relative entropy coding.

Host-side numpy re-implementation of the grouping spec
(prior_model.py:264-316): parameters are shuffled with a fixed seed, then
greedily bin-packed so each group's summed KL stays <= bits_per_group bits.
The algorithm is order-dependent, so it is pinned by golden tests.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np


@dataclasses.dataclass(frozen=True)
class Grouping:
    """Static grouping metadata for one latent level.

    Layout: the "coded order" is the concatenation of the groups. param2group
    maps coded position -> original parameter index; group2param is its
    inverse (original parameter index -> coded position).
    """

    n_groups: int
    group_start: np.ndarray  # (G,) int32, coded-order start offset per group
    group_end: np.ndarray  # (G,) int32
    group_idx: np.ndarray  # (D,) int32, group id of each coded position
    param2group: np.ndarray  # (D,) int32, coded position -> param index
    group2param: np.ndarray  # (D,) int32, param index -> coded position
    group_kls: np.ndarray  # (G,) float64, summed KL bits per group
    weights: np.ndarray  # (D,) float64 per-param KL bits (param order)

    @property
    def n_params(self) -> int:
        return int(self.param2group.shape[0])

    @property
    def group_sizes(self) -> np.ndarray:
        return self.group_end - self.group_start

    @property
    def max_group_size(self) -> int:
        return int(self.group_sizes.max())


def greedy_pack(weights: np.ndarray, max_weight: float) -> List[List[int]]:
    """Greedy sequential packing: walk items in order, open a new group when
    adding the next item would exceed max_weight (prior_model.py:301-316)."""
    groups: List[List[int]] = [[0]]
    current = float(weights[0])
    for i in range(1, len(weights)):
        w = float(weights[i])
        if current + w > max_weight:
            groups.append([i])
            current = w
        else:
            groups[-1].append(i)
            current += w
    return groups


def compute_grouping(
    kl_bits: np.ndarray, max_bits: float = 16.0, shuffle_seed: int = 0
) -> Grouping:
    """Build a Grouping from mean per-parameter KL (in bits).

    kl_bits: (D,) mean KL contribution of each parameter over the training
    set, in bits. Parameters are shuffled deterministically (seed pinned, as
    in prior_model.py:279-281) before packing so correlated neighbours don't
    land in one group.
    """
    kl_bits = np.asarray(kl_bits, dtype=np.float64)
    d = kl_bits.shape[0]
    rng = np.random.RandomState(shuffle_seed)
    index = rng.choice(d, d, replace=False)

    packed = greedy_pack(kl_bits[index], max_bits)
    param2group = np.concatenate([index[g] for g in packed]).astype(np.int32)
    group2param = np.argsort(param2group).astype(np.int32)
    group_idx = np.concatenate(
        [np.full(len(g), gi, dtype=np.int32) for gi, g in enumerate(packed)]
    )
    sizes = np.array([len(g) for g in packed], dtype=np.int32)
    group_end = np.cumsum(sizes).astype(np.int32)
    group_start = (group_end - sizes).astype(np.int32)
    group_kls = np.array([kl_bits[index[g]].sum() for g in packed])

    return Grouping(
        n_groups=len(packed),
        group_start=group_start,
        group_end=group_end,
        group_idx=group_idx,
        param2group=param2group,
        group2param=group2param,
        group_kls=group_kls,
        weights=kl_bits,
    )


def grouping_from_posteriors(
    q_loc: np.ndarray,
    q_scale: np.ndarray,
    p_loc: np.ndarray,
    p_scale: np.ndarray,
    max_bits: float = 16.0,
) -> Grouping:
    """Grouping from training-set posteriors vs prior: mean KL per parameter
    in bits over the training rows (prior_model.py:264-271)."""
    var_ratio = (q_scale / p_scale) ** 2
    t = ((q_loc - p_loc) / p_scale) ** 2
    kl = 0.5 * (var_ratio + t - 1.0 - np.log(var_ratio))
    kl_bits = kl.mean(axis=0) / np.log(2.0)
    return compute_grouping(kl_bits, max_bits=max_bits)
