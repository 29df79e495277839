"""Compression engine: per-datapoint posterior optimization + progressive
relative entropy (A*) coding, fully on device.

TPU-native redesign of TestBNNmodel (test_model.py:33-856). Key departures
from the reference, all in service of the TPU execution model:

- One level-generic ``LevelState``/``LevelMeta`` pair replaces the
  triplicated w/h/hh code paths.
- Ragged groups are padded to ``max_group_size`` so every coder call has one
  static shape (dynamic-slice windows + validity masks).
- A* scoring is algebraically restructured: with codebook samples
  z = mu_p + sigma_p * eps, the score log q(z) - log p(z) is a quadratic in
  eps, so scoring ALL rows against ALL 2^16 samples is two matmuls against a
  shared [eps^2, eps] basis — it runs on the MXU instead of a VPU loop, and
  all rows encode their (different) selected groups simultaneously.
  (The per-row constant term can be dropped: it doesn't move the argmax.)
- All rows advance one group per encode step in parallel (the reference
  loops rows on the host, test_model.py:806-818); beta annealing and
  group-KL reductions are on-device segment-sums.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from recombiner_tpu.config import ModalityConfig
from recombiner_tpu.coding.codebook import make_codebook
from recombiner_tpu.coding.gumbel import gumbel_chain
from recombiner_tpu.io.checkpoint import LevelArtifact, PriorArtifact
from recombiner_tpu.models.gaussian import Gaussian, kl_gaussian, scale_transform
from recombiner_tpu.models.inr import inr_forward
from recombiner_tpu.models.mappings import lpe_to_pe, sample_hierarchical_latents


@struct.dataclass
class LevelMeta:
    """Static per-level coding metadata (device arrays + shape constants)."""

    p_loc: jax.Array  # (Dpad,) prior loc, coded order
    p_scale: jax.Array  # (Dpad,) prior scale, coded order
    group_start: jax.Array  # (G,) int32
    group_size: jax.Array  # (G,) int32
    group_idx: jax.Array  # (D,) int32 coded position -> group id
    group2param: jax.Array  # (D,) int32 param index -> coded position
    perm_g2p: Optional[jax.Array]  # (R, D) int32 storage row per physical row
    eps: jax.Array  # (n_samples, Gmax) codebook
    gumbel: jax.Array  # (n_samples,)
    D: int = struct.field(pytree_node=False)
    Dpad: int = struct.field(pytree_node=False)
    Gmax: int = struct.field(pytree_node=False)
    n_groups: int = struct.field(pytree_node=False)


@struct.dataclass
class LevelState:
    """Trainable/evolving per-level state, stored in coded (group) order and
    (for permuted levels) budget-mixed row order."""

    q: Gaussian  # (R, Dpad)
    frozen_mask: jax.Array  # (R, Dpad) float 1.0 where coded
    frozen_val: jax.Array  # (R, Dpad)
    kl_beta: jax.Array  # (R, G)
    compressed: jax.Array  # (R, G) bool
    indices: jax.Array  # (R, G) int32 transmitted sample indices

    @property
    def n_rows(self) -> int:
        return self.q.loc.shape[0]


@struct.dataclass
class Codec:
    """Frozen coding context: per-level metadata + the learned mappings."""

    w: LevelMeta
    h: Optional[LevelMeta]
    hh: Optional[LevelMeta]
    A: Tuple[jax.Array, ...]
    up: dict

    def meta(self, name: str) -> LevelMeta:
        return {"w": self.w, "h": self.h, "hh": self.hh}[name]

    @property
    def level_names(self):
        return ("w",) if self.h is None else ("w", "h", "hh")


@struct.dataclass
class CodecState:
    w: LevelState
    h: Optional[LevelState]
    hh: Optional[LevelState]

    def level(self, name: str) -> LevelState:
        return {"w": self.w, "h": self.h, "hh": self.hh}[name]

    def replace_level(self, name: str, ls: LevelState) -> "CodecState":
        return self.replace(**{name: ls})


# --------------------------------------------------------------------- init


def _round_up(x: int, m: int = 128) -> int:
    return ((x + m - 1) // m) * m


def _make_level_meta(
    lv: LevelArtifact,
    level_name: str,
    n_rows: int,
    permute_rows: bool,
    codebook_seed: int,
    gumbel_seed: int,
    bits_per_group: int,
    codebook_kind: str,
) -> LevelMeta:
    g = lv.grouping
    D = g.n_params
    Gmax = _round_up(g.max_group_size)
    Dpad = D + Gmax
    p2g = g.param2group
    p_loc = np.zeros(Dpad, np.float32)
    p_scale = np.ones(Dpad, np.float32)
    p_loc[:D] = lv.p_loc[p2g]
    p_scale[:D] = lv.p_scale[p2g]

    perm = None
    if permute_rows:
        # cross-patch budget-mixing permutation, one per column
        # (test_model.py:182-208); regenerated deterministically at decode.
        perm = np.empty((n_rows, D), np.int32)
        for d in range(D):
            perm[:, d] = np.random.RandomState(d).choice(n_rows, n_rows, False)

    n_samples = 2**bits_per_group
    eps = make_codebook(codebook_seed, level_name, n_samples, Gmax, codebook_kind)
    gum = jnp.asarray(gumbel_chain(n_samples, gumbel_seed), jnp.float32)

    return LevelMeta(
        p_loc=jnp.asarray(p_loc),
        p_scale=jnp.asarray(p_scale),
        group_start=jnp.asarray(g.group_start, jnp.int32),
        group_size=jnp.asarray(g.group_sizes, jnp.int32),
        group_idx=jnp.asarray(g.group_idx, jnp.int32),
        group2param=jnp.asarray(g.group2param, jnp.int32),
        perm_g2p=None if perm is None else jnp.asarray(perm),
        eps=eps,
        gumbel=gum,
        D=D,
        Dpad=Dpad,
        Gmax=Gmax,
        n_groups=g.n_groups,
    )


def _init_level_state(lv: LevelArtifact, meta: LevelMeta, n_rows: int, kl_beta: float) -> LevelState:
    """Posteriors initialized from the prior: loc = p_loc, raw scale = the
    training-average log_scale (test_model.py:138-166)."""
    D, Dpad = meta.D, meta.Dpad
    loc = jnp.broadcast_to(meta.p_loc, (n_rows, Dpad))
    raw = np.zeros(Dpad, np.float32)
    raw[:D] = lv.avg_log_scale[lv.grouping.param2group]
    log_scale = jnp.broadcast_to(jnp.asarray(raw), (n_rows, Dpad))
    G = meta.n_groups
    return LevelState(
        q=Gaussian(loc=loc, log_scale=log_scale),
        frozen_mask=jnp.zeros((n_rows, Dpad)),
        frozen_val=jnp.zeros((n_rows, Dpad)),
        kl_beta=jnp.full((n_rows, G), kl_beta, jnp.float32),
        compressed=jnp.zeros((n_rows, G), bool),
        indices=jnp.zeros((n_rows, G), jnp.int32),
    )


def init_codec(
    artifact: PriorArtifact,
    n_rows: int,
    codebook_kind: str = "threefry",
    initial_beta: Optional[float] = None,
) -> Tuple[Codec, CodecState]:
    """Build the coding context and fresh state for ``n_rows`` posterior rows
    (datapoints, or patches in patch mode)."""
    cfg = artifact.config
    beta = artifact.kl_beta if initial_beta is None else initial_beta
    seed = artifact.codebook_seed
    bits = cfg.bits_per_group

    w_meta = _make_level_meta(
        artifact.w, "w", n_rows, cfg.patch, seed, seed, bits, codebook_kind
    )
    w_state = _init_level_state(artifact.w, w_meta, n_rows, beta)

    h_meta = hh_meta = h_state = hh_state = None
    if cfg.patch:
        r2 = cfg.rows_level2(n_rows)
        r3 = cfg.rows_level3(n_rows)
        h_meta = _make_level_meta(
            artifact.h, "h", r2, True, seed, seed, bits, codebook_kind
        )
        h_state = _init_level_state(artifact.h, h_meta, r2, beta)
        hh_meta = _make_level_meta(
            artifact.hh, "hh", r3, False, seed, seed, bits, codebook_kind
        )
        hh_state = _init_level_state(artifact.hh, hh_meta, r3, beta)

    codec = Codec(
        w=w_meta,
        h=h_meta,
        hh=hh_meta,
        A=tuple(jnp.asarray(a) for a in artifact.A),
        up=jax.tree_util.tree_map(jnp.asarray, artifact.up),
    )
    state = CodecState(w=w_state, h=h_state, hh=hh_state)
    return codec, state


# ----------------------------------------------------------------- predict


def _effective(ls: LevelState) -> Tuple[jax.Array, jax.Array]:
    """Blend frozen samples into the posterior (test_model.py:289-290):
    coded positions use the transmitted sample with zero std."""
    fm = ls.frozen_mask
    loc = ls.q.loc * (1.0 - fm) + ls.frozen_val * fm
    scale = scale_transform(ls.q.log_scale) * (1.0 - fm)
    return loc, scale


def _to_param_order(x: jax.Array, meta: LevelMeta) -> jax.Array:
    """Stored (mixed-row, coded-column) layout -> physical rows, param columns
    (test_model.py:292-298)."""
    x = x[:, : meta.D]
    if meta.perm_g2p is not None:
        x = jnp.take_along_axis(x, meta.perm_g2p, axis=0)
    return x[:, meta.group2param]


def predict(
    codec: Codec,
    state: CodecState,
    X: jax.Array,
    key: jax.Array,
    cfg: ModalityConfig,
    sample_size: int = 1,
) -> jax.Array:
    """Render the INR from the current (partially coded) posteriors.

    X: (R, P, fourier_dim) -> (R, S, P, out_dim).
    """
    S = sample_size
    loc, scale = _effective(state.w)
    loc = _to_param_order(loc, codec.w)
    scale = _to_param_order(scale, codec.w)

    n_inr = cfg.n_inr_params
    R = loc.shape[0]
    k_lpe, k_w = jax.random.split(key)

    lpe_loc = loc[:, n_inr:].reshape(R, *cfg.lpe_spatial, cfg.latent_dim)
    lpe_scale = scale[:, n_inr:].reshape(R, *cfg.lpe_spatial, cfg.latent_dim)
    lpe_eps = jax.random.normal(k_lpe, (R, S, *lpe_loc.shape[1:]))
    lpe = lpe_loc[:, None] + lpe_scale[:, None] * lpe_eps
    pe = lpe_to_pe(codec.up, lpe, cfg)
    x = jnp.concatenate(
        [jnp.broadcast_to(X[:, None], (*pe.shape[:3], X.shape[-1])), pe], -1
    )

    if cfg.patch:
        h_loc, h_scale = _effective(state.h)
        h_loc = _to_param_order(h_loc, codec.h)
        h_scale = _to_param_order(h_scale, codec.h)
        hh_loc, hh_scale = _effective(state.hh)
        hh_loc = _to_param_order(hh_loc, codec.hh)
        hh_scale = _to_param_order(hh_scale, codec.hh)
    else:
        h_loc = h_scale = hh_loc = hh_scale = None

    h_w = sample_hierarchical_latents(
        k_w, loc[:, :n_inr], scale[:, :n_inr],
        h_loc, h_scale, hh_loc, hh_scale, S, cfg,
    )
    return inr_forward(x, h_w, codec.A, cfg)


# ------------------------------------------------------------------- KL


def level_kl(ls: LevelState, meta: LevelMeta) -> jax.Array:
    """Elementwise KL(q || p) on real coded positions: (R, D), nats."""
    return kl_gaussian(
        ls.q.loc[:, : meta.D],
        scale_transform(ls.q.log_scale[:, : meta.D]),
        meta.p_loc[: meta.D],
        meta.p_scale[: meta.D],
    )


def group_kl(ls: LevelState, meta: LevelMeta) -> jax.Array:
    """Per-(row, group) KL in nats via on-device segment-sum — the reference's
    host-side np.bincount loop (test_model.py:383-402)."""
    kl = level_kl(ls, meta)  # (R, D)
    return jax.ops.segment_sum(kl.T, meta.group_idx, num_segments=meta.n_groups).T


def beta_weighted_kl(ls: LevelState, meta: LevelMeta) -> jax.Array:
    kl = level_kl(ls, meta)
    factor = ls.kl_beta[:, meta.group_idx]  # (R, D)
    return (kl * factor).sum()


def update_betas(
    ls: LevelState,
    meta: LevelMeta,
    bits_per_group: float,
    upper_buffer: float = 0.0,
    lower_buffer: float = 0.4,
    step: float = 0.05,
) -> LevelState:
    """Per-group multiplicative beta annealing toward the 16-bit budget,
    frozen groups untouched (test_model.py:404-434)."""
    kls_bits = group_kl(ls, meta) / jnp.log(2.0)
    beta = ls.kl_beta
    beta = beta * jnp.where(kls_bits > bits_per_group + upper_buffer, 1.0 + step, 1.0)
    beta = beta / jnp.where(kls_bits <= bits_per_group - lower_buffer, 1.0 + step, 1.0)
    beta = jnp.clip(beta, 0.0, 10000.0)
    beta = jnp.where(ls.compressed, ls.kl_beta, beta)
    return ls.replace(kl_beta=beta)


# ------------------------------------------------------------ optimization


def _trainables(state: CodecState):
    return {name: getattr(state, name).q for name in ("w", "h", "hh") if getattr(state, name) is not None}


def _with_trainables(state: CodecState, qs) -> CodecState:
    for name, q in qs.items():
        state = state.replace_level(name, state.level(name).replace(q=q))
    return state


@partial(
    jax.jit,
    static_argnames=("cfg", "n_epochs", "lr", "sample_size", "kl_adjust_gap", "adjust_betas"),
    donate_argnums=(1,),
)
def optimize(
    codec: Codec,
    state: CodecState,
    X: jax.Array,
    Y: jax.Array,
    key: jax.Array,
    *,
    cfg: ModalityConfig,
    n_epochs: int,
    lr: float = 2e-4,
    sample_size: int = 5,
    kl_adjust_gap: int = 10,
    adjust_betas: bool = True,
) -> CodecState:
    """MC-ELBO posterior optimization with in-scan beta annealing
    (test_model.py:621-635). Fresh Adam, matching the reference's optimizer
    re-init at every finetune (test_model.py:722,771,821)."""
    opt = optax.adam(lr)

    def loss_fn(qs, st: CodecState, k):
        s = _with_trainables(st, qs)
        y_hat = predict(codec, s, X, k, cfg, sample_size=sample_size)
        mse = jnp.mean((y_hat - Y[:, None]) ** 2) * Y.shape[0]
        kl = beta_weighted_kl(s.w, codec.w)
        if s.h is not None:
            kl += beta_weighted_kl(s.h, codec.h)
            kl += beta_weighted_kl(s.hh, codec.hh)
        return mse + kl

    opt_state = opt.init(_trainables(state))

    def epoch(carry, inputs):
        s, o = carry
        i, k = inputs

        if adjust_betas:
            def do_adjust(s):
                s = s.replace_level("w", update_betas(s.w, codec.w, cfg.bits_per_group))
                if s.h is not None:
                    s = s.replace_level("h", update_betas(s.h, codec.h, cfg.bits_per_group))
                    s = s.replace_level("hh", update_betas(s.hh, codec.hh, cfg.bits_per_group))
                return s

            s = jax.lax.cond(i % kl_adjust_gap == 0, do_adjust, lambda s: s, s)

        grads = jax.grad(loss_fn)(_trainables(s), s, k)
        updates, o = opt.update(grads, o)
        qs = optax.apply_updates(_trainables(s), updates)
        return (_with_trainables(s, qs), o), None

    keys = jax.random.split(key, n_epochs)
    idxs = jnp.arange(n_epochs)
    (state, _), _ = jax.lax.scan(epoch, (state, opt_state), (idxs, keys))
    return state


# ----------------------------------------------------------- encode step


def encode_step_level(ls: LevelState, meta: LevelMeta) -> LevelState:
    """Code ONE group per row, in parallel over all rows: pick each row's
    max-KL uncompressed group, A*-score it against the shared codebook via
    the [eps^2, eps] matmul basis, freeze the winning sample.

    Equivalent to one sweep of the reference's per-row host loop
    (test_model.py:806-818 + compress_group/sample_group :501-533,586-595).
    """
    R, Gmax = ls.q.loc.shape[0], meta.Gmax

    kls = group_kl(ls, meta) / jnp.log(2.0)
    kls = jnp.where(ls.compressed, -jnp.inf, kls)
    g = jnp.argmax(kls, axis=1).astype(jnp.int32)  # (R,)
    start = meta.group_start[g]
    size = meta.group_size[g]

    def window(row, s):
        return jax.lax.dynamic_slice(row, (s,), (Gmax,))

    q_loc = jax.vmap(window)(ls.q.loc, start)
    q_scale = jax.vmap(window)(scale_transform(ls.q.log_scale), start)
    p_loc = jax.vmap(window, in_axes=(None, 0))(meta.p_loc, start)
    p_scale = jax.vmap(window, in_axes=(None, 0))(meta.p_scale, start)
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (R, Gmax), 1) < size[:, None]
    )

    # log q(z) - log p(z) with z = p_loc + p_scale * eps is quadratic in eps:
    #   alpha * eps^2 + beta * eps + const,  const dropped (argmax-invariant)
    inv_q2 = 1.0 / (q_scale * q_scale)
    delta = p_loc - q_loc
    alpha = 0.5 * (1.0 - p_scale * p_scale * inv_q2)
    beta = -delta * p_scale * inv_q2
    alpha = jnp.where(valid, alpha, 0.0)
    beta = jnp.where(valid, beta, 0.0)

    scores = (
        jnp.einsum("nj,rj->nr", meta.eps * meta.eps, alpha,
                   preferred_element_type=jnp.float32)
        + jnp.einsum("nj,rj->nr", meta.eps, beta,
                     preferred_element_type=jnp.float32)
        + meta.gumbel[:, None]
    )
    idx = jnp.argmax(scores, axis=0).astype(jnp.int32)  # (R,)

    z = p_loc + p_scale * meta.eps[idx]  # (R, Gmax)

    def scatter(dest_row, s, val_row, valid_row):
        win = jax.lax.dynamic_slice(dest_row, (s,), (Gmax,))
        new = jnp.where(valid_row, val_row, win)
        return jax.lax.dynamic_update_slice(dest_row, new, (s,))

    frozen_val = jax.vmap(scatter)(ls.frozen_val, start, z, valid)
    frozen_mask = jax.vmap(scatter)(
        ls.frozen_mask, start, jnp.ones((R, Gmax)), valid
    )
    rows = jnp.arange(R)
    # rows whose groups are all coded are a no-op (resume / ragged finishes)
    active = ~jnp.all(ls.compressed, axis=1)

    def gate(new, old):
        return jnp.where(active.reshape((R,) + (1,) * (new.ndim - 1)), new, old)

    return ls.replace(
        frozen_val=gate(frozen_val, ls.frozen_val),
        frozen_mask=gate(frozen_mask, ls.frozen_mask),
        kl_beta=gate(ls.kl_beta.at[rows, g].set(0.0), ls.kl_beta),
        compressed=gate(ls.compressed.at[rows, g].set(True), ls.compressed),
        indices=gate(ls.indices.at[rows, g].set(idx), ls.indices),
    )


@partial(jax.jit, static_argnames=("level",))
def encode_step(codec: Codec, state: CodecState, level: str) -> CodecState:
    return state.replace_level(level, encode_step_level(state.level(level), codec.meta(level)))


# ---------------------------------------------------------------- decode


def decode_level_values(meta: LevelMeta, indices: jax.Array) -> jax.Array:
    """Expand transmitted indices into coded-order parameter values (R, D).

    Fully parallel: z[r, d] = p_loc[d] + p_scale[d] * eps[idx[r, g(d)], off(d)].
    """
    D = meta.D
    gidx = meta.group_idx  # (D,)
    offs = jnp.arange(D, dtype=jnp.int32) - meta.group_start[gidx]
    sel = indices[:, gidx]  # (R, D)
    eps_vals = meta.eps[sel, offs[None, :]]
    return meta.p_loc[:D] + meta.p_scale[:D] * eps_vals


def decode_state(codec: Codec, indices: dict, cfg: ModalityConfig) -> CodecState:
    """Reconstruct a fully-frozen CodecState from transmitted indices alone —
    the explicit decoder the reference leaves implicit."""

    def level(name: str) -> LevelState:
        meta = codec.meta(name)
        idx = jnp.asarray(indices[name], jnp.int32)
        R = idx.shape[0]
        vals = decode_level_values(meta, idx)
        pad = jnp.zeros((R, meta.Gmax))
        return LevelState(
            q=Gaussian(
                loc=jnp.concatenate([vals, pad], -1),
                log_scale=jnp.full((R, meta.Dpad), -1e9),
            ),
            frozen_mask=jnp.ones((R, meta.Dpad)),
            frozen_val=jnp.concatenate([vals, pad], -1),
            kl_beta=jnp.zeros((R, meta.n_groups)),
            compressed=jnp.ones((R, meta.n_groups), bool),
            indices=idx,
        )

    return CodecState(
        w=level("w"),
        h=level("h") if cfg.patch else None,
        hh=level("hh") if cfg.patch else None,
    )


def decode(
    codec: Codec,
    indices: dict,
    X: jax.Array,
    cfg: ModalityConfig,
) -> jax.Array:
    """indices {'w': (R,G), 'h': ..., 'hh': ...} -> reconstruction (R, P, out).

    Deterministic: every posterior is a point mass at the decoded sample.
    """
    state = decode_state(codec, indices, cfg)
    y = predict(codec, state, X, jax.random.key(0), cfg, sample_size=1)
    return y[:, 0]
