"""Compression engine: per-datapoint posterior optimization + progressive
relative entropy (A*) coding, fully on device.

TPU-native redesign of TestBNNmodel (test_model.py:33-856). Key departures
from the reference, all in service of the TPU execution model:

- One level-generic ``LevelState``/``LevelMeta`` pair replaces the
  triplicated w/h/hh code paths.
- **Posteriors are stored in PHYSICAL (param-order, physical-row) layout** so
  the differentiated ELBO path contains ZERO gathers/scatters — gathers on
  the grad path lower to TPU scatters in the backward pass and were measured
  30-40x slower than the whole rest of the epoch. The coded (group-order,
  budget-mixed-row) view exists only as static index maps; the coder and the
  beta bookkeeping gather through them forward-only. (The reference instead
  stores group-permuted posteriors and un-permutes every forward,
  test_model.py:289-298.)
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

Layout glossary (coded cell (r', c) <-> physical cell (r, d)):
    d = param2group[c]           # coded position -> param index
    r = perm_g2p[r', c]          # coded row -> physical row (patch mixing)
    c = group2param[d]; r' = perm_p2g[r, c]
"""

from __future__ import annotations

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
from recombiner_tpu.models.inr import inr_forward, resolve_precision
from recombiner_tpu.models.mappings import lpe_to_pe, sample_hierarchical_latents


@struct.dataclass
class LevelMeta:
    """Static per-level coding metadata (device arrays + shape constants)."""

    # priors in param order (KL path — elementwise, no gathers)
    pp_loc: jax.Array  # (D,)
    pp_scale: jax.Array  # (D,)
    # priors in coded order, padded (coder window path)
    p_loc: jax.Array  # (Dpad,)
    p_scale: jax.Array  # (Dpad,)
    group_start: jax.Array  # (G,) int32, coded offsets
    group_size: jax.Array  # (G,) int32
    group_idx: jax.Array  # (D,) int32 coded position -> group id
    param2group: jax.Array  # (D,) int32 coded position -> param index
    group2param: jax.Array  # (D,) int32 param index -> coded position
    group_of_col: jax.Array  # (D,) int32 param index -> group id
    perm_g2p: Optional[jax.Array]  # (R, D) int32 coded row -> physical row, per coded col
    beta_row: Optional[jax.Array]  # (R, D) int32 physical cell -> its coded row, per param col
    eps: jax.Array  # (n_samples, Gmax) codebook
    gumbel: jax.Array  # (n_samples,)
    D: int = struct.field(pytree_node=False)
    Dpad: int = struct.field(pytree_node=False)
    Gmax: int = struct.field(pytree_node=False)
    n_groups: int = struct.field(pytree_node=False)


@struct.dataclass
class LevelState:
    """Trainable/evolving per-level state in PHYSICAL (param-order) layout;
    group bookkeeping (betas, indices) in coded-row/group layout."""

    q: Gaussian  # (R, D) physical layout
    frozen_mask: jax.Array  # (R, D) float 1.0 where coded
    frozen_val: jax.Array  # (R, D)
    kl_beta: jax.Array  # (R, G) coded rows
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

    perm = beta_row = None
    if permute_rows:
        # cross-patch budget-mixing permutation, one per coded column
        # (test_model.py:182-208); regenerated deterministically at decode.
        # The native path avoids O(D) python RandomState instantiations
        # (kodak-scale init_codec dropped from tens of seconds to ~ms);
        # bit parity pinned in test_native.py.
        from recombiner_tpu import native

        pi = native.patch_permutations(n_rows, D)
        if pi is not None:
            perm, inv = pi
        else:
            perm = np.empty((n_rows, D), np.int32)
            inv = np.empty((n_rows, D), np.int32)
            for c in range(D):
                order = np.random.RandomState(c).choice(n_rows, n_rows, False)
                perm[:, c] = order
                inv[order, c] = np.arange(n_rows, dtype=np.int32)
        # beta_row[r, d] = coded row owning physical cell (r, d)
        beta_row = inv[:, g.group2param]

    n_samples = 2**bits_per_group
    eps = make_codebook(codebook_seed, level_name, n_samples, Gmax, codebook_kind)
    gum = jnp.asarray(gumbel_chain(n_samples, gumbel_seed), jnp.float32)

    return LevelMeta(
        pp_loc=jnp.asarray(lv.p_loc, jnp.float32),
        pp_scale=jnp.asarray(lv.p_scale, jnp.float32),
        p_loc=jnp.asarray(p_loc),
        p_scale=jnp.asarray(p_scale),
        group_start=jnp.asarray(g.group_start, jnp.int32),
        group_size=jnp.asarray(g.group_sizes, jnp.int32),
        group_idx=jnp.asarray(g.group_idx, jnp.int32),
        param2group=jnp.asarray(g.param2group, jnp.int32),
        group2param=jnp.asarray(g.group2param, jnp.int32),
        group_of_col=jnp.asarray(g.group_idx[g.group2param], jnp.int32),
        perm_g2p=None if perm is None else jnp.asarray(perm),
        beta_row=None if beta_row is None else jnp.asarray(beta_row),
        eps=eps,
        gumbel=gum,
        D=D,
        Dpad=Dpad,
        Gmax=Gmax,
        n_groups=g.n_groups,
    )


def _init_level_state(lv: LevelArtifact, meta: LevelMeta, n_rows: int, kl_beta: float) -> LevelState:
    """Posteriors initialized from the prior: loc = p_loc, raw scale = the
    training-average log_scale (test_model.py:138-166), in physical layout."""
    D = meta.D
    loc = jnp.broadcast_to(meta.pp_loc, (n_rows, D))
    log_scale = jnp.broadcast_to(jnp.asarray(lv.avg_log_scale, jnp.float32), (n_rows, D))
    G = meta.n_groups
    return LevelState(
        q=Gaussian(loc=loc, log_scale=log_scale),
        frozen_mask=jnp.zeros((n_rows, D)),
        frozen_val=jnp.zeros((n_rows, D)),
        kl_beta=jnp.full((n_rows, G), kl_beta, jnp.float32),
        compressed=jnp.zeros((n_rows, G), bool),
        indices=jnp.zeros((n_rows, G), jnp.int32),
    )


def init_codec(
    artifact: PriorArtifact,
    n_rows: int,
    codebook_kind: Optional[str] = None,
    initial_beta: Optional[float] = None,
) -> Tuple[Codec, CodecState]:
    """Build the coding context and fresh state for ``n_rows`` posterior rows
    (datapoints, or patches in patch mode). The codebook kind defaults to the
    artifact's (it is bitstream format, not a tuning knob)."""
    cfg = artifact.config
    beta = artifact.kl_beta if initial_beta is None else initial_beta
    seed = artifact.codebook_seed
    if codebook_kind is None:
        codebook_kind = getattr(artifact, "codebook_kind", "threefry")
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
    coded positions use the transmitted sample with zero std. Pure
    elementwise — masks/values are constants w.r.t. the optimization."""
    fm = ls.frozen_mask
    loc = ls.q.loc * (1.0 - fm) + ls.frozen_val * fm
    scale = scale_transform(ls.q.log_scale) * (1.0 - fm)
    return loc, scale


@partial(jax.jit, static_argnames=("cfg", "sample_size", "precision"))
def predict(
    codec: Codec,
    state: CodecState,
    X: jax.Array,
    key: jax.Array,
    cfg: ModalityConfig,
    sample_size: int = 1,
    precision: Optional[str] = None,
) -> jax.Array:
    """Render the INR from the current (partially coded) posteriors.

    X: (R, P, fourier_dim) -> (R, S, P, out_dim). Gather-free.

    Jitted at this boundary: the eager first call costs ~100 s of per-op
    compilation on CPU and is a dispatch storm on the remote TPU tunnel
    (measured round 2); inner callers (optimize's loss_fn) inline it into
    their own jit, so the annotation only changes the eager call sites
    (distortion logging, decode).
    """
    S = sample_size
    loc, scale = _effective(state.w)

    n_inr = cfg.n_inr_params
    R = loc.shape[0]
    k_lpe, k_w = jax.random.split(key)

    lpe_loc = loc[:, n_inr:].reshape(R, *cfg.lpe_spatial, cfg.latent_dim)
    lpe_scale = scale[:, n_inr:].reshape(R, *cfg.lpe_spatial, cfg.latent_dim)
    lpe_eps = jax.random.normal(k_lpe, (R, S, *lpe_loc.shape[1:]))
    lpe = lpe_loc[:, None] + lpe_scale[:, None] * lpe_eps
    # precision covers the stitch-conv stack too: on the patch path the
    # decode/optimize graph runs THROUGH these convs, and torch computes
    # them in exact f32 by construction
    pe = lpe_to_pe(codec.up, lpe, cfg,
                   precision=resolve_precision(precision))
    x = jnp.concatenate(
        [jnp.broadcast_to(X[:, None], (*pe.shape[:3], X.shape[-1])), pe], -1
    )

    if cfg.patch:
        h_loc, h_scale = _effective(state.h)
        hh_loc, hh_scale = _effective(state.hh)
    else:
        h_loc = h_scale = hh_loc = hh_scale = None

    h_w = sample_hierarchical_latents(
        k_w, loc[:, :n_inr], scale[:, :n_inr],
        h_loc, h_scale, hh_loc, hh_scale, S, cfg,
    )
    return inr_forward(x, h_w, codec.A, cfg, precision=precision)


# ------------------------------------------------------------------- KL


def level_kl(ls: LevelState, meta: LevelMeta) -> jax.Array:
    """Elementwise KL(q || p) in physical layout: (R, D), nats."""
    return kl_gaussian(
        ls.q.loc,
        scale_transform(ls.q.log_scale),
        meta.pp_loc,
        meta.pp_scale,
    )


def _to_coded(x: jax.Array, meta: LevelMeta) -> jax.Array:
    """Physical (R, D) -> coded layout (R, D): coded cell (r', c) reads
    physical (perm_g2p[r', c], param2group[c]). Forward-only gather."""
    x = x[:, meta.param2group]
    if meta.perm_g2p is not None:
        x = jnp.take_along_axis(x, meta.perm_g2p, axis=0)
    return x


@jax.jit
def group_kl(ls: LevelState, meta: LevelMeta) -> jax.Array:
    """Per-(coded row, group) KL in nats via on-device segment-sum — the
    reference's host-side np.bincount loop (test_model.py:383-402).

    Jitted for the eager call sites (kl_bits_summary, encode-loop logging);
    jitted callers inline it."""
    kl = _to_coded(level_kl(ls, meta), meta)  # (R, D) coded
    return jax.ops.segment_sum(kl.T, meta.group_idx, num_segments=meta.n_groups).T


def beta_weighted_kl(ls: LevelState, meta: LevelMeta) -> jax.Array:
    """sum_cells beta[owning group] * KL(cell). The beta factor is a
    constant-indexed gather (no gradient flows through it), so the
    differentiated path stays elementwise."""
    kl = level_kl(ls, meta)  # (R, D) physical
    beta = jax.lax.stop_gradient(ls.kl_beta)
    if meta.beta_row is None:
        factor = beta[:, meta.group_of_col]  # (R, D)
    else:
        factor = beta[meta.beta_row, meta.group_of_col[None, :]]
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


def _elbo_loss_fn(codec, X, Y, cfg, sample_size, precision, remat,
                  with_aux: bool = False):
    """The shared MC-ELBO objective of optimize/optimize_adaptive
    (test_model.py:625-630): mean MSE * n_rows + sum of beta-weighted KLs.

    ``with_aux`` additionally returns the distortion term (the scaled MSE)
    as a value_and_grad aux — already computed inside the loss, so the aux
    costs nothing. optimize_adaptive's ``monitor='mse'`` stop rule watches
    it instead of the full ELBO, whose beta-annealed KL term is
    NONSTATIONARY (update_betas moves beta every kl_adjust_gap epochs), so
    an ELBO plateau never clears rel_tol on long phase-1 runs (measured:
    docs/SCHEDULE.md trajectory, 30k epochs without a 0.1% window plateau
    while distortion is flat from ~10k)."""

    def loss_fn(qs, st: CodecState, k):
        s = _with_trainables(st, qs)
        y_hat = predict(codec, s, X, k, cfg, sample_size=sample_size,
                        precision=precision)
        mse = jnp.mean((y_hat - Y[:, None]) ** 2) * Y.shape[0]
        kl = beta_weighted_kl(s.w, codec.w)
        if s.h is not None:
            kl += beta_weighted_kl(s.h, codec.h)
            kl += beta_weighted_kl(s.hh, codec.hh)
        if with_aux:
            return mse + kl, mse
        return mse + kl

    if remat:
        loss_fn = jax.checkpoint(loss_fn, static_argnums=())
    return loss_fn


def _make_opt(lr: float, lr_schedule=None):
    """Adam, optionally with a cosine learning-rate schedule.

    ``lr_schedule=("cosine", peak, floor, total)`` runs Adam at
    cosine-decayed lr from ``peak`` to ``floor`` over ``total`` steps
    (constant ``floor`` afterwards). The step counter lives in the optimizer
    state, so chunked runs that thread opt_state resume the schedule exactly;
    ``lr`` is ignored when a schedule is given.

    The reference optimizes phase 1 at a CONSTANT 2e-4 for 30,000 epochs
    (main_compression.py:148-151). A decayed schedule is encoder-side only
    (the bitstream is indices; the schedule never leaves the encoder) and is
    the measured matched-RD lever for shortening phase 1: the windowed ELBO
    keeps improving 0.2-1% per 2000-epoch window all the way to 30k at
    constant lr (docs/SCHEDULE.md), so plateau stops never fire and hard
    caps cost 0.4 dB — decaying the lr converges the same trajectory in
    fewer epochs instead."""
    if lr_schedule is None:
        return optax.adam(lr)
    kind, peak, floor, total = lr_schedule
    assert kind == "cosine", lr_schedule
    sched = optax.cosine_decay_schedule(
        init_value=float(peak), decay_steps=int(total),
        alpha=float(floor) / float(peak))
    return optax.chain(
        optax.scale_by_adam(), optax.scale_by_schedule(sched),
        optax.scale(-1.0))


def _anneal_all(s: CodecState, codec: Codec, cfg: ModalityConfig) -> CodecState:
    s = s.replace_level("w", update_betas(s.w, codec.w, cfg.bits_per_group))
    if s.h is not None:
        s = s.replace_level("h", update_betas(s.h, codec.h, cfg.bits_per_group))
        s = s.replace_level("hh", update_betas(s.hh, codec.hh, cfg.bits_per_group))
    return s


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "n_epochs", "lr", "sample_size", "kl_adjust_gap", "adjust_betas",
        "return_opt_state", "remat", "precision", "return_loss", "lr_schedule",
    ),
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
    opt_state=None,
    return_opt_state: bool = False,
    remat: bool = False,
    precision: Optional[str] = None,
    return_loss: bool = False,
    lr_schedule: Optional[tuple] = None,
) -> CodecState:
    """MC-ELBO posterior optimization with in-scan beta annealing
    (test_model.py:621-635). By default Adam starts fresh, matching the
    reference's optimizer re-init at every finetune
    (test_model.py:722,771,821); pass/return opt_state to split one long run
    into chunks without perturbing the dynamics.

    NOTE: ``state`` is DONATED (its buffers are consumed) — rebind the
    result, never reuse the argument after the call. On CPU donation is a
    no-op; on TPU reuse raises "array has been deleted".

    remat=True rematerializes the ELBO forward in the backward pass
    (jax.checkpoint): cuts the stored activation chain — the dominant HBM
    allocation at kodak/video encode scale, where S=5 over thousands of
    pixels per row OOMs a 16 GB chip — for ~1.3x epoch compute.

    precision scopes exact-f32 matmuls to THIS optimization's INR einsums
    (models/inr.py); the coding-phase finetunes pass 'highest' to recover
    the measured ~0.35 dB bf16-pass deficit without taxing phase 1
    (docs/HEAD_TO_HEAD.md).

    return_loss=True additionally returns the per-epoch loss trajectory
    (n_epochs,) — the instrumentation surface the adaptive encode schedule
    was calibrated on (scripts/schedule_trajectory.py).

    ``lr_schedule``: see _make_opt — cosine-decayed Adam whose step counter
    threads through opt_state across chunks (``lr`` ignored when given)."""
    opt = _make_opt(lr, lr_schedule)
    loss_fn = _elbo_loss_fn(codec, X, Y, cfg, sample_size, precision, remat)

    if opt_state is None:
        opt_state = opt.init(_trainables(state))

    def epoch(carry, inputs):
        s, o = carry
        i, k = inputs

        # gradient first, THEN the annealing update: the reference builds the
        # elbo graph (capturing the current betas) before calling
        # update_annealing_factors (test_model.py:623-632), so new betas only
        # weight the FOLLOWING epoch's gradient.
        loss, grads = jax.value_and_grad(loss_fn)(_trainables(s), s, k)

        if adjust_betas:
            s = jax.lax.cond(
                i % kl_adjust_gap == 0,
                lambda s: _anneal_all(s, codec, cfg),
                lambda s: s,
                s,
            )

        updates, o = opt.update(grads, o)
        qs = optax.apply_updates(_trainables(s), updates)
        return (_with_trainables(s, qs), o), (loss if return_loss else None)

    keys = jax.random.split(key, n_epochs)
    idxs = jnp.arange(n_epochs)
    (state, opt_state), losses = jax.lax.scan(epoch, (state, opt_state), (idxs, keys))
    out = (state,)
    if return_opt_state:
        out = out + (opt_state,)
    if return_loss:
        out = out + (losses,)
    return out if len(out) > 1 else state


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "lr", "sample_size", "kl_adjust_gap", "window", "remat",
        "precision", "monitor", "lr_schedule",
    ),
    donate_argnums=(1,),
)
def optimize_adaptive(
    codec: Codec,
    state: CodecState,
    X: jax.Array,
    Y: jax.Array,
    key: jax.Array,
    epoch0,
    max_epoch,
    min_epoch,
    rel_tol,
    es_carry,
    *,
    cfg: ModalityConfig,
    lr: float = 2e-4,
    sample_size: int = 5,
    kl_adjust_gap: int = 10,
    window: int = 25,
    remat: bool = False,
    precision: Optional[str] = None,
    opt_state=None,
    monitor: str = "loss",
    lr_schedule: Optional[tuple] = None,
):
    """Early-stopping MC-ELBO optimization: same per-epoch math as
    ``optimize`` but run in a lax.while_loop that HALTS on device when the
    windowed mean loss stops improving — the adaptive encode schedule
    (VERDICT r3 #1). The reference's budgets are fixed
    (main_compression.py:148-158: 30,000 phase-1 epochs + per-group
    finetunes of max(30000/n_groups, 50)) regardless of convergence; on this
    remote tunnel a HOST-side stop test would cost a round trip per window,
    so the windowed-plateau test runs inside the compiled loop and the host
    only sees the final epoch count.

    Stop rule, evaluated every ``window`` epochs once ``min_epoch`` (global)
    epochs have run: halt when mean(loss over this window) fails to improve
    on the previous window by more than ``rel_tol * |window mean|``. The MC
    ELBO is noisy (sample_size=5), so the window must average enough epochs
    for the plateau signal to clear the noise floor — calibrated on measured
    trajectories (docs/SCHEDULE.md).

    ``monitor`` picks the watched scalar: ``'loss'`` (full ELBO — right for
    short finetunes, whose group betas are frozen-settled) or ``'mse'``
    (the distortion term only — right for PHASE 1, where update_betas keeps
    the KL term nonstationary for the whole run so the windowed ELBO never
    plateaus; the distortion term flattens once the posteriors converge,
    docs/SCHEDULE.md trajectory). Gradients always come from the full ELBO;
    only the stop statistic changes.

    Dynamic args (no recompile across finetune budgets): ``epoch0`` (global
    epoch counter at entry — keeps kl_adjust_gap phase and window boundaries
    aligned across resumable chunks), ``max_epoch``/``min_epoch`` (global
    bounds), ``rel_tol``, and ``es_carry = (prev_window_mean, window_sum)``
    (pass (inf, 0.0) to start; thread the returned value across chunks).

    Returns (state, opt_state, es_carry, epochs_done_global, stopped).
    ``state`` is DONATED, as in ``optimize``; the epoch RNG substream is
    split from ``key`` per epoch (a different but equally deterministic
    stream than optimize's pre-split array — crash-resume replays it
    exactly from the same key).
    """
    opt = _make_opt(lr, lr_schedule)
    loss_fn = _elbo_loss_fn(codec, X, Y, cfg, sample_size, precision, remat,
                            with_aux=True)

    if opt_state is None:
        opt_state = opt.init(_trainables(state))
    prev_win, cur_sum = es_carry

    def cond(c):
        _s, _o, _k, i, _prev, _cur, stop = c
        return (i < max_epoch) & ~stop

    def body(c):
        s, o, k, i, prev, cur, stop = c
        k, sub = jax.random.split(k)
        (loss, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            _trainables(s), s, sub)
        loss = mse if monitor == "mse" else loss
        s = jax.lax.cond(
            i % kl_adjust_gap == 0,
            lambda s: _anneal_all(s, codec, cfg),
            lambda s: s,
            s,
        )
        updates, o = opt.update(grads, o)
        s = _with_trainables(s, optax.apply_updates(_trainables(s), updates))

        cur = cur + loss
        boundary = (i + 1) % window == 0
        win = cur / window
        plateau = (prev - win) < rel_tol * jnp.abs(win)
        stop = boundary & plateau & ((i + 1) >= min_epoch) & jnp.isfinite(prev)
        prev = jnp.where(boundary, win, prev)
        cur = jnp.where(boundary, 0.0, cur)
        return (s, o, k, i + 1, prev, cur, stop)

    state, opt_state, key, i, prev_win, cur_sum, stopped = jax.lax.while_loop(
        cond,
        body,
        (state, opt_state, key, jnp.asarray(epoch0, jnp.int32),
         jnp.asarray(prev_win, jnp.float32), jnp.asarray(cur_sum, jnp.float32),
         jnp.asarray(False)),
    )
    # key is the carried post-split key: thread it into the next chunk so a
    # chunked adaptive run consumes ONE continuous epoch substream
    return state, opt_state, key, (prev_win, cur_sum), i, stopped


# ----------------------------------------------------------- encode step


def encode_step_level(ls: LevelState, meta: LevelMeta) -> LevelState:
    """Code ONE group per coded row, in parallel over all rows: pick each
    row's max-KL uncompressed group, A*-score it against the shared codebook
    via the [eps^2, eps] matmul basis, freeze the winning sample.

    Equivalent to one sweep of the reference's per-row host loop
    (test_model.py:806-818 + compress_group/sample_group :501-533,586-595).
    Runs outside the optimization loop: the coded-view gathers and the
    physical scatter here are forward-only.
    """
    R, Gmax, D = ls.q.loc.shape[0], meta.Gmax, meta.D

    kls = group_kl(ls, meta) / jnp.log(2.0)
    kls = jnp.where(ls.compressed, -jnp.inf, kls)
    g = jnp.argmax(kls, axis=1).astype(jnp.int32)  # (R,) per coded row
    start = meta.group_start[g]
    size = meta.group_size[g]

    # coded-window cell coordinates, padded to Gmax
    cols = start[:, None] + jax.lax.broadcasted_iota(jnp.int32, (R, Gmax), 1)
    valid = cols < (start + size)[:, None]
    cols_c = jnp.minimum(cols, D - 1)  # clamp pad lanes
    d_cols = meta.param2group[cols_c]  # (R, Gmax) physical columns
    if meta.perm_g2p is not None:
        rows_phys = jnp.take_along_axis(meta.perm_g2p, cols_c, axis=1)
    else:
        rows_phys = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[:, None], (R, Gmax))

    q_loc = ls.q.loc[rows_phys, d_cols]
    q_scale = scale_transform(ls.q.log_scale)[rows_phys, d_cols]

    def window(s):
        return jax.lax.dynamic_slice(meta.p_loc, (s,), (Gmax,)), jax.lax.dynamic_slice(
            meta.p_scale, (s,), (Gmax,)
        )

    p_loc, p_scale = jax.vmap(window)(start)

    # log q(z) - log p(z) with z = p_loc + p_scale * eps is quadratic in eps:
    #   alpha * eps^2 + beta * eps + const,  const dropped (argmax-invariant)
    inv_q2 = 1.0 / (q_scale * q_scale)
    delta = p_loc - q_loc
    alpha = 0.5 * (1.0 - p_scale * p_scale * inv_q2)
    beta = -delta * p_scale * inv_q2
    alpha = jnp.where(valid, alpha, 0.0)
    beta = jnp.where(valid, beta, 0.0)

    # SCORING RUNS IN EXACT f32 (6-pass), unconditionally: the argmax races
    # 2^16 candidates whose top scores differ by tiny margins (truncated-
    # Gumbel chain), and |eps^2| reaches 1e4 — single-bf16-pass products
    # (~2^-9 relative) mis-pick samples often enough to cost ~0.4 dB over a
    # 125-group encode (round-3 isolation, docs/HEAD_TO_HEAD.md: finetune
    # precision alone did NOT close the gap; the torch reference scores in
    # exact f32, test_model.py:501-533). Two (2^16, Gmax) matmuls per group
    # step make this ~free against the interleaved finetunes.
    scores = (
        jnp.einsum("nj,rj->nr", meta.eps * meta.eps, alpha,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
        + jnp.einsum("nj,rj->nr", meta.eps, beta,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        + meta.gumbel[:, None]
    )
    idx = jnp.argmax(scores, axis=0).astype(jnp.int32)  # (R,)

    z = p_loc + p_scale * meta.eps[idx]  # (R, Gmax)

    # rows whose groups are all coded are a no-op (resume / ragged finishes)
    active = ~jnp.all(ls.compressed, axis=1)  # (R,) coded rows
    write = valid & active[:, None]

    # scatter the frozen sample into physical cells; pad/inactive lanes are
    # routed out of bounds and dropped (clamped duplicates would race)
    d_cols_w = jnp.where(write, d_cols, D)
    frozen_val = ls.frozen_val.at[rows_phys, d_cols_w].set(z, mode="drop")
    frozen_mask = ls.frozen_mask.at[rows_phys, d_cols_w].set(1.0, mode="drop")

    rows = jnp.arange(R)

    def gate(new, old):
        return jnp.where(active.reshape((R,) + (1,) * (new.ndim - 1)), new, old)

    return ls.replace(
        frozen_val=frozen_val,
        frozen_mask=frozen_mask,
        kl_beta=gate(ls.kl_beta.at[rows, g].set(0.0), ls.kl_beta),
        compressed=gate(ls.compressed.at[rows, g].set(True), ls.compressed),
        indices=gate(ls.indices.at[rows, g].set(idx), ls.indices),
    )


@partial(jax.jit, static_argnames=("level",))
def encode_step(codec: Codec, state: CodecState, level: str) -> CodecState:
    return state.replace_level(level, encode_step_level(state.level(level), codec.meta(level)))


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "level", "n_steps", "n_ft", "lr", "sample_size",
        "kl_adjust_gap", "window", "remat", "precision", "crn", "lr_schedule",
    ),
    donate_argnums=(1,),
)
def encode_chunk(
    codec: Codec,
    state: CodecState,
    X: jax.Array,
    Y: jax.Array,
    key: jax.Array,
    crn_key: jax.Array,
    min_epoch,
    rel_tol,
    *,
    cfg: ModalityConfig,
    level: str,
    n_steps: int,
    n_ft: int,
    lr: float = 2e-4,
    sample_size: int = 5,
    kl_adjust_gap: int = 10,
    window: int = 0,
    remat: bool = False,
    precision: Optional[str] = None,
    crn: bool = False,
    lr_schedule: Optional[str] = None,
):
    """``n_steps`` progressive group steps — each an A* encode_step plus its
    interleaved posterior finetune — fused into ONE compiled program.

    The unfused loop dispatches 2 programs + a flow-control round trip per
    group (progressive.py); on the remote-tunnel v5e that fixed overhead was
    measured at ~1.5 s/group (docs/PERF.md) against multi-second finetunes —
    and it dominates outright once the adaptive schedule shrinks the
    finetunes. Scanning K group steps per program divides the per-group
    dispatch cost by K while keeping the crash-resume/snapshot cadence at
    chunk boundaries. The reference's loop is host-side per (row, group)
    with a .item() sync per step (test_model.py:806-827).

    Numerics are BIT-IDENTICAL to the unfused path (pinned by
    tests/test_fused_coding.py): the finetune replays optimize_chunked's
    exact key chain (one split for the chunk sub-key, then the per-epoch
    pre-split) when ``window == 0``, and optimize_adaptive's per-epoch
    split chain when ``window > 0`` (adaptive early stop; ``min_epoch`` /
    ``rel_tol`` are dynamic, see optimize_adaptive). ``crn=True`` reuses
    ``crn_key`` for every finetune (common-random-numbers, progressive.py).

    Only single-chunk finetunes fuse (n_ft <= the caller's chunk_epochs
    guard); longer budgets stay on the unfused path. Returns
    (state, key, epochs_run (n_steps,)).

    ``lr_schedule='cosine'`` decays each finetune's lr from ``lr`` to 0 over
    its n_ft ceiling (fresh schedule per group, like the fresh Adam): an
    optimization-quality knob the reference doesn't have (constant 2e-4
    everywhere, main_compression.py:153) — measured per-finetune loss
    improvement at 2e-4 is only ~1.2% over 240 epochs (docs/SCHEDULE.md).
    """
    meta = codec.meta(level)
    if lr_schedule == "cosine":
        opt = optax.adam(optax.cosine_decay_schedule(lr, max(n_ft, 1)))
    else:
        opt = optax.adam(lr)
    loss_fn = _elbo_loss_fn(codec, X, Y, cfg, sample_size, precision, remat)

    def epoch_update(s, o, i, k):
        loss, grads = jax.value_and_grad(loss_fn)(_trainables(s), s, k)
        s = jax.lax.cond(
            i % kl_adjust_gap == 0,
            lambda s: _anneal_all(s, codec, cfg),
            lambda s: s,
            s,
        )
        updates, o = opt.update(grads, o)
        return _with_trainables(s, optax.apply_updates(_trainables(s), updates)), o, loss

    def ft_fixed(s, ft_key):
        # replay optimize_chunked's chain exactly: one (key, sub) split for
        # the single <=chunk_epochs chunk, then optimize's pre-split epochs
        _, sub = jax.random.split(ft_key)
        keys = jax.random.split(sub, n_ft)
        o = opt.init(_trainables(s))

        def epoch(carry, inp):
            s, o = carry
            i, k = inp
            s, o, _ = epoch_update(s, o, i, k)
            return (s, o), None

        (s, _), _ = jax.lax.scan(epoch, (s, o), (jnp.arange(n_ft), keys))
        return s, jnp.int32(n_ft)

    def ft_adaptive(s, ft_key):
        # optimize_adaptive's chain: per-epoch splits from the carried key
        o = opt.init(_trainables(s))

        def cond(c):
            _s, _o, _k, i, _prev, _cur, stop = c
            return (i < n_ft) & ~stop

        def body(c):
            s, o, k, i, prev, cur, stop = c
            k, sub = jax.random.split(k)
            s, o, loss = epoch_update(s, o, i, sub)
            cur = cur + loss
            boundary = (i + 1) % window == 0
            win = cur / window
            plateau = (prev - win) < rel_tol * jnp.abs(win)
            stop = boundary & plateau & ((i + 1) >= min_epoch) & jnp.isfinite(prev)
            prev = jnp.where(boundary, win, prev)
            cur = jnp.where(boundary, 0.0, cur)
            return (s, o, k, i + 1, prev, cur, stop)

        s, _o, _k, i, _p, _c, _st = jax.lax.while_loop(
            cond, body,
            (s, o, ft_key, jnp.int32(0), jnp.float32(jnp.inf),
             jnp.float32(0.0), jnp.asarray(False)),
        )
        return s, i

    finetune = ft_adaptive if window > 0 else ft_fixed

    def step(carry, _):
        s, k = carry
        s = s.replace_level(level, encode_step_level(s.level(level), meta))
        if n_ft == 0:
            return (s, k), jnp.int32(0)
        if crn:
            ft_key = crn_key
        else:
            k, ft_key = jax.random.split(k)
        s, ran = finetune(s, ft_key)
        return (s, k), ran

    (state, key), rans = jax.lax.scan(step, (state, key), None, length=n_steps)
    return state, key, rans


# ---------------------------------------------------------------- decode


def decode_level_values(meta: LevelMeta, indices: jax.Array) -> jax.Array:
    """Expand transmitted indices into coded-order parameter values (R, D).

    Fully parallel: z[r', c] = p_loc[c] + p_scale[c] * eps[idx[r', g(c)], off(c)].
    """
    D = meta.D
    gidx = meta.group_idx  # (D,)
    offs = jnp.arange(D, dtype=jnp.int32) - meta.group_start[gidx]
    sel = indices[:, gidx]  # (R, D)
    eps_vals = meta.eps[sel, offs[None, :]]
    return meta.p_loc[:D] + meta.p_scale[:D] * eps_vals


def _coded_to_physical(x_coded: jax.Array, meta: LevelMeta) -> jax.Array:
    """Coded (R, D) -> physical layout: phys[r, d] = coded[r'(r,d), group2param...].

    phys[r, d] = coded[beta_row[r, d], group2param[d]] (pure gather)."""
    if meta.beta_row is None:
        return jnp.take(x_coded, meta.group2param, axis=1)
    return x_coded[meta.beta_row, meta.group2param[None, :]]


def decode_state(codec: Codec, indices: dict, cfg: ModalityConfig) -> CodecState:
    """Reconstruct a fully-frozen CodecState from transmitted indices alone —
    the explicit decoder the reference leaves implicit."""

    def level(name: str) -> LevelState:
        meta = codec.meta(name)
        idx = jnp.asarray(indices[name], jnp.int32)
        R = idx.shape[0]
        vals = _coded_to_physical(decode_level_values(meta, idx), meta)
        return LevelState(
            q=Gaussian(loc=vals, log_scale=jnp.full((R, meta.D), -1e9)),
            frozen_mask=jnp.ones((R, meta.D)),
            frozen_val=vals,
            kl_beta=jnp.zeros((R, meta.n_groups)),
            compressed=jnp.ones((R, meta.n_groups), bool),
            indices=idx,
        )

    return CodecState(
        w=level("w"),
        h=level("h") if cfg.patch else None,
        hh=level("hh") if cfg.patch else None,
    )


@partial(jax.jit, static_argnames=("cfg", "precision"))
def decode(
    codec: Codec,
    indices: dict,
    X: jax.Array,
    cfg: ModalityConfig,
    precision: Optional[str] = "highest",
) -> jax.Array:
    """indices {'w': (R,G), 'h': ..., 'hh': ...} -> reconstruction (R, P, out).

    Deterministic: every posterior is a point mass at the decoded sample.
    Jitted: this is the receiver/serving path (one compiled program per
    geometry), and the encode-side final reconstruction.

    The CANONICAL decode evaluates the INR matmuls in exact f32
    (precision='highest'): the torch reference decodes in exact f32 by
    construction, and on TPU the bf16-pass default renders a measurably
    different (worse) reconstruction at high-PSNR operating points than the
    one the coding-phase finetunes optimized — the decode forward is one
    matmul chain per datapoint, so exactness here is ~free
    (docs/HEAD_TO_HEAD.md round 3).
    """
    state = decode_state(codec, indices, cfg)
    y = predict(codec, state, X, jax.random.key(0), cfg, sample_size=1,
                precision=precision)
    return y[:, 0]
