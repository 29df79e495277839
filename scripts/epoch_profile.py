#!/usr/bin/env python3
"""Per-component attribution of the S=5 encode epoch at R=500 (VERDICT r3 #5).

The 26.9 ms epoch = INR chain (17.9, at its K=32 occupancy roofline,
docs/PERF.md) + upsampler (5.6) + a ~3.4 ms sampling/optimizer tail nobody
has itemized. This script times each sub-graph as a 60-iteration scanned
program (same discipline as the epoch itself: one dispatch, warm-exact
executable, device_get sync) so dispatch overhead cancels:

  epoch            full optimize() epoch (grad + annealing + adam)
  grad_only        value_and_grad of the ELBO (no adam update)
  adam_only        optax.adam update of the posteriors from fixed grads
  fwd_predict      ELBO forward only
  fwd_bwd_lpe      lpe_to_pe (phase-decomposed conv stack) fwd+bwd
  fwd_bwd_sample   posterior sampling + blending only, fwd+bwd
  fwd_bwd_inr      inr_forward (x@W chain + @A) fwd+bwd on fixed inputs

    python scripts/epoch_profile.py > docs/epoch_profile.json
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, ".")
    from bench import N_IMAGES, _init_A, _init_up

    from recombiner_tpu.coding.encoder import (
        _effective,
        beta_weighted_kl,
        init_codec,
        optimize,
        predict,
    )
    from recombiner_tpu.config import CIFAR
    from recombiner_tpu.data.synthetic import synthetic_dataset
    from recombiner_tpu.io.checkpoint import LevelArtifact, PriorArtifact
    from recombiner_tpu.models.inr import inr_forward
    from recombiner_tpu.models.mappings import lpe_to_pe, sample_hierarchical_latents
    from recombiner_tpu.priors.grouping import compute_grouping
    from recombiner_tpu.utils.timing import sync

    cfg = CIFAR
    S = 5
    rng = np.random.default_rng(0)
    D = cfg.n_coded_params
    kl_bits = rng.lognormal(0.0, 1.0, D)
    kl_bits *= 128 * cfg.bits_per_group / kl_bits.sum()
    art = PriorArtifact(
        config=cfg, kl_beta=1e-6,
        w=LevelArtifact(
            p_loc=rng.normal(0, 0.02, D).astype(np.float32),
            p_scale=np.abs(rng.normal(0.02, 0.005, D)).astype(np.float32) + 1e-3,
            avg_log_scale=np.full(D, -4.0, np.float32),
            grouping=compute_grouping(kl_bits, max_bits=cfg.bits_per_group),
        ),
        h=None, hh=None, A=_init_A(cfg), up=_init_up(cfg),
    )
    X, Y = synthetic_dataset(cfg, N_IMAGES, seed=1)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    codec, state = init_codec(art, n_rows=N_IMAGES)
    R = N_IMAGES
    n_inr = cfg.n_inr_params
    N = 60

    sync(jnp.zeros(8) + 1.0)
    out = {"R": R, "S": S, "n_meas": N, "platform": jax.devices()[0].platform}

    def timed(name, fn, *args):
        fn(*args)  # compile + first-execution cost
        sync(fn(*args))
        t0 = time.perf_counter()
        sync(fn(*args))
        out[name] = (time.perf_counter() - t0) / N
        print(f"# {name}: {out[name]*1e3:.2f} ms", file=sys.stderr, flush=True)

    # ---- full epoch via the production optimize()
    st = jax.tree_util.tree_map(jnp.copy, state)
    kw = dict(cfg=cfg, n_epochs=N, lr=2e-4, sample_size=S, return_opt_state=True)
    st, _ = optimize(codec, st, Xj, Yj, jax.random.key(1), **kw)
    sync(st.w.q.loc)
    st, _ = optimize(codec, st, Xj, Yj, jax.random.key(2), **kw)
    sync(st.w.q.loc)
    t0 = time.perf_counter()
    st, _ = optimize(codec, st, Xj, Yj, jax.random.key(3), **kw)
    sync(st.w.q.loc)
    out["epoch"] = (time.perf_counter() - t0) / N
    print(f"# epoch: {out['epoch']*1e3:.2f} ms", file=sys.stderr, flush=True)

    # shared ELBO loss on the (frozen-blend) posteriors
    def loss_fn(q, k):
        s2 = state.replace_level("w", state.w.replace(q=q))
        y_hat = predict(codec, s2, Xj, k, cfg, sample_size=S)
        mse = jnp.mean((y_hat - Yj[:, None]) ** 2) * R
        return mse + beta_weighted_kl(s2.w, codec.w)

    @jax.jit
    def grad_scan(q, key):
        def body(c, k):
            g = jax.grad(loss_fn)(c, k)
            # carry a q perturbed by the grad so iterations aren't CSE'd away
            return jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, c, g), None
        qf, _ = jax.lax.scan(body, q, jax.random.split(key, N))
        return qf

    timed("grad_only", grad_scan, state.w.q, jax.random.key(5))

    # ---- adam update alone (fixed grads)
    opt = optax.adam(2e-4)

    @jax.jit
    def adam_scan(q, g):
        o = opt.init(q)
        def body(c, _):
            qq, oo = c
            up, oo = opt.update(g, oo)
            return (optax.apply_updates(qq, up), oo), None
        (qf, _), _ = jax.lax.scan(body, (q, o), None, length=N)
        return qf

    g0 = jax.jit(jax.grad(loss_fn))(state.w.q, jax.random.key(6))
    timed("adam_only", adam_scan, state.w.q, g0)

    # ---- forward only
    @jax.jit
    def fwd_scan(q, key):
        def body(acc, k):
            s2 = state.replace_level("w", state.w.replace(q=q))
            y = predict(codec, s2, Xj, k, cfg, sample_size=S)
            return acc + y.mean(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, N))
        return acc

    timed("fwd_predict", fwd_scan, state.w.q, jax.random.key(7))

    # ---- component fwd+bwd sub-graphs (dummy sum losses)
    loc, scale = _effective(state.w)
    lpe_loc = loc[:, n_inr:].reshape(R, *cfg.lpe_spatial, cfg.latent_dim)
    lpe_scale = scale[:, n_inr:].reshape(R, *cfg.lpe_spatial, cfg.latent_dim)

    @jax.jit
    def lpe_scan(ll, key):
        def body(acc, k):
            eps = jax.random.normal(k, (R, S, *ll.shape[1:]))
            lpe = ll[:, None] + lpe_scale[:, None] * eps
            def f(a):
                return lpe_to_pe(codec.up, a, cfg).mean()
            v, g = jax.value_and_grad(f)(lpe)
            return acc + v + g.mean(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, N))
        return acc

    timed("fwd_bwd_lpe", lpe_scan, lpe_loc, jax.random.key(8))

    # bf16-input conv stack (VERDICT r3 #5: the GPU baseline grants the
    # reference TF32 convs; cfg.compute_dtype="bfloat16" is our equivalent
    # lever — decode-affecting, so it must be measured before it can ship)
    import dataclasses

    cfg_bf16 = dataclasses.replace(cfg, compute_dtype="bfloat16")

    @jax.jit
    def lpe_scan_bf16(ll, key):
        def body(acc, k):
            eps = jax.random.normal(k, (R, S, *ll.shape[1:]))
            lpe = ll[:, None] + lpe_scale[:, None] * eps
            def f(a):
                return lpe_to_pe(codec.up, a, cfg_bf16).mean()
            v, g = jax.value_and_grad(f)(lpe)
            return acc + v + g.mean(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, N))
        return acc

    timed("fwd_bwd_lpe_bf16", lpe_scan_bf16, lpe_loc, jax.random.key(8))

    @jax.jit
    def sample_scan(q, key):
        def body(acc, k):
            def f(qq):
                s2 = state.replace_level("w", state.w.replace(q=qq))
                lo, sc = _effective(s2.w)
                h_w = sample_hierarchical_latents(
                    k, lo[:, :n_inr], sc[:, :n_inr],
                    None, None, None, None, S, cfg)
                return h_w.mean()
            v, g = jax.value_and_grad(f)(q)
            return acc + v + g.loc.mean(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, N))
        return acc

    timed("fwd_bwd_sample", sample_scan, state.w.q, jax.random.key(9))

    x0 = jnp.zeros((R, S, cfg.n_pixels, cfg.input_dim), jnp.float32) + 0.1
    hw0 = jnp.zeros((R, S, n_inr), jnp.float32) + 0.01

    @jax.jit
    def inr_scan(hw, key):
        def body(acc, k):
            def f(h):
                return inr_forward(x0, h, codec.A, cfg).mean()
            v, g = jax.value_and_grad(f)(hw + 1e-6 * acc)
            return acc + v + g.mean(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, N))
        return acc

    timed("fwd_bwd_inr", inr_scan, hw0, jax.random.key(10))

    out["tail_ms"] = (out["epoch"] - out["grad_only"]) * 1e3
    out["attribution_note"] = (
        "epoch = grad_only + annealing/adam + scan bookkeeping; "
        "grad_only ~= fwd_bwd_inr + fwd_bwd_lpe + fwd_bwd_sample + mse/kl"
    )
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
