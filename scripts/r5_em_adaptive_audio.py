#!/usr/bin/env python3
"""Train the audio_mini prior under --em_schedule adaptive (VERDICT r4 #6).

Identical to scripts/audio_mini_prior.py (same data, seed, schedule
ceiling 550x(200/100)) except em_stop = the resolve_em_schedule('adaptive')
preset, so EM halts at the joint (windowed-mse plateau) x (realized rate
settled) point. The demo pairs its h2h encodes against the full-550 prior's
(docs/schedule_priors/PRIOR_rd_audio_mini_bitrate=2.npz, encodes
ours_audio_mini_s7.json 69.785 @ full schedule).

    python scripts/r5_em_adaptive_audio.py > /tmp/em_adaptive_audio.log 2>&1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from recombiner_tpu.config import AUDIO_MINI
from recombiner_tpu.data.synthetic import synthetic_dataset
from recombiner_tpu.io.checkpoint import save_prior_artifact
from recombiner_tpu.metrics import batch_psnr
from recombiner_tpu.priors.artifact import build_prior_artifact
from recombiner_tpu.priors.trainer import em_train, forward, resolve_em_schedule

OUT = "docs/r5_em_adaptive/PRIOR_rd_audio_mini_bitrate=2.npz"
BITRATE = 2.0


def main() -> None:
    cfg = AUDIO_MINI
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    X, Y = synthetic_dataset(cfg, 256, seed=42)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    t0 = time.perf_counter()

    def log_fn(em_iter, rec, state, priors):
        y_hat = np.asarray(forward(state, Xj, jax.random.key(em_iter), cfg)[:, 0])
        psnr = batch_psnr(Y, y_hat, round8=False).mean()
        rate = (f" rate {rec['realized_bitrate']:.3f} aim {rec['budget_aim']:.3f}"
                if "realized_bitrate" in rec else "")
        print(
            f"[{em_iter}] PSNR {psnr:.3f}; mse {rec['mse']:.7f}; "
            f"KL {rec['kl_bits']:.2f} bits; beta {rec['kl_beta']:.3g};"
            f"{rate} {time.perf_counter() - t0:.0f}s",
            flush=True,
        )

    res = em_train(
        jax.random.key(42), cfg, Xj, Yj, max_bitrate=BITRATE,
        n_em_iters=550, first_epochs=200, later_epochs=100, lr=2e-4,
        log_fn=log_fn,
        em_stop=resolve_em_schedule("adaptive", None, 550),
    )
    stp = (res.controller or {}).get("em_stop")
    sel = (res.controller or {}).get("selected")
    print(f"em_stop: {stp}; selected: {sel}", flush=True)
    art = build_prior_artifact(res.state, res.priors, res.kl_beta, cfg,
                               codebook_seed=42)
    save_prior_artifact(OUT, art)
    print(f"saved {OUT} ({time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
