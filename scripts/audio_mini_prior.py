#!/usr/bin/env python3
"""Train the audio_mini head-to-head prior (VERDICT r3 next #5).

Full-EM prior on 256 synthetic 1-D patch rows (= 64 audio_mini datapoints,
800 samples each), saved as a versioned artifact under docs/schedule_priors
for scripts/head_to_head.py --geometry audio_mini — the 1-D analogue of the
kodak_mini patch h2h prior (same train seed 42; the h2h test rows use
synthetic_dataset(cfg, n, seed=43) exactly like the other geometries).

    nohup python scripts/audio_mini_prior.py > /tmp/audio_mini_prior.log &
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
from recombiner_tpu.priors.trainer import em_train, forward

OUT = "docs/schedule_priors/PRIOR_rd_audio_mini_bitrate=2.npz"
BITRATE = 2.0  # bits/sample (audio_mini is not name=="audio": no kbps map)


def main() -> None:
    cfg = AUDIO_MINI
    X, Y = synthetic_dataset(cfg, 256, seed=42)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    t0 = time.perf_counter()

    def checkpoint_fn(em_iter, state, priors, kl_beta, controller):
        art = build_prior_artifact(state, priors, kl_beta, cfg, codebook_seed=42)
        save_prior_artifact(OUT, art)

    def log_fn(em_iter, rec, state, priors):
        y_hat = np.asarray(forward(state, Xj, jax.random.key(em_iter), cfg)[:, 0])
        psnr = batch_psnr(Y, y_hat, round8=False).mean()
        print(
            f"[{em_iter}] PSNR {psnr:.3f}; KL {rec['kl_bits']:.2f} bits; "
            f"beta {rec['kl_beta']:.3g}; {time.perf_counter() - t0:.0f}s",
            flush=True,
        )

    res = em_train(
        jax.random.key(42), cfg, Xj, Yj, max_bitrate=BITRATE,
        n_em_iters=550, first_epochs=200, later_epochs=100, lr=2e-4,
        checkpoint_fn=checkpoint_fn, log_fn=log_fn,
    )
    art = build_prior_artifact(res.state, res.priors, res.kl_beta, cfg,
                               codebook_seed=42)
    save_prior_artifact(OUT, art)
    print(f"saved {OUT} ({time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
