"""Default-loop hierarchy quality gate (VERDICT r3 weak #5 / next #7).

The full TINY_PATCH e2e fixture is multi-minute (em_train dominates) and
slow-marked, so a quality regression specific to the 3-level hierarchy path
— where both round-3 RD mechanisms (CRN finetunes, A* scoring precision)
lived — only failed under --runslow. This gate removes the em_train cost by
encoding against a CACHED prior artifact (tests/fixtures/tiny_patch_prior.npz,
built by the recipe in the module docstring below) so the hierarchy encode +
decode path runs in the default budget.

The floor is pinned at measured-green minus 0.75 dB (CPU path is
deterministic for fixed inputs), so an artificial >=0.75 dB hierarchy
reconstruction degradation fails the DEFAULT suite, not only --runslow.

Fixture recipe (rebuild only if the artifact format changes):
    em_train(key(0), TINY_PATCH, synthetic_dataset(TINY_PATCH, 3, seed=10),
             max_bitrate=1.2, n_em_iters=25, first_epochs=40,
             later_epochs=20, lr=2e-3)  # KL settles to ~144 bits -> ~20
    build_prior_artifact(...); save_prior_artifact(fixture_path, art)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from recombiner_tpu.coding.encoder import decode, init_codec
from recombiner_tpu.coding.progressive import compress
from recombiner_tpu.data.synthetic import synthetic_dataset
from recombiner_tpu.io.checkpoint import load_prior_artifact
from recombiner_tpu.metrics import batch_psnr

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "tiny_patch_prior.npz")

# measured 2026-08-20 on the deterministic CPU path (this exact call):
# 16.9356 dB. Floor = measured - 0.75 so a >=0.75 dB hierarchy regression
# fails in the default loop while numeric jitter (XLA version bumps) passes.
PSNR_GREEN = 16.9356
PSNR_FLOOR = PSNR_GREEN - 0.75


def test_hierarchy_encode_decode_quality_gate():
    art = load_prior_artifact(FIXTURE)
    cfg = art.config
    assert cfg.patch and cfg.name == "tiny_patch"

    Xt, Yt = synthetic_dataset(cfg, 2, seed=99)
    codec, state = init_codec(art, n_rows=Xt.shape[0])

    res = compress(
        codec, state, jnp.array(Xt), jnp.array(Yt), cfg, jax.random.key(1),
        n_optimize_epochs=40, lr=2e-3, sample_size=2,
        finetune_overrides={"w": 2, "h": 2, "hh": 2},
        fused_steps=16,
    )

    # all three levels fully coded
    for name in codec.level_names:
        assert bool(np.asarray(res.state.level(name).compressed).all()), name

    # decode from indices ONLY reproduces the reported reconstruction
    dec = np.asarray(decode(codec, res.indices, jnp.array(Xt), cfg))
    np.testing.assert_array_equal(dec, res.reconstruction)

    got = float(batch_psnr(Yt, res.reconstruction, round8=False).mean())
    assert got > PSNR_FLOOR, (got, PSNR_FLOOR)
