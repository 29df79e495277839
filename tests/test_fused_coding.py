"""Fused coding chunks (encoder.encode_chunk): K group steps + interleaved
finetunes per compiled program must be BIT-IDENTICAL to the 2-programs-per-
group loop — same key chains, same ops, same order. The fusion exists purely
to divide the per-group dispatch overhead (~1.5 s/group on the remote
tunnel, docs/PERF.md) by K."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recombiner_tpu.coding.encoder import init_codec
from recombiner_tpu.coding.progressive import compress
from recombiner_tpu.config import TINY, TINY_PATCH
from recombiner_tpu.data.synthetic import synthetic_dataset
from recombiner_tpu.priors.artifact import build_prior_artifact
from recombiner_tpu.priors.trainer import em_train


def _artifact(cfg, seed=0):
    X, Y = synthetic_dataset(cfg, 2, seed=seed)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    res = em_train(jax.random.key(0), cfg, Xj, Yj, max_bitrate=2.0,
                   n_em_iters=2, first_epochs=10, later_epochs=5, lr=2e-3)
    return build_prior_artifact(res.state, res.priors, res.kl_beta, cfg), Xj, Yj


def _run(art, Xj, Yj, cfg, *, fused_steps, finetune_stop=None,
         finetune_crn=None):
    codec, state = init_codec(art, n_rows=2)
    return compress(
        codec, state, Xj, Yj, cfg, jax.random.key(7),
        n_optimize_epochs=30, lr=2e-3, sample_size=2,
        finetune_overrides={"w": 12, "h": 12, "hh": 12},
        fused_steps=fused_steps, finetune_stop=finetune_stop,
        finetune_crn=finetune_crn,
    )


@pytest.mark.parametrize("crn", [False, True], ids=["split", "crn"])
def test_fused_matches_unfused_fixed_budget(crn):
    cfg = TINY
    art, Xj, Yj = _artifact(cfg)
    ref = _run(art, Xj, Yj, cfg, fused_steps=None, finetune_crn=crn)
    fus = _run(art, Xj, Yj, cfg, fused_steps=5, finetune_crn=crn)
    np.testing.assert_array_equal(ref.indices["w"], fus.indices["w"])
    np.testing.assert_array_equal(
        np.asarray(ref.state.w.q.loc), np.asarray(fus.state.w.q.loc))
    np.testing.assert_array_equal(ref.reconstruction, fus.reconstruction)
    assert ref.timings["finetune_epochs"] == fus.timings["finetune_epochs"]


def test_fused_matches_unfused_adaptive():
    cfg = TINY
    art, Xj, Yj = _artifact(cfg)
    stop = (4, 5e-3, 8)
    ref = _run(art, Xj, Yj, cfg, fused_steps=None, finetune_stop=stop)
    fus = _run(art, Xj, Yj, cfg, fused_steps=5, finetune_stop=stop)
    np.testing.assert_array_equal(ref.indices["w"], fus.indices["w"])
    np.testing.assert_array_equal(
        np.asarray(ref.state.w.q.loc), np.asarray(fus.state.w.q.loc))
    assert ref.timings["finetune_epochs"] == fus.timings["finetune_epochs"]
    # the adaptive rule must actually have engaged somewhere, or this test
    # degenerates to the fixed-budget case
    assert ref.timings["finetune_epochs"] < ref.timings["finetune_budget"]


@pytest.mark.slow
def test_fused_matches_unfused_hierarchy():
    """3-level patch topology: h/hh levels fuse too (CRN auto-on)."""
    cfg = TINY_PATCH
    art, Xj, Yj = _artifact(cfg, seed=3)
    ref = _run(art, Xj, Yj, cfg, fused_steps=None)
    fus = _run(art, Xj, Yj, cfg, fused_steps=8)
    for name in ("w", "h", "hh"):
        np.testing.assert_array_equal(ref.indices[name], fus.indices[name])
    np.testing.assert_array_equal(ref.reconstruction, fus.reconstruction)
