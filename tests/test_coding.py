import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recombiner_tpu.coding.codebook import make_codebook
from recombiner_tpu.coding.encoder import (
    decode,
    decode_level_values,
    encode_step,
    group_kl,
    init_codec,
    level_kl,
    optimize,
    predict,
    update_betas,
)
from recombiner_tpu.coding.gumbel import gumbel_chain
from recombiner_tpu.config import TINY, TINY_PATCH
from recombiner_tpu.data.synthetic import synthetic_dataset
from recombiner_tpu.models.gaussian import scale_transform
from recombiner_tpu.priors.artifact import build_prior_artifact
from recombiner_tpu.priors.trainer import em_train


def test_gumbel_chain_recurrence_and_monotonicity():
    g = gumbel_chain(1000, seed=42)
    assert np.all(np.diff(g) < 0)  # strictly decreasing
    # matches the reference's sequential recurrence (test_model.py:448-455)
    rng = np.random.RandomState(42)
    log_u = np.log(rng.rand(1000))
    bound = -np.log(-log_u[0])
    seq = [bound]
    for i in range(1, 1000):
        bound = -np.log(-log_u[i] + np.exp(-bound))
        seq.append(bound)
    np.testing.assert_allclose(g, np.array(seq), rtol=1e-10)


def test_gumbel_chain_deterministic():
    np.testing.assert_array_equal(gumbel_chain(100, 7), gumbel_chain(100, 7))
    assert not np.allclose(gumbel_chain(100, 7), gumbel_chain(100, 8))


def test_codebook_determinism_and_level_separation():
    a = np.asarray(make_codebook(42, "w", 64, 16))
    b = np.asarray(make_codebook(42, "w", 64, 16))
    c = np.asarray(make_codebook(42, "h", 64, 16))
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)
    assert abs(a.mean()) < 0.1 and abs(a.std() - 1.0) < 0.1


def test_codebook_sobol_backend():
    s = np.asarray(make_codebook(42, "w", 64, 8, kind="sobol"))
    assert s.shape == (64, 8)
    assert np.abs(s).max() <= 100.0
    s2 = np.asarray(make_codebook(42, "w", 64, 8, kind="sobol"))
    np.testing.assert_array_equal(s, s2)


@pytest.fixture(scope="module")
def tiny_artifact():
    cfg = TINY
    X, Y = synthetic_dataset(cfg, 2, seed=4)
    res = em_train(
        jax.random.key(0), cfg, jnp.array(X), jnp.array(Y), max_bitrate=6.0,
        n_em_iters=2, first_epochs=30, later_epochs=15, lr=2e-3,
    )
    art = build_prior_artifact(res.state, res.priors, res.kl_beta, cfg)
    return cfg, art, X, Y


def test_init_codec_state(tiny_artifact):
    cfg, art, X, Y = tiny_artifact
    codec, state = init_codec(art, n_rows=2)
    assert codec.h is None
    D = cfg.n_coded_params
    assert codec.w.D == D
    assert state.w.q.loc.shape == (2, D)  # physical (param-order) storage
    np.testing.assert_allclose(np.asarray(state.w.q.loc[0]), art.w.p_loc, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state.w.q.log_scale[0]), art.w.avg_log_scale, rtol=1e-6
    )
    # the coded view of the priors is the param2group reorder
    p2g = art.w.grouping.param2group
    np.testing.assert_allclose(
        np.asarray(codec.w.p_loc[:D]), art.w.p_loc[p2g], rtol=1e-6
    )
    assert not bool(np.asarray(state.w.compressed).any())


def test_encode_step_freezes_one_group_per_row(tiny_artifact):
    cfg, art, X, Y = tiny_artifact
    codec, state = init_codec(art, n_rows=2)
    s1 = encode_step(codec, state, "w")
    comp = np.asarray(s1.w.compressed)
    assert comp.sum(axis=1).tolist() == [1, 1]
    # the chosen group was each row's max-KL group
    kls = np.asarray(group_kl(state.w, codec.w))
    chosen = comp.argmax(axis=1)
    np.testing.assert_array_equal(chosen, kls.argmax(axis=1))
    # betas zeroed for coded groups
    beta = np.asarray(s1.w.kl_beta)
    assert (beta[np.arange(2), chosen] == 0).all()
    # frozen values match the codebook formula z = p_loc + p_scale * eps[idx];
    # storage is physical, so map coded window cells -> param columns
    meta = codec.w
    p2g = np.asarray(meta.param2group)
    fv = np.asarray(s1.w.frozen_val)
    fm = np.asarray(s1.w.frozen_mask)
    for r in range(2):
        g = chosen[r]
        st_, en = int(meta.group_start[g]), int(meta.group_start[g] + meta.group_size[g])
        idx = int(np.asarray(s1.w.indices)[r, g])
        z = np.asarray(meta.p_loc)[st_:en] + np.asarray(meta.p_scale)[st_:en] * np.asarray(
            meta.eps
        )[idx, : en - st_]
        d_cols = p2g[st_:en]
        np.testing.assert_allclose(fv[r, d_cols], z, rtol=1e-6)
        assert (fm[r, d_cols] == 1).all()
        # exactly group_size cells frozen in this row
        assert fm[r].sum() == en - st_


def test_encode_step_score_matches_bruteforce_oracle(tiny_artifact):
    """The matmul-basis scoring must select the same sample as the direct
    log q - log p + gumbel computation (test_model.py:501-533)."""
    cfg, art, X, Y = tiny_artifact
    codec, state = init_codec(art, n_rows=2)
    # perturb q so scores are non-degenerate
    key = jax.random.key(11)
    state = state.replace_level(
        "w",
        state.w.replace(
            q=state.w.q.replace(
                loc=state.w.q.loc + 0.05 * jax.random.normal(key, state.w.q.loc.shape)
            )
        ),
    )
    s1 = encode_step(codec, state, "w")
    meta = codec.w
    kls = np.asarray(group_kl(state.w, meta))
    for r in range(2):
        g = int(kls[r].argmax())
        st_ = int(meta.group_start[g])
        size = int(meta.group_size[g])
        eps = np.asarray(meta.eps, np.float64)[:, :size]
        p_loc = np.asarray(meta.p_loc, np.float64)[st_ : st_ + size]
        p_scale = np.asarray(meta.p_scale, np.float64)[st_ : st_ + size]
        # q storage is physical: window columns map through param2group
        d_cols = np.asarray(meta.param2group)[st_ : st_ + size]
        q_loc = np.asarray(state.w.q.loc, np.float64)[r, d_cols]
        q_scale = np.asarray(scale_transform(state.w.q.log_scale), np.float64)[
            r, d_cols
        ]
        z = p_loc + p_scale * eps
        logp = (-0.5 * ((z - p_loc) / p_scale) ** 2 - np.log(p_scale)).sum(-1)
        logq = (-0.5 * ((z - q_loc) / q_scale) ** 2 - np.log(q_scale)).sum(-1)
        scores = logq - logp + np.asarray(meta.gumbel, np.float64)
        idx_chosen = int(np.asarray(s1.w.indices)[r, g])
        # allow f32-vs-f64 near-ties: chosen score within tiny margin of best
        assert scores[idx_chosen] >= scores.max() - 1e-3


def test_decode_level_values_roundtrip(tiny_artifact):
    cfg, art, X, Y = tiny_artifact
    codec, state = init_codec(art, n_rows=2)
    # code ALL groups
    for _ in range(codec.w.n_groups):
        state = encode_step(codec, state, "w")
    assert bool(np.asarray(state.w.compressed).all())
    vals = np.asarray(decode_level_values(codec.w, state.w.indices))
    # map coded values to physical layout for comparison with storage
    frozen = np.asarray(state.w.frozen_val)
    phys = vals[:, np.asarray(codec.w.group2param)]
    # agree to float32 rounding (XLA may fuse mul+add differently in the two
    # programs); bit-exactness is guaranteed decode-vs-decode, not enc-vs-dec
    np.testing.assert_allclose(phys, frozen, rtol=1e-6, atol=1e-7)
    vals2 = np.asarray(decode_level_values(codec.w, state.w.indices))
    np.testing.assert_array_equal(vals, vals2)  # decode is deterministic


def test_full_roundtrip_encoder_decoder_bitexact(tiny_artifact):
    """Decoder reconstructs from indices ALONE and must match the encoder's
    own frozen prediction bit-for-bit."""
    cfg, art, X, Y = tiny_artifact
    codec, state = init_codec(art, n_rows=2)
    Xj = jnp.array(X)
    state = optimize(
        codec, state, Xj, jnp.array(Y), jax.random.key(1),
        cfg=cfg, n_epochs=30, lr=2e-3, sample_size=2,
    )
    for _ in range(codec.w.n_groups):
        state = encode_step(codec, state, "w")

    enc_pred = np.asarray(predict(codec, state, Xj, jax.random.key(0), cfg, 1)[:, 0])
    indices = {"w": np.asarray(state.w.indices)}
    dec_pred = np.asarray(decode(codec, indices, Xj, cfg))
    # encoder's internal view agrees with the decoder to f32 tolerance...
    np.testing.assert_allclose(enc_pred, dec_pred, atol=1e-4)
    # ...and the decoder itself is bit-deterministic from indices alone
    dec_pred2 = np.asarray(decode(codec, indices, Xj, cfg))
    np.testing.assert_array_equal(dec_pred, dec_pred2)


def test_optimize_reduces_distortion(tiny_artifact):
    cfg, art, X, Y = tiny_artifact
    codec, state = init_codec(art, n_rows=2)
    Xj, Yj = jnp.array(X), jnp.array(Y)

    def mse(s):
        p = predict(codec, s, Xj, jax.random.key(0), cfg, 1)[:, 0]
        return float(jnp.mean((p - Yj) ** 2))

    m0 = mse(state)
    state = optimize(codec, state, Xj, Yj, jax.random.key(2), cfg=cfg,
                     n_epochs=50, lr=2e-3, sample_size=2)
    assert mse(state) < m0


def test_update_betas_direction():
    cfg = TINY
    X, Y = synthetic_dataset(cfg, 2, seed=5)
    res = em_train(
        jax.random.key(0), cfg, jnp.array(X), jnp.array(Y), max_bitrate=6.0,
        n_em_iters=1, first_epochs=10, later_epochs=5, lr=2e-3,
    )
    art = build_prior_artifact(res.state, res.priors, res.kl_beta, cfg)
    codec, state = init_codec(art, n_rows=2, initial_beta=1.0)
    kls_bits = np.asarray(group_kl(state.w, codec.w)) / np.log(2)
    s1 = update_betas(state.w, codec.w, cfg.bits_per_group)
    beta = np.asarray(s1.kl_beta)
    over = kls_bits > cfg.bits_per_group
    under = kls_bits <= cfg.bits_per_group - 0.4
    np.testing.assert_allclose(beta[over], 1.05, rtol=1e-6)
    np.testing.assert_allclose(beta[under], 1 / 1.05, rtol=1e-6)
    mid = ~over & ~under
    np.testing.assert_allclose(beta[mid], 1.0, rtol=1e-6)


def test_beta_factor_maps_match_coded_view():
    """The physical-layout beta factor (beta_row, group_of_col) must equal
    the coded-view factor beta[:, group_idx] moved cell-by-cell through the
    coded<->physical map."""
    cfg = TINY_PATCH
    X, Y = synthetic_dataset(cfg, 2, seed=7)  # 8 rows
    res = em_train(
        jax.random.key(0), cfg, jnp.array(X), jnp.array(Y), max_bitrate=4.0,
        n_em_iters=1, first_epochs=5, later_epochs=5, lr=2e-3,
    )
    art = build_prior_artifact(res.state, res.priors, res.kl_beta, cfg)
    codec, state = init_codec(art, n_rows=8)
    meta = codec.w
    R, D = 8, meta.D
    rng = np.random.default_rng(0)
    beta = jnp.asarray(rng.uniform(size=(R, meta.n_groups)).astype(np.float32))

    # physical-layout factor as used in beta_weighted_kl
    factor_phys = np.asarray(beta[meta.beta_row, meta.group_of_col[None, :]])

    # oracle: factor of coded cell (r', c) is beta[r', group_idx[c]], and
    # coded cell (r', c) IS physical cell (perm_g2p[r', c], param2group[c])
    oracle = np.zeros((R, D), np.float32)
    g2p = np.asarray(meta.perm_g2p)
    p2g_col = np.asarray(meta.param2group)
    gidx = np.asarray(meta.group_idx)
    bnp = np.asarray(beta)
    for rp in range(R):
        for c in range(D):
            oracle[g2p[rp, c], p2g_col[c]] = bnp[rp, gidx[c]]
    np.testing.assert_array_equal(factor_phys, oracle)


def test_finetune_annealing_continues(tiny_artifact):
    """Pin the finetune behavior used by progressive.compress: beta annealing
    CONTINUES during per-group finetunes (optimize's default
    adjust_betas=True, firing every kl_adjust_gap epochs), exactly like the
    reference's update_annealing_factors call inside its train loop
    (test_model.py:631-632) — while frozen groups keep beta=0 untouched."""
    cfg, art, X, Y = tiny_artifact
    codec, state = init_codec(art, n_rows=2, initial_beta=1.0)
    Xj, Yj = jnp.array(X), jnp.array(Y)

    # freeze one group per row, as compress() does before each finetune
    state = encode_step(codec, state, "w")
    frozen = np.asarray(state.w.compressed)
    assert frozen.sum(axis=1).min() == 1
    beta_before = np.asarray(state.w.kl_beta)
    np.testing.assert_array_equal(beta_before[frozen], 0.0)

    # a finetune spanning one annealing boundary, with compress()'s defaults
    state = optimize(codec, state, Xj, Yj, jax.random.key(9), cfg=cfg,
                     n_epochs=11, lr=2e-4, sample_size=2)
    beta_after = np.asarray(state.w.kl_beta)

    # frozen groups stay exactly at 0; unfrozen betas moved by the annealer
    np.testing.assert_array_equal(beta_after[frozen], 0.0)
    assert not np.allclose(beta_after[~frozen], beta_before[~frozen])
    # every change is a power of the (1 +- 0.05) multiplicative step
    ratio = beta_after[~frozen] / beta_before[~frozen]
    steps = np.log(ratio) / np.log(1.05)
    np.testing.assert_allclose(steps, np.round(steps), atol=1e-4)


def test_optimize_remat_matches(tiny_artifact):
    """remat=True changes memory, not math: the rematerialized epoch produces
    the same posteriors as the stored-activation path (f32 tolerance)."""
    cfg, art, X, Y = tiny_artifact
    Xj, Yj = jnp.array(X), jnp.array(Y)

    def run(remat):
        codec, state = init_codec(art, n_rows=2)
        return optimize(codec, state, Xj, Yj, jax.random.key(4), cfg=cfg,
                        n_epochs=20, lr=2e-3, sample_size=2, remat=remat)

    a = run(False)
    b = run(True)
    np.testing.assert_allclose(
        np.asarray(a.w.q.loc), np.asarray(b.w.q.loc), rtol=1e-5, atol=1e-6
    )


def test_sobol_codebook_kind_survives_bitstream(tiny_artifact, tmp_path):
    """codebook kind is bitstream FORMAT: a sobol encode must decode with the
    sobol codebook, carried through artifact header and bitstream header."""
    import dataclasses
    import os

    from recombiner_tpu.coding.progressive import compress
    from recombiner_tpu.io.bitstream import read_bitstream, write_bitstream
    from recombiner_tpu.io.checkpoint import load_prior_artifact, save_prior_artifact

    cfg, art, X, Y = tiny_artifact
    art_sobol = dataclasses.replace(art, codebook_kind="sobol")
    path = str(tmp_path / "prior_sobol.npz")
    save_prior_artifact(path, art_sobol)
    art_sobol = load_prior_artifact(path)
    assert art_sobol.codebook_kind == "sobol"

    Xj, Yj = jnp.array(X), jnp.array(Y)
    codec, state = init_codec(art_sobol, n_rows=2)  # defaults to artifact kind
    res = compress(codec, state, Xj, Yj, cfg, jax.random.key(2),
                   n_optimize_epochs=10, sample_size=2, finetune_overrides={"w": 1})
    bs = str(tmp_path / "bs.rctb")
    write_bitstream(bs, res.indices, config_name=cfg.name,
                    codebook_seed=art_sobol.codebook_seed,
                    codebook_kind=art_sobol.codebook_kind,
                    bits_per_group=cfg.bits_per_group)
    header, indices = read_bitstream(bs)
    assert header["codebook_kind"] == "sobol"

    # a receiver honoring the header reproduces the reconstruction exactly;
    # the WRONG (default threefry) codebook demonstrably does not
    codec_rx, _ = init_codec(art_sobol, n_rows=2, codebook_kind=header["codebook_kind"])
    y = np.asarray(decode(codec_rx, indices, Xj, cfg))
    np.testing.assert_array_equal(y, res.reconstruction)
    codec_bad, _ = init_codec(art_sobol, n_rows=2, codebook_kind="threefry")
    y_bad = np.asarray(decode(codec_bad, indices, Xj, cfg))
    assert not np.array_equal(y_bad, res.reconstruction)


def test_finetune_chunked_to_1000_epoch_programs(monkeypatch):
    """Finetunes above 1000 epochs must split into <=1000-epoch optimize
    programs (a single 7500-epoch program crashed the TPU worker — see
    progressive.optimize_chunked)."""
    import jax.numpy as jnp

    from recombiner_tpu.coding import progressive
    from recombiner_tpu.coding.encoder import init_codec
    from recombiner_tpu.config import TINY
    from recombiner_tpu.data.synthetic import synthetic_dataset
    from recombiner_tpu.priors.trainer import em_train
    from recombiner_tpu.priors.artifact import build_prior_artifact
    import jax

    X, Y = synthetic_dataset(TINY, 2, seed=0)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    res = em_train(jax.random.key(0), TINY, Xj, Yj, max_bitrate=0.2,
                   n_em_iters=1, first_epochs=4, later_epochs=2, lr=2e-3)
    art = build_prior_artifact(res.state, res.priors, res.kl_beta, TINY,
                               codebook_seed=0)
    codec, state = init_codec(art, n_rows=2)

    calls = []

    def spy(codec_, state_, X_, Y_, key_, **kw):
        # chunk arithmetic only: skip the actual optimization work
        calls.append(kw["n_epochs"])
        if kw.get("return_opt_state"):
            return state_, kw.get("opt_state")
        return state_

    monkeypatch.setattr(progressive, "optimize", spy)
    progressive.compress(codec, state, Xj, Yj, TINY, jax.random.key(1),
                         n_optimize_epochs=0, finetune_overrides={"w": 2300},
                         sample_size=1)
    assert calls, "finetunes ran"
    assert max(calls) <= 1000
    n_groups = codec.meta("w").n_groups
    # each group's 2300-epoch finetune = chunks summing exactly to 2300
    assert sum(calls) == n_groups * 2300


def test_sync_every_does_not_change_results(tiny_artifact):
    """The per-group flow-control fetch is pure host-side pacing: batching
    it over K group steps (compress(sync_every=K)) must leave indices and
    reconstruction bit-identical."""
    import jax
    import jax.numpy as jnp

    from recombiner_tpu.coding.progressive import compress

    cfg, art, X, Y = tiny_artifact
    Xj, Yj = jnp.array(X), jnp.array(Y)

    def run(k):
        codec, state = init_codec(art, n_rows=2)
        return compress(codec, state, Xj, Yj, cfg, jax.random.key(5),
                        n_optimize_epochs=8, sample_size=2,
                        finetune_overrides={"w": 2}, sync_every=k)

    a, b = run(1), run(4)
    np.testing.assert_array_equal(a.indices["w"], b.indices["w"])
    np.testing.assert_array_equal(a.reconstruction, b.reconstruction)


def test_precision_plumbing_bit_identical_on_cpu(tiny_artifact):
    """precision threading (optimize/predict/decode static args) must not
    perturb semantics: on CPU — where every matmul is exact f32 regardless —
    a scoped-precision encode is bit-identical to a default one. On TPU the
    flag changes MXU pass counts only; RNG streams, schedules, and the
    bitstream format are precision-independent by construction."""
    from recombiner_tpu.coding.progressive import compress

    cfg, art, X, Y = tiny_artifact
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)

    def run(coding_precision):
        codec, state = init_codec(art, n_rows=2)
        return codec, compress(
            codec, state, Xj, Yj, cfg, jax.random.key(3),
            n_optimize_epochs=4, lr=2e-3, sample_size=2,
            finetune_overrides={"w": 1}, chunk_epochs=4,
            coding_precision=coding_precision,
        )

    codec, a = run(None)
    _, b = run("highest")
    for name in codec.level_names:
        np.testing.assert_array_equal(
            np.asarray(a.state.level(name).indices),
            np.asarray(b.state.level(name).indices),
        )
    np.testing.assert_array_equal(a.reconstruction, b.reconstruction)


def test_finetune_crn_deterministic_and_distinct(tiny_artifact):
    """finetune_crn reuses ONE noise key for every coding-phase finetune —
    the reference's train(random_seed=epoch) common-random-numbers semantics
    (test_model.py:621-623), measured +0.30 dB on the kodak_mini patch
    head-to-head (docs/HEAD_TO_HEAD.md round 3). Pins: (a) CRN encodes are
    deterministic, (b) CRN actually changes the finetune streams vs fresh
    keys, (c) phase-1 and A* coding streams are NOT shifted by the toggle
    (crn_key is fold_in-derived, the main chain is not consumed)."""
    from recombiner_tpu.coding.progressive import compress

    cfg, art, X, Y = tiny_artifact
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)

    def run(crn, n_ft=2):
        codec, state = init_codec(art, n_rows=2)
        return compress(
            codec, state, Xj, Yj, cfg, jax.random.key(3),
            n_optimize_epochs=4, lr=2e-3, sample_size=2,
            finetune_overrides={"w": n_ft}, chunk_epochs=4,
            finetune_crn=crn,
        )

    a1, a2, b = run(True), run(True), run(False)
    np.testing.assert_array_equal(a1.reconstruction, a2.reconstruction)
    assert np.any(np.asarray(a1.state.w.q.loc) != np.asarray(b.state.w.q.loc))
    # (c): with zero finetune epochs the toggle is a no-op end to end
    c1, c2 = run(True, n_ft=0), run(False, n_ft=0)
    np.testing.assert_array_equal(
        np.asarray(c1.state.w.indices), np.asarray(c2.state.w.indices))
    np.testing.assert_array_equal(c1.reconstruction, c2.reconstruction)


def test_resolve_coding_precision_auto():
    """Round-5 co-adaptation fix: audio-family (unrounded-PSNR) configs
    auto-raise the coding-finetune precision to exact f32 so the canonical
    f32 decode renders the function the finetunes optimized; the explicit
    'default' sentinel forces the ambient path; everything else is
    untouched (docs/HEAD_TO_HEAD.md round 5)."""
    from recombiner_tpu.config import TINY, TINY_AUDIO
    from recombiner_tpu.coding.progressive import resolve_coding_precision

    assert resolve_coding_precision(None, TINY_AUDIO) == "highest"
    assert resolve_coding_precision(None, TINY) is None
    assert resolve_coding_precision("default", TINY_AUDIO) is None
    assert resolve_coding_precision("default", TINY) is None
    assert resolve_coding_precision("high", TINY_AUDIO) == "high"
    assert resolve_coding_precision("highest", TINY) == "highest"


def test_apply_precision_mode_sentinel():
    """--precision default must reach compress() as the explicit sentinel,
    not be collapsed into None (which would re-enable the per-modality
    auto it exists to bypass)."""
    from recombiner_tpu.utils.platform import apply_precision_mode

    assert apply_precision_mode(None) is None
    assert apply_precision_mode("default") == "default"
    assert apply_precision_mode("scoped") == "highest"
    assert apply_precision_mode("scoped_high") == "high"
