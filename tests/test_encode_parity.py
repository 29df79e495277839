"""Encode/RD parity against the actual PyTorch reference compression engine.

Builds ONE tiny trained prior with the reference's own classes (the same
8-dump pickle main_prior_training.py:283-341 writes), then runs BOTH full
encode stacks — the reference's optimize_posteriors + compress_posteriors
(test_model.py:621-856, schedule shape from main_compression.py:148-162,
reduced epochs) and our compress() — on identical data from the identical
artifact, and asserts distortion parity at exactly matched bpp.

Also checks the component-level "middle layer": group-KL vectors, the
beta-weighted KL (the ELBO's regularizer term), and beta-annealing
trajectories computed by both frameworks on IDENTICAL posterior states.

Codebooks differ by design (ours is an owned threefry spec, theirs torch
Sobol — SURVEY §7 'hard parts'), so parity is at the RD level for the
end-to-end test and exact for the state-level tests.
"""

import dataclasses
import os
import pickle
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)

N_OPT = 1500  # reduced from 30000 (main_compression.py:151); same both sides
N_FT = 3  # reduced from max(30000//n_groups, 50); same both sides


def _ref_modules():
    sys.path.insert(0, REF)
    try:
        import prior_model
        import test_model
    finally:
        sys.path.remove(REF)
    return prior_model, test_model


@pytest.fixture(scope="module")
def trained_pickle(tmp_path_factory):
    """A tiny reference-trained prior: mini-EM (train + moment-matched M-step,
    main_prior_training.py:112-172) with the reference's own model classes,
    dumped in the reference checkpoint format."""
    import torch

    torch.manual_seed(0)
    torch.set_num_threads(1)
    prior_model, _ = _ref_modules()

    from recombiner_tpu.config import TINY
    from recombiner_tpu.data.synthetic import synthetic_dataset

    X, Y = synthetic_dataset(TINY, 2, seed=3)
    Xt, Yt = torch.from_numpy(X), torch.from_numpy(Y)

    model = prior_model.PriorBNNmodel(
        in_dim=32, hidden_dims=[8, 8], out_dim=3, train_size=2, data_dim=2,
        pixel_sizes=[16, 16], upsample_factors=[16, 16], latent_dim=128,
        patch=False, patch_nums=None, hierarchical_patch_nums=None, device="cpu",
    )
    lt = prior_model.LinearTransform(model.dims)
    up = prior_model.Upsample(2, [2, 1, 1], [4, 2, 2])

    s0 = float(torch.nn.functional.softplus(torch.tensor(-2.0)) / 6)
    D_inr = model.cum_param_sizes[-1]
    prior_loc = torch.zeros(D_inr)
    prior_scale = torch.ones(D_inr) * s0
    prior_lpe_loc = torch.zeros(model.lpe_loc.shape[1:])
    prior_lpe_scale = torch.ones(model.lpe_loc.shape[1:]) * s0
    kl_beta = 3e-6  # fixed: gives ~27 16-bit groups at this scale

    for it in range(3):
        model.train(80 if it == 0 else 40, 2e-3, Xt, Yt, prior_loc, prior_scale,
                    prior_lpe_loc, prior_lpe_scale, None, None, None, None,
                    lt, up, kl_beta, training_mappings=True, verbose=False)
        with torch.no_grad():  # M-step, main_prior_training.py:156-172
            prior_loc = model.loc.detach().mean(0)
            prior_scale = ((model.st(model.log_scale.detach()) ** 2).mean(0)
                           + model.loc.detach().var(0)) ** 0.5
            prior_lpe_loc = model.lpe_loc.detach().mean([0])
            prior_lpe_scale = ((model.st(model.lpe_log_scale.detach()) ** 2).mean([0])
                               + model.lpe_loc.detach().var([0])) ** 0.5

    q_loc = torch.cat([model.loc.flatten(start_dim=1),
                       model.lpe_loc.flatten(start_dim=1)], -1)
    q_scale = torch.cat([model.st(model.log_scale).flatten(start_dim=1),
                         model.st(model.lpe_log_scale).flatten(start_dim=1)], -1)
    p_loc = torch.cat([prior_loc, prior_lpe_loc.flatten()])
    p_scale = torch.cat([prior_scale, prior_lpe_scale.flatten()])
    grouping = prior_model.get_grouping(q_loc.detach(), q_scale.detach(), p_loc, p_scale)
    avg_ls = torch.cat([model.log_scale.detach().mean(0),
                        model.lpe_log_scale.detach().mean(0).flatten()])

    path = str(tmp_path_factory.mktemp("parity") / "PRIOR_parity.pkl")
    with open(path, "wb") as f:
        pickle.dump(grouping, f)
        pickle.dump((p_loc, p_scale, kl_beta, avg_ls), f)
        pickle.dump((None,) * 8, f)
        pickle.dump((None, None, kl_beta, None), f)
        pickle.dump((None,) * 8, f)
        pickle.dump((None, None, kl_beta, None), f)
        pickle.dump(lt, f)
        pickle.dump(up, f)
    return path, X, Y


def _build_ref_test_model(path, n_rows):
    """Exactly main_compression.py:37-145's wiring (reordered priors,
    inverse-softplus log-scales, buffers)."""
    import torch

    _, test_model = _ref_modules()
    with open(path, "rb") as f:
        (group_idx, group_start, group_end, group2param, param2group,
         n_groups, group_kls, weights) = pickle.load(f)
        prior_loc, prior_scale, kl_beta, avg_ls = pickle.load(f)
        for _ in range(4):
            pickle.load(f)
        lt = pickle.load(f)
        up = pickle.load(f)

    _p_locs = prior_loc.clone()[param2group]
    _p_log_scales = torch.log(torch.exp(prior_scale * 6) - 1).clone()[param2group]
    _avg_ls = avg_ls[param2group].cpu().detach()
    m = test_model.TestBNNmodel(
        in_dim=32, hidden_dims=[8, 8], out_dim=3, number_of_datapoints=n_rows,
        upsample_factors=[16, 16], latent_dim=128, data_dim=2,
        pixel_sizes=[16, 16], patch=False, patch_nums=None,
        hierarchical_patch_nums=None, dataset="cifar",
        linear_transform=lt, upsample_net=up,
        p_loc=_p_locs, p_log_scale=_p_log_scales, init_log_scale=_avg_ls,
        param_to_group=param2group, group_to_param=group2param,
        n_groups=n_groups, group_start_index=group_start,
        group_end_index=group_end, group_idx=group_idx,
        w0=30., c=6., random_seed=42, device="cpu",
        kl_upper_buffer=0., kl_lower_buffer=0.4, kl_adjust_gap=10,
        initial_beta=kl_beta, beta_step_size=0.05,
    )
    return m, int(n_groups)


def _our_artifact(path, dataset="tiny"):
    """Converted artifact with the reference's 16-bit group budget (the tiny
    test configs default to 8-bit groups for speed; the grouping in this
    pickle was packed at 16 bits so the codec must anneal toward 16)."""
    from recombiner_tpu.io.convert_reference import convert_reference_checkpoint

    art = convert_reference_checkpoint(path, dataset, reference_path=REF)
    cfg16 = dataclasses.replace(art.config, bits_per_group=16)
    return dataclasses.replace(art, config=cfg16)


@pytest.mark.slow
def test_encode_rd_parity(trained_pickle):
    """Same artifact, same data, matched (reduced) schedule: distortion at
    exactly matched bpp must agree within 1 dB."""
    import torch

    import jax
    import jax.numpy as jnp

    from recombiner_tpu.coding.encoder import init_codec
    from recombiner_tpu.coding.progressive import compress

    path, X, Y = trained_pickle

    # ---- reference encode
    torch.manual_seed(0)
    torch.set_num_threads(1)
    m, n_groups_ref = _build_ref_test_model(path, n_rows=2)
    x, y = torch.from_numpy(X), torch.from_numpy(Y)
    m.optimize_posteriors(x, y, n_epochs=N_OPT, lr=2e-4, verbose=0)
    m.compress_posteriors(
        x, y, n_epochs_finetune=N_FT, h_n_epochs_finetune=None,
        hh_n_epochs_finetune=None, verbose=0, lr=2e-4, fine_tune_gap=1,
        compress_from_group_with_largest_kl=True,
    )
    with torch.no_grad():
        y_ref = m.predict(x, random_seed=0, sample_size=1)
    ref_mse = float(((y_ref - y) ** 2).mean())

    # ---- our encode
    art = _our_artifact(path)
    codec, state = init_codec(art, n_rows=2)
    assert codec.w.n_groups == n_groups_ref  # identical grouping -> same bpp
    res = compress(
        codec, state, jnp.asarray(X), jnp.asarray(Y), art.config,
        jax.random.key(1), n_optimize_epochs=N_OPT,
        finetune_overrides={"w": N_FT}, sample_size=5,
    )
    our_mse = float(np.mean((res.reconstruction - Y) ** 2))

    ref_psnr = -10 * np.log10(ref_mse)
    our_psnr = -10 * np.log10(our_mse)
    assert abs(ref_psnr - our_psnr) < 1.0, (ref_psnr, our_psnr)
    # sanity: both actually compressed something useful
    assert our_psnr > 20.0 and ref_psnr > 20.0


@pytest.fixture(scope="module")
def trained_pickle_patch(tmp_path_factory):
    """A tiny PATCH-MODE reference-trained prior: the full 3-level hierarchy
    (h/hh latents, main_prior_training.py:156-172 M-steps for all levels),
    dumped in the reference checkpoint format (main_prior_training.py:283-341
    incl. the h/hh grouping tuples)."""
    import torch

    torch.manual_seed(0)
    torch.set_num_threads(1)
    prior_model, _ = _ref_modules()

    from recombiner_tpu.config import get_config
    from recombiner_tpu.data.synthetic import synthetic_dataset

    cfg = get_config("tiny_patch")
    # 2 datapoints x (2,2) patches -> 8 level-1 rows, 4 h rows, 2 hh rows
    # (>=2 rows per level: the reference M-step uses torch.var, which is
    # NaN for a single sample)
    X, Y = synthetic_dataset(cfg, 2, seed=11)
    Xt, Yt = torch.from_numpy(X), torch.from_numpy(Y)
    R = X.shape[0]
    hier = {"level2": [2, 1], "level3": [2, 2]}

    model = prior_model.PriorBNNmodel(
        in_dim=32, hidden_dims=[8, 8], out_dim=3, train_size=R, data_dim=2,
        pixel_sizes=[16, 16], upsample_factors=[16, 16], latent_dim=128,
        patch=True, patch_nums=[2, 2], hierarchical_patch_nums=hier,
        device="cpu",
    )
    lt = prior_model.LinearTransform(model.dims)
    up = prior_model.Upsample(2, [2, 1, 1], [4, 2, 2])

    s0 = float(torch.nn.functional.softplus(torch.tensor(-2.0)) / 6)
    D_inr = model.cum_param_sizes[-1]
    ones = torch.ones(D_inr)
    prior_loc, prior_scale = torch.zeros(D_inr), ones * s0
    prior_lpe_loc = torch.zeros(model.lpe_loc.shape[1:])
    prior_lpe_scale = torch.ones(model.lpe_loc.shape[1:]) * s0
    prior_h_loc, prior_h_scale = torch.zeros(D_inr), ones.clone() * s0
    prior_hh_loc, prior_hh_scale = torch.zeros(D_inr), ones.clone() * s0
    kl_beta = 3e-6

    def moment_match(loc_p, log_scale_p):
        loc = loc_p.detach()
        scale = model.st(log_scale_p.detach())
        return loc.mean(0), ((scale**2).mean(0) + loc.var(0)) ** 0.5

    for it in range(3):
        model.train(80 if it == 0 else 40, 2e-3, Xt, Yt, prior_loc, prior_scale,
                    prior_lpe_loc, prior_lpe_scale, prior_h_loc, prior_h_scale,
                    prior_hh_loc, prior_hh_scale, lt, up, kl_beta,
                    training_mappings=True, verbose=False)
        with torch.no_grad():  # all-level M-step, main_prior_training.py:156-172
            prior_loc, prior_scale = moment_match(model.loc, model.log_scale)
            prior_lpe_loc = model.lpe_loc.detach().mean([0])
            prior_lpe_scale = ((model.st(model.lpe_log_scale.detach()) ** 2).mean([0])
                               + model.lpe_loc.detach().var([0])) ** 0.5
            prior_h_loc, prior_h_scale = moment_match(model.h_loc, model.h_log_scale)
            prior_hh_loc, prior_hh_scale = moment_match(model.hh_loc, model.hh_log_scale)

    q_loc = torch.cat([model.loc.flatten(start_dim=1),
                       model.lpe_loc.flatten(start_dim=1)], -1)
    q_scale = torch.cat([model.st(model.log_scale).flatten(start_dim=1),
                         model.st(model.lpe_log_scale).flatten(start_dim=1)], -1)
    p_loc = torch.cat([prior_loc, prior_lpe_loc.flatten()])
    p_scale = torch.cat([prior_scale, prior_lpe_scale.flatten()])
    grouping = prior_model.get_grouping(q_loc.detach(), q_scale.detach(), p_loc, p_scale)
    h_grouping = prior_model.get_grouping(
        model.h_loc.detach(), model.st(model.h_log_scale.detach()),
        prior_h_loc, prior_h_scale)
    hh_grouping = prior_model.get_grouping(
        model.hh_loc.detach(), model.st(model.hh_log_scale.detach()),
        prior_hh_loc, prior_hh_scale)
    avg_ls = torch.cat([model.log_scale.detach().mean(0),
                        model.lpe_log_scale.detach().mean(0).flatten()])
    h_avg_ls = model.h_log_scale.detach().mean(0)
    hh_avg_ls = model.hh_log_scale.detach().mean(0)

    path = str(tmp_path_factory.mktemp("parity_patch") / "PRIOR_parity_patch.pkl")
    with open(path, "wb") as f:
        pickle.dump(grouping, f)
        pickle.dump((p_loc, p_scale, kl_beta, avg_ls), f)
        pickle.dump(h_grouping, f)
        pickle.dump((prior_h_loc, prior_h_scale, kl_beta, h_avg_ls), f)
        pickle.dump(hh_grouping, f)
        pickle.dump((prior_hh_loc, prior_hh_scale, kl_beta, hh_avg_ls), f)
        pickle.dump(lt, f)
        pickle.dump(up, f)
    return path, X, Y


def _build_ref_test_model_patch(path, n_rows):
    """main_compression.py:37-145's exact wiring for the PATCH branch
    (h/hh priors reordered by their param2group, inverse-softplus scales)."""
    import torch

    _, test_model = _ref_modules()
    with open(path, "rb") as f:
        g1 = pickle.load(f)
        prior_loc, prior_scale, kl_beta, avg_ls = pickle.load(f)
        gh = pickle.load(f)
        h_prior_loc, h_prior_scale, _, h_avg_ls = pickle.load(f)
        ghh = pickle.load(f)
        hh_prior_loc, hh_prior_scale, _, hh_avg_ls = pickle.load(f)
        lt = pickle.load(f)
        up = pickle.load(f)

    def reorder(loc, scale, avg, p2g):
        return (loc.clone()[p2g],
                torch.log(torch.exp(scale * 6) - 1).clone()[p2g],
                avg[p2g].cpu().detach())

    (group_idx, group_start, group_end, group2param, param2group,
     n_groups, *_rest) = g1
    (h_group_idx, h_group_start, h_group_end, h_group2param, h_param2group,
     h_n_groups, *_rest) = gh
    (hh_group_idx, hh_group_start, hh_group_end, hh_group2param,
     hh_param2group, hh_n_groups, *_rest) = ghh

    _p_loc, _p_ls, _avg = reorder(prior_loc, prior_scale, avg_ls, param2group)
    _h_p_loc, _h_p_ls, _h_avg = reorder(h_prior_loc, h_prior_scale, h_avg_ls, h_param2group)
    _hh_p_loc, _hh_p_ls, _hh_avg = reorder(hh_prior_loc, hh_prior_scale, hh_avg_ls, hh_param2group)

    m = test_model.TestBNNmodel(
        in_dim=32, hidden_dims=[8, 8], out_dim=3, number_of_datapoints=n_rows,
        upsample_factors=[16, 16], latent_dim=128, data_dim=2,
        pixel_sizes=[16, 16], patch=True, patch_nums=[2, 2],
        hierarchical_patch_nums={"level2": [2, 1], "level3": [2, 2]},
        dataset="cifar",
        linear_transform=lt, upsample_net=up,
        p_loc=_p_loc, p_log_scale=_p_ls, init_log_scale=_avg,
        param_to_group=param2group, group_to_param=group2param,
        n_groups=n_groups, group_start_index=group_start,
        group_end_index=group_end, group_idx=group_idx,
        h_p_loc=_h_p_loc, h_p_log_scale=_h_p_ls, h_init_log_scale=_h_avg,
        h_param_to_group=h_param2group, h_group_to_param=h_group2param,
        h_n_groups=h_n_groups, h_group_start_index=h_group_start,
        h_group_end_index=h_group_end, h_group_idx=h_group_idx,
        hh_p_loc=_hh_p_loc, hh_p_log_scale=_hh_p_ls, hh_init_log_scale=_hh_avg,
        hh_param_to_group=hh_param2group, hh_group_to_param=hh_group2param,
        hh_n_groups=hh_n_groups, hh_group_start_index=hh_group_start,
        hh_group_end_index=hh_group_end, hh_group_idx=hh_group_idx,
        w0=30., c=6., random_seed=42, device="cpu",
        kl_upper_buffer=0., kl_lower_buffer=0.4, kl_adjust_gap=10,
        initial_beta=kl_beta, beta_step_size=0.05,
    )
    return m, (int(n_groups), int(h_n_groups), int(hh_n_groups))


@pytest.mark.slow
def test_encode_rd_parity_patch(trained_pickle_patch):
    """FULL patch-mode encode stack head-to-head (VERDICT round 1, missing
    #1): per-column patch permutations on levels 1 AND 2
    (test_model.py:179-208), the hh -> h -> w progressive loop
    (test_model.py:701-798) and the h/hh coder twins (:535-584) vs our
    hierarchy, from ONE converted artifact on identical data at exactly
    matched bpp. A wrong permutation inverse or level broadcast fails this
    by dB, not by epsilon."""
    import torch

    import jax
    import jax.numpy as jnp

    from recombiner_tpu.coding.encoder import init_codec
    from recombiner_tpu.coding.progressive import compress

    path, X, Y = trained_pickle_patch
    R = X.shape[0]

    # ---- reference encode
    torch.manual_seed(0)
    torch.set_num_threads(1)
    m, (n_g, h_n_g, hh_n_g) = _build_ref_test_model_patch(path, n_rows=R)
    x, y = torch.from_numpy(X), torch.from_numpy(Y)
    m.optimize_posteriors(x, y, n_epochs=N_OPT, lr=2e-4, verbose=0)
    m.compress_posteriors(
        x, y, n_epochs_finetune=N_FT, h_n_epochs_finetune=2,
        hh_n_epochs_finetune=2, verbose=0, lr=2e-4, fine_tune_gap=1,
        compress_from_group_with_largest_kl=True,
    )
    with torch.no_grad():
        y_ref = m.predict(x, random_seed=0, sample_size=1)
    ref_mse = float(((y_ref - y) ** 2).mean())

    # ---- our encode, same artifact/data/schedule
    art = _our_artifact(path, dataset="tiny_patch")
    codec, state = init_codec(art, n_rows=R)
    assert (codec.w.n_groups, codec.h.n_groups, codec.hh.n_groups) == (
        n_g, h_n_g, hh_n_g
    )  # identical groupings -> identical bpp by construction
    res = compress(
        codec, state, jnp.asarray(X), jnp.asarray(Y), art.config,
        jax.random.key(1), n_optimize_epochs=N_OPT,
        finetune_overrides={"w": N_FT, "h": 2, "hh": 2}, sample_size=5,
    )
    our_mse = float(np.mean((res.reconstruction - Y) ** 2))

    ref_psnr = -10 * np.log10(ref_mse)
    our_psnr = -10 * np.log10(our_mse)
    assert abs(ref_psnr - our_psnr) < 1.0, (ref_psnr, our_psnr)
    assert our_psnr > 20.0 and ref_psnr > 20.0


def _identical_states(trained_pickle):
    """Both frameworks loaded with the SAME random posterior state; returns
    (ref model, our codec, our state, frozen_group) aligned through the
    coded<->physical maps."""
    import torch

    import jax.numpy as jnp

    from recombiner_tpu.coding.encoder import init_codec
    from recombiner_tpu.models.gaussian import Gaussian

    path, _, _ = trained_pickle
    m, n_groups = _build_ref_test_model(path, n_rows=2)
    art = _our_artifact(path)
    codec, state = init_codec(art, n_rows=2)

    D = codec.w.D
    rng = np.random.default_rng(7)
    q_loc = rng.normal(0, 0.05, (2, D)).astype(np.float32)
    q_log_scale = rng.uniform(-6, -3, (2, D)).astype(np.float32)
    beta = rng.uniform(0.5, 2.0, (2, n_groups)).astype(np.float32)

    # ours stores physical layout; the reference stores coded order where
    # coded column c holds physical param param2group[c]
    p2g = np.asarray(codec.w.param2group)
    m.loc.data = torch.from_numpy(q_loc[:, p2g])
    m.log_scale.data = torch.from_numpy(q_log_scale[:, p2g])
    m.kl_beta = torch.from_numpy(beta.copy())

    state = state.replace_level(
        "w",
        state.w.replace(
            q=Gaussian(loc=jnp.asarray(q_loc), log_scale=jnp.asarray(q_log_scale)),
            kl_beta=jnp.asarray(beta),
        ),
    )
    return m, codec, state


def test_group_kl_vector_parity(trained_pickle):
    """Per-(row, group) KL sums agree exactly on identical posteriors —
    the middle-layer check between 'constants match' and 'RD matches'."""
    from recombiner_tpu.coding.encoder import beta_weighted_kl, group_kl

    m, codec, state = _identical_states(trained_pickle)
    ref_kls = m.update_annealing_factors(update=False)  # (R, G) nats
    our_kls = np.asarray(group_kl(state.w, codec.w))
    np.testing.assert_allclose(our_kls, ref_kls, rtol=3e-4)

    # the ELBO's regularizer term (beta-weighted KL scalar) also agrees
    ref_weighted = float(m.calculate_kl())
    our_weighted = float(beta_weighted_kl(state.w, codec.w))
    np.testing.assert_allclose(our_weighted, ref_weighted, rtol=1e-4)


def test_beta_trajectory_parity(trained_pickle):
    """Multiplicative beta annealing follows the reference step-for-step on
    identical states, including the frozen-group skip."""
    import torch

    from recombiner_tpu.coding.encoder import update_betas

    m, codec, state = _identical_states(trained_pickle)

    # freeze group 0 of row 1 in both
    m.compressed_mask_groupwise[1, 0] = True
    comp = np.zeros((2, codec.w.n_groups), bool)
    comp[1, 0] = True
    import jax.numpy as jnp

    ls = state.w.replace(compressed=jnp.asarray(comp))

    for _ in range(4):
        m.update_annealing_factors(update=True)
        ls = update_betas(ls, codec.w, 16)

    ref_beta = m.kl_beta.numpy()
    our_beta = np.asarray(ls.kl_beta)
    np.testing.assert_allclose(our_beta, ref_beta, rtol=1e-5)
    # frozen cell untouched in both
    assert our_beta[1, 0] == ref_beta[1, 0]
