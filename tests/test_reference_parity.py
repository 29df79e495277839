"""Algorithm-level parity with the actual PyTorch reference implementation.

Drives the reference code (imported read-only from /root/reference, never
copied) and our framework on IDENTICAL tiny data with matched architecture
and hyperparameters, and checks both reach comparable training fidelity.
Initializations and RNG streams differ by design, so parity is at the
fit-quality level, not bit level.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def tiny_data():
    """Two 16x16 RGB images as (X fourier feats, Y targets), built by OUR
    pipeline; the reference consumes the same arrays as torch tensors."""
    from recombiner_tpu.config import TINY
    from recombiner_tpu.data.synthetic import synthetic_dataset

    X, Y = synthetic_dataset(TINY, 2, seed=3)
    return X, Y


def _run_reference(X, Y, n_epochs, lr):
    import torch

    torch.manual_seed(0)
    torch.set_num_threads(1)
    sys.path.insert(0, REF)
    try:
        from prior_model import LinearTransform, PriorBNNmodel, Upsample
    finally:
        sys.path.remove(REF)

    model = PriorBNNmodel(
        in_dim=32, hidden_dims=[8, 8], out_dim=3, train_size=X.shape[0],
        data_dim=2, pixel_sizes=[16, 16], upsample_factors=[16, 16],
        latent_dim=128, patch=False, patch_nums=None,
        hierarchical_patch_nums=None, device="cpu",
    )
    lt = LinearTransform(model.dims)
    up = Upsample(2, [2, 1, 1], [4, 2, 2])
    Xt = torch.from_numpy(X)
    Yt = torch.from_numpy(Y)
    s0 = float(torch.nn.functional.softplus(torch.tensor(-2.0)) / 6)
    p_loc = torch.zeros(model.loc.shape[1])
    p_scale = torch.ones(model.loc.shape[1]) * s0
    pl_loc = torch.zeros(model.lpe_loc.shape[1:])
    pl_scale = torch.ones(model.lpe_loc.shape[1:]) * s0
    mse, kl, _ = model.train(
        n_epochs, lr, Xt, Yt, p_loc, p_scale, pl_loc, pl_scale,
        None, None, None, None, lt, up, 1e-8,
    )
    return mse, kl


def _run_ours(X, Y, n_epochs, lr):
    import jax
    import jax.numpy as jnp

    from recombiner_tpu.config import TINY
    from recombiner_tpu.priors.trainer import init_prior_state, init_priors, sgd_epochs

    cfg = TINY
    state = init_prior_state(jax.random.key(0), cfg, X.shape[0])
    priors = init_priors(cfg)
    state, m = sgd_epochs(
        state, jnp.asarray(X), jnp.asarray(Y), priors, jnp.float32(1e-8),
        jax.random.key(1), cfg=cfg, n_epochs=n_epochs, lr=lr,
    )
    return float(m.mse), float(m.kl) / X.shape[0]


def test_prior_training_fit_parity(tiny_data):
    """Same data, architecture, loss, optimizer, epochs: both implementations
    must reach the same fidelity regime (and both must actually learn)."""
    X, Y = tiny_data
    n_epochs, lr = 150, 2e-3
    ref_mse, ref_kl = _run_reference(X, Y, n_epochs, lr)
    our_mse, our_kl = _run_ours(X, Y, n_epochs, lr)

    base_mse = float(np.mean((Y - Y.mean()) ** 2))
    # both learn: beat the mean predictor clearly
    assert ref_mse < 0.6 * base_mse
    assert our_mse < 0.6 * base_mse
    # same fidelity regime: PSNRs within 3 dB of each other
    ref_psnr = -10 * np.log10(ref_mse)
    our_psnr = -10 * np.log10(our_mse)
    assert abs(ref_psnr - our_psnr) < 3.0, (ref_psnr, our_psnr)


def test_constants_parity():
    """The scalar constants that define the model family match the reference
    (main_prior_training.py:66-68, test_model.py:88-98)."""
    from recombiner_tpu.config import CIFAR

    assert CIFAR.w0 == 30.0
    assert CIFAR.c == 6.0
    assert CIFAR.init_log_scale == -4.0
    assert CIFAR.bits_per_group == 16

    sys.path.insert(0, REF)
    try:
        from config import configs
    finally:
        sys.path.remove(REF)
    for name in ("cifar", "kodak", "audio", "video", "protein"):
        from recombiner_tpu.config import get_config

        ours = get_config(name)
        ref = configs[name]
        assert ours.input_dim == ref["input_dim"]
        assert ours.output_dim == ref["output_dim"]
        assert list(ours.hidden_dims) == ref["hidden_dims"]
        assert ours.data_dim == ref["data_dim"]
        assert list(ours.pixel_sizes) == ref["pixel_sizes"]
        assert ours.patch == ref["patch"]
        assert ours.latent_dim == ref["latent_dim"]
        assert ours.fourier_dim == ref["fourier_dim"]
        assert list(ours.upsample_factors) == ref["upsample_factors"]
        assert ours.bitrate_range == ref["bitrate_range"]
        assert ours.lowest_bitrate == ref["lowest_bitrate"]
        if ref["patch"]:
            assert list(ours.patch_nums) == ref["patch_nums"]
            assert list(ours.level2_patch_nums) == ref["hierarchical_patch_nums"]["level2"]
            assert list(ours.level3_patch_nums) == ref["hierarchical_patch_nums"]["level3"]


def test_prior_forward_and_kl_parity_identical_state():
    """Integration-level middle layer: with IDENTICAL posterior state and
    mappings, the reference PriorBNNmodel's forward (stitched patch-LPE
    upsampling + 3-level hierarchical latents + INR) and unweighted KL must
    match ours numerically. Posterior scales are driven to ~0 so the
    reparameterized samples are deterministic (= loc) in both frameworks."""
    import torch

    import jax
    import jax.numpy as jnp

    from recombiner_tpu.config import TINY_PATCH
    from recombiner_tpu.data.synthetic import synthetic_dataset
    from recombiner_tpu.models.gaussian import Gaussian
    from recombiner_tpu.priors.trainer import (
        forward,
        init_prior_state,
        init_priors,
        total_kl,
    )

    sys.path.insert(0, REF)
    try:
        from prior_model import LinearTransform, PriorBNNmodel, Upsample
    finally:
        sys.path.remove(REF)

    cfg = TINY_PATCH
    R = 8  # 2 datapoints x 4 patches; h rows 4, hh rows 2
    X, _ = synthetic_dataset(cfg, 2, seed=21)

    state = init_prior_state(jax.random.key(0), cfg, R)
    rng = np.random.default_rng(3)
    D = cfg.n_inr_params

    def det(shape, scale=0.05):
        return rng.normal(0, scale, shape).astype(np.float32)

    NEG = -40.0  # softplus(-40)/6 ~ 4e-19: the sample IS the loc
    w_loc = det((R, D))
    h_loc = det((4, D))
    hh_loc = det((2, D))
    lpe_loc = det((R, *cfg.lpe_spatial, cfg.latent_dim), 0.1)
    state = state.replace(
        w=Gaussian(jnp.asarray(w_loc), jnp.full((R, D), NEG)),
        h=Gaussian(jnp.asarray(h_loc), jnp.full((4, D), NEG)),
        hh=Gaussian(jnp.asarray(hh_loc), jnp.full((2, D), NEG)),
        lpe=Gaussian(jnp.asarray(lpe_loc), jnp.full(lpe_loc.shape, NEG)),
    )

    # reference model with the SAME posteriors and mappings
    torch.manual_seed(0)
    ref = PriorBNNmodel(
        in_dim=32, hidden_dims=[8, 8], out_dim=3, train_size=R, data_dim=2,
        pixel_sizes=[16, 16], upsample_factors=[16, 16], latent_dim=128,
        patch=True, patch_nums=[2, 2],
        hierarchical_patch_nums={"level2": [2, 1], "level3": [2, 2]},
        device="cpu",
    )
    with torch.no_grad():
        ref.loc.data = torch.from_numpy(w_loc)
        ref.h_loc.data = torch.from_numpy(h_loc)
        ref.hh_loc.data = torch.from_numpy(hh_loc)
        ref.lpe_loc.data = torch.from_numpy(lpe_loc)
        for p in (ref.log_scale, ref.h_log_scale, ref.hh_log_scale, ref.lpe_log_scale):
            p.data = torch.full_like(p.data, NEG)

    lt = LinearTransform(ref.dims)
    up = Upsample(2, [2, 1, 1], [4, 2, 2])
    with torch.no_grad():
        for i, a in enumerate(state.A):
            lt.A[i].data = torch.from_numpy(np.asarray(a))
        for i in range(3):
            conv = getattr(up, f"conv{i + 1}")
            w = np.asarray(state.up[f"conv{i}"]["w"])
            k_axes = list(range(w.ndim - 2))
            conv.weight.data = torch.from_numpy(
                np.transpose(w, [w.ndim - 1, w.ndim - 2] + k_axes).copy()
            )
            conv.bias.data = torch.from_numpy(np.asarray(state.up[f"conv{i}"]["b"]))

    # ---- forward parity (deterministic because scales ~ 0)
    y_ours = np.asarray(forward(state, jnp.asarray(X), jax.random.key(5), cfg, 1)[:, 0])
    with torch.no_grad():
        y_ref = ref.forward(torch.from_numpy(X), lt, up).numpy()
    np.testing.assert_allclose(y_ours, y_ref, atol=2e-4)

    # ---- unweighted KL parity on realistic scales
    state2 = state.replace(
        w=state.w.replace(log_scale=jnp.full((R, D), -4.0)),
        h=state.h.replace(log_scale=jnp.full((4, D), -4.0)),
        hh=state.hh.replace(log_scale=jnp.full((2, D), -4.0)),
        lpe=state.lpe.replace(log_scale=jnp.full(lpe_loc.shape, -4.0)),
    )
    with torch.no_grad():
        for p in (ref.log_scale, ref.h_log_scale, ref.hh_log_scale, ref.lpe_log_scale):
            p.data = torch.full_like(p.data, -4.0)
    priors = init_priors(cfg)
    s0 = float(torch.nn.functional.softplus(torch.tensor(-2.0)) / 6)
    with torch.no_grad():
        kl_ref = float(ref.calculate_kl(
            torch.zeros(D), torch.full((D,), s0),
            torch.zeros(lpe_loc.shape[1:]), torch.full(lpe_loc.shape[1:], s0),
            torch.zeros(D), torch.full((D,), s0),
            torch.zeros(D), torch.full((D,), s0),
        ))
    kl_ours = float(total_kl(state2, priors))
    np.testing.assert_allclose(kl_ours, kl_ref, rtol=1e-5)
