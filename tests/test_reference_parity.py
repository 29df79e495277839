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
