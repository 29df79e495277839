import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recombiner_tpu.config import CIFAR, TINY, TINY_PATCH, VIDEO, get_config
from recombiner_tpu.models import (
    Gaussian,
    NaturalGaussian,
    apply_upsample,
    expand_level,
    gaussian_log_prob,
    init_linear_transform,
    init_upsample_params,
    inr_forward,
    inverse_scale_transform,
    kl_gaussian,
    lpe_to_pe,
    sample_hierarchical_latents,
    scale_transform,
)


def test_scale_transform_matches_torch_softplus():
    torch = __import__("torch")
    x = np.linspace(-10, 30, 101).astype(np.float32)
    ours = np.asarray(scale_transform(jnp.array(x)))
    ref = (torch.nn.functional.softplus(torch.from_numpy(x), beta=1, threshold=20) / 6).numpy()
    # XLA and torch use different exp implementations; agree to ~3e-4 relative.
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-6)


def test_inverse_scale_transform_roundtrip():
    raw = jnp.linspace(-6, 6, 41)
    s = scale_transform(raw)
    back = inverse_scale_transform(s)
    np.testing.assert_allclose(np.asarray(back), np.asarray(raw), atol=1e-4)


def test_kl_matches_torch_distributions():
    torch = __import__("torch")
    rng = np.random.default_rng(0)
    ql = rng.normal(size=(16,)).astype(np.float32)
    qs = np.abs(rng.normal(size=(16,))).astype(np.float32) + 0.1
    pl = rng.normal(size=(16,)).astype(np.float32)
    ps = np.abs(rng.normal(size=(16,))).astype(np.float32) + 0.1
    ours = np.asarray(kl_gaussian(jnp.array(ql), jnp.array(qs), jnp.array(pl), jnp.array(ps)))
    ref = torch.distributions.kl_divergence(
        torch.distributions.Normal(torch.from_numpy(ql), torch.from_numpy(qs)),
        torch.distributions.Normal(torch.from_numpy(pl), torch.from_numpy(ps)),
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_log_prob_matches_scipy():
    from scipy.stats import norm

    x = np.linspace(-3, 3, 7).astype(np.float32)
    ours = np.asarray(gaussian_log_prob(jnp.array(x), jnp.array(0.5), jnp.array(1.7)))
    ref = norm.logpdf(x, 0.5, 1.7)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


@pytest.mark.parametrize("data_dim,spatial", [(1, (4,)), (2, (2, 2)), (3, (1, 1, 1))])
def test_upsample_shapes(data_dim, spatial):
    key = jax.random.key(0)
    params = init_upsample_params(key, data_dim)
    x = jax.random.normal(key, (2, *spatial, 128))
    factors = ((6, 4, 4), 2, 2) if data_dim == 3 else (4, 2, 2)
    out = apply_upsample(params, x, data_dim, factors, (2, 1, 1))
    if data_dim == 3:
        expect = tuple(s * f for s, f in zip(spatial, (24, 16, 16)))
    else:
        expect = tuple(s * 16 for s in spatial)
    assert out.shape == (2, *expect, 16)


def test_upsample_parity_with_torch():
    """Same weights loaded into a torch Upsample-topology net must agree."""
    torch = __import__("torch")
    key = jax.random.key(1)
    params = init_upsample_params(key, 2)
    x = np.asarray(jax.random.normal(jax.random.key(2), (3, 2, 2, 128)), np.float32)

    out = np.asarray(apply_upsample(params, jnp.array(x), 2, (4, 2, 2), (2, 1, 1)))

    tnet = torch.nn.Sequential()
    convs = []
    for i, (cin, cout, k, p) in enumerate(
        [(128, 64, 5, 2), (64, 64, 3, 1), (64, 16, 3, 1)]
    ):
        conv = torch.nn.Conv2d(cin, cout, k, padding=p)
        w = np.asarray(params[f"conv{i}"]["w"])  # (kh, kw, cin, cout)
        conv.weight.data = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)).copy())
        conv.bias.data = torch.from_numpy(np.asarray(params[f"conv{i}"]["b"]))
        convs.append(conv)
    up = [torch.nn.Upsample(scale_factor=f) for f in (4, 2, 2)]
    act = torch.nn.LeakyReLU()
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        t = convs[0](up[0](t))
        t = act(t)
        t = convs[1](up[1](t))
        t = act(t)
        t = convs[2](up[2](t))
    ref = np.transpose(t.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_expand_level_mapping():
    # patch grid 4x2, level2 groups of (2,1) -> groups grid 2x2
    pn, lv = (4, 2), (2, 1)
    n_groups = 4
    x = jnp.arange(2 * n_groups, dtype=jnp.float32).reshape(2 * n_groups, 1)
    out = np.asarray(expand_level(x, pn, lv)).ravel()
    # datapoint 0: patch (i,j) -> group (i//2, j): patches in row-major order
    # (0,0)(0,1)(1,0)(1,1)(2,0)(2,1)(3,0)(3,1) -> groups 0,1,0,1,2,3,2,3
    np.testing.assert_array_equal(out[:8], [0, 1, 0, 1, 2, 3, 2, 3])
    np.testing.assert_array_equal(out[8:], [4, 5, 4, 5, 6, 7, 6, 7])


def test_hierarchical_sampling_zero_noise_sum():
    """With scale ~ 0, the sample equals level1 + broadcast(h) + broadcast(hh)."""
    cfg = TINY_PATCH
    R, D = 8, 6  # 2 datapoints x 4 patches
    loc = jnp.arange(R * D, dtype=jnp.float32).reshape(R, D)
    h_loc = 100 * jnp.arange(4 * D, dtype=jnp.float32).reshape(4, D)  # R/2
    hh_loc = 10000 * jnp.arange(2 * D, dtype=jnp.float32).reshape(2, D)  # R/4
    zero = jnp.zeros_like
    out = sample_hierarchical_latents(
        jax.random.key(0), loc, zero(loc), h_loc, zero(h_loc), hh_loc, zero(hh_loc),
        sample_size=1, cfg=cfg,
    )
    assert out.shape == (R, 1, D)
    # level2: groups of (2,1) patches in a 2x2 patch grid
    h_exp = np.asarray(expand_level(h_loc, cfg.patch_nums, cfg.level2_patch_nums))
    hh_exp = np.asarray(expand_level(hh_loc, cfg.patch_nums, cfg.level3_patch_nums))
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(loc) + h_exp + hh_exp)


def test_lpe_to_pe_shapes_nonpatch_and_patch():
    key = jax.random.key(3)
    up = init_upsample_params(key, 2)
    lpe = jax.random.normal(key, (3, 2, *TINY.lpe_spatial, 128))
    pe = lpe_to_pe(up, lpe, TINY)
    assert pe.shape == (3, 2, 256, 16)

    lpe_p = jax.random.normal(key, (8, 2, *TINY_PATCH.lpe_spatial, 128))
    pe_p = lpe_to_pe(up, lpe_p, TINY_PATCH)
    assert pe_p.shape == (8, 2, 256, 16)


def test_lpe_patch_stitching_consistency():
    """Patch-mode upsampling of a stitched canvas == non-patch upsampling of the
    same canvas, re-split into patches."""
    from recombiner_tpu.coords import patchify, unpatchify

    key = jax.random.key(4)
    up = init_upsample_params(key, 2)
    cfg = TINY_PATCH
    n_data = 2
    R = n_data * cfg.patches_per_datapoint
    lpe = jax.random.normal(key, (R, 1, *cfg.lpe_spatial, 128))
    pe = np.asarray(lpe_to_pe(up, lpe, cfg))  # (R, 1, P, 16)

    # oracle: stitch each datapoint's patch lpes on the host, upsample whole
    for d in range(n_data):
        rows = np.asarray(lpe[d * 4 : (d + 1) * 4, 0])  # (4, 1, 1, 128)
        canvas = unpatchify(rows, cfg.patch_nums)  # (2, 2, 128)
        big = apply_upsample(
            up, jnp.array(canvas)[None], 2, cfg.layerwise_scale_factors, cfg.paddings
        )  # (1, 32, 32, 16)
        expected_patches = patchify(np.asarray(big[0]), cfg.pixel_sizes)
        got = pe[d * 4 : (d + 1) * 4, 0].reshape(4, *cfg.pixel_sizes, 16)
        np.testing.assert_allclose(got, expected_patches, atol=1e-5)


def test_inr_forward_matches_manual_numpy():
    cfg = TINY
    key = jax.random.key(5)
    A = init_linear_transform(key, cfg.net_dims)
    R, S, P = 2, 3, 16
    x = jax.random.normal(jax.random.key(6), (R, S, P, cfg.input_dim))
    h_w = jax.random.normal(jax.random.key(7), (R, S, cfg.n_inr_params))
    out = np.asarray(inr_forward(x, h_w, A, cfg))
    assert out.shape == (R, S, P, cfg.output_dim)

    # manual oracle for one (r, s)
    xn = np.asarray(x, np.float64)
    hn = np.asarray(h_w, np.float64)
    dims = cfg.net_dims
    cum = [0] + list(cfg.cum_param_sizes)
    for r in range(R):
        for s in range(S):
            act = xn[r, s]
            for li in range(cfg.n_layers):
                lat = hn[r, s, cum[li] : cum[li + 1]] @ np.asarray(A[li], np.float64)
                b = lat[: dims[li + 1]]
                w = lat[dims[li + 1] :].reshape(dims[li], dims[li + 1])
                act = act @ w + b
                if li != cfg.n_layers - 1:
                    act = np.sin(cfg.w0 * act)
            np.testing.assert_allclose(out[r, s], act, atol=1e-4)


def test_inr_forward_matches_torch_reference_semantics():
    """Cross-check layer slicing/bias conventions against a torch oracle that
    follows prior_model.py:168-179 exactly."""
    torch = __import__("torch")
    cfg = CIFAR
    key = jax.random.key(8)
    A = init_linear_transform(key, cfg.net_dims)
    R, P = 2, 8
    x = np.asarray(jax.random.normal(jax.random.key(9), (R, P, cfg.input_dim)), np.float32)
    h_w = np.asarray(
        jax.random.normal(jax.random.key(10), (R, cfg.n_inr_params)), np.float32
    ) * 0.02
    ours = np.asarray(inr_forward(jnp.array(x)[:, None], jnp.array(h_w)[:, None], A, cfg))[:, 0]

    xt = torch.from_numpy(x)
    ht = torch.from_numpy(h_w)
    cum = cfg.cum_param_sizes
    dims = cfg.net_dims
    with torch.no_grad():
        act = xt
        for li in range(cfg.n_layers):
            start = 0 if li == 0 else cum[li - 1]
            lat = ht[..., start : cum[li]] @ torch.from_numpy(np.asarray(A[li]))
            bias = lat[:, : dims[li + 1]]
            w = lat[:, dims[li + 1] :].reshape(-1, dims[li], dims[li + 1])
            act = act @ w + bias[:, None, :]
            if li != cfg.n_layers - 1:
                act = torch.sin(cfg.w0 * act)
    np.testing.assert_allclose(ours, act.numpy(), atol=1e-4)


def test_gaussian_pytree():
    g = Gaussian(loc=jnp.zeros((3,)), log_scale=jnp.zeros((3,)))
    leaves = jax.tree_util.tree_leaves(g)
    assert len(leaves) == 2
    s = g.sample(jax.random.key(0), (5,))
    assert s.shape == (5, 3)
    p = NaturalGaussian(loc=jnp.zeros(3), scale=jnp.ones(3))
    assert jax.tree_util.tree_leaves(p)
