"""Reference-checkpoint converter: write a real reference-format pickle using
the imported reference code, convert it, and verify the mappings agree
numerically (then encode with it end-to-end)."""

import os
import pickle
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def reference_pickle(tmp_path_factory):
    """Build a tiny prior checkpoint exactly the way main_prior_training.py
    does (same dump sequence, :283-341), with the reference's own classes."""
    torch = __import__("torch")
    torch.manual_seed(0)
    sys.path.insert(0, REF)
    try:
        from prior_model import LinearTransform, PriorBNNmodel, Upsample, get_grouping
    finally:
        sys.path.remove(REF)

    model = PriorBNNmodel(
        in_dim=32, hidden_dims=[8, 8], out_dim=3, train_size=2, data_dim=2,
        pixel_sizes=[16, 16], upsample_factors=[16, 16], latent_dim=128,
        patch=False, patch_nums=None, hierarchical_patch_nums=None, device="cpu",
    )
    lt = LinearTransform(model.dims)
    up = Upsample(2, [2, 1, 1], [4, 2, 2])

    s0 = float(torch.nn.functional.softplus(torch.tensor(-2.0)) / 6)
    D = model.cum_param_sizes[-1]
    prior_loc = torch.zeros(D)
    prior_scale = torch.ones(D) * s0
    prior_lpe_loc = torch.zeros(model.lpe_loc.shape[1:])
    prior_lpe_scale = torch.ones(model.lpe_loc.shape[1:]) * s0

    q_loc = torch.cat([model.loc.flatten(start_dim=1),
                       model.lpe_loc.flatten(start_dim=1)], -1)
    q_scale = torch.cat([model.st(model.log_scale).flatten(start_dim=1),
                         model.st(model.lpe_log_scale).flatten(start_dim=1)], -1)
    p_loc = torch.cat([prior_loc, prior_lpe_loc.flatten()])
    p_scale = torch.cat([prior_scale, prior_lpe_scale.flatten()])
    grouping = get_grouping(q_loc.detach(), q_scale.detach(), p_loc, p_scale)
    avg_ls = torch.cat([
        model.log_scale.detach().mean(0),
        model.lpe_log_scale.detach().mean(0).flatten(),
    ])

    path = str(tmp_path_factory.mktemp("ref") / "PRIOR_ref.pkl")
    with open(path, "wb") as f:
        pickle.dump(grouping, f)
        pickle.dump((p_loc, p_scale, 1e-7, avg_ls), f)
        pickle.dump((None,) * 8, f)
        pickle.dump((None, None, 1e-7, None), f)
        pickle.dump((None,) * 8, f)
        pickle.dump((None, None, 1e-7, None), f)
        pickle.dump(lt, f)
        pickle.dump(up, f)
    return path, lt, up


def test_convert_and_mapping_parity(reference_pickle):
    import jax.numpy as jnp
    import torch

    from recombiner_tpu.config import TINY
    from recombiner_tpu.io.convert_reference import convert_reference_checkpoint
    from recombiner_tpu.models.upsample import apply_upsample

    path, lt, up = reference_pickle
    art = convert_reference_checkpoint(path, "tiny", reference_path=REF)
    assert art.config == TINY
    assert art.w.p_loc.shape == (TINY.n_coded_params,)
    assert art.w.grouping.n_params == TINY.n_coded_params

    # A matrices carried over unchanged
    np.testing.assert_array_equal(art.A[0], lt.A[0].detach().numpy())

    # converted upsampler == reference upsampler on the same input
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 1, 1, 128)).astype(np.float32)
    ours = np.asarray(
        apply_upsample(
            {k: {kk: jnp.asarray(vv) for kk, vv in v.items()} for k, v in art.up.items()},
            jnp.asarray(x), 2, (4, 2, 2), (2, 1, 1),
        )
    )
    with torch.no_grad():
        ref = up(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_encode_with_converted_artifact(reference_pickle):
    """A prior trained by the REFERENCE code drives OUR encoder end-to-end."""
    import jax
    import jax.numpy as jnp

    from recombiner_tpu.coding.encoder import decode, init_codec
    from recombiner_tpu.coding.progressive import compress
    from recombiner_tpu.config import TINY
    from recombiner_tpu.data.synthetic import synthetic_dataset
    from recombiner_tpu.io.convert_reference import convert_reference_checkpoint

    path, _, _ = reference_pickle
    art = convert_reference_checkpoint(path, "tiny", reference_path=REF)
    X, Y = synthetic_dataset(TINY, 2, seed=5)
    codec, state = init_codec(art, n_rows=2)
    res = compress(
        codec, state, jnp.asarray(X), jnp.asarray(Y), TINY, jax.random.key(0),
        n_optimize_epochs=15, lr=2e-3, sample_size=2,
        finetune_overrides={"w": 1},
    )
    dec = np.asarray(decode(codec, res.indices, jnp.asarray(X), TINY))
    np.testing.assert_array_equal(dec, res.reconstruction)


def test_convert_cli(reference_pickle, tmp_path):
    from recombiner_tpu.cli import convert
    from recombiner_tpu.io.checkpoint import load_prior_artifact

    path, _, _ = reference_pickle
    out = str(tmp_path / "converted.npz")
    convert.main(
        ["--pickle", path, "--dataset", "tiny", "--reference_path", REF, "--out", out]
    )
    art = load_prior_artifact(out)
    assert art.config.name == "tiny"
    assert art.w.grouping.n_groups > 0


def test_export_then_convert_round_trip(tmp_path):
    """ours -> reference pickle -> ours again: the artifact survives the
    round trip exactly, and the reference's own Upsample module built from
    the exported pickle computes the same mapping as our upsampler."""
    import jax
    import jax.numpy as jnp
    import torch

    from recombiner_tpu.config import TINY
    from recombiner_tpu.data.synthetic import synthetic_dataset
    from recombiner_tpu.io.convert_reference import convert_reference_checkpoint
    from recombiner_tpu.io.export_reference import export_reference_checkpoint
    from recombiner_tpu.models.upsample import apply_upsample
    from recombiner_tpu.priors.artifact import build_prior_artifact
    from recombiner_tpu.priors.trainer import em_train

    cfg = TINY
    X, Y = synthetic_dataset(cfg, 2, seed=9)
    res = em_train(
        jax.random.key(0), cfg, jnp.asarray(X), jnp.asarray(Y), max_bitrate=6.0,
        n_em_iters=1, first_epochs=5, later_epochs=5, lr=2e-3,
    )
    art = build_prior_artifact(res.state, res.priors, res.kl_beta, cfg)

    path = str(tmp_path / "PRIOR_exported.pkl")
    export_reference_checkpoint(art, path, reference_path=REF)
    back = convert_reference_checkpoint(path, "tiny", reference_path=REF)

    np.testing.assert_array_equal(back.w.p_loc, np.asarray(art.w.p_loc, np.float32))
    np.testing.assert_array_equal(back.w.p_scale, np.asarray(art.w.p_scale, np.float32))
    np.testing.assert_array_equal(
        back.w.avg_log_scale, np.asarray(art.w.avg_log_scale, np.float32)
    )
    g0, g1 = art.w.grouping, back.w.grouping
    assert g0.n_groups == g1.n_groups
    np.testing.assert_array_equal(g0.param2group, g1.param2group)
    np.testing.assert_array_equal(g0.group_idx, g1.group_idx)
    for a0, a1 in zip(art.A, back.A):
        np.testing.assert_array_equal(np.asarray(a0, np.float32), a1)

    # the exported torch Upsample module agrees with our upsampler
    with open(path, "rb") as f:
        import pickle as pkl
        import sys as _sys

        _sys.path.insert(0, REF)
        try:
            for _ in range(7):
                pkl.load(f)
            up_torch = pkl.load(f)
        finally:
            _sys.path.remove(REF)
    lpe = np.random.default_rng(1).normal(size=(1, 1, 1, 128)).astype(np.float32)
    ours = np.asarray(apply_upsample(
        jax.tree_util.tree_map(jnp.asarray, art.up), jnp.asarray(lpe), cfg.data_dim,
        cfg.layerwise_scale_factors, cfg.paddings,
    ))
    with torch.no_grad():
        theirs = up_torch(torch.from_numpy(lpe).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_convert_cli_export_direction(reference_pickle, tmp_path):
    """CLI round trip through BOTH directions: pickle -> npz -> pickle -> npz
    preserves the artifact."""
    from recombiner_tpu.cli import convert
    from recombiner_tpu.io.checkpoint import load_prior_artifact

    path, _, _ = reference_pickle
    npz1 = str(tmp_path / "a.npz")
    convert.main(["--pickle", path, "--dataset", "tiny", "--reference_path", REF, "--out", npz1])
    pkl2 = str(tmp_path / "b.pkl")
    convert.main(["--to_reference", "--artifact", npz1, "--reference_path", REF, "--out", pkl2])
    npz2 = str(tmp_path / "c.npz")
    convert.main(["--pickle", pkl2, "--dataset", "tiny", "--reference_path", REF, "--out", npz2])

    a1 = load_prior_artifact(npz1)
    a2 = load_prior_artifact(npz2)
    np.testing.assert_array_equal(a1.w.p_loc, a2.w.p_loc)
    np.testing.assert_array_equal(a1.w.p_scale, a2.w.p_scale)
    np.testing.assert_array_equal(a1.w.grouping.param2group, a2.w.grouping.param2group)
    for x, y in zip(a1.A, a2.A):
        np.testing.assert_array_equal(x, y)
