import numpy as np

from recombiner_tpu.coords import (
    datum_to_points,
    fourier_features,
    grid_fourier_features,
    make_coord_grid,
    patchify,
    unpatchify,
)


def test_coord_grid_matches_reference_formula():
    g = make_coord_grid((4, 8))
    assert g.shape == (4, 8, 2)
    # (0.5 + i)/s in [0,1] mapped to [-1,1]
    expect0 = -1 + 2 * (0.5 + np.arange(4)) / 4
    np.testing.assert_allclose(g[:, 0, 0], expect0, rtol=1e-6)
    expect1 = -1 + 2 * (0.5 + np.arange(8)) / 8
    np.testing.assert_allclose(g[0, :, 1], expect1, rtol=1e-6)


def test_fourier_features_against_torch_oracle():
    torch = __import__("torch")
    coords = make_coord_grid((5, 7)).reshape(-1, 2)
    feats = fourier_features(coords, 16)
    assert feats.shape == (35, 16)

    # independent torch computation of data/image.py:25-27
    t = torch.from_numpy(coords)
    w = torch.exp(torch.linspace(0, float(np.log(1024)), 16 // 4))
    z = torch.matmul(t.unsqueeze(-1), w.unsqueeze(0)).view(35, -1)
    ref = torch.cat([torch.cos(np.pi * z), torch.sin(np.pi * z)], dim=-1).numpy()
    # torch computes sin/cos of ~1024*pi arguments in float32; our float64
    # pipeline differs by ~1e-4 there (ours is the more accurate one).
    np.testing.assert_allclose(feats, ref, atol=3e-4)


def test_fourier_dim_3d():
    feats = grid_fourier_features((2, 3, 4), 18)
    assert feats.shape == (24, 18)


def test_datum_to_points_ordering_matches_channel_first_flatten():
    rng = np.random.default_rng(0)
    chan_last = rng.normal(size=(4, 6, 3)).astype(np.float32)
    coords, feats = datum_to_points(chan_last)
    # reference: datum (C, *spatial) -> reshape(C, -1).T
    chan_first = np.moveaxis(chan_last, -1, 0)
    ref = chan_first.reshape(3, -1).T
    np.testing.assert_array_equal(feats, ref)
    assert coords.shape == (24, 2)


def test_patchify_roundtrip_and_order():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(8, 12, 3)).astype(np.float32)
    patches = patchify(img, (4, 6))
    assert patches.shape == (4, 4, 6, 3)
    # row-major patch order: patch 1 is (rows 0:4, cols 6:12)
    np.testing.assert_array_equal(patches[1], img[0:4, 6:12])
    np.testing.assert_array_equal(patches[2], img[4:8, 0:6])
    back = unpatchify(patches, (2, 2))
    np.testing.assert_array_equal(back, img)


def test_patchify_3d():
    rng = np.random.default_rng(2)
    vid = rng.normal(size=(4, 8, 8, 3)).astype(np.float32)
    patches = patchify(vid, (2, 4, 4))
    assert patches.shape == (8, 2, 4, 4, 3)
    np.testing.assert_array_equal(patches[1], vid[0:2, 0:4, 4:8])
    back = unpatchify(patches, (2, 2, 2))
    np.testing.assert_array_equal(back, vid)
