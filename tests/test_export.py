import numpy as np

from recombiner_tpu.config import AUDIO, KODAK, PROTEIN, TINY, TINY_PATCH
from recombiner_tpu.data.export import (
    export_reconstructions,
    read_wav,
    reassemble,
    write_pdb,
    write_png,
    write_wav,
)
from recombiner_tpu.data.protein import parse_pdb_ca, normalize_backbone


def test_reassemble_roundtrip_patch(tmp_path):
    from recombiner_tpu.coords import patchify

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    patches = patchify(img, TINY_PATCH.pixel_sizes)  # (4, 16, 16, 3)
    rows = patches.reshape(4, -1, 3)
    out = reassemble(rows, TINY_PATCH)
    np.testing.assert_array_equal(out[0], img)


def test_png_export(tmp_path):
    rng = np.random.default_rng(1)
    y = rng.uniform(size=(2, TINY.n_pixels, 3)).astype(np.float32)
    paths = export_reconstructions(y, TINY, str(tmp_path))
    assert len(paths) == 2 and paths[0].endswith(".png")
    from PIL import Image

    img = np.asarray(Image.open(paths[0])).astype(np.float32) / 255.0
    expect = np.round(y[0].reshape(16, 16, 3) * 255) / 255
    np.testing.assert_allclose(img, expect, atol=1e-6)


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    clip = rng.uniform(0.1, 0.9, 48000).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, clip)
    back = read_wav(p)
    np.testing.assert_allclose(back, clip, atol=1e-4)


def test_audio_export_shape(tmp_path):
    rng = np.random.default_rng(3)
    y = rng.uniform(size=(60, 800, 1)).astype(np.float32)  # one clip in patches
    paths = export_reconstructions(y, AUDIO, str(tmp_path))
    assert len(paths) == 1 and paths[0].endswith(".wav")
    assert read_wav(paths[0]).shape == (48000,)


def test_pdb_export_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    xyz = rng.uniform(0, 3, size=(96, 3)).astype(np.float32)  # normalized units
    p = str(tmp_path / "c.pdb")
    write_pdb(p, xyz)
    parsed = parse_pdb_ca(p)  # returns de-normalized coords
    np.testing.assert_allclose(parsed, xyz * 25.0, atol=1e-3)


def test_kodak_reassembly_shape():
    rng = np.random.default_rng(5)
    y = rng.uniform(size=(96, KODAK.n_pixels, 3)).astype(np.float32)
    out = reassemble(y, KODAK)
    assert out.shape == (1, 512, 768, 3)
