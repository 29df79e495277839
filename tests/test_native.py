"""Native C++ library: bit-identical parity with the Python implementations."""

import zlib

import numpy as np
import pytest

from recombiner_tpu import native
from recombiner_tpu.coding.gumbel import gumbel_chain as py_gumbel_chain


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++)")
    return lib


def test_crc32_matches_zlib(lib):
    data = b"hello recombiner-tpu" * 100
    assert native.crc32(data) == zlib.crc32(data)
    assert native.crc32(b"") == zlib.crc32(b"")
    # incremental
    a, b = data[:57], data[57:]
    assert native.crc32(b, native.crc32(a)) == zlib.crc32(data)


def test_pack_indices_parity(lib):
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 2**16, size=(37, 11)).astype(np.int32)
    out = native.pack_indices(idx, 16)
    np.testing.assert_array_equal(out, idx.astype(np.uint16))
    with pytest.raises(ValueError):
        native.pack_indices(np.array([[2**16]], np.int32), 16)
    with pytest.raises(ValueError):
        native.pack_indices(np.array([[-1]], np.int32), 16)


def test_gumbel_chain_bit_parity(lib):
    """C++ MT19937 reimplementation must match numpy RandomState to libm
    rounding (<=1 ulp in float64 from log), and exactly in the float32 form
    the encoder actually consumes (encoder.py casts to f32)."""
    for seed in (0, 42, 123456):
        ours = native.gumbel_chain(2000, seed)
        ref = py_gumbel_chain(2000, seed)
        np.testing.assert_allclose(ours, ref, rtol=1e-14, atol=1e-14)
        np.testing.assert_array_equal(
            ours.astype(np.float32), ref.astype(np.float32)
        )


def test_parse_pdb_ca_parity(lib, tmp_path):
    from recombiner_tpu.data.protein import _parse_pdb_ca_py as py_parse

    lines = []
    for i in range(120):
        # NB: both parsers whitespace-split PDB lines (a quirk inherited from
        # the reference, data/protein.py:22-29), so fields must not merge —
        # keep coords in the 7-char-plus-sign-free range.
        x, y, z = 0.5 * i, 0.25 * i, 0.125 * i
        lines.append(
            f"ATOM  {i + 1:5d}  CA  ALA A{i + 1:4d}    {x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           C"
        )
        lines.append(
            f"ATOM  {i + 1:5d}  CB  ALA A{i + 1:4d}    {x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           C"
        )
        lines.append("HETATM fake line")
    text = "\n".join(lines)
    p = tmp_path / "x.pdb"
    p.write_text(text)

    py_xyz = py_parse(str(p))
    n, c_xyz = native.parse_pdb_ca(text.encode(), 96)
    assert n == 120
    np.testing.assert_array_equal(c_xyz, py_xyz)


def test_parse_pdb_short_chain(lib):
    text = b"ATOM      1  CA  ALA A   1       1.000   2.000   3.000  1.00  0.00\n"
    n, xyz = native.parse_pdb_ca(text, 96)
    assert n == 1
    np.testing.assert_allclose(xyz[0], [1.0, 2.0, 3.0])
    assert (xyz[1:] == 0).all()


def test_patch_permutations_bit_parity():
    """Native permutation streams are bit-identical to the format spec:
    column c = RandomState(c).choice(n, n, False) (test_model.py:186-190)."""
    from recombiner_tpu import native

    out = native.patch_permutations(37, 50)
    assert out is not None, "native library must build in this image"
    perm, inv = out
    oracle = np.empty((37, 50), np.int32)
    for c in range(50):
        oracle[:, c] = np.random.RandomState(c).choice(37, 37, False)
    np.testing.assert_array_equal(perm, oracle)
    # inverse property
    for c in range(50):
        np.testing.assert_array_equal(inv[oracle[:, c], c], np.arange(37))
