"""Binary bitstream format for transmitted group indices.

The reference's "bitstream" is CSVs of float-formatted indices
(main_compression.py:169-178). Here the real format: a compact binary file of
16-bit sample indices plus a JSON header carrying everything the decoder
needs to expand them against the shared prior artifact, with CRC32 integrity.

Layout:  magic 'RCTB' | u8 version | u32 header_len | header JSON |
         per level (in header order): u16/u32 indices row-major | u32 crc32

A native C++ packer (recombiner_tpu/native) accelerates bulk pack/unpack when
built; this module is the reference implementation and always available.
"""

from __future__ import annotations

import json
import struct
import zlib
from typing import Dict

import numpy as np

MAGIC = b"RCTB"
VERSION = 1


def pack_bitstream(
    indices: Dict[str, np.ndarray],
    *,
    config_name: str,
    codebook_seed: int,
    bits_per_group: int,
    codebook_kind: str = "threefry",
    extra: dict | None = None,
) -> bytes:
    from recombiner_tpu import native

    dtype = np.uint16 if bits_per_group <= 16 else np.uint32
    levels = []
    payload = b""
    for name, idx in indices.items():
        idx = np.ascontiguousarray(np.asarray(idx))
        levels.append({"name": name, "rows": int(idx.shape[0]), "groups": int(idx.shape[1])})
        if dtype is np.uint16:
            packed = native.pack_indices(idx, bits_per_group)  # range-checked in C++
        else:
            packed = None
        if packed is None:
            if idx.min() < 0 or idx.max() >= 2**bits_per_group:
                raise ValueError(f"index out of range for {bits_per_group}-bit groups")
            packed = idx.astype(dtype)
        payload += packed.tobytes()
    header = json.dumps(
        {
            "config": config_name,
            "codebook_seed": int(codebook_seed),
            "codebook_kind": codebook_kind,
            "bits_per_group": int(bits_per_group),
            "levels": levels,
            **(extra or {}),
        }
    ).encode()
    body = MAGIC + struct.pack("<BI", VERSION, len(header)) + header + payload
    return body + struct.pack("<I", zlib.crc32(body))


def unpack_bitstream(blob: bytes):
    """Returns (header dict, {level: (rows, groups) int32 indices})."""
    if blob[:4] != MAGIC:
        raise ValueError("not a RCTB bitstream")
    body, crc = blob[:-4], struct.unpack("<I", blob[-4:])[0]
    if zlib.crc32(body) != crc:
        raise ValueError("bitstream CRC mismatch")
    version, hlen = struct.unpack("<BI", blob[4:9])
    if version > VERSION:
        raise ValueError(f"bitstream version {version} unsupported")
    header = json.loads(blob[9 : 9 + hlen].decode())
    dtype = np.uint16 if header["bits_per_group"] <= 16 else np.uint32
    off = 9 + hlen
    out = {}
    for lv in header["levels"]:
        if lv["rows"] < 0 or lv["groups"] < 0:
            raise ValueError(f"bitstream header declares negative shape: {lv}")
        n = lv["rows"] * lv["groups"]
        arr = np.frombuffer(blob, dtype, count=n, offset=off)
        out[lv["name"]] = arr.reshape(lv["rows"], lv["groups"]).astype(np.int32)
        off += n * dtype().itemsize
    return header, out


def write_bitstream(path: str, indices: Dict[str, np.ndarray], **kw) -> int:
    blob = pack_bitstream(indices, **kw)
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def read_bitstream(path: str):
    with open(path, "rb") as f:
        return unpack_bitstream(f.read())
