"""Decompression CLI — the explicit decoder the reference leaves implicit.

    python -m recombiner_tpu.cli.decompress --bitstream out/bitstream_test_id_0.rctb \
        --prior_path out/PRIOR_....npz --save_dir out/
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from recombiner_tpu.coding.encoder import decode, init_codec
from recombiner_tpu.coords import grid_fourier_features
from recombiner_tpu.io.bitstream import read_bitstream
from recombiner_tpu.io.checkpoint import load_prior_artifact


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Decode a RECOMBINER-TPU bitstream")
    p.add_argument("--bitstream", required=True)
    p.add_argument("--prior_path", required=True)
    p.add_argument("--save_dir", required=True)
    p.add_argument(
        "--export_media",
        action="store_true",
        help="also write reassembled PNG/WAV/PDB/NPZ files per datapoint",
    )
    return p.parse_args(argv)


def main(argv=None):
    from recombiner_tpu.utils.platform import apply_platform_override

    apply_platform_override()  # RECOMBINER_TPU_PLATFORM=cpu etc. (utils/platform.py)
    args = parse_args(argv)
    art = load_prior_artifact(args.prior_path)
    cfg = art.config
    header, indices = read_bitstream(args.bitstream)
    if header["config"] != cfg.name:
        raise SystemExit(
            f"bitstream was encoded for config {header['config']}, prior is {cfg.name}"
        )
    if header["codebook_seed"] != art.codebook_seed:
        raise SystemExit("bitstream/prior codebook seed mismatch")
    kind = header.get("codebook_kind", "threefry")

    n_rows = indices["w"].shape[0]
    codec, _ = init_codec(art, n_rows, codebook_kind=kind)
    feats = grid_fourier_features(cfg.pixel_sizes, cfg.fourier_dim)
    X = jnp.broadcast_to(jnp.asarray(feats), (n_rows, *feats.shape))
    y = np.asarray(decode(codec, indices, X, cfg))

    os.makedirs(args.save_dir, exist_ok=True)
    out = os.path.join(
        args.save_dir,
        os.path.basename(args.bitstream).replace(".rctb", "_decoded.npy"),
    )
    np.save(out, y)
    print(f"Decoded {n_rows} rows -> {out} shape={y.shape}", flush=True)
    if args.export_media:
        from recombiner_tpu.data.export import export_reconstructions

        stem = os.path.basename(args.bitstream).replace(".rctb", "")
        paths = export_reconstructions(y, cfg, args.save_dir, stem=stem)
        print(f"Exported {len(paths)} media files ({paths[0]} ...)", flush=True)
    return y


if __name__ == "__main__":
    main()
