"""Convert a reference (PyTorch) prior checkpoint into our artifact format.

    python -m recombiner_tpu.cli.convert --pickle PRIOR_....pkl --dataset cifar \
        --reference_path /path/to/RECOMBINER --out prior.npz
"""

from __future__ import annotations

import argparse

from recombiner_tpu.io.checkpoint import save_prior_artifact
from recombiner_tpu.io.convert_reference import convert_reference_checkpoint


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Convert reference prior pickle -> npz artifact")
    p.add_argument("--pickle", required=True, help="reference PRIOR_*.pkl path")
    p.add_argument("--dataset", required=True)
    p.add_argument("--reference_path", default=None,
                   help="path to the reference repo (needed to unpickle its nn.Modules)")
    p.add_argument("--out", required=True)
    p.add_argument("--codebook_seed", type=int, default=42)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    art = convert_reference_checkpoint(
        args.pickle, args.dataset, reference_path=args.reference_path,
        codebook_seed=args.codebook_seed,
    )
    save_prior_artifact(args.out, art)
    print(
        f"Converted {args.pickle} -> {args.out} "
        f"(n_groups={art.w.grouping.n_groups}, kl_beta={art.kl_beta:.3g})",
        flush=True,
    )
    return art


if __name__ == "__main__":
    main()
