#!/usr/bin/env python
"""Migrate a raw KDN simulator dataset (NSFNET/GEANT2/synth50) into the
framework's JSON graph archives.

Equivalent CLI to the reference's examples/Routenet/migrate.py:159-167:

    python tools/migrate.py --dataset /path/to/nsfnetbw --output_path ./out
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ignnition_tpu.data.kdn import migrate  # noqa: E402


def main():
    p = argparse.ArgumentParser(
        description="Migrate a raw simulator dataset to JSON graph archives."
    )
    p.add_argument("--dataset", required=True, help="raw dataset root directory")
    p.add_argument("--output_path", required=True, help="output directory")
    p.add_argument("--samples_per_archive", type=int, default=100)
    p.add_argument("--train_fraction", type=float, default=0.8)
    p.add_argument("--limit", type=int, default=None, help="max samples to convert")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--intensity",
        type=int,
        nargs=2,
        default=None,
        metavar=("LO", "HI"),
        help="keep only archives whose file-name intensity is in [LO, HI] "
        "(reference datanetAPI intensity_values filter)",
    )
    args = p.parse_args()

    n_train, n_eval = migrate(
        args.dataset,
        args.output_path,
        samples_per_archive=args.samples_per_archive,
        train_fraction=args.train_fraction,
        seed=args.seed,
        limit=args.limit,
        intensity_range=tuple(args.intensity) if args.intensity else None,
    )
    if n_train + n_eval == 0:
        print(
            f"error: no samples found under '{args.dataset}' — expected "
            f"directories containing graph_attr.txt plus *.tar.gz archives",
            file=sys.stderr,
        )
        sys.exit(1)
    print(f"migrated {n_train} train / {n_eval} eval samples to {args.output_path}")


if __name__ == "__main__":
    main()
