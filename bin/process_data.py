#!/usr/bin/env python
"""Featurize a CSV of positions into a compressed npz (reference:
``nnet.process_csv``, nnet.py:366-383 — fixed and batched on device)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main():
    p = argparse.ArgumentParser(description="csv -> npz feature precompute")
    p.add_argument("csv", help="input csv (board, ko, last, move|val)")
    p.add_argument("out", help="output path: .npz (feature precompute) or a "
                   "shard prefix with --shards (packed raw positions)")
    p.add_argument("--shards", action="store_true",
                   help="write packed .pshard.npz shards (constant-memory "
                   "streaming SL; features computed on device at train time)")
    p.add_argument("--shard-size", type=int, default=262144)
    args = p.parse_args()

    from bokego_tpu.train import data

    if args.shards:
        # constant-memory streaming pack (23M-row CSVs never materialize
        # in RAM — round-2 weak #6)
        paths = data.pack_csv_to_shards(args.csv, args.out, args.shard_size)
        total = sum(
            int(__import__("numpy").load(p)["boards"].shape[0]) for p in paths
        )
        print(f"wrote {len(paths)} shards: {total} positions")
        return
    ds = data.load_csv(args.csv)
    data.save_npz(args.out, ds)
    kind = "vals" if ds.is_value else "moves"
    print(f"wrote {args.out}: {len(ds)} positions ({kind})")


if __name__ == "__main__":
    main()
