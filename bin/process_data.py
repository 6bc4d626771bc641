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
    p.add_argument("npz", help="output npz path")
    args = p.parse_args()

    from bokego_tpu.train import data

    ds = data.load_csv(args.csv)
    data.save_npz(args.npz, ds)
    kind = "vals" if ds.is_value else "moves"
    print(f"wrote {args.npz}: {len(ds)} positions ({kind})")


if __name__ == "__main__":
    main()
