#!/usr/bin/env python
"""Value-net data generation CLI (reference: bin/genvals.py intent).

Generates labeled positions in device batches and appends them (×8 dihedral
augmentation) to a CSV consumable by bin/train.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax


def main():
    p = argparse.ArgumentParser(description="generate data for value net")
    p.add_argument("-n", metavar="N", type=int, default=1,
                   help="number of games to generate, in thousands")
    p.add_argument("-o", metavar="PATH", required=True, help="output csv")
    p.add_argument("--sl", help="SL policy checkpoint (orbax dir or .pt)")
    p.add_argument("--rl", help="RL policy checkpoint (orbax dir or .pt)")
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--min-r", type=int, default=70,
                   help="earliest random-move turn (reference: 70, "
                   "genvals.py:22 — but a value net trained only on turn-70+ "
                   "positions extrapolates a large systematic bias at "
                   "earlier turns; spread r across the whole game for a "
                   "net the search can trust everywhere)")
    p.add_argument("--max-r", type=int, default=90)
    p.add_argument("--max-turns", type=int, default=90)
    p.add_argument("--raw-tt-labels", action="store_true",
                   help="label with raw Tromp-Taylor instead of the "
                        "dead-group-aware resolved score (the default "
                        "mirrors the reference's gnugo labels, go.py:512)")
    args = p.parse_args()

    from bokego_tpu.cli import load_variables
    from bokego_tpu.train import genvals

    sl_vars = load_variables(args.sl, "policy")
    rl_vars = load_variables(args.rl, "policy") if args.rl else sl_vars

    total = args.n * 1000
    rng = jax.random.PRNGKey(args.seed)
    gen = jax.jit(
        lambda r: genvals.generate(
            r, sl_vars, rl_vars, args.batch,
            max_turns=args.max_turns, min_r=args.min_r, max_r=args.max_r,
            resolved_labels=not args.raw_tt_labels,
        )
    )
    written = 0
    while written < total:
        rng, sub = jax.random.split(rng)
        samples = gen(sub)
        rows = genvals.samples_to_rows(samples)
        genvals.write_csv(args.o, rows, augment=not args.no_augment)
        written += len(rows)
        print(f"{written}/{total} positions")


if __name__ == "__main__":
    main()
