#!/usr/bin/env python
"""Generate policy-SL training data from self-play (the from-scratch
replacement for the reference's unshipped KGS dataset, report.pdf p.4)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax


def main():
    p = argparse.ArgumentParser(description="self-play -> policy SL csv")
    p.add_argument("-n", metavar="GAMES", type=int, default=1024,
                   help="number of games")
    p.add_argument("-o", metavar="PATH", required=True, help="output csv")
    p.add_argument("--policy", help="policy checkpoint (orbax dir or .pt)")
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--max-turns", type=int, default=70)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-augment", action="store_true")
    args = p.parse_args()

    from bokego_tpu.cli import load_variables
    from bokego_tpu.train import gendata

    variables = load_variables(args.policy, "policy")
    rng = jax.random.PRNGKey(args.seed)
    done = 0
    while done < args.n:
        rng, sub = jax.random.split(rng)
        traj = gendata.generate(
            sub, variables, args.batch, max_turns=args.max_turns
        )
        rows = gendata.trajectory_to_rows(traj)
        gendata.write_csv(args.o, rows, augment=not args.no_augment)
        done += args.batch
        print(f"{min(done, args.n)}/{args.n} games ({len(rows)} positions)")


if __name__ == "__main__":
    main()
