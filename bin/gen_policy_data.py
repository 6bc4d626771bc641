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
    p.add_argument("-o", metavar="PATH", required=True,
                   help="output csv, or shard prefix with --packed")
    p.add_argument("--packed", action="store_true",
                   help="write .pshard.npz shards directly (vectorized, no "
                        "CSV intermediate — the at-scale path)")
    p.add_argument("--policy", help="policy checkpoint (orbax dir or .pt)")
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--max-turns", type=int, default=70)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-augment", action="store_true")
    args = p.parse_args()

    import time

    from bokego_tpu.cli import load_variables
    from bokego_tpu.train import gendata
    from bokego_tpu.train.data import save_shards

    variables = load_variables(args.policy, "policy")
    rng = jax.random.PRNGKey(args.seed)
    done = chunk = total_pos = 0
    t0 = time.monotonic()
    while done < args.n:
        rng, sub = jax.random.split(rng)
        traj = gendata.generate(
            sub, variables, args.batch, max_turns=args.max_turns
        )
        if args.packed:
            ds = gendata.trajectory_to_packed(traj, augment=not args.no_augment)
            save_shards(f"{args.o}-c{chunk:03d}", ds, shard_size=len(ds))
            n_pos = len(ds)
        else:
            rows = gendata.trajectory_to_rows(traj)
            gendata.write_csv(args.o, rows, augment=not args.no_augment)
            n_pos = len(rows)
        chunk += 1
        done += args.batch
        total_pos += n_pos
        dt = time.monotonic() - t0
        print(f"{min(done, args.n)}/{args.n} games, {total_pos} positions "
              f"({total_pos / dt:.0f} pos/s)", flush=True)


if __name__ == "__main__":
    main()
