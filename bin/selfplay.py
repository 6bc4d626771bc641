#!/usr/bin/env python
"""REINFORCE self-play training CLI (reference: bin/selfplay.py).

Plays the latest pool policy against randomly-sampled previous generations
and appends the new generation to the pool.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os

import numpy as np

import jax


def main():
    p = argparse.ArgumentParser(description="REINFORCE self-play training")
    p.add_argument("-e", metavar="E", type=int, default=1, help="number of epochs")
    p.add_argument("-b", metavar="B", type=int, default=16, help="games per batch")
    p.add_argument("-n", metavar="N", type=int, default=64, help="iterations per epoch")
    p.add_argument("-f", metavar="PATH", default=os.path.join(os.getcwd(), "RL_stats.txt"),
                   help="stats file")
    p.add_argument("-w", metavar="PATH", default=os.path.join("data", "weights"),
                   help="weights pool directory")
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--max-turns", type=int, default=70)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from bokego_tpu.models import init_policy
    from bokego_tpu.train import checkpoints, reinforce

    latest = checkpoints.latest_policy(args.w)
    if latest is None:
        print("Empty pool: seeding policy_0 with fresh init")
        variables = init_policy(jax.random.PRNGKey(args.seed))
        checkpoints.save_next_policy(args.w, variables)
        n_latest, ckpt = 0, {"variables": variables}
    else:
        n_latest, ckpt = latest
    variables = ckpt["variables"]
    # Optimizer state only threads within this process: a checkpointed one
    # restores as plain dicts (orbax drops optax NamedTuple types) and the
    # pool seed's SL state has a different optimizer tree anyway — fresh
    # Adam state per run matches the reference, which never checkpoints
    # optimizer state across selfplay.py invocations either.
    opt_state = None
    print(f"Opponent pool size: {n_latest}")

    rng = np.random.default_rng(args.seed)
    jrng = jax.random.PRNGKey(args.seed)
    for epoch in range(args.e):
        print(f"Epoch: {epoch + 1}")
        opp_id, opp_ckpt = checkpoints.sample_opponent(args.w, rng)
        print(f"Playing against Policy {opp_id}")
        jrng, sub = jax.random.split(jrng)
        result = reinforce.train_epoch(
            sub,
            variables,
            opp_ckpt["variables"],
            n_iters=args.n,
            batch_games=args.b,
            max_turns=args.max_turns,
            lr=args.lr,
            opt_state=opt_state,
        )
        variables, opt_state = result.variables, result.opt_state
        with open(args.f, "a+") as f:
            f.write(f"Policy {n_latest} vs. Policy {opp_id}\n")
            f.write(f"Batch Size: {args.b}, Iterations: {args.n}\n")
            f.write(",".join(f"{w:.3f}" for w in result.winrates) + "\n")
        n_latest = checkpoints.save_next_policy(args.w, variables, opt_state)
        print(f"Saved policy_{n_latest}")


if __name__ == "__main__":
    main()
