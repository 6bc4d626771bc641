#!/usr/bin/env python
"""AlphaZero-style closed-loop training CLI (beyond-reference bonus:
search-visit policy targets + outcome value targets, train/alphazero.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax


def main():
    p = argparse.ArgumentParser(description="AlphaZero-style training loop")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--moves", type=int, default=80)
    p.add_argument("--rollouts", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--policy", help="initial policy ckpt (orbax dir or .pt)")
    p.add_argument("--value", help="initial value ckpt (orbax dir or .pt)")
    p.add_argument("-o", "--out", default="az_ckpt", help="output dir prefix")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from bokego_tpu.cli import load_variables
    from bokego_tpu.train import alphazero as az, checkpoints

    pv = load_variables(args.policy, "policy")
    vv = load_variables(args.value, "value")
    state = az.train(
        jax.random.PRNGKey(args.seed), pv, vv,
        iters=args.iters, batch=args.batch, n_moves=args.moves,
        n_rollouts=args.rollouts, lr=args.lr, temperature=args.temperature,
    )
    checkpoints.save_variables(args.out + "_policy", state.policy)
    checkpoints.save_variables(args.out + "_value", state.value)
    print(f"saved {args.out}_policy and {args.out}_value")


if __name__ == "__main__":
    main()
