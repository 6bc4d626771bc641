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
    p.add_argument("--temp-moves", type=int, default=12,
                   help="sample by visits for the first T plies, greedy "
                        "after (AlphaZero opening-diversity schedule)")
    p.add_argument("--updates-per-iter", type=int, default=1)
    p.add_argument("--policy", help="initial policy ckpt (orbax dir or .pt)")
    p.add_argument("--value", help="initial value ckpt (orbax dir or .pt)")
    p.add_argument("-o", "--out", default="az_ckpt", help="output dir prefix")
    p.add_argument("--save-every", type=int, default=16,
                   help="checkpoint {out}_policy/{out}_value every K iters")
    p.add_argument("--resume", action="store_true",
                   help="continue from {out}_policy/{out}_value and "
                        "{out}_iter.txt if present (optimizer restarts "
                        "fresh, as the reference's per-invocation Adam)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from bokego_tpu.cli import load_variables
    from bokego_tpu.train import alphazero as az, checkpoints

    import numpy as np

    start_iter = 0
    iter_path = args.out + "_iter.txt"
    ckpt_path = args.out + "_ckpt"  # combined all-or-nothing resume state
    if args.resume and os.path.isdir(ckpt_path):
        # Single-payload resume: policy+value+iter land in ONE orbax save
        # (tmp dir + rename, atomic), so a crash mid-checkpoint can never
        # leave a mixed pair for --resume to load (ADVICE r4 #3).
        payload = checkpoints.load_checkpoint(ckpt_path)["variables"]
        pv, vv = payload["policy"], payload["value"]
        start_iter = int(payload["iter"])
        print(f"resuming from {ckpt_path} at iter {start_iter}")
    elif args.resume and os.path.isdir(args.out + "_policy"):
        # legacy split layout (pre-combined checkpoints)
        pv = checkpoints.load_variables(args.out + "_policy")
        vv = checkpoints.load_variables(args.out + "_value")
        if os.path.exists(iter_path):
            start_iter = int(open(iter_path).read().strip())
        print(f"resuming from {args.out}_* at iter {start_iter}")
    else:
        pv = load_variables(args.policy, "policy")
        vv = load_variables(args.value, "value")

    def save_all(it, policy, value):
        # Resume source of truth first (atomic); the split dirs and iter
        # file are derived conveniences for the anchor/match tools.
        checkpoints.save_variables(
            ckpt_path,
            {"policy": policy, "value": value, "iter": np.asarray(it)},
        )
        checkpoints.save_variables(args.out + "_policy", policy)
        checkpoints.save_variables(args.out + "_value", value)
        with open(iter_path, "w") as f:
            f.write(str(it))

    def checkpoint(it, state):
        if it % args.save_every and it != start_iter + args.iters:
            return
        save_all(it, state.policy, state.value)
        print(f"checkpointed {args.out}_* at iter {it}", flush=True)

    state = az.train(
        jax.random.PRNGKey(args.seed), pv, vv,
        iters=args.iters, batch=args.batch, n_moves=args.moves,
        n_rollouts=args.rollouts, lr=args.lr, temperature=args.temperature,
        temp_moves=args.temp_moves, updates_per_iter=args.updates_per_iter,
        start_iter=start_iter, checkpoint_fn=checkpoint,
    )
    save_all(start_iter + args.iters, state.policy, state.value)
    print(f"saved {args.out}_policy and {args.out}_value")


if __name__ == "__main__":
    main()
