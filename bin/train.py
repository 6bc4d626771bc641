#!/usr/bin/env python
"""Supervised training CLI (reference: bin/train.py, fixed & generalized).

Examples:
    python bin/train.py -d data.npz --kind value -e 3 -o ckpts/value
    python bin/train.py -d moves.csv --kind policy --lr 1e-3
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax


def main():
    p = argparse.ArgumentParser(description="SL training for policy/value nets")
    p.add_argument("-d", metavar="DATA", required=True, help="path to csv or npz")
    p.add_argument("-c", metavar="CHECKPOINT", help="orbax checkpoint to resume")
    p.add_argument("-e", metavar="EPOCHS", type=int, default=1)
    p.add_argument("--kind", choices=("policy", "value"), default="value")
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("-o", "--out", default="checkpoint", help="output checkpoint dir")
    p.add_argument("--stats", default="stats.txt")
    p.add_argument("--init-from-policy", help="bootstrap value trunk from a policy ckpt")
    args = p.parse_args()

    from bokego_tpu.models import init_policy, init_value, value_from_policy
    from bokego_tpu.train import checkpoints, data, sl

    print("Loading data...")
    # csv / .pshard.npz / shard glob / dir -> constant-memory streaming with
    # on-device featurization; legacy feature npz -> in-memory
    dataset = data.load_streaming(args.d)
    print(f"Number of board positions: {len(dataset)}")

    start_epoch, opt_state = 0, None
    if args.c:
        print("Loading checkpoint...")
        ckpt = checkpoints.load_checkpoint(args.c)
        variables = ckpt["variables"]
        opt_state = ckpt.get("opt_state")
        start_epoch = int(ckpt.get("meta", {}).get("epoch", 0))
    else:
        init = init_value if args.kind == "value" else init_policy
        variables = init(jax.random.PRNGKey(0))
        if args.kind == "value" and args.init_from_policy:
            pol = checkpoints.load_variables(args.init_from_policy)
            variables = value_from_policy(variables, pol)

    state = sl.train(
        dataset,
        variables,
        kind=args.kind,
        epochs=args.e,
        batch_size=args.bs,
        lr=args.lr,
        weight_decay=args.weight_decay,
        opt_state=opt_state,
        start_epoch=start_epoch,
        stats_path=args.stats,
    )
    checkpoints.save_variables(
        args.out, state.variables, state.opt_state, {"epoch": state.epoch}
    )
    print(f"Saved {args.out} (epoch {state.epoch})")


if __name__ == "__main__":
    main()
