#!/usr/bin/env python
"""Simulation-mode (--simulate, λ=0.5) search throughput.

The reference's ``--simulate`` leaf evaluation is a policy playout to
terminal (mcts.py:195-206) — its slowest mode ("[n]eed... at least 10x",
mcts.py:194).  Round 2 measured 1,351 rollouts/s/chip at B=256 with the
fixed-budget scan playout; round 3 switches simulations to the
early-exiting ``playout_final`` (while_loop, no trajectory stacking),
which stops as soon as every board is terminal.

Usage: python tools/measure_sim_throughput.py [--batch 256] [--rollouts 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--rollouts", type=int, default=64)
    p.add_argument("--midgame-plies", type=int, default=40,
                   help="advance games this far first (sim leaves sit "
                        "mid-game, where early exit matters)")
    args = p.parse_args()

    from bokego_tpu.cli import load_variables
    from bokego_tpu.config import SearchConfig
    from bokego_tpu.env import rules, state as st
    from bokego_tpu.features import features_batch
    from bokego_tpu.models import inference
    from bokego_tpu.search import mcts, playout as po

    params = {
        "policy": load_variables(
            os.path.join(REPO, "data/weights/policy_17_flax"), "policy"),
        "value": load_variables(
            os.path.join(REPO, "data/weights/value_r2"), "value"),
    }
    ev = mcts.net_evaluator(has_value=True)
    cfg = SearchConfig(no_sim=False, value_net_weight=0.5,
                       expand_thresh=16, max_nodes=2048)

    rng = jax.random.PRNGKey(0)
    states = st.new_game_batch(args.batch)
    if args.midgame_plies:
        def probs_fn(s):
            return inference.policy_probs(params["policy"], features_batch(s))

        traj = po.playout(rng, probs_fn, probs_fn, states,
                          num_steps=args.midgame_plies, max_turns=80)
        states = traj.final

    run = jax.jit(
        lambda r, t: mcts.run_search(r, t, ev, params, cfg, args.rollouts))
    trees = jax.jit(
        lambda r, s: mcts.init_trees(r, s, ev, params, cfg))(rng, states)
    trees = jax.block_until_ready(run(rng, trees))  # compile + warm
    best = 0.0
    for i in range(3):
        t0 = time.monotonic()
        trees = jax.block_until_ready(run(jax.random.PRNGKey(i + 1), trees))
        dt = time.monotonic() - t0
        best = max(best, args.batch * args.rollouts / dt)
    print(f"sim-mode: {best:,.0f} rollouts/s/chip at B={args.batch} "
          f"(each rollout = full policy playout to terminal; "
          f"midgame start ply {args.midgame_plies})")


if __name__ == "__main__":
    main()
