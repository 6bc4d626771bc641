#!/usr/bin/env python
"""Winrate-vs-generation curve against a FIXED external opponent.

VERDICT round-2 item 2: the from-scratch closed loop (rl_pool/policy_0..N)
had only pool-internal evals.  This plays EVERY generation against the
reference's shipped RL policy (policy_17 — converted weights with exact
logits parity, tests/test_models.py) in raw-policy playout games: the
reference's own evaluation protocol for REINFORCE progress
(selfplay.self_play, /root/reference/bin/selfplay.py:49-57, winrate prints
selfplay.py:112-114), down to MAX_TURNS=70 and eye-filling filter.  Final
positions are scored with the dead-group resolver (the gnugo-judgment
analog, env/scoring.py) — raw Tromp-Taylor at turn 70 would miscount
unfinished captures.

Usage: python tools/policy_curve.py [--games 256] [--out data/training_logs/policy_curve.txt]
"""

import argparse
import glob
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bokego_tpu.env import rules, scoring, state as st
from bokego_tpu.features import features_batch
from bokego_tpu.models import inference
from bokego_tpu.search import playout as po

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAX_TURNS = 70  # the reference's RL self-play horizon (selfplay.py:16)


def probs_fn(variables):
    def fn(states):
        return inference.policy_probs(variables, features_batch(states))

    return fn


def play_side(rng, my_vars, opp_vars, batch, i_am_black):
    """One batch of raw-policy games; returns float wins[batch]."""
    even = probs_fn(my_vars if i_am_black else opp_vars)
    odd = probs_fn(opp_vars if i_am_black else my_vars)
    states = st.new_game_batch(batch)
    rng, pr, sr = jax.random.split(rng, 3)
    final = po.playout_final(pr, even, odd, states, max_turns=MAX_TURNS,
                             avoid_eyes=True)
    score = jax.vmap(
        lambda r, s: scoring.resolved_score(r, s, n_playouts=63, num_steps=96)
    )(jax.random.split(sr, batch), final)
    won_black = score > 0
    return jnp.where(i_am_black, won_black, ~won_black)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--games", type=int, default=256, help="games per color")
    p.add_argument("--opponent",
                   default=os.path.join(REPO, "data/weights/policy_17_flax"))
    p.add_argument("--pool",
                   default=os.path.join(REPO, "data/weights/rl_pool"))
    p.add_argument("--out",
                   default=os.path.join(REPO, "data/training_logs/policy_curve.txt"))
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--single", default=None,
                   help="evaluate ONE policy checkpoint instead of a pool")
    args = p.parse_args()

    from bokego_tpu.cli import load_variables

    opp = load_variables(args.opponent, "policy")
    if args.single:
        gens = [args.single]
    else:
        gens = sorted(glob.glob(os.path.join(args.pool, "policy_*")),
                      key=lambda s: int(s.rsplit("_", 1)[1]))
    play_jit = jax.jit(play_side, static_argnums=(3, 4))

    lines = [f"# winrate vs FIXED policy_17 (converted), {2 * args.games} "
             f"raw-policy games/gen, resolved scoring, seed {args.seed}"]
    print(lines[0])
    for path in gens:
        try:
            gen = int(path.rsplit("_", 1)[1])
        except ValueError:
            gen = os.path.basename(path.rstrip("/"))  # --single by name
        mine = load_variables(path, "policy")
        rng = jax.random.PRNGKey(args.seed + (gen if isinstance(gen, int) else 0))
        t0 = time.monotonic()
        wins, total = 0, 0
        for i_am_black in (True, False):
            rng, sub = jax.random.split(rng)
            won = play_jit(sub, mine, opp, args.games, i_am_black)
            wins += int(np.asarray(won).sum())
            total += args.games
        p_hat = wins / total
        ci = 1.96 * math.sqrt(p_hat * (1 - p_hat) / total)
        line = (f"gen {gen}: {wins}/{total} = {p_hat:.3f} +- {ci:.3f} "
                f"({time.monotonic() - t0:.0f}s)")
        print(line, flush=True)
        lines.append(line)

    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
