#!/usr/bin/env python
"""In-process engine-vs-engine match between two SearchConfigs.

Plays a batch of simultaneous games on one chip, config A moving one color
and config B the other, at equal rollouts per move unless overridden.
Used to tune the serving config (deeper searches beat the reference-default
shallow ones once the rollout budget is large) and to measure fidelity
trades.  Configs are python dicts of SearchConfig overrides passed as
JSON-ish strings.

Usage:
  python tools/config_match.py '{"expand_thresh": 16, "max_nodes": 4096}' \\
      '{}' --games 64 --rollouts 1024
"""

import argparse
import ast
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bokego_tpu.cli import load_variables
from bokego_tpu.config import SearchConfig
from bokego_tpu.coords import PASS_ACTION
from bokego_tpu.env import rules, state as st
from bokego_tpu.search import mcts

N_MOVES = 80
OPEN_PLIES = 6  # policy-sampled opening moves: PUCT with zero noise is
# deterministic, so without these every game in the batch is a replica


def play(rng, params, ev, batch, cfg_a, cfg_b, ra, rb, a_is_black,
         open_plies: int = OPEN_PLIES, resolved: bool = False):
    from bokego_tpu.search.playout import select_moves

    search_a = jax.jit(lambda r, s, p: mcts.search(r, s, ev, p, cfg_a, ra)[0])
    search_b = jax.jit(lambda r, s, p: mcts.search(r, s, ev, p, cfg_b, rb)[0])

    @jax.jit
    def sample_open(r, s, p, done):
        probs = ev.policy_probs(p, s)
        return select_moves(r, probs, s, avoid_eyes=True, done=done)

    states = st.new_game_batch(batch)
    done = jnp.zeros((batch,), bool)
    for move in range(N_MOVES):
        rng, sub = jax.random.split(rng)
        if move < open_plies:
            # shared random opening (per-game diversity; same positions for
            # both sides' games, colors alternate by a_is_black pairing)
            actions = sample_open(sub, states, params, done)
        else:
            black_to_play = move % 2 == 0
            search = search_a if black_to_play == a_is_black else search_b
            actions = search(sub, states, params)
        actions = jnp.where(done, PASS_ACTION, actions)
        states = rules.step_batch(states, actions)
        done = done | rules.is_terminal_batch(states, N_MOVES)
    if resolved:
        # dead-group-aware judgment of the finals (the reference's matches
        # were gnugo-scored, go.py:512-526; env/scoring.py is the analog)
        from bokego_tpu.env import scoring

        rng, sr = jax.random.split(rng)
        scores = np.asarray(jax.jit(jax.vmap(
            lambda r, s: scoring.resolved_score(r, s, n_playouts=63,
                                                num_steps=96)
        ))(jax.random.split(sr, batch), states))
    else:
        scores = np.asarray(rules.score_batch(states))
    return scores > 0 if a_is_black else scores < 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("cfg_a", help="SearchConfig overrides for side A (dict literal)")
    p.add_argument("cfg_b", help="SearchConfig overrides for side B (dict literal)")
    p.add_argument("--games", type=int, default=64, help="games per color")
    p.add_argument("--rollouts", type=int, default=400)
    p.add_argument("--rollouts-b", type=int, default=None,
                   help="rollouts for B if different")
    p.add_argument("--policy", default="data/weights/policy_17_flax")
    p.add_argument("--value", default="data/weights/value_r2")
    p.add_argument("--seed", type=int, default=5)
    p.add_argument("--resolved", action="store_true",
                   help="dead-group-aware scoring of the finals")
    args = p.parse_args()

    cfg_a = SearchConfig(**ast.literal_eval(args.cfg_a))
    cfg_b = SearchConfig(**ast.literal_eval(args.cfg_b))
    ra, rb = args.rollouts, args.rollouts_b or args.rollouts
    params = {
        "policy": load_variables(args.policy, "policy"),
        "value": load_variables(args.value, "value"),
    }
    ev = mcts.net_evaluator(has_value=True)
    rng = jax.random.PRNGKey(args.seed)
    t0 = time.monotonic()
    wins, total = 0, 0
    # same rng for both directions => identical sampled openings, colors
    # swapped (paired comparison)
    for a_is_black in (True, False):
        won = play(rng, params, ev, args.games, cfg_a, cfg_b, ra, rb,
                   a_is_black, resolved=args.resolved)
        wins += int(won.sum())
        total += len(won)
        print(f"A as {'B' if a_is_black else 'W'}: {int(won.sum())}/{len(won)}"
              f" ({time.monotonic() - t0:.0f}s)", flush=True)
    pw = wins / total
    ci = 1.96 * math.sqrt(max(pw * (1 - pw), 1e-9) / total)
    print(f"\nA winrate {pw:.3f} +/- {ci:.3f} over {total} games "
          f"(A: {ra} rollouts, B: {rb})")


if __name__ == "__main__":
    main()
