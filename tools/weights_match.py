#!/usr/bin/env python
"""In-process engine-vs-engine match between two WEIGHT sets.

Same play loop as tools/config_match.py but each side searches with its own
params — used to measure training progress (e.g. trained weights vs
random-init, or RL generation N vs generation 0), the batched equivalent of
the reference's GTP_match evaluations (gtp.py:533-604).

Usage:
  python tools/weights_match.py A_POLICY A_VALUE B_POLICY B_VALUE \
      [--games 64] [--rollouts 64]

Pass "random" for a random-init net ("random:SEED" to vary the seed).
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bokego_tpu.config import SearchConfig
from bokego_tpu.coords import PASS_ACTION
from bokego_tpu.env import rules, state as st
from bokego_tpu.search import mcts

N_MOVES = 80
OPEN_PLIES = 6  # policy-sampled opening (each side samples its own policy)


def load(path: str, kind: str):
    from bokego_tpu.cli import load_variables
    from bokego_tpu.models import init_policy, init_value

    if path.startswith("random"):
        seed = int(path.split(":", 1)[1]) if ":" in path else 0
        init = init_policy if kind == "policy" else init_value
        return init(jax.random.PRNGKey(seed))
    return load_variables(path, kind)


def play(rng, params_a, params_b, ev, batch, cfg, n_rollouts, a_is_black,
         open_plies: int = OPEN_PLIES, resolved: bool = False):
    """One batch of games, A as black iff a_is_black. Returns bool[batch]
    = A won (Tromp-Taylor)."""
    from bokego_tpu.search.playout import select_moves

    search = jax.jit(lambda r, s, p: mcts.search(r, s, ev, p, cfg, n_rollouts)[0])

    @jax.jit
    def sample_open(r, s, p, done):
        probs = ev.policy_probs(p, s)
        return select_moves(r, probs, s, avoid_eyes=True, done=done)

    states = st.new_game_batch(batch)
    done = jnp.zeros((batch,), bool)
    for move in range(N_MOVES):
        rng, sub = jax.random.split(rng)
        black_to_play = move % 2 == 0
        params = params_a if black_to_play == a_is_black else params_b
        if move < open_plies:
            actions = sample_open(sub, states, params, done)
        else:
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


def match(rng, params_a, params_b, ev, games_per_side, cfg, n_rollouts,
          resolved: bool = False):
    wins, total = 0, 0
    for a_is_black in (True, False):
        rng, sub = jax.random.split(rng)
        won = play(sub, params_a, params_b, ev, games_per_side, cfg,
                   n_rollouts, a_is_black, resolved=resolved)
        wins += int(won.sum())
        total += len(won)
    return wins, total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("a_policy")
    p.add_argument("a_value")
    p.add_argument("b_policy")
    p.add_argument("b_value")
    p.add_argument("--games", type=int, default=64, help="games per color")
    p.add_argument("--rollouts", type=int, default=64)
    p.add_argument("--expand-thresh", type=int, default=16)
    p.add_argument("--max-nodes", type=int, default=512)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--resolved", action="store_true",
                   help="dead-group-aware scoring of the finals")
    args = p.parse_args()

    params_a = {"policy": load(args.a_policy, "policy"),
                "value": load(args.a_value, "value")}
    params_b = {"policy": load(args.b_policy, "policy"),
                "value": load(args.b_value, "value")}
    ev = mcts.net_evaluator(has_value=True)
    cfg = SearchConfig(expand_thresh=args.expand_thresh,
                       max_nodes=args.max_nodes, no_sim=True)
    t0 = time.monotonic()
    wins, total = match(jax.random.PRNGKey(args.seed), params_a, params_b,
                        ev, args.games, cfg, args.rollouts,
                        resolved=args.resolved)
    p_hat = wins / total
    ci = 1.96 * math.sqrt(p_hat * (1 - p_hat) / total)
    print(f"A won {wins}/{total} = {p_hat:.3f} +- {ci:.3f} "
          f"({args.rollouts} rollouts/move, {time.monotonic() - t0:.0f}s)")


if __name__ == "__main__":
    main()
