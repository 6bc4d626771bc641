#!/usr/bin/env python
"""In-process TIMED engine-vs-engine match between two serving configs.

Answers "which config is stronger per second of wall clock" — the question
that matters for serving, which fixed-rollout ``config_match`` cannot ask.
Both engines live in ONE process and alternate moves on the one chip, so
each side's per-move budget is spent with the chip to itself (no
contention confound; pondering stays off because moves are method-driven).
A neutral native-rules referee validates every move and scores finished
games with the dead-group resolver (go_ownership — the gnugo judgment).

Usage:
  python tools/serving_match.py '{"expand_thresh":16,"max_nodes":65536}' \
      '{"expand_thresh":16,"max_nodes":16384,"noise_weight":0.25}' \
      --forest-a 1 --forest-b 32 --games 16 --time 0.5
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
from bokego_tpu.config import EngineConfig, SearchConfig
from bokego_tpu.coords import PASS, RESIGN, unsquash
from bokego_tpu.env import state as st
from bokego_tpu.gtp.engine import GTPEngine
from bokego_tpu.native import NativeBoard
from bokego_tpu.search import mcts

MAX_MOVES = 170


def reset(engine: GTPEngine):
    engine.state = st.new_game(float(engine.state.komi))
    engine._move_history = []
    engine._last_state = None
    engine.trees = None
    engine.running = True


def sample_opening(rng, engine, plies):
    """Shared random opening moves (policy-sampled): PUCT with shared nets
    is near-deterministic, so openings provide the game diversity
    (config_match.py uses the same device)."""
    from bokego_tpu.search.playout import select_moves

    moves = []
    s = engine.state
    for _ in range(plies):
        rng, sub = jax.random.split(rng)
        batch = jax.tree.map(lambda x: x[None], s)
        probs = engine.ev.policy_probs(engine.params, batch)
        mv = select_moves(
            sub, probs, batch, avoid_eyes=True, done=jnp.zeros((1,), bool)
        )
        import bokego_tpu.env.rules as rules

        s = rules.step(s, mv[0])
        moves.append(int(jnp.where(mv[0] >= 81, -1, mv[0])))
    return moves


def play_game(a: GTPEngine, b: GTPEngine, a_is_black: bool, opening, log):
    reset(a)
    reset(b)
    referee = NativeBoard(5.5)
    for mv in opening:
        referee.play(mv)
        a.input_move(mv)
        b.input_move(mv)
    passes = 0
    n_moves = len(opening)
    while passes < 2 and n_moves < MAX_MOVES:
        black_to_move = n_moves % 2 == 0
        mover, tag = (a, "A") if black_to_move == a_is_black else (b, "B")
        other = b if mover is a else a
        t0 = time.monotonic()
        mv = mover.genmove()
        dt = time.monotonic() - t0
        if mv == RESIGN:
            log(f"  {tag} resigned after {n_moves} moves")
            return (mover is b), "resign"
        try:
            referee.play(mv)
        except ValueError:
            log(f"  {tag} played an impossible move at {n_moves} — forfeit")
            return (mover is b), "forfeit"
        passes = passes + 1 if mv == PASS else 0
        other.input_move(mv)
        n_moves += 1
        if n_moves <= len(opening) + 2:
            log(f"  move {n_moves}: {tag} {unsquash(mv)} ({dt:.2f}s)")
    score = referee.resolved_score()
    log(f"  played out ({n_moves} moves): resolved {score:+.1f}")
    black_won = score > 0
    return black_won == a_is_black, f"{score:+.1f}"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("cfg_a")
    p.add_argument("cfg_b")
    p.add_argument("--forest-a", type=int, default=1)
    p.add_argument("--forest-b", type=int, default=1)
    p.add_argument("--games", type=int, default=16)
    p.add_argument("--time", type=float, default=0.5)
    p.add_argument("--open-plies", type=int, default=6)
    p.add_argument("--policy", default="data/weights/policy_17_flax")
    p.add_argument("--value", default="data/weights/value_r2")
    p.add_argument("--seed", type=int, default=11)
    args = p.parse_args()

    params = {
        "policy": load_variables(args.policy, "policy"),
        "value": load_variables(args.value, "value"),
    }
    ev = mcts.net_evaluator(has_value=True)

    def mk(cfg_str, forest):
        scfg = SearchConfig(no_sim=True, **ast.literal_eval(cfg_str))
        ecfg = EngineConfig(
            time_lim=args.time, pondering=False, forest_size=forest
        )
        return GTPEngine(ev, params, scfg, ecfg)

    a = mk(args.cfg_a, args.forest_a)
    b = mk(args.cfg_b, args.forest_b)

    def log(msg):
        print(msg, flush=True)

    rng = jax.random.PRNGKey(args.seed)
    a_wins = 0
    t0 = time.monotonic()
    for g in range(args.games):
        rng, sub = jax.random.split(rng)
        opening = sample_opening(sub, a, args.open_plies)
        a_is_black = g % 2 == 0
        won, how = play_game(a, b, a_is_black, opening, log)
        a_wins += won
        log(
            f"game {g + 1}: A as {'B' if a_is_black else 'W'} "
            f"{'WON' if won else 'lost'} ({how}) "
            f"[{a_wins}/{g + 1}] ({time.monotonic() - t0:.0f}s)"
        )
    pw = a_wins / args.games
    ci = 1.96 * math.sqrt(max(pw * (1 - pw), 1e-9) / args.games)
    log(f"\nA winrate {pw:.3f} +/- {ci:.3f} over {args.games} games "
        f"at {args.time}s/move")


if __name__ == "__main__":
    main()
