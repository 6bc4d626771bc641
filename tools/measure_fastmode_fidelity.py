#!/usr/bin/env python
"""Measure the fast-mode fidelity trade with an engine-vs-engine match.

The headline bench runs `use_kernel=True, eval_every=8, kernel_levels=6`
(bench.py); exact reference cadence is `eval_every=1` on the XLA path
(SearchConfig docs).  Round-1 review: the "typically negligible" fidelity
claim was asserted, not measured.  This plays fast-config vs exact-config
at EQUAL rollouts per move (400, the engine default) over a batch of
simultaneous games — both sides run in one process so they share the chip —
and reports the fast side's winrate with a 95% CI.

Usage: python tools/measure_fastmode_fidelity.py [games_per_side] [n_rollouts]
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bokego_tpu.cli import load_variables
from bokego_tpu.config import SearchConfig
from bokego_tpu.search import mcts

from tools.config_match import play

FAST = SearchConfig(use_kernel=True, eval_every=8, kernel_levels=6, max_nodes=512)
EXACT = SearchConfig(eval_every=1, max_nodes=512)


def main():
    per_side = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_rollouts = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    params = {
        "policy": load_variables("data/weights/policy_17_flax", "policy"),
        "value": load_variables("data/weights/value_r2", "value"),
    }
    ev = mcts.net_evaluator(has_value=True)
    rng = jax.random.PRNGKey(11)
    t0 = time.monotonic()
    wins, total = 0, 0
    for fast_is_black in (True, False):
        rng, sub = jax.random.split(rng)
        won = play(sub, params, ev, per_side, FAST, EXACT,
                   n_rollouts, n_rollouts, fast_is_black)
        wins += int(won.sum())
        total += len(won)
        print(
            f"fast as {'B' if fast_is_black else 'W'}: "
            f"{int(won.sum())}/{len(won)} "
            f"({time.monotonic() - t0:.0f}s elapsed)", flush=True,
        )
    p = wins / total
    ci = 1.96 * math.sqrt(max(p * (1 - p), 1e-9) / total)
    print(
        f"\nfast-mode (kernel, eval_every=8, levels=6) vs exact (eval_every=1)"
        f" at {n_rollouts} rollouts/move, {total} games:\n"
        f"fast winrate {p:.3f} +/- {ci:.3f} (95% CI)"
    )


if __name__ == "__main__":
    main()
