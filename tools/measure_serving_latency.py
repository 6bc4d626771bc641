#!/usr/bin/env python
"""Measure single-game serving throughput (rollouts/s) of the GTP engine.

The serving constraint is the ~110 ms fixed dispatch latency of the remote
tunnel, paid per device call (PERF.md "Serving latency").  Round 3 ships
depth-2 pipelined dispatch (engine.timed_rollout): the next BIG_CHUNK is
enqueued while the previous one runs, hiding dispatch latency behind
device work.  This tool drives the real engine object on a fresh board and
reports effective rollouts/s for the timed path (pipelined) and the
count path (blocking) — comparison floor: the reference engine's 454
rollouts/s on this host's CPU.

Usage: python tools/measure_serving_latency.py [--time 4.0] [--strong]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def root_visits(eng) -> float:
    import numpy as np

    # forest-aggregate root visit count
    return float(np.asarray(eng.trees.root_stats[..., 0]).sum())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--time", type=float, default=4.0, help="seconds per trial")
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--strong", action="store_true",
                   help="use the --strong serving config (65536-node pool)")
    p.add_argument("--forest", type=int, default=1,
                   help="root-parallel trees (rollouts/s aggregates over "
                        "the forest — the served Forest configuration)")
    p.add_argument("--leaf-batch", type=int, default=1, dest="leaf_batch",
                   help="K leaf-parallel rollouts per step with virtual "
                        "loss (search/leafpar.py; round-4 single-tree "
                        "serving lever)")
    args = p.parse_args()

    from bokego_tpu.cli import load_variables
    from bokego_tpu.config import EngineConfig, SearchConfig
    from bokego_tpu.gtp.engine import GTPEngine
    from bokego_tpu.search.mcts import net_evaluator

    params = {
        "policy": load_variables(
            os.path.join(REPO, "data/weights/policy_17_flax"), "policy"),
        "value": load_variables(
            os.path.join(REPO, "data/weights/value_r2"), "value"),
    }
    scfg = (SearchConfig(expand_thresh=16, max_nodes=65536)
            if args.strong else SearchConfig())
    if args.leaf_batch > 1:
        import dataclasses

        scfg = dataclasses.replace(scfg, leaf_batch=args.leaf_batch)
    eng = GTPEngine(net_evaluator(has_value=True), params, scfg,
                    EngineConfig(pondering=False, time_lim=args.time,
                                 forest_size=args.forest))
    eng._ensure_tree()
    # warm every jitted path the timed loop hits (compiles are ~20-40s)
    for big in (True, True, False, False):
        eng._dispatch(big)

    print(f"config: {'strong' if args.strong else 'default'}, "
          f"forest {args.forest}, leaf_batch {args.leaf_batch}, "
          f"{args.time}s/trial")
    for mode in ("timed-pipelined", "count-blocking"):
        rates = []
        for t in range(args.trials):
            eng._cmd_clear_board([])
            eng._ensure_tree()
            v0 = root_visits(eng)
            t0 = time.monotonic()
            if mode == "timed-pipelined":
                eng.timed_rollout(args.time)
            else:
                eng.rollout(int(args.time * 2000))
            dt = time.monotonic() - t0
            v1 = root_visits(eng)
            rates.append((v1 - v0) / dt)
        print(f"{mode}: {max(rates):,.0f} rollouts/s "
              f"(trials: {', '.join(f'{r:,.0f}' for r in rates)})")


if __name__ == "__main__":
    main()
