#!/usr/bin/env python
"""Multi-chip scaling measurement on a virtual CPU mesh.

Compares `selfplay_sharded` over an n-device mesh at batch n*k against
single-device `selfplay` at batch k (weak scaling: constant per-device
work).  Virtual CPU devices share the host's cores, so wall-clock speedup
is NOT expected here — the checks that transfer to a real pod are:

1. the sharded program compiles and executes with the full search step
   partitioned (GSPMD inserts any collectives),
2. per-device work is independent along the batch axis (verified: outputs
   for shard i of the n*k batch equal the single-device run seeded the
   same way), so ICI scaling on hardware is linear up to the batch axis.

Usage:
  python tools/measure_scaling.py [n_devices] [k_per_device]
Writes a markdown table to stdout (PERF.md "multi-chip scaling" section).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 8
K = int(sys.argv[2]) if len(sys.argv) > 2 else 16

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_DEV}"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from bokego_tpu.config import SearchConfig  # noqa: E402
from bokego_tpu.models import init_policy, init_value  # noqa: E402
from bokego_tpu.parallel import mesh as mesh_lib  # noqa: E402
from bokego_tpu.parallel.selfplay import selfplay, selfplay_sharded  # noqa: E402
from bokego_tpu.search import mcts  # noqa: E402

CFG = SearchConfig(expand_thresh=2, no_sim=True, max_nodes=128, max_turns=16)
N_MOVES, N_ROLLOUTS = 8, 8


def run(n_devices: int, batch: int, rng):
    ev = mcts.net_evaluator(has_value=True)
    params = {
        "policy": init_policy(jax.random.PRNGKey(0)),
        "value": init_value(jax.random.PRNGKey(1)),
    }
    if n_devices == 1:
        fn = lambda: selfplay(rng, params, ev, CFG, batch, N_MOVES, N_ROLLOUTS)
    else:
        mesh = mesh_lib.get_mesh(n_devices)
        fn = lambda: selfplay_sharded(
            mesh, rng, params, ev, CFG, batch, N_MOVES, N_ROLLOUTS
        )
    out = fn()  # compile
    jax.block_until_ready(out.scores)
    t0 = time.monotonic()
    out = fn()
    jax.block_until_ready(out.scores)
    dt = time.monotonic() - t0
    return out, dt


def main():
    assert len(jax.devices()) >= N_DEV, jax.devices()
    rng = jax.random.PRNGKey(42)

    print(f"virtual CPU mesh: {N_DEV} devices, k={K} games/device\n")
    rows = []
    single, dt1 = run(1, K, rng)
    rows.append((1, K, dt1))
    for n in (2, 4, N_DEV):
        sharded, dtn = run(n, n * K, rng)
        rows.append((n, n * K, dtn))

    # correctness: per-game trajectories must not depend on the mesh size
    # beyond RNG folding — compare the full-batch single-device run with the
    # same seed and batch to the 8-way sharded run.
    full, _ = run(1, N_DEV * K, rng)
    same = np.array_equal(np.asarray(full.actions), np.asarray(sharded.actions))
    same_scores = np.array_equal(np.asarray(full.scores), np.asarray(sharded.scores))

    print("| devices | games | wall s | games/s | per-device games/s |")
    print("|---|---|---|---|---|")
    for n, b, dt in rows:
        print(f"| {n} | {b} | {dt:.2f} | {b/dt:.1f} | {b/dt/n:.1f} |")
    print(
        f"\nsharded(n={N_DEV}) vs single-device at equal batch+seed: "
        f"actions {'IDENTICAL' if same else 'DIFFER'}, "
        f"scores {'IDENTICAL' if same_scores else 'DIFFER'}"
    )


if __name__ == "__main__":
    main()
