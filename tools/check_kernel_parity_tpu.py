#!/usr/bin/env python
"""Numerical parity of the Pallas rollout kernel ON REAL TPU HARDWARE.

tests/test_rollout_kernel.py proves kernel==XLA in interpret mode on CPU;
interpret mode does NOT honor `input_output_aliases` (kernels pre-copy
instead), so the hardware path's in-place DMA row writes had no numerical
check (round-1 review weak #3).  This runs the same comparison on the
ambient TPU: XLA search path vs Pallas kernel path at eval_every=2 (where
their valuation cadences agree), deterministic net-free evaluator, exact
visit-count / stats comparison.

Usage: python tools/check_kernel_parity_tpu.py

STATUS (round 2): PASS on hardware at both thresholds.  The first run
failed two ways, both fixed: (1) kernel_block=4 violated Mosaic's 8-row
tile alignment (now enforced in `mcts._fit_block`); (2) Mosaic's
lane-reduce argmax resolves EXACT PUCT-score ties to a different index
than XLA's first-maximum semantics, forking the search from the first
tied selection — the kernel now tie-breaks to the lowest index
explicitly (ops/rollout.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from bokego_tpu.config import SearchConfig
from bokego_tpu.env import state as st
from bokego_tpu.search import mcts

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from tests.test_mcts import fake_evaluator  # noqa: E402


def run(cfg, n_rollouts, batch=16, seed=0):
    states = st.new_game_batch(batch)
    ev = fake_evaluator()
    rng = jax.random.PRNGKey(seed)
    f = jax.jit(
        lambda r, s: mcts.run_search(
            r, mcts.init_trees(r, s, ev, None, cfg), ev, None, cfg, n_rollouts
        )
    )
    return f(rng, states)


def main():
    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()[0]})")
    if backend == "cpu":
        print("WARNING: not on TPU; this duplicates the interpret-mode test")
    for thresh in (100, 3):
        base = dict(
            expand_thresh=thresh, no_sim=True, max_nodes=256, max_turns=80,
            eval_every=2, kernel_block=8, max_depth=8, kernel_levels=8,
        )
        t_xla = run(SearchConfig(**base, use_kernel=False), 60)
        t_ker = run(SearchConfig(**base, use_kernel=True), 60)
        np.testing.assert_allclose(
            np.asarray(t_ker.root_stats), np.asarray(t_xla.root_stats),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(t_ker.pstats), np.asarray(t_xla.pstats),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(t_ker.n_nodes), np.asarray(t_xla.n_nodes)
        )
        a1 = np.asarray(jax.vmap(mcts.choose_action)(t_xla))
        a2 = np.asarray(jax.vmap(mcts.choose_action)(t_ker))
        np.testing.assert_array_equal(a1, a2)
        visits = int(np.asarray(t_ker.visits).sum())
        print(f"expand_thresh={thresh}: kernel == XLA on {backend} "
              f"(16 trees, 60 rollouts, {visits} total visits) OK")
    print("hardware kernel parity: PASS")


if __name__ == "__main__":
    main()
