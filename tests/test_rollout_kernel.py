"""Pallas rollout kernel parity vs the XLA search path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bokego_tpu.config import SearchConfig
from bokego_tpu.env import state as st
from bokego_tpu.search import mcts

from tests.test_mcts import fake_evaluator


def _run(cfg, n_rollouts, batch=8, seed=0):
    states = st.new_game_batch(batch)
    ev = fake_evaluator()
    rng = jax.random.PRNGKey(seed)
    trees = mcts.init_trees(rng, states, ev, None, cfg)
    trees = mcts.run_search(rng, trees, ev, None, cfg, n_rollouts)
    return trees


@pytest.mark.slow
@pytest.mark.parametrize("thresh", [100, 3])
def test_kernel_matches_xla_path(thresh):
    """With eval_every=1... the kernel path uses the same delayed-valuation
    semantics as eval_every>1, so compare both at E=2 where they agree."""
    base = dict(
        expand_thresh=thresh, no_sim=True, max_nodes=256, max_turns=80,
        eval_every=2, kernel_block=4, max_depth=8, kernel_levels=8,
    )
    t_xla = _run(SearchConfig(**base, use_kernel=False), 60)
    t_ker = _run(SearchConfig(**base, use_kernel=True), 60)

    np.testing.assert_allclose(
        np.asarray(t_ker.root_stats), np.asarray(t_xla.root_stats), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(t_ker.pstats), np.asarray(t_xla.pstats), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(t_ker.n_nodes), np.asarray(t_xla.n_nodes)
    )
    # same chosen actions
    a1 = np.asarray(jax.vmap(mcts.choose_action)(t_xla))
    a2 = np.asarray(jax.vmap(mcts.choose_action)(t_ker))
    np.testing.assert_array_equal(a1, a2)
