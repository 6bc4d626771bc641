"""Multi-device sharding on the 8-virtual-CPU mesh: batched MCTS self-play,
dp-sharded SL step, and the dryrun entry points."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bokego_tpu.config import SearchConfig
from bokego_tpu.env import rules
from bokego_tpu.parallel import mesh as mesh_lib
from bokego_tpu.parallel.selfplay import selfplay, selfplay_sharded
from bokego_tpu.search import mcts

from tests.test_mcts import fake_evaluator

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def test_selfplay_single():
    cfg = SearchConfig(expand_thresh=2, no_sim=True, max_nodes=256, max_turns=6)
    res = selfplay(
        jax.random.PRNGKey(0), None, fake_evaluator(), cfg,
        batch=4, n_moves=4, n_rollouts=4,
    )
    assert res.actions.shape == (4, 4)
    assert res.scores.shape == (4,)
    assert not bool(np.asarray(res.final.invalid).any())


def test_selfplay_sharded_matches_shapes():
    m = mesh_lib.get_mesh(8)
    cfg = SearchConfig(expand_thresh=2, no_sim=True, max_nodes=128, max_turns=4)
    res = selfplay_sharded(
        m, jax.random.PRNGKey(0), None, fake_evaluator(), cfg,
        batch=16, n_moves=3, n_rollouts=2,
    )
    assert res.actions.shape == (3, 16)
    assert not bool(np.asarray(res.final.invalid).any())


def test_sl_sharded_step():
    import optax

    from bokego_tpu.models import init_policy
    from bokego_tpu.models.nets import PolicyNet
    from bokego_tpu.train import sl

    variables = init_policy(jax.random.PRNGKey(0))
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])
    step = sl.make_train_step(sl.make_policy_loss(PolicyNet()), tx, n_devices=8)
    fts = jnp.zeros((16, 9, 9, 27), jnp.float32)
    moves = jnp.zeros((16,), jnp.int32)
    new_vars, opt_state, loss = step(variables, opt_state, fts, moves)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    probs, vals = jax.jit(fn)(*args)
    assert probs.shape == (256, 81)
    assert vals.shape == (256,)
