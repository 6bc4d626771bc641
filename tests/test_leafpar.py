"""Leaf-parallel search (search/leafpar.py): K=1 must be the sequential
algorithm bitwise; K>1 must net every virtual loss out exactly and keep
the tree invariants of the sequential search."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bokego_tpu.config import SearchConfig
from bokego_tpu.coords import NN
from bokego_tpu.env import state as st
from bokego_tpu.search import leafpar, mcts
from bokego_tpu.search import tree as tr_mod

from tests.test_mcts import fake_evaluator
from tests.test_rules import random_game_states


def _root_state():
    states = list(random_game_states(3, n_moves=16, pass_prob=0.0))
    s, _ = states[-1]
    return jax.tree.map(lambda x: jnp.asarray(x)[None], s)


def _stones_eval():
    """Fake evaluator WITH the fused ``evaluate_fts`` path, computable both
    from states and from feature planes (planes 0/1 are player/opponent
    stones, features.py): exercises the precomputed-successor expansion."""

    def _from_stones(stones):
        z = 1.0 + (jnp.arange(NN)[None, :] * 7 + stones[:, None]) % 13
        probs = (z / z.sum(axis=-1, keepdims=True)).astype(jnp.float32)
        vals = (((stones * 3) % 17 - 8) / 10.0).astype(jnp.float32)
        return probs, vals

    def evaluate(params, states):
        del params
        return _from_stones(jnp.sum(states.board != 0, axis=-1))

    def evaluate_fts(params, fts):
        del params
        stones = jnp.sum(fts[..., 0] + fts[..., 1], axis=(-1, -2)).astype(
            jnp.int32
        )
        return _from_stones(stones)

    def policy_probs(params, states):
        return evaluate(params, states)[0]

    return mcts.Evaluator(
        evaluate=evaluate,
        policy_probs=policy_probs,
        has_value=True,
        evaluate_fts=evaluate_fts,
    )


def _run_pair(ev, cfg, n, K):
    """(sequential trees, leaf-parallel trees) after n rollouts each."""
    root = _root_state()
    rng = jax.random.PRNGKey(7)
    t_seq = mcts.init_trees(rng, root, ev, None, cfg)
    t_par = jax.tree.map(lambda x: x, t_seq)
    t_seq = jax.jit(
        lambda t: mcts.run_search(jax.random.PRNGKey(1), t, ev, None, cfg, n)
    )(t_seq)
    t_par = jax.jit(
        lambda t: leafpar.run_search_k(
            jax.random.PRNGKey(1), t, ev, None, cfg, n, K
        )
    )(t_par)
    return t_seq, t_par


@pytest.mark.parametrize("ev_fn", [fake_evaluator, _stones_eval])
def test_k1_matches_sequential_bitwise(ev_fn):
    """K=1 (virtual loss forced to 0) is the sequential search exactly,
    on both the plain and the fused (evaluate_fts) evaluation paths."""
    cfg = SearchConfig(
        expand_thresh=3, max_nodes=512, no_sim=True, noise_weight=0.0
    )
    t_seq, t_par = _run_pair(ev_fn(), cfg, n=40, K=1)
    np.testing.assert_array_equal(
        np.asarray(t_seq.pstats), np.asarray(t_par.pstats)
    )
    np.testing.assert_array_equal(
        np.asarray(t_seq.root_stats), np.asarray(t_par.root_stats)
    )
    np.testing.assert_array_equal(
        np.asarray(t_seq.value), np.asarray(t_par.value)
    )
    assert int(t_seq.n_nodes[0]) == int(t_par.n_nodes[0])


@pytest.mark.parametrize("K", [4, 8])
@pytest.mark.parametrize("ev_fn", [fake_evaluator, _stones_eval])
@pytest.mark.slow
def test_k_parallel_invariants(ev_fn, K):
    """K>1: virtual losses net out exactly and the tree stays consistent."""
    n = 64
    cfg = SearchConfig(
        expand_thresh=3, max_nodes=512, no_sim=True, noise_weight=0.0
    )
    _, t = _run_pair(ev_fn(), cfg, n, K)
    t1 = jax.tree.map(lambda x: np.asarray(x)[0], t)

    # every rollout counted exactly once at the root
    assert int(t1.root_stats[0]) == n

    # visit counts are integers (virtual-loss residue would leave
    # fractions only if vl were fractional; with vl=1 residue would show
    # as a count mismatch below)
    nplane = t1.pstats[:, tr_mod.C_N, :NN]
    np.testing.assert_array_equal(nplane, np.round(nplane))

    # conservation at the root: descents from an expanded root always step
    # into a child, so each rollout increments exactly one root edge; any
    # un-netted virtual visit would break the equality.
    child = t1.pstats[:, tr_mod.C_CHILD, :NN].astype(np.int64)
    root = int(t1.root)
    assert nplane[root][child[root] >= 0].sum() == n

    # value cache: every visited node has a finite cached value
    visited = np.zeros(t1.parent.shape[0], bool)
    visited[root] = True
    for p in range(t1.parent.shape[0]):
        for a in range(NN):
            c = child[p, a]
            if c >= 0 and nplane[p, a] > 0:
                visited[c] = True
    assert np.all(np.isfinite(t1.value[visited]))

    # W_v consistency under a constant-per-leaf value net: every edge's
    # |W_v| is bounded by its N times the max |value| (=0.8 for the fake)
    wv = t1.pstats[:, tr_mod.C_WV, :NN]
    assert np.all(np.abs(wv) <= nplane * 0.8 + 1e-5)

    # child indices in range and acyclic (children allocate after parents)
    alloc = int(t1.n_nodes)
    assert np.all(child[child >= 0] < alloc)
    for p in range(alloc):
        for a in range(NN):
            if child[p, a] >= 0:
                assert child[p, a] > p or p == root


def _peaked_eval():
    """Deterministic evaluator with a decisive prior peak per position —
    under a near-flat prior 160 rollouts spread ~2 visits over 81 children
    and "most-visited" is tie-noise, which says nothing about leaf-parallel
    fidelity; a peaked prior makes both searches concentrate so their top
    choices are comparable."""

    def evaluate(params, states):
        del params
        stones = jnp.sum(states.board != 0, axis=-1)
        z = 1.0 + (jnp.arange(NN)[None, :] * 7 + stones[:, None]) % 13
        peak = (stones * 5) % NN
        z = z + jnp.where(
            jnp.arange(NN)[None, :] == peak[:, None], 500.0, 0.0
        )
        probs = (z / z.sum(axis=-1, keepdims=True)).astype(jnp.float32)
        chk = (
            jnp.sum(
                states.board.astype(jnp.int32) * jnp.arange(1, 82)[None, :],
                axis=-1,
            )
            + states.turn
        )
        vals = (((chk % 17) - 8) / 30.0).astype(jnp.float32)
        return probs, vals

    def policy_probs(params, states):
        return evaluate(params, states)[0]

    return mcts.Evaluator(
        evaluate=evaluate, policy_probs=policy_probs, has_value=True
    )


@pytest.mark.slow
def test_k_parallel_matches_sequential_distribution():
    """At equal rollouts, leaf-parallel visit mass lands where sequential
    puts it (same PUCT math; divergence only from in-batch staleness):
    under a decisive prior both pick the same most-visited child and give
    it a similar share.  Both searches are fully deterministic here."""
    cfg = SearchConfig(
        expand_thresh=3, max_nodes=1024, no_sim=True, noise_weight=0.0
    )
    n = 160
    t_seq, t_par = _run_pair(_peaked_eval(), cfg, n=n, K=8)
    row_seq = np.asarray(mcts._take_rows(t_seq.pstats, t_seq.root))[0]
    row_par = np.asarray(mcts._take_rows(t_par.pstats, t_par.root))[0]
    valid = row_seq[tr_mod.C_CHILD, :NN] >= 0
    ns, npar = row_seq[tr_mod.C_N, :NN], row_par[tr_mod.C_N, :NN]
    best_seq = int(np.argmax(np.where(valid, ns, -1)))
    best_par = int(np.argmax(np.where(valid, npar, -1)))
    assert best_seq == best_par
    share_seq, share_par = ns[best_seq] / n, npar[best_par] / n
    assert share_seq > 0.3, share_seq  # the peak really concentrated
    assert abs(share_seq - share_par) < 0.2, (share_seq, share_par)


@pytest.mark.slow
def test_simulation_mode_smoke():
    """λ-mixed (--simulate) leaf-parallel step traces and counts rollouts."""
    cfg = SearchConfig(
        expand_thresh=2,
        max_nodes=256,
        no_sim=False,
        value_net_weight=0.5,
        max_turns=40,
        noise_weight=0.0,
    )
    ev = fake_evaluator()
    root = _root_state()
    t = mcts.init_trees(jax.random.PRNGKey(0), root, ev, None, cfg)
    t = jax.jit(
        lambda t: leafpar.run_search_k(
            jax.random.PRNGKey(2), t, ev, None, cfg, 16, 4
        )
    )(t)
    assert int(t.root_stats[0, 0]) == 16
    assert np.isfinite(np.asarray(t.root_stats)).all()
