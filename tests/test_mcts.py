"""Search parity: the array MCTS must reproduce the reference PUCT
algorithm's visit distribution (dict-based oracle, deterministic fake nets).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bokego_tpu.config import SearchConfig
from bokego_tpu.coords import NN, PASS_ACTION
from bokego_tpu.env import rules, state as st
from bokego_tpu.search import mcts
from bokego_tpu.search.tree import get_state

from tests.oracle import OracleGame
from tests.oracle_mcts import DictMCTS
from tests.test_rules import random_game_states


# Deterministic fake policy/value, computable from the raw board on both
# sides: probs ∝ 1 + ((a * 7 + #stones) % 13); value from a board checksum.
def fake_probs_np(board, turn):
    stones = int(np.sum(np.asarray(board) != 0))
    z = 1.0 + (np.arange(81) * 7 + stones) % 13
    return z / z.sum()


def fake_value_np(board, turn):
    chk = int(np.dot(np.asarray(board, dtype=np.int64), np.arange(1, 82))) + turn
    return ((chk % 17) - 8) / 10.0


def fake_evaluator():
    def evaluate(params, states):
        del params
        stones = jnp.sum(states.board != 0, axis=-1)  # (B,)
        z = 1.0 + (jnp.arange(NN)[None, :] * 7 + stones[:, None]) % 13
        probs = z / z.sum(axis=-1, keepdims=True)
        chk = (
            jnp.sum(states.board.astype(jnp.int64) * jnp.arange(1, 82)[None, :], axis=-1)
            + states.turn
        )
        vals = ((chk % 17) - 8) / 10.0
        return probs.astype(jnp.float32), vals.astype(jnp.float32)

    def policy_probs(params, states):
        return evaluate(params, states)[0]

    return mcts.Evaluator(evaluate=evaluate, policy_probs=policy_probs, has_value=True)


@pytest.mark.parametrize("expand_thresh,n_rollouts", [(100, 150), (5, 60), (0, 40)])
def test_visit_parity_vs_dict_oracle(expand_thresh, n_rollouts):
    """Same PUCT math => same visit counts on every root child."""
    # A midgame position reached by a fixed random game (skip back past any
    # trailing pass so the root is non-terminal).
    states = list(random_game_states(5, n_moves=20, pass_prob=0.0))
    s, g = states[-1]

    cfg = SearchConfig(
        expand_thresh=expand_thresh,
        exploration_weight=4.0,
        no_sim=True,
        max_turns=80,
        max_nodes=8192,
    )
    ev = fake_evaluator()
    batch = jax.tree.map(lambda x: x[None], s)
    rng = jax.random.PRNGKey(0)
    trees = mcts.init_trees(rng, batch, ev, None, cfg)
    trees = mcts.run_search(rng, trees, ev, None, cfg, n_rollouts)

    oracle = DictMCTS(
        g,
        probs_fn=lambda game: fake_probs_np(game.board, game.turn),
        value_fn=lambda game: fake_value_np(game.board, game.turn),
        exploration_weight=4.0,
        expand_thresh=expand_thresh,
        max_turns=80,
    )
    oracle.rollout(n_rollouts)

    want = oracle.root_child_visits()
    tree0 = jax.tree.map(lambda x: x[0], trees)
    kids = np.asarray(tree0.children[int(tree0.root)])
    got = {
        a: int(tree0.visits[kids[a]]) for a in range(NN) if kids[a] >= 0
    }
    assert set(got) == set(want)
    assert got == want
    # root visit count matches total rollouts
    assert int(tree0.visits[int(tree0.root)]) == n_rollouts
    # winrate parity
    np.testing.assert_allclose(
        float(mcts.root_winrate(tree0, 1.0)), oracle.winrate(), rtol=1e-5
    )


def test_branch_num_topk():
    s = st.new_game()
    cfg = SearchConfig(branch_num=5, no_sim=True, max_nodes=256)
    ev = fake_evaluator()
    batch = jax.tree.map(lambda x: x[None], s)
    trees = mcts.init_trees(jax.random.PRNGKey(0), batch, ev, None, cfg)
    tree0 = jax.tree.map(lambda x: x[0], trees)
    kids = np.asarray(tree0.children[0])
    assert (kids >= 0).sum() == 5


def test_choose_most_visited():
    states = list(random_game_states(7, n_moves=10))
    s, _ = states[-1]
    cfg = SearchConfig(no_sim=True, max_nodes=4096)
    ev = fake_evaluator()
    batch = jax.tree.map(lambda x: x[None], s)
    rng = jax.random.PRNGKey(1)
    trees = mcts.init_trees(rng, batch, ev, None, cfg)
    trees = mcts.run_search(rng, trees, ev, None, cfg, 50)
    a = int(jax.vmap(mcts.choose_action)(trees)[0])
    tree0 = jax.tree.map(lambda x: x[0], trees)
    kids = np.asarray(tree0.children[0])
    visits = {i: int(tree0.visits[kids[i]]) for i in range(NN) if kids[i] >= 0}
    assert a in visits
    assert visits[a] == max(visits.values())


def test_terminal_root_returns_pass():
    s = st.new_game()
    s = rules.step(s, jnp.int32(PASS_ACTION))  # last move pass -> terminal
    cfg = SearchConfig(no_sim=True, max_nodes=64)
    ev = fake_evaluator()
    batch = jax.tree.map(lambda x: x[None], s)
    trees = mcts.init_trees(jax.random.PRNGKey(0), batch, ev, None, cfg)
    trees = mcts.run_search(jax.random.PRNGKey(1), trees, ev, None, cfg, 3)
    a = int(jax.vmap(mcts.choose_action)(trees)[0])
    assert a == PASS_ACTION


def test_terminal_root_jitted_no_phantom_children():
    """Regression: the WHOLE search jitted as one graph on a batch mixing a
    terminal root with a live one.  On the axon TPU backend the fused
    gather->where(did)->scatter write-back of a REFUSED expansion
    miscompiled, leaving the pool-cap slot ids in the terminal root's child
    plane — 81 phantom children whose corrupted visit rows out-voted real
    moves (engine symptom: junk moves like A1/J9).  The drop-write form
    must keep the row clean under jit on every backend."""
    from bokego_tpu.search import tree as tr

    live = st.new_game()
    term = rules.step(st.new_game(), jnp.int32(PASS_ACTION))
    batch = jax.tree.map(lambda a, b: jnp.stack([a, b]), term, live)
    cfg = SearchConfig(expand_thresh=2, no_sim=True, max_nodes=256)
    ev = fake_evaluator()
    actions, trees = jax.jit(
        lambda r, s: mcts.search(r, s, ev, None, cfg, 40)
    )(jax.random.PRNGKey(0), batch)
    row_term = np.asarray(trees.pstats)[0][int(np.asarray(trees.root)[0])]
    assert int(actions[0]) == PASS_ACTION
    assert not (row_term[tr.C_CHILD, :NN] >= 0).any()
    assert row_term[tr.C_N, :NN].max() == 0.0
    # the live tree is unaffected: exact visit accounting at its root
    row_live = np.asarray(trees.pstats)[1][int(np.asarray(trees.root)[1])]
    assert row_live[tr.C_N, :NN].sum() == 40.0
    legal = np.asarray(rules.legal_mask_batch(batch))
    assert legal[1, int(actions[1])]


def test_batched_search_runs():
    """Multiple trees advance independently in one scan."""
    B = 4
    s = st.new_game_batch(B)
    cfg = SearchConfig(expand_thresh=3, no_sim=True, max_nodes=2048)
    ev = fake_evaluator()
    rng = jax.random.PRNGKey(0)
    actions, trees = mcts.search(rng, s, ev, None, cfg, n_rollouts=30)
    assert actions.shape == (B,)
    assert np.all(np.asarray(trees.visits[:, 0]) == 30)
    # all chosen actions legal
    legal = np.asarray(rules.legal_mask_batch(s))
    for b in range(B):
        assert legal[b, int(actions[b])]


@pytest.mark.slow
def test_simulation_mode_smoke():
    """--simulate parity config: sims mixed with value net (λ=0.5)."""
    B = 2
    s = st.new_game_batch(B)
    cfg = SearchConfig(no_sim=False, value_net_weight=0.5, max_turns=20, max_nodes=512)
    ev = fake_evaluator()
    actions, trees = mcts.search(jax.random.PRNGKey(0), s, ev, None, cfg, n_rollouts=5)
    t0 = jax.tree.map(lambda x: x[0], trees)
    assert int(t0.visits[0]) == 5
    # sim rewards accumulated into wq
    assert np.asarray(trees.wq[:, 0]).any()


def test_advance_root_subtree_reuse():
    """Re-rooting keeps the child's accumulated stats (set_root reuse)."""
    import jax.numpy as jnp

    states = list(random_game_states(9, n_moves=6, pass_prob=0.0))
    s, _ = states[-1]
    cfg = SearchConfig(expand_thresh=5, no_sim=True, max_nodes=4096)
    ev = fake_evaluator()
    batch = jax.tree.map(lambda x: x[None], s)
    rng = jax.random.PRNGKey(3)
    trees = mcts.init_trees(rng, batch, ev, None, cfg)
    trees = mcts.run_search(rng, trees, ev, None, cfg, 40)
    a = int(jax.vmap(mcts.choose_action)(trees)[0])
    t0 = jax.tree.map(lambda x: x[0], trees)
    from bokego_tpu.search import tree as tr
    row = np.asarray(t0.pstats[int(t0.root)])
    child_n = row[tr.C_N, a]
    child = int(row[tr.C_CHILD, a])
    new_trees, ok = mcts.advance_root(trees, jnp.asarray([a], jnp.int32))
    assert bool(ok[0])
    assert int(new_trees.root[0]) == child
    np.testing.assert_allclose(float(new_trees.root_stats[0, 0]), child_n)
    # advancing to a non-existent edge reports not-ok
    _, ok2 = mcts.advance_root(trees, jnp.asarray([81], jnp.int32))
    assert not bool(ok2[0])


@pytest.mark.slow
def test_fused_eval_path_matches_unfused():
    """net_evaluator's fused leaf_analysis path == the states-level path."""
    from bokego_tpu.models import init_policy, init_value

    params = {"policy": init_policy(jax.random.PRNGKey(0)),
              "value": init_value(jax.random.PRNGKey(1))}
    ev_fused = mcts.net_evaluator(True)
    assert ev_fused.evaluate_fts is not None
    ev_plain = mcts.Evaluator(
        evaluate=ev_fused.evaluate,
        policy_probs=ev_fused.policy_probs,
        has_value=True,
    )
    s = st.new_game_batch(2)
    cfg = SearchConfig(expand_thresh=3, no_sim=True, max_nodes=512)
    rng = jax.random.PRNGKey(5)
    t1 = mcts.run_search(rng, mcts.init_trees(rng, s, ev_fused, params, cfg),
                         ev_fused, params, cfg, 12)
    t2 = mcts.run_search(rng, mcts.init_trees(rng, s, ev_plain, params, cfg),
                         ev_plain, params, cfg, 12)
    np.testing.assert_allclose(np.asarray(t1.pstats), np.asarray(t2.pstats),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(t1.n_nodes), np.asarray(t2.n_nodes))


# ---------------------------------------------------------------------------
# Tree compaction (the reference's _prune, mcts.py:236-255, array-style)


@pytest.mark.slow
def test_compact_preserves_search():
    """compact() relabels slots but not structure: invariants hold and a
    search continued after compaction produces identical root-child visit
    counts to one continued without it."""
    from bokego_tpu.search import tree as tr

    states = list(random_game_states(7, n_moves=12, pass_prob=0.0))
    s, _ = states[-1]
    cfg = SearchConfig(expand_thresh=3, no_sim=True, max_nodes=4096, max_turns=80)
    ev = fake_evaluator()
    batch = jax.tree.map(lambda x: x[None], s)
    rng = jax.random.PRNGKey(1)
    trees = mcts.init_trees(rng, batch, ev, None, cfg)
    trees = mcts.run_search(rng, trees, ev, None, cfg, 80)
    action = int(jax.vmap(mcts.choose_action)(trees)[0])
    adv, okk = mcts.advance_root(trees, jnp.array([action], jnp.int32))
    assert bool(okk[0])
    comp = jax.vmap(tr.compact)(adv)

    kept = jax.vmap(tr.reachable_from_root)(adv)
    assert int(comp.root[0]) == 0  # root is lowest kept slot
    assert int(comp.n_nodes[0]) == int(kept.sum())
    assert int(comp.n_nodes[0]) < int(adv.n_nodes[0])  # slots were freed
    # root stats carried over untouched
    np.testing.assert_array_equal(
        np.asarray(comp.root_stats), np.asarray(adv.root_stats)
    )
    # fresh slots are pool-default (expand_core relies on this)
    k = int(comp.n_nodes[0])
    assert np.all(np.isnan(np.asarray(comp.value[0, k:])))
    assert np.all(np.asarray(comp.pstats[0, k:, :, :81][..., 4, :]) < 0)
    assert not np.any(np.asarray(comp.expanded[0, k:]))

    rng2 = jax.random.PRNGKey(2)
    a = mcts.run_search(rng2, adv, ev, None, cfg, 60)
    b = mcts.run_search(rng2, comp, ev, None, cfg, 60)
    row_a = np.asarray(a.pstats)[0, int(a.root[0])]
    row_b = np.asarray(b.pstats)[0, int(b.root[0])]
    np.testing.assert_allclose(row_a[tr.C_N, :NN], row_b[tr.C_N, :NN])
    np.testing.assert_allclose(
        row_a[tr.C_WV, :NN], row_b[tr.C_WV, :NN], rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(a.root_stats), np.asarray(b.root_stats)
    )


@pytest.mark.slow
def test_long_game_never_stalls_on_pool():
    """VERDICT round-2 #6 done-criterion: a served game at expand_thresh=3
    with a bounded pool keeps searching to budget on every move — the
    per-move compaction at advance_root reclaims off-path slots, so
    rollout() never hits the frozen pool-full state."""
    from bokego_tpu.config import EngineConfig
    from bokego_tpu.gtp.engine import GTPEngine

    eng = GTPEngine(
        fake_evaluator(),
        None,
        SearchConfig(expand_thresh=3, no_sim=True, max_nodes=4096, n_rollouts=32),
        EngineConfig(time_lim=None, n_rollouts=32, pondering=False),
    )
    eng.running = True
    for move in range(40):
        assert eng.rollout(32), f"search stalled (pool full) at move {move}"
        mv = eng.genmove(resign=False)
        if int(eng.state.turn) > 78:
            break
    assert move >= 20  # the game actually ran deep enough to matter


# ---------------------------------------------------------------------------
# Root noise with subtree reuse (round 3) and the device-side PV walk


def test_add_root_noise_touches_only_root_priors():
    """Noise mixes Dirichlet into the ROOT row's priors and nothing else —
    child rows keep clean priors so re-rooting + re-noising reproduces the
    reference's set-root-time noise (Go_MCTS._add_noise, mcts.py:366-369)."""
    from bokego_tpu.search import tree as tr

    states = list(random_game_states(3, n_moves=10, pass_prob=0.0))
    s, _ = states[-1]
    cfg = SearchConfig(expand_thresh=2, no_sim=True, max_nodes=256)
    ev = fake_evaluator()
    batch = jax.tree.map(lambda x: x[None], s)
    rng = jax.random.PRNGKey(3)
    trees = mcts.run_search(
        rng, mcts.init_trees(rng, batch, ev, None, cfg), ev, None, cfg, 40
    )
    w, alpha = 0.25, 0.1
    noised = mcts.add_root_noise(trees, jax.random.PRNGKey(9), w, alpha)

    before = np.asarray(trees.pstats)
    after = np.asarray(noised.pstats)
    root = int(trees.root[0])
    # every non-root slot is bit-identical
    mask = np.ones(before.shape[1], bool)
    mask[root] = False
    np.testing.assert_array_equal(after[0, mask], before[0, mask])
    # root row: priors mixed toward a distribution (total mass (1-w)+w),
    # all other channels untouched
    pb, pa = before[0, root], after[0, root]
    for ch in range(pb.shape[0]):
        if ch == tr.C_PRIOR:
            continue
        np.testing.assert_array_equal(pa[ch], pb[ch])
    assert not np.array_equal(pa[tr.C_PRIOR, :NN], pb[tr.C_PRIOR, :NN])
    np.testing.assert_allclose(
        pa[tr.C_PRIOR, :NN].sum(),
        (1 - w) * pb[tr.C_PRIOR, :NN].sum() + w,
        rtol=1e-5,
    )
    # deterministic in the key
    again = mcts.add_root_noise(trees, jax.random.PRNGKey(9), w, alpha)
    np.testing.assert_array_equal(np.asarray(again.pstats), after)


def test_pv_walk_matches_host_walk():
    """pv_walk follows most-visited children exactly like a host-side walk
    over the pulled stats pool (the analyze streamer's old implementation)."""
    from bokego_tpu.search import tree as tr

    states = list(random_game_states(11, n_moves=8, pass_prob=0.0))
    s, _ = states[-1]
    cfg = SearchConfig(expand_thresh=1, no_sim=True, max_nodes=512)
    ev = fake_evaluator()
    batch = jax.tree.map(lambda x: x[None], s)
    rng = jax.random.PRNGKey(4)
    trees = mcts.run_search(
        rng, mcts.init_trees(rng, batch, ev, None, cfg), ev, None, cfg, 120
    )
    one = jax.tree.map(lambda x: x[0], trees)
    pst = np.asarray(one.pstats)
    root = int(one.root)
    visits = pst[root, tr.C_N, :NN]
    top = np.argsort(-visits)[:3].astype(np.int32)
    depth = 6
    got = np.asarray(mcts.pv_walk(one, jnp.asarray(top), depth=depth))

    for k, a0 in enumerate(top):
        cur = int(pst[root, tr.C_CHILD, a0])
        want = []
        for _ in range(depth):
            if cur < 0:
                want.append(-1)
                continue
            row = pst[cur]
            ch, n = row[tr.C_CHILD, :NN], row[tr.C_N, :NN]
            n = np.where(ch >= 0, n, -1.0)
            a = int(np.argmax(n))
            if ch[a] < 0 or n[a] <= 0:
                cur = -1
                want.append(-1)
            else:
                want.append(a)
                cur = int(ch[a])
        np.testing.assert_array_equal(got[k], np.array(want, np.int32))


def test_eval_every_noneval_step_caches_nothing():
    """Round-4 cond restructure: pool scatters run unconditionally outside
    the eval cond, so on a NON-eval step (eval_every > 1) they must be
    dead — no zero-prior expansion, and an unvalued leaf must stay NaN
    (not get 0.0 cached)."""
    states = st.new_game_batch(2)
    cfg = SearchConfig(
        expand_thresh=0, no_sim=True, max_nodes=256, eval_every=4
    )
    ev = fake_evaluator()
    trees = mcts.init_trees(jax.random.PRNGKey(0), states, ev, None, cfg)
    nan_before = int(jnp.isnan(trees.value).sum())
    n_nodes_before = np.asarray(trees.n_nodes).copy()
    # step_idx=1: forced non-eval; every child leaf is unvalued and (with
    # expand_thresh=0) would expand on an eval step
    out = jax.jit(
        lambda r, t: mcts.search_step(r, t, ev, None, cfg, 1)
    )(jax.random.PRNGKey(1), trees)
    assert int(jnp.isnan(out.value).sum()) == nan_before  # nothing cached
    np.testing.assert_array_equal(np.asarray(out.n_nodes), n_nodes_before)
    # visits still backprop (neutral value): root N grew by 1
    np.testing.assert_allclose(
        np.asarray(out.root_stats[:, 0]),
        np.asarray(trees.root_stats[:, 0]) + 1,
    )
