"""Batched PUCT Monte-Carlo tree search.

The reference's ``MCTS`` (mcts.py:15-255) walks a Python object graph one
rollout at a time, evaluating nets one position at a time.  Here every
rollout phase is a vectorized pass over a *batch of trees*:

  descend  — vmapped while_loop of PUCT argmax over child arrays,
  evaluate — ONE batched policy/value forward for all trees' leaves,
  expand   — vmapped scatter of all legal children (rules.child_states),
  simulate — optional vectorized playout to terminal (``--simulate`` mode),
  backprop — vmapped parent-pointer walk with per-ply sign flips.

Search math is the reference's exactly: PUCT score
``-avg + c * prior * sqrt(total_child_visits) / (1 + N_child)``
(mcts.py:219-234), value/sim mixing by ``value_net_weight``
(mcts.py:159-170, 225-229), leaf expansion after ``expand_thresh`` visits
(mcts.py:179-180), ``branch_num`` top-k children, Dirichlet(0.1) root noise
(mcts.py:41, 366-369), most-visited choose (mcts.py:110-131).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bokego_tpu.coords import NN, PASS_ACTION
from bokego_tpu.config import SearchConfig
from bokego_tpu.env import rules
from bokego_tpu.env.state import GoState
from bokego_tpu.features import features_batch
from bokego_tpu.models import inference
from bokego_tpu.search import playout as po
from bokego_tpu.search.tree import Tree, empty_tree, expand, get_state, set_leaf_value


class Evaluator(NamedTuple):
    """Leaf evaluation callback (static; close over net apply fns).

    ``evaluate(params, states) -> (probs (B, 81), values (B,) | None)`` is
    the full leaf evaluation; ``policy_probs(params, states) -> (B, 81)`` is
    the policy-only path used by simulation playouts.  ``params`` is an
    arbitrary pytree threaded through dynamically so weight updates don't
    retrace the search; ``has_value`` must agree with ``evaluate``.
    """

    evaluate: "callable"
    policy_probs: "callable"
    has_value: bool


def net_evaluator(has_value: bool = True) -> "Evaluator":
    """Standard evaluator over the Flax nets; params =
    {'policy': vars, 'value': vars}."""

    def policy_probs(params, states):
        return inference.policy_probs(params["policy"], features_batch(states))

    def evaluate(params, states):
        fts = features_batch(states)
        probs = inference.policy_probs(params["policy"], fts)
        vals = inference.value_fn(params["value"], fts) if has_value else None
        return probs, vals

    return Evaluator(evaluate=evaluate, policy_probs=policy_probs, has_value=has_value)


# ---------------------------------------------------------------------------
# Per-tree phases (vmapped by the driver functions below).


def _mix_weight(cfg: SearchConfig, has_value: bool) -> float:
    """λ resolution (mcts.py:65-70): 1.0 in no_sim mode, 0.0 without a value
    net, else ``value_net_weight``."""
    if cfg.no_sim:
        return 1.0
    if not has_value:
        return 0.0
    return cfg.value_net_weight


def _puct_child(tree: Tree, node: jnp.ndarray, c: float, w: float) -> jnp.ndarray:
    """Select the PUCT-best child of an expanded node (mcts.py:219-234)."""
    kids = tree.children[node]  # (81,)
    valid = kids >= 0
    idx = jnp.maximum(kids, 0)
    n = tree.visits[idx]
    avg = jnp.where(
        n > 0,
        ((1.0 - w) * tree.wq[idx] + w * tree.wv[idx]) / jnp.maximum(n, 1),
        0.0,
    )
    total = jnp.maximum(jnp.sum(jnp.where(valid, n, 0)), 1)
    score = -avg + c * tree.prior[idx] * jnp.sqrt(total.astype(jnp.float32)) / (
        1.0 + n
    )
    score = jnp.where(valid, score, -jnp.inf)
    return kids[jnp.argmax(score)]


def _descend_one(tree: Tree, cfg: SearchConfig, w: float) -> jnp.ndarray:
    """Walk from root to a leaf via PUCT (``MCTS._descend``, mcts.py:172-183)."""

    def is_internal(i):
        return tree.expanded[i] & jnp.any(tree.children[i] >= 0) & ~tree.terminal[i]

    def cond(cur):
        return is_internal(cur)

    def body(cur):
        return _puct_child(tree, cur, cfg.exploration_weight, w)

    return jax.lax.while_loop(cond, body, tree.root)


def _backprop_one(
    tree: Tree,
    leaf: jnp.ndarray,
    sim_reward: jnp.ndarray,
    use_sim: bool,
    use_value: bool,
) -> Tree:
    """Propagate reward/value up the parent chain with per-ply negation
    (``MCTS._backpropagate``, mcts.py:208-217)."""
    leaf_val = tree.value[leaf]

    def cond(carry):
        cur, _, _, _ = carry
        return cur >= 0

    def body(carry):
        cur, r, v, t = carry
        t = t.replace(visits=t.visits.at[cur].add(1))
        if use_sim:
            t = t.replace(wq=t.wq.at[cur].add(r))
        if use_value:
            t = t.replace(wv=t.wv.at[cur].add(v))
        return (t.parent[cur], -r, -v, t)

    _, _, _, out = jax.lax.while_loop(cond, body, (leaf, sim_reward, leaf_val, tree))
    return out


def root_winrate(tree: Tree, w: float) -> jnp.ndarray:
    """Root winrate in [0, 1] (``MCTS.winrate``, mcts.py:159-170)."""
    n = tree.visits[tree.root]
    v = ((1.0 - w) * tree.wq[tree.root] + w * tree.wv[tree.root]) / jnp.maximum(n, 1)
    return jnp.where(n > 0, (v + 1.0) / 2.0, 0.0)


def choose_action(tree: Tree) -> jnp.ndarray:
    """Most-visited root child's action; PASS if the root has no children
    (``MCTS.choose``, mcts.py:110-131)."""
    kids = tree.children[tree.root]
    valid = kids >= 0
    n = jnp.where(valid, tree.visits[jnp.maximum(kids, 0)], -1)
    best = jnp.argmax(n)
    return jnp.where(jnp.any(valid), best, PASS_ACTION).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Batched driver.


def _evaluate(ev: Evaluator, params, states: GoState):
    probs, vals = ev.evaluate(params, states)
    if vals is None:
        vals = jnp.zeros(probs.shape[0], jnp.float32)
    return probs, vals


def init_trees(
    rng: jax.Array,
    root_states: GoState,
    ev: Evaluator,
    params,
    cfg: SearchConfig,
) -> Tree:
    """Build a batch of trees and expand their roots (``MCTS.set_root``,
    mcts.py:153-157: root noise + immediate expansion)."""
    batch = root_states.turn.shape[0]
    trees = jax.vmap(lambda s: empty_tree(s, cfg.max_nodes, cfg.max_turns))(
        root_states
    )
    probs, vals = _evaluate(ev, params, root_states)
    if cfg.noise_weight > 0:
        noise = jax.random.dirichlet(
            rng, jnp.full((NN,), cfg.dirichlet_alpha), (batch,)
        )
        probs = (1.0 - cfg.noise_weight) * probs + cfg.noise_weight * noise
    need = jnp.ones((batch,), bool)
    trees = jax.vmap(
        lambda t, p, nd: expand(t, t.root, p, nd, cfg.branch_num, cfg.max_turns)
    )(trees, probs, need)
    trees = jax.vmap(lambda t, v: set_leaf_value(t, t.root, v))(trees, vals)
    return trees


def search_step(
    rng: jax.Array, trees: Tree, ev: Evaluator, params, cfg: SearchConfig
) -> Tree:
    """One synchronized rollout across every tree (``MCTS.rollout`` n=1,
    mcts.py:133-151)."""
    has_value = ev.has_value
    w = _mix_weight(cfg, has_value)

    leaves = jax.vmap(partial(_descend_one, cfg=cfg, w=w))(trees)
    leaf_states = jax.vmap(get_state)(trees, leaves)
    probs, vals = _evaluate(ev, params, leaf_states)

    need = (
        (trees.visits[jnp.arange(leaves.shape[0]), leaves] > cfg.expand_thresh)
        & ~trees.terminal[jnp.arange(leaves.shape[0]), leaves]
        & ~trees.expanded[jnp.arange(leaves.shape[0]), leaves]
    )
    trees = jax.vmap(
        lambda t, l, p, nd: expand(t, l, p, nd, cfg.branch_num, cfg.max_turns)
    )(trees, leaves, probs, need)
    trees = jax.vmap(set_leaf_value)(trees, leaves, vals)

    if cfg.no_sim:
        sim_r = jnp.zeros(leaves.shape[0], jnp.float32)
        use_sim = False
    else:
        sim_r = _simulate(rng, leaf_states, ev, params, cfg)
        use_sim = True

    trees = jax.vmap(
        partial(_backprop_one, use_sim=use_sim, use_value=has_value)
    )(trees, leaves, sim_r)
    return trees


def _simulate(
    rng: jax.Array, leaf_states: GoState, ev: Evaluator, params, cfg: SearchConfig
) -> jnp.ndarray:
    """Policy playout to terminal; reward from the leaf player's perspective
    (``MCTS._simulate``, mcts.py:195-206; Tromp-Taylor reward, no gnugo)."""

    def probs_fn(states):
        return ev.policy_probs(params, states)

    traj = po.playout(
        rng,
        probs_fn,
        probs_fn,
        leaf_states,
        num_steps=cfg.max_turns + 1,
        max_turns=cfg.max_turns,
        avoid_eyes=True,
    )
    r_black = po.rewards(traj.final)
    # invert when white to move at the leaf (mcts.py:199-205)
    return jnp.where(leaf_states.turn % 2 == 0, r_black, -r_black)


def run_search(
    rng: jax.Array,
    trees: Tree,
    ev: Evaluator,
    params,
    cfg: SearchConfig,
    n_rollouts: int,
) -> Tree:
    """Run ``n_rollouts`` synchronized rollouts (scan over search_step)."""

    def body(t, r):
        return search_step(r, t, ev, params, cfg), None

    rngs = jax.random.split(rng, n_rollouts)
    trees, _ = jax.lax.scan(body, trees, rngs)
    return trees


def search(
    rng: jax.Array,
    root_states: GoState,
    ev: Evaluator,
    params,
    cfg: SearchConfig,
    n_rollouts: int | None = None,
) -> tuple[jnp.ndarray, Tree]:
    """Fresh-tree search: init, rollout, choose.  Returns (actions, trees).

    Actions use device encoding (81 = pass, returned when a root has no
    legal point move).
    """
    n = cfg.n_rollouts if n_rollouts is None else n_rollouts
    init_rng, run_rng = jax.random.split(rng)
    trees = init_trees(init_rng, root_states, ev, params, cfg)
    trees = run_search(run_rng, trees, ev, params, cfg, n)
    actions = jax.vmap(choose_action)(trees)
    return actions, trees
