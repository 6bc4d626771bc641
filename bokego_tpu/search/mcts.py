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
from bokego_tpu.env import rules as rules_mod
from bokego_tpu.env import rules
from bokego_tpu.env.state import GoState
from bokego_tpu.features import features_batch
from bokego_tpu.models import inference
from bokego_tpu.search import playout as po
from bokego_tpu.search import tree as tr_mod
from bokego_tpu.search.tree import Tree, empty_tree, expand, set_leaf_value


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
    evaluate_fts: "callable | None" = None  # (params, fts) -> (probs, vals);
    # when present, the search fuses feature computation with successor
    # generation (rules.leaf_analysis) on eval steps


def net_evaluator(has_value: bool = True, dtype=None) -> "Evaluator":
    """Standard evaluator over the Flax nets; params =
    {'policy': vars, 'value': vars}.

    ``dtype=jnp.bfloat16`` runs the conv trunks in bf16 (2× MXU throughput
    on v5e; the net forward dominates the search's eval phase — PERF.md).
    Probabilities/values are cast back to f32 for the tree math; measured
    move agreement stays within search noise.  Default f32 preserves exact
    logits parity with the torch reference (tests/test_models.py)."""

    def _cast(tree):
        return jax.tree.map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            tree,
        )

    def policy_probs(params, states):
        pol, fts = params["policy"], features_batch(states)
        if dtype is not None:
            pol, fts = _cast(pol), fts.astype(dtype)
        return inference.policy_probs(pol, fts).astype(jnp.float32)

    def evaluate_fts(params, fts):
        pol, val = params["policy"], params.get("value")
        if dtype is not None:
            pol, val, fts = _cast(pol), _cast(val), fts.astype(dtype)
        probs = inference.policy_probs(pol, fts).astype(jnp.float32)
        vals = (
            inference.value_fn(val, fts).astype(jnp.float32)
            if has_value
            else None
        )
        return probs, vals

    def evaluate(params, states):
        return evaluate_fts(params, features_batch(states))

    return Evaluator(
        evaluate=evaluate,
        policy_probs=policy_probs,
        has_value=has_value,
        evaluate_fts=evaluate_fts,
    )


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


def _take_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(B, N, ...) indexed by (B,) -> (B, ...) via take_along_axis.

    NOTE: this (and every hot-path gather here) deliberately avoids
    advanced integer indexing like ``x[arange(B), idx]`` — on the TPU
    backend that pattern lowers to a pathologically slow general gather
    (measured ~60x slower and minutes of compile time), while
    ``take_along_axis`` lowers to fast contiguous row gathers.
    """
    ex = idx.reshape(idx.shape + (1,) * (x.ndim - 1))
    return jnp.take_along_axis(x, ex, axis=1)[:, 0]


def gather_states(nodes: GoState, idx: jnp.ndarray) -> GoState:
    """Batched node-state gather: nodes (B, Nmax, ...) at (B,) indices."""
    return jax.tree.map(lambda x: _take_rows(x, idx), nodes)


class _Descent(NamedTuple):
    leaf: jnp.ndarray  # (B,) leaf node index per tree
    path: jnp.ndarray  # (B, max_depth) node indices; Nmax (OOB) where unused
    acts: jnp.ndarray  # (B, max_depth) action taken at each internal level
    leaf_n: jnp.ndarray  # (B,) visit count of the leaf (from its edge entry)
    depth: jnp.ndarray  # (B,) index of the leaf within path


def _descend_batch(trees: Tree, cfg: SearchConfig, w: float) -> _Descent:
    """PUCT walk from every root to a leaf, recording the path
    (``MCTS._descend``, mcts.py:172-183; PUCT formula mcts.py:219-234).

    Batch-level: one set of row gathers per tree *level*, all trees in
    lockstep; finished trees idle until the deepest one stops.
    """
    batch = trees.root.shape[0]
    c = cfg.exploration_weight
    cap = trees.parent.shape[1]  # Nmax (OOB sentinel for path scatters)

    def level(carry):
        cur, done, path, acts, leaf_n, depth, i = carry
        row = _take_rows(trees.pstats, cur)  # (B, 8, 128) — one row per level
        kids = row[:, tr_mod.C_CHILD, :NN]
        valid = kids >= 0
        # terminal nodes never have children (expand refuses them), so
        # "has any child" alone decides internal-ness.
        internal = jnp.any(valid, axis=1) & ~done
        nf = row[:, tr_mod.C_N, :NN]
        avg = jnp.where(
            nf > 0,
            ((1.0 - w) * row[:, tr_mod.C_WQ, :NN] + w * row[:, tr_mod.C_WV, :NN])
            / jnp.maximum(nf, 1.0),
            0.0,
        )
        total = jnp.maximum(jnp.sum(jnp.where(valid, nf, 0.0), axis=1), 1.0)
        score = -avg + c * row[:, tr_mod.C_PRIOR, :NN] * jnp.sqrt(total)[:, None] / (
            1.0 + nf
        )
        score = jnp.where(valid, score, -jnp.inf)
        best_a = jnp.argmax(score, axis=1)
        best = jnp.take_along_axis(kids, best_a[:, None], axis=1)[:, 0].astype(
            jnp.int32
        )
        picked_n = jnp.take_along_axis(nf, best_a[:, None], axis=1)[:, 0]
        nxt = jnp.where(internal, best, cur)
        leaf_n = jnp.where(internal, picked_n, leaf_n)
        depth = jnp.where(internal, depth + 1, depth)
        path = jax.lax.dynamic_update_index_in_dim(
            path, jnp.where(internal, nxt, cap), i + 1, axis=1
        )
        acts = jax.lax.dynamic_update_index_in_dim(
            acts, jnp.where(internal, best_a, 0), i, axis=1
        )
        return nxt, done | ~internal, path, acts, leaf_n, depth, i + 1

    def cond(carry):
        _, done, _, _, _, _, i = carry
        return jnp.any(~done) & (i < cfg.max_depth - 1)

    path0 = jnp.full((batch, cfg.max_depth), cap, jnp.int32)
    path0 = path0.at[:, 0].set(trees.root)
    init = (
        trees.root,
        jnp.zeros((batch,), bool),
        path0,
        jnp.zeros((batch, cfg.max_depth), jnp.int32),
        jnp.zeros((batch,), jnp.float32),  # visit count of the leaf
        jnp.zeros((batch,), jnp.int32),
        jnp.int32(0),
    )
    leaf, _, path, acts, leaf_n, depth, _ = jax.lax.while_loop(cond, level, init)
    return _Descent(leaf=leaf, path=path, acts=acts, leaf_n=leaf_n, depth=depth)


def _backprop_batch(
    trees: Tree,
    desc: _Descent,
    sim_reward: jnp.ndarray,
    use_sim: bool,
    use_value: bool,
) -> Tree:
    """Scatter the reward/value up every recorded path with per-ply sign
    flips (``MCTS._backpropagate``, mcts.py:208-217) — no loop: one
    vmapped scatter-add per stat array."""
    D = desc.path.shape[1]
    # NaN leaf value = not yet evaluated (possible only with eval_every > 1,
    # where a freshly expanded child can be visited before its delayed
    # valuation): back up a neutral 0 for those rollouts.
    leaf_val = jnp.nan_to_num(_take_rows(trees.value, desc.leaf))
    # sign[i] = (-1)^(depth - i) for i <= depth (leaf gets +1)
    ii = jnp.arange(D)[None, :]
    parity = (desc.depth[:, None] - ii) % 2
    sign = jnp.where(parity == 0, 1.0, -1.0)

    # Node path[j] (j>=1) lives at edge (path[j-1], acts[j-1]); the root's
    # own stats live in root_stats.
    upd = jnp.stack(
        [
            jnp.ones((trees.root.shape[0], D), jnp.float32),
            sign * sim_reward[:, None] if use_sim else jnp.zeros_like(sign),
            sign * leaf_val[:, None] if use_value else jnp.zeros_like(sign),
        ],
        axis=-1,
    )  # (B, D, 3): update for node path[j] uses sign[:, j]
    jj = jnp.arange(1, D)[None, :]
    valid_edge = jj <= desc.depth[:, None]
    cap = trees.parent.shape[-1]
    parent_rows = jnp.where(valid_edge, desc.path[:, :-1], cap)  # OOB -> drop
    edge_acts = desc.acts[:, : D - 1]
    edge_upd = upd[:, 1:, :]
    def upd_one(a, r, ac, u):
        a = a.at[r, tr_mod.C_N, ac].add(u[:, 0], mode="drop")
        if use_sim:
            a = a.at[r, tr_mod.C_WQ, ac].add(u[:, 1], mode="drop")
        if use_value:
            a = a.at[r, tr_mod.C_WV, ac].add(u[:, 2], mode="drop")
        return a

    pstats = jax.vmap(upd_one)(trees.pstats, parent_rows, edge_acts, edge_upd)
    root_sign = jnp.where(desc.depth % 2 == 0, 1.0, -1.0)
    root_upd = jnp.stack(
        [
            jnp.ones_like(root_sign),
            root_sign * sim_reward if use_sim else jnp.zeros_like(root_sign),
            root_sign * leaf_val if use_value else jnp.zeros_like(root_sign),
        ],
        axis=-1,
    )
    return trees.replace(
        pstats=pstats, root_stats=trees.root_stats + root_upd
    )


def root_winrate(tree: Tree, w: float) -> jnp.ndarray:
    """Root winrate in [0, 1] (``MCTS.winrate``, mcts.py:159-170)."""
    n, q, v = tree.root_stats[0], tree.root_stats[1], tree.root_stats[2]
    mixed = ((1.0 - w) * q + w * v) / jnp.maximum(n, 1.0)
    return jnp.where(n > 0, (mixed + 1.0) / 2.0, 0.0)


def choose_action(tree: Tree) -> jnp.ndarray:
    """Most-visited root child's action; PASS if the root has no children
    (``MCTS.choose``, mcts.py:110-131)."""
    row = tree.pstats[tree.root]  # (8, 128)
    valid = row[tr_mod.C_CHILD, :NN] >= 0
    n = jnp.where(valid, row[tr_mod.C_N, :NN], -1.0)
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
    trees = _expand_batch(trees, trees.root, probs, need, cfg)
    trees = jax.vmap(lambda t, v: set_leaf_value(t, t.root, v))(trees, vals)
    return trees


def _fit_block(batch: int, want: int, align: int = 1) -> int:
    """Largest kernel block <= ``want`` that divides the (static) batch.

    On hardware, Mosaic requires row-block slices of the (8,128)-tiled
    stats to align dim 0 to 8 (``align=8``); interpret mode has no such
    constraint."""
    for k in range(min(want, batch), 0, -1):
        if batch % k == 0 and k % align == 0:
            return k
    raise ValueError(
        f"no kernel block <= {want} divides batch {batch} with {align}-row "
        f"alignment — use a batch that is a multiple of {align}, or the "
        f"XLA path (use_kernel=False)"
    )


_warned_kernel_fallback = set()


def _kernel_ok(batch: int) -> bool:
    """Whether the Pallas kernel path can serve this (static) batch size.

    On hardware, Mosaic's 8-row tile alignment means no legal block exists
    unless the batch is a multiple of 8 (``_fit_block`` would raise at
    trace time — e.g. ``--fast --forest 1``).  Fall back to the XLA path
    with a one-time warning instead of crashing the first dispatch."""
    import warnings as _warnings

    if jax.default_backend() == "cpu" or batch % 8 == 0:
        return True
    if batch not in _warned_kernel_fallback:
        _warned_kernel_fallback.add(batch)
        _warnings.warn(
            f"use_kernel=True needs a batch that is a multiple of 8 on TPU "
            f"(Mosaic 8-row tile alignment); batch {batch} uses the XLA "
            f"path instead",
            stacklevel=2,
        )
    return False


def _expand_batch(trees, nodes, probs, need, cfg: SearchConfig, precomputed=None):
    """Batched expansion; on the kernel path the parent-row write goes
    through the in-place Pallas kernel (ops/rollout.write_rows) instead of
    an XLA scatter that copies the whole pstats pool."""
    import jax as _jax

    from bokego_tpu.search.tree import expand_core

    if not cfg.use_kernel or not _kernel_ok(trees.root.shape[0]):
        def one(t, l, p, nd, pre):
            t, row, did = expand_core(
                t, l, p, nd, cfg.branch_num, cfg.max_turns, pre
            )
            # drop-write form, NOT where(did, row, old) scattered back:
            # see the tree.expand_core note on the axon jit miscompile
            idx = jnp.where(did, l, t.capacity)
            return t.replace(
                pstats=t.pstats.at[idx].set(row, mode="drop")
            )

        return jax.vmap(one)(trees, nodes, probs, need, precomputed)

    from bokego_tpu.ops.rollout import write_rows

    trees, rows, did = jax.vmap(
        lambda t, l, p, nd, pre: expand_core(
            t, l, p, nd, cfg.branch_num, cfg.max_turns, pre
        )
    )(trees, nodes, probs, need, precomputed)
    interpret = _jax.default_backend() == "cpu"
    pstats = write_rows(
        trees.pstats, nodes, rows, did,
        tb=_fit_block(
            trees.root.shape[0], cfg.kernel_block, 1 if interpret else 8
        ),
        interpret=interpret,
    )
    return trees.replace(pstats=pstats)


def search_step(
    rng: jax.Array,
    trees: Tree,
    ev: Evaluator,
    params,
    cfg: SearchConfig,
    step_idx: jnp.ndarray | int = 0,
) -> Tree:
    """One synchronized rollout across every tree (``MCTS.rollout`` n=1,
    mcts.py:133-151).

    Performance: leaf values are cached at first visit (the reference's
    ``_val_cache``/``_dist_cache``, mcts.py:42-44) and expansion only
    happens past ``expand_thresh`` — so most rollouts need NO net forward
    and NO successor generation.  Both are gated behind one batch-level
    ``lax.cond``: when every tree's leaf is already valued and none needs
    expansion, the step is pure descend + backprop.
    """
    has_value = ev.has_value
    w = _mix_weight(cfg, has_value)
    batch = trees.root.shape[0]

    if cfg.use_kernel and cfg.no_sim and _kernel_ok(batch):
        return _search_step_kernel(rng, trees, ev, params, cfg, step_idx, w, has_value)

    desc = _descend_batch(trees, cfg, w)
    leaves = desc.leaf

    leaf_visits = jnp.where(desc.depth > 0, desc.leaf_n, trees.root_stats[..., 0])
    need = (
        (leaf_visits > cfg.expand_thresh)
        & ~_take_rows(trees.terminal, leaves)
        & ~_take_rows(trees.expanded, leaves)
    )
    any_work = jnp.any(need) | jnp.any(
        jnp.isnan(_take_rows(trees.value, leaves))
    )
    if cfg.eval_every > 1:
        any_work = any_work & (jnp.asarray(step_idx) % cfg.eval_every == 0)

    # Copy-free cond structure (round-3 weak #5: --strong per-chunk cost
    # scaled with max_nodes): the cond carries only the COMPUTE — net
    # forward + successor generation, returning small (B, ...) arrays —
    # while every pool-sized scatter runs unconditionally outside it.
    # When the cond's branches instead returned the whole Tree, XLA
    # inserted defensive full-pool copies of the nodes/flag arrays in the
    # identity branch to unify buffer assignment, a ~O(max_nodes) tax on
    # EVERY rollout (measured: 0.77 -> 4.0 ms/rollout from 512 -> 32768
    # slots on CPU; HLO showed s8[32768,81] etc. copies per iteration).
    # Outside the cond the scatters are O(82 rows) drop-writes whose
    # indices are dead (need/unvalued all-False) on no-work steps.
    def eval_compute(trees):
        leaf_states = gather_states(trees.nodes, leaves)
        if ev.evaluate_fts is not None:
            # fused path: one group analysis serves both the feature planes
            # and all successor states
            from bokego_tpu.features import features_from_tables

            fa = jax.vmap(rules_mod.leaf_analysis)(leaf_states)
            fts = jax.vmap(features_from_tables)(leaf_states, fa.mt)
            probs, vals = ev.evaluate_fts(params, fts)
            pre = (fa.children, fa.legal)
        else:
            probs, vals = ev.evaluate(params, leaf_states)
            csts, legal = jax.vmap(
                lambda s: rules_mod.child_states(s, with_hash=False)
            )(leaf_states)
            pre = (csts, legal)
        if vals is None:
            vals = jnp.zeros(probs.shape[0], jnp.float32)
        return probs, vals, pre

    out_shapes = jax.eval_shape(eval_compute, trees)
    probs, vals, pre = jax.lax.cond(
        any_work,
        eval_compute,
        lambda t: jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), out_shapes
        ),
        trees,
    )

    def apply_updates(trees):
        # mask by any_work: with eval_every > 1 a non-eval step can have
        # need=True / unvalued leaves, and the scatters below must stay
        # dead on those steps (no zero-prior expansion, no 0.0 caching)
        trees = _expand_batch(
            trees, leaves, probs, need & any_work, cfg, precomputed=pre
        )

        def setv(t, l, v):
            idx = jnp.where(
                any_work & jnp.isnan(t.value[l]), l, t.capacity
            )
            return t.replace(value=t.value.at[idx].set(v, mode="drop"))

        return jax.vmap(setv)(trees, leaves, vals)

    if cfg.no_sim:
        sim_r = jnp.zeros(batch, jnp.float32)
        use_sim = False
    else:
        sim_r = _simulate(rng, gather_states(trees.nodes, leaves), ev, params, cfg)
        use_sim = True

    if cfg.eval_every > 1:
        # Delayed-valuation ordering (same as the Pallas kernel path):
        # backprop with the current cached value, then evaluate/expand.
        trees = _backprop_batch(trees, desc, sim_r, use_sim, has_value)
        trees = apply_updates(trees)
    else:
        # Exact reference ordering: evaluate the leaf, then backprop it
        # (MCTS.rollout, mcts.py:139-151).
        trees = apply_updates(trees)
        trees = _backprop_batch(trees, desc, sim_r, use_sim, has_value)
    return trees


def _search_step_kernel(rng, trees, ev, params, cfg, step_idx, w, has_value):
    """Rollout via the Pallas fused descend/backprop kernel (in-place stat
    updates; see ops/rollout.py).  no_sim only."""
    import jax as _jax

    from bokego_tpu.ops.rollout import descend_backprop

    interpret = _jax.default_backend() == "cpu"
    batch = trees.root.shape[0]
    tb = _fit_block(batch, cfg.kernel_block, 1 if interpret else 8)
    pstats, kd = descend_backprop(
        trees.pstats,
        trees.value,
        trees.root,
        c=cfg.exploration_weight,
        w=w,
        use_value=has_value,
        levels=cfg.kernel_levels,
        tb=tb,
        interpret=interpret,
    )
    root_sign = jnp.where(kd.depth % 2 == 0, 1.0, -1.0)
    root_upd = jnp.stack(
        [
            jnp.ones_like(root_sign),
            jnp.zeros_like(root_sign),
            root_sign * kd.leaf_val if has_value else jnp.zeros_like(root_sign),
        ],
        axis=-1,
    )
    old_root_n = trees.root_stats[..., 0]
    trees = trees.replace(pstats=pstats, root_stats=trees.root_stats + root_upd)

    leaves = kd.leaf
    leaf_visits = jnp.where(kd.depth > 0, kd.leaf_n, old_root_n)
    # A childless node is never 'expanded' (expand only flips the flag when
    # it creates children), so eligibility is just visits + non-terminal;
    # terminality comes from the parent row's C_TERM plane the kernel
    # already read. Depth-0 roots: an expanded root is internal (kernel
    # descends), so a depth-0 leaf root is unexpanded; it is non-terminal
    # whenever it has legal moves — root terminality is checked by the
    # driver (selfplay masks done games; the engine rebuilds on terminal
    # positions), so treat depth-0 as eligible.
    leaf_terminal = jnp.where(kd.depth > 0, kd.leaf_terminal > 0, False)
    # ~expanded ALSO guards the kernel's level bound: a descent that
    # exhausts kernel_levels stops at an INTERNAL node (deep trees at low
    # expand_thresh) — re-expanding it would allocate duplicate children
    # and zero its stats row.
    need = (
        (leaf_visits > cfg.expand_thresh)
        & ~leaf_terminal
        & ~_take_rows(trees.expanded, leaves)
    )
    any_work = jnp.any(need) | jnp.any(kd.leaf_unvalued > 0)
    if cfg.eval_every > 1:
        any_work = any_work & (jnp.asarray(step_idx) % cfg.eval_every == 0)

    # compute-only cond (same structure as the XLA path above): the cond
    # returns small (B, ...) arrays; pool-sized scatters run outside it so
    # the identity branch forces no defensive full-pool copies
    def eval_compute(trees):
        leaf_states = gather_states(trees.nodes, leaves)
        if ev.evaluate_fts is not None:
            from bokego_tpu.features import features_from_tables

            fa = jax.vmap(rules_mod.leaf_analysis)(leaf_states)
            fts = jax.vmap(features_from_tables)(leaf_states, fa.mt)
            probs, vals = ev.evaluate_fts(params, fts)
            pre = (fa.children, fa.legal)
        else:
            probs, vals = ev.evaluate(params, leaf_states)
            csts, legal = jax.vmap(
                lambda s: rules_mod.child_states(s, with_hash=False)
            )(leaf_states)
            pre = (csts, legal)
        if vals is None:
            vals = jnp.zeros(probs.shape[0], jnp.float32)
        return probs, vals, pre

    out_shapes = jax.eval_shape(eval_compute, trees)
    probs, vals, pre = jax.lax.cond(
        any_work,
        eval_compute,
        lambda t: jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), out_shapes
        ),
        trees,
    )
    trees = _expand_batch(
        trees, leaves, probs, need & any_work, cfg, precomputed=pre
    )

    def setv(t, l, v):
        idx = jnp.where(any_work & jnp.isnan(t.value[l]), l, t.capacity)
        return t.replace(value=t.value.at[idx].set(v, mode="drop"))

    return jax.vmap(setv)(trees, leaves, vals)


def add_root_noise(
    trees: Tree, rng: jax.Array, weight: float, alpha: float
) -> Tree:
    """Mix fresh Dirichlet noise into every root's stored priors
    (``Go_MCTS._add_noise``, mcts.py:366-369 — the reference mixes into the
    root's full 81-move dist at ``set_root``).

    Lets a noised forest KEEP its subtree across moves: child rows store
    clean priors (expansion writes raw probs; only the root row is ever
    noised), so after :func:`advance_root` the new root's row is clean and
    re-noising reproduces the reference's set-root-time noise exactly."""
    batch = trees.root.shape[0]
    rows = _take_rows(trees.pstats, trees.root)  # (B, 8, 128)
    noise = jax.random.dirichlet(rng, jnp.full((NN,), alpha), (batch,))
    mixed = (1.0 - weight) * rows[:, tr_mod.C_PRIOR, :NN] + weight * noise
    rows = rows.at[:, tr_mod.C_PRIOR, :NN].set(mixed)
    idx = trees.root[:, None, None, None].astype(jnp.int32)

    def put(p, i, r):
        return p.at[i[0, 0, 0]].set(r)

    return trees.replace(pstats=jax.vmap(put)(trees.pstats, idx, rows))


def pv_walk(tree: Tree, root_actions: jnp.ndarray, depth: int = 8) -> jnp.ndarray:
    """Principal variations for ``root_actions`` at a SINGLE tree's root,
    entirely on device: follow the most-visited child ``depth`` plies.

    Returns int32[k, depth] actions, −1-padded once the line runs out.
    Replaces the analyze streamer's host-side walk, which pulled the whole
    pstats pool to the host every tick (268 MB at ``--strong``) — here only
    a (k, depth) array transfers (gtp.py:374-399 is the reference behavior
    being served)."""

    def pv_one(a0):
        row = tree.pstats[tree.root]
        child0 = row[tr_mod.C_CHILD, a0].astype(jnp.int32)

        def step(cur, _):
            crow = tree.pstats[jnp.maximum(cur, 0)]
            valid = crow[tr_mod.C_CHILD, :NN] >= 0
            cn = jnp.where(valid, crow[tr_mod.C_N, :NN], -1.0)
            nxt_a = jnp.argmax(cn)
            has = (cur >= 0) & jnp.any(valid) & (cn[nxt_a] > 0)
            nxt = jnp.where(
                has, crow[tr_mod.C_CHILD, nxt_a].astype(jnp.int32), -1
            )
            return nxt, jnp.where(has, nxt_a.astype(jnp.int32), -1)

        _, acts = jax.lax.scan(step, child0, None, length=depth)
        return acts

    return jax.vmap(pv_one)(root_actions.astype(jnp.int32))


def advance_root(trees: Tree, actions: jnp.ndarray) -> tuple[Tree, jnp.ndarray]:
    """Re-root each tree at its child for ``actions`` (the reference keeps
    the subtree across moves: ``MCTS.choose``/``set_root``, mcts.py:110-131,
    153-157).  Returns (trees, ok) — ok=False where no such child exists
    (terminal root, unexpanded action, or pass) and the caller must rebuild.
    Off-path nodes stay allocated until :func:`bokego_tpu.search.tree.compact`
    relabels the kept subtree to the pool head (the serving engine runs it
    at every re-root — the reference's ``_prune``, mcts.py:236-255)."""
    row = _take_rows(trees.pstats, trees.root)  # (B, 8, 128)
    a = jnp.clip(actions, 0, NN - 1)
    child = jnp.take_along_axis(row[:, tr_mod.C_CHILD, :NN], a[:, None], axis=1)[:, 0]
    ok = (child >= 0) & (actions >= 0) & (actions < NN)
    new_root = jnp.where(ok, child.astype(jnp.int32), trees.root)
    # the new root's own stats come from its edge entry at the old root
    n = jnp.take_along_axis(row[:, tr_mod.C_N, :NN], a[:, None], axis=1)[:, 0]
    wq = jnp.take_along_axis(row[:, tr_mod.C_WQ, :NN], a[:, None], axis=1)[:, 0]
    wv = jnp.take_along_axis(row[:, tr_mod.C_WV, :NN], a[:, None], axis=1)[:, 0]
    new_rs = jnp.stack([n, wq, wv], axis=-1)
    trees = trees.replace(
        root=new_root,
        root_stats=jnp.where(ok[:, None], new_rs, trees.root_stats),
    )
    return trees, ok


def expand_roots(
    trees: Tree, ev: Evaluator, params, cfg: SearchConfig
) -> Tree:
    """Ensure every root is expanded+valued (``set_root`` -> ``_expand``,
    mcts.py:153-157) — used after :func:`advance_root` lands on a child
    that was still a leaf."""
    root_states = gather_states(trees.nodes, trees.root)
    probs, vals = _evaluate(ev, params, root_states)
    need = ~_take_rows(trees.expanded, trees.root)
    trees = _expand_batch(trees, trees.root, probs, need, cfg)
    return jax.vmap(lambda t, v: set_leaf_value(t, t.root, v))(trees, vals)


def _simulate(
    rng: jax.Array, leaf_states: GoState, ev: Evaluator, params, cfg: SearchConfig
) -> jnp.ndarray:
    """Policy playout to terminal; reward from the leaf player's perspective
    (``MCTS._simulate``, mcts.py:195-206; Tromp-Taylor reward, no gnugo)."""

    def probs_fn(states):
        return ev.policy_probs(params, states)

    final = po.playout_final(
        rng,
        probs_fn,
        probs_fn,
        leaf_states,
        max_turns=cfg.max_turns,
        avoid_eyes=True,
    )
    r_black = po.rewards(final)
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

    def body(t, xs):
        i, r = xs
        return search_step(r, t, ev, params, cfg, i), None

    rngs = jax.random.split(rng, n_rollouts)
    trees, _ = jax.lax.scan(body, trees, (jnp.arange(n_rollouts), rngs))
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
