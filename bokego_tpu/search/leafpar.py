"""Leaf-parallel PUCT search: K rollouts per step with virtual loss.

Single-tree serving is *sequential-eval-bound*: each rollout of
``mcts.search_step`` is a dependent descend → net-forward(B=1) → backprop
chain, ~1.1 ms on a v5e (PERF.md "Serving throughput"), so one served
tree uses a sliver of the MXU no matter how fast each phase is.  The
classic fix — AlphaGo's tree parallelism with **virtual loss** (also
KataGo, ELF; the reference has no analog, its search is strictly
sequential, mcts.py:133-151) — batches the one step the MXU cares about:

  select   — K PUCT descents, each applying a virtual loss along its
             path so the next descent diverges instead of piling onto
             the same leaf,
  evaluate — ONE policy/value forward over all K leaves (B=K on the
             MXU instead of K dependent B=1 dispatches),
  expand   — the distinct leaves past ``expand_thresh``, sequentially
             (slot allocation is a running counter; the ``expanded``
             flag dedupes repeated leaves within the batch),
  backprop — one fused scatter that simultaneously REMOVES the virtual
             loss and applies the real (reward, value) updates with the
             reference's per-ply sign flips (mcts.py:208-217).

Virtual loss here is the standard "pretend the rollout already lost":
each traversed edge gets ``N += vl, W_q += vl, W_v += vl`` at selection
time.  Stats are stored child-perspective (PUCT selects by ``-avg + U``,
mcts.py:219-234), so *adding* to W marks the child as winning, which the
parent avoids — and the extra visits shrink the U term.  With the
default ``vl = 1.0`` a later in-batch descent reads exactly the visit
counts it would have seen had the earlier rollouts completed, so
``expand_thresh`` semantics match sequential search; the fused backprop
then nets every virtual term out exactly (N gets ``1 − vl + vl = 1``).

Semantics vs ``mcts.search_step``:

* ``K = 1`` (with ``vl = 0``) is the sequential algorithm — bitwise
  (tests/test_leafpar.py asserts it).
* ``K > 1`` is the standard leaf-parallel approximation: descents
  within one step cannot see each other's evaluations, so two of them
  may reach the same unexpanded leaf (both then backprop that leaf's
  single value).  This is the same trade every virtual-loss engine
  makes; the strength cost must be measured, not assumed — the
  equal-wall-clock match (tools/serving_match.py, queue stage 4) is
  PENDING HARDWARE and its result lands in PERF.md when it runs.

Composes with forest batching: shapes are (B trees, K leaves), so
``--forest 8`` with ``leaf_batch 16`` evaluates 128 positions per step.

XLA-path only (the Pallas rollout kernel fuses descend+backprop for the
K=1 cadence; leaf-parallel instead amortizes dispatch across K, which
is the better lever for B=1 serving).  ``eval_every`` must be 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bokego_tpu.config import SearchConfig
from bokego_tpu.env import rules as rules_mod
from bokego_tpu.search import tree as tr_mod
from bokego_tpu.search.mcts import (
    Evaluator,
    _descend_batch,
    _expand_batch,
    _mix_weight,
    _simulate,
    _take_rows,
    gather_states,
)
from bokego_tpu.search.tree import Tree


def _edge_arrays(desc, cap: int):
    """Per-edge (row, action, valid) arrays for a descent's path.

    Node ``path[j]`` (j >= 1) lives at edge ``(path[j-1], acts[j-1])``;
    invalid levels point at ``cap`` so ``mode="drop"`` scatters skip them
    (same addressing as ``mcts._backprop_batch``)."""
    D = desc.path.shape[-1]
    jj = jnp.arange(1, D)
    valid = jj <= desc.depth[..., None]  # (..., D-1)
    rows = jnp.where(valid, desc.path[..., :-1], cap)
    acts = desc.acts[..., : D - 1]
    return rows, acts, valid


def _apply_vloss(trees: Tree, desc, vl: float) -> Tree:
    """Add the virtual loss along one descent's path (edges only: the
    root's own ``root_stats`` never feed selection — ``_descend_batch``
    reads only child-edge rows — so it takes no virtual term)."""
    cap = trees.parent.shape[-1]
    rows, acts, valid = _edge_arrays(desc, cap)
    amt = jnp.where(valid, jnp.float32(vl), 0.0)

    def one(a, r, ac, u):
        a = a.at[r, tr_mod.C_N, ac].add(u, mode="drop")
        a = a.at[r, tr_mod.C_WQ, ac].add(u, mode="drop")
        a = a.at[r, tr_mod.C_WV, ac].add(u, mode="drop")
        return a

    return trees.replace(pstats=jax.vmap(one)(trees.pstats, rows, acts, amt))


def _backprop_k(
    trees: Tree,
    descs,  # _Descent stacked to (K, B, ...)
    sim_r: jnp.ndarray,  # (K, B)
    vl: float,
    use_sim: bool,
    use_value: bool,
) -> Tree:
    """Fused backprop for K paths: one scatter-add per stat plane that
    removes the selection-time virtual loss and applies the real update
    (``MCTS._backpropagate`` sign flips, mcts.py:208-217) in a single
    pass.  Duplicate edges across the K paths accumulate correctly —
    scatter-add is order-free."""
    K, B, D = descs.path.shape
    cap = trees.parent.shape[-1]
    leaf_val = jnp.nan_to_num(
        jax.vmap(lambda l: _take_rows(trees.value, l))(descs.leaf)
    )  # (K, B)

    # sign[k, b, j] = (-1)^(depth - j), leaf gets +1 (reference parity)
    ii = jnp.arange(D)[None, None, :]
    sign = jnp.where((descs.depth[..., None] - ii) % 2 == 0, 1.0, -1.0)
    rows, acts, valid = _edge_arrays(descs, cap)  # (K, B, D-1)
    sign_e = sign[..., 1:]  # edge j holds node path[j]'s update

    n_upd = jnp.where(valid, 1.0 - vl, 0.0)
    wq_real = sign_e * sim_r[..., None] if use_sim else 0.0
    wv_real = sign_e * leaf_val[..., None] if use_value else 0.0
    wq_upd = jnp.where(valid, wq_real - vl, 0.0)
    wv_upd = jnp.where(valid, wv_real - vl, 0.0)

    def flat(x):  # (K, B, D-1) -> (B, K*(D-1))
        return jnp.transpose(x, (1, 0, 2)).reshape(B, K * (D - 1))

    def one(a, r, ac, un, uq, uv):
        a = a.at[r, tr_mod.C_N, ac].add(un, mode="drop")
        a = a.at[r, tr_mod.C_WQ, ac].add(uq, mode="drop")
        a = a.at[r, tr_mod.C_WV, ac].add(uv, mode="drop")
        return a

    pstats = jax.vmap(one)(
        trees.pstats,
        flat(rows),
        flat(acts),
        flat(n_upd),
        flat(wq_upd),
        flat(wv_upd),
    )

    root_sign = jnp.where(descs.depth % 2 == 0, 1.0, -1.0)  # (K, B)
    root_upd = jnp.stack(
        [
            jnp.full((B,), float(K), jnp.float32),
            jnp.sum(root_sign * sim_r, axis=0)
            if use_sim
            else jnp.zeros((B,), jnp.float32),
            jnp.sum(root_sign * leaf_val, axis=0)
            if use_value
            else jnp.zeros((B,), jnp.float32),
        ],
        axis=-1,
    )
    return trees.replace(pstats=pstats, root_stats=trees.root_stats + root_upd)


def search_step_k(
    rng: jax.Array,
    trees: Tree,
    ev: Evaluator,
    params,
    cfg: SearchConfig,
    K: int,
    vl: float = 1.0,
) -> Tree:
    """K leaf-parallel rollouts across every tree (one fused step).

    Equivalent to K calls of ``mcts.search_step`` except that the K
    descents share one evaluation round (see module docstring).  Root
    visit counts grow by exactly K, so rollout accounting (timed serving,
    ``n_rollouts`` budgets) is unchanged.
    """
    if cfg.eval_every != 1:
        raise ValueError("leaf-parallel search requires eval_every == 1")
    if K == 1:
        vl = 0.0  # exact sequential arithmetic (K=1 needs no divergence)
    has_value = ev.has_value
    w = _mix_weight(cfg, has_value)
    B = trees.root.shape[0]
    cap = trees.parent.shape[-1]

    # --- select: K descents, each leaving a virtual loss on its path ---
    def sel(t, _):
        d = _descend_batch(t, cfg, w)
        return (_apply_vloss(t, d, vl) if vl else t), d

    trees, descs = jax.lax.scan(sel, trees, None, length=K)

    leaves = descs.leaf  # (K, B)
    # Sequential-equivalent visit count of each leaf: desc.leaf_n was read
    # from post-virtual-loss stats, so with vl=1 it already counts the
    # earlier in-batch rollouts (exact expand_thresh parity); the root
    # fallback (depth 0, never virtual-lossed) reads root_stats directly.
    leaf_visits = jnp.where(
        descs.depth > 0, descs.leaf_n, trees.root_stats[None, :, 0]
    )
    need = (
        (leaf_visits > cfg.expand_thresh)
        & ~jax.vmap(lambda l: _take_rows(trees.terminal, l))(leaves)
        & ~jax.vmap(lambda l: _take_rows(trees.expanded, l))(leaves)
    )  # (K, B) — duplicates of one unexpanded leaf all flag; the expansion
    # scan dedupes via the `expanded` bit it updates between sub-steps
    unvalued = jnp.isnan(jax.vmap(lambda l: _take_rows(trees.value, l))(leaves))
    any_work = jnp.any(need) | jnp.any(unvalued)

    def flat_leaf_states(t):
        ls = jax.vmap(lambda l: gather_states(t.nodes, l))(leaves)
        return jax.tree.map(lambda x: x.reshape((K * B,) + x.shape[2:]), ls)

    # sim mode plays out every leaf unconditionally (as mcts.search_step);
    # no_sim defers the gather into the cond so cached-leaf steps stay pure
    # descend + backprop
    flat_states = None if cfg.no_sim else flat_leaf_states(trees)

    # compute-only cond (same structure as mcts.search_step, round-3 weak
    # #5 fix): the cond returns only (K, B, ...) compute results; every
    # pool-sized scatter runs unconditionally outside it, so the identity
    # branch forces no defensive full-pool copies.  On no-work steps
    # any_work == False implies need/unvalued are all-False, so the
    # drop-scatters below are dead by construction.
    def eval_compute(trees):
        fs = flat_states if flat_states is not None else flat_leaf_states(trees)
        if ev.evaluate_fts is not None:
            # fused path (as mcts.search_step): one group analysis over all
            # K*B leaves serves both the feature planes and the successor
            # states every expansion will write
            from bokego_tpu.features import features_from_tables

            fa = jax.vmap(rules_mod.leaf_analysis)(fs)
            fts = jax.vmap(features_from_tables)(fs, fa.mt)
            probs, vals = ev.evaluate_fts(params, fts)
            pre_flat = (fa.children, fa.legal)
        else:
            probs, vals = ev.evaluate(params, fs)
            csts, legal = jax.vmap(
                lambda s: rules_mod.child_states(s, with_hash=False)
            )(fs)
            pre_flat = (csts, legal)
        if vals is None:
            vals = jnp.zeros(probs.shape[0], jnp.float32)
        pre = jax.tree.map(
            lambda x: x.reshape((K, B) + x.shape[1:]), pre_flat
        )
        return probs.reshape(K, B, -1), vals.reshape(K, B), pre

    out_shapes = jax.eval_shape(eval_compute, trees)
    probs_k, vals_k, pre = jax.lax.cond(
        any_work,
        eval_compute,
        lambda t: jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), out_shapes
        ),
        trees,
    )

    # expand each sub-batch in sequence: slot allocation is a counter,
    # and the expanded flag set by sub-step i blocks re-expansion of the
    # same leaf at sub-step j > i (need is re-derived from the carried
    # trees, not the pre-scan snapshot)
    def exp_body(t, xs):
        leaf_i, probs_i, visits_i, pre_i = xs
        need_i = (
            (visits_i > cfg.expand_thresh)
            & ~_take_rows(t.terminal, leaf_i)
            & ~_take_rows(t.expanded, leaf_i)
        )
        return _expand_batch(t, leaf_i, probs_i, need_i, cfg, pre_i), None

    trees, _ = jax.lax.scan(
        exp_body, trees, (leaves, probs_k, leaf_visits, pre)
    )

    # value every leaf (first-visit cache, mcts.py:42): one scatter per
    # tree; duplicate leaves carry identical values so write order is
    # irrelevant
    def setv(val_row, idx, v):
        known = ~jnp.isnan(val_row[idx])
        return val_row.at[jnp.where(known, cap, idx)].set(v, mode="drop")

    trees = trees.replace(
        value=jax.vmap(setv)(trees.value, leaves.T, vals_k.T)
    )

    if cfg.no_sim:
        sim_r = jnp.zeros((K, B), jnp.float32)
        use_sim = False
    else:
        sim_r = _simulate(rng, flat_states, ev, params, cfg).reshape(K, B)
        use_sim = True

    return _backprop_k(trees, descs, sim_r, vl, use_sim, has_value)


def run_search_k(
    rng: jax.Array,
    trees: Tree,
    ev: Evaluator,
    params,
    cfg: SearchConfig,
    n_rollouts: int,
    K: int,
    vl: float = 1.0,
) -> Tree:
    """``n_rollouts`` leaf-parallel rollouts (scan of ceil(n/K) K-steps).

    ``n_rollouts`` should be a multiple of ``K`` (serving chunks are);
    otherwise the count rounds up to the next step boundary."""
    steps = -(-n_rollouts // K)

    def body(t, r):
        return search_step_k(r, t, ev, params, cfg, K, vl), None

    trees, _ = jax.lax.scan(body, trees, jax.random.split(rng, steps))
    return trees
