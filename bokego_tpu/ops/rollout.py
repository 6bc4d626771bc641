"""Pallas TPU kernel: fused PUCT descend + backprop, in place.

The rollout hot loop reads one ``pstats`` row per tree level (PUCT over the
81 actions) and, on the way back, increments (N, W) at the traversed edges.
XLA executes this as scattered gathers plus batched scatters — and a batched
scatter on TPU materializes a full copy of the (hundreds of MB) stats array
every rollout.  This kernel does the whole thing with per-tree row DMAs and
``input_output_aliases`` so the updates land in place: per rollout each tree
touches only ``depth`` rows (~KB), not the pool.

Scope: the no-simulation path (value-net leaf evaluation, the engine
default, boke.py:40-44).  The kernel performs descend + backprop and
reports each tree's leaf; leaf evaluation/expansion stays in XLA on the
(rare) eval steps.  The backprop uses the leaf's *current* cached value
(0 if not yet evaluated) — identical to the XLA path under
``eval_every > 1`` semantics (see config.SearchConfig.eval_every).

Correctness is tested against the XLA path in interpret mode on CPU
(tests/test_rollout_kernel.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bokego_tpu.search.tree import (
    C_CHILD,
    C_N,
    C_PRIOR,
    C_TERM,
    C_WQ,
    C_WV,
    CH_PAD,
    LANE_PAD,
)


class KernelDescent(NamedTuple):
    leaf: jnp.ndarray  # (B,) int32
    leaf_n: jnp.ndarray  # (B,) f32 — leaf's edge visit count (pre-increment)
    leaf_val: jnp.ndarray  # (B,) f32 — cached leaf value, NaN -> 0
    leaf_unvalued: jnp.ndarray  # (B,) f32 — 1.0 where value was NaN
    depth: jnp.ndarray  # (B,) int32
    leaf_terminal: jnp.ndarray  # (B,) f32 — 1.0 where the leaf is terminal
    # (from the parent row's C_TERM plane; 0 for depth-0 roots — the caller
    # supplies root terminality)


def _kernel(
    root_ref,  # scalar prefetch: (B,) int32 roots
    pstats_hbm,  # (B, N, 8, 128) f32 in ANY/HBM (aliased output)
    value_hbm,  # (B, N) f32 in ANY/HBM
    pstats_out,  # aliased with pstats_hbm
    res_out,  # (B, 128) f32 in ANY/HBM: lanes [leaf, depth, n, val, unval]
    rows,  # VMEM scratch (L, TB, 8, 128) f32
    value_rows,  # VMEM scratch (TB, N) f32
    stage,  # VMEM scratch (TB, 128) f32
    sems,  # DMA sems (TB,)
    vsems,  # DMA sems (TB,)
    *,
    tb: int,
    levels: int,
    c: float,
    w: float,
    use_value: bool,
    interpret: bool,
):
    prog = pl.program_id(0)
    b0 = prog * tb

    if interpret:
        # Interpret mode does not honor input_output_aliases: materialize
        # each tree's untouched rows into the output first.  On hardware the
        # two refs are one buffer and this copy is skipped.
        for t in range(tb):
            pltpu.make_async_copy(
                pstats_hbm.at[b0 + t], pstats_out.at[b0 + t], sems.at[t]
            ).start()
        for t in range(tb):
            pltpu.make_async_copy(
                pstats_hbm.at[b0 + t], pstats_out.at[b0 + t], sems.at[t]
            ).wait()

    cur_vec = jnp.stack([root_ref[b0 + t] for t in range(tb)]).astype(jnp.int32)
    active = jnp.ones((tb,), jnp.bool_)
    depth = jnp.zeros((tb,), jnp.int32)
    leaf_n = jnp.zeros((tb,), jnp.float32)
    leaf_term = jnp.zeros((tb,), jnp.float32)
    iota_lane = jax.lax.broadcasted_iota(jnp.int32, (tb, LANE_PAD), 1)

    # Prefetch the block's value rows (contiguous trees -> one DMA).
    pltpu.make_async_copy(
        value_hbm.at[pl.ds(b0, tb)], value_rows, vsems.at[0]
    ).start()

    node_hist: list[jnp.ndarray] = []  # node whose row was loaded per level
    act_hist: list[jnp.ndarray] = []  # action chosen per level

    for i in range(levels):
        # Load the current node's row for every tree in the block.
        for t in range(tb):
            pltpu.make_async_copy(
                pstats_hbm.at[b0 + t, cur_vec[t]], rows.at[i, t], sems.at[t]
            ).start()
        for t in range(tb):
            pltpu.make_async_copy(
                pstats_hbm.at[b0 + t, cur_vec[t]], rows.at[i, t], sems.at[t]
            ).wait()

        row = rows[i]  # (TB, 8, 128) channel planes
        kids = row[:, C_CHILD, :]  # (TB, 128); lanes >= 81 pad with -1
        valid = kids >= 0
        nf = row[:, C_N, :]
        avg = jnp.where(
            nf > 0,
            ((1.0 - w) * row[:, C_WQ, :] + w * row[:, C_WV, :])
            / jnp.maximum(nf, 1.0),
            0.0,
        )
        total = jnp.maximum(jnp.sum(jnp.where(valid, nf, 0.0), axis=1), 1.0)
        score = -avg + c * row[:, C_PRIOR, :] * jnp.sqrt(total)[:, None] / (1.0 + nf)
        score = jnp.where(valid, score, -jnp.inf)
        # lowest-index tie-break, matching XLA argmax semantics: Mosaic's
        # lane-reduce argmax resolves exact ties (equal priors at N=0)
        # differently, which forked the search from the XLA path on
        # hardware (measured by tools/check_kernel_parity_tpu.py)
        mx = jnp.max(score, axis=1)
        best_a = jnp.min(
            jnp.where(score == mx[:, None], iota_lane, score.shape[1]), axis=1
        ).astype(jnp.int32)  # (TB,)
        onehot = iota_lane == best_a[:, None]
        picked_child = jnp.sum(jnp.where(onehot, kids, 0.0), axis=1).astype(
            jnp.int32
        )
        picked_n = jnp.sum(jnp.where(onehot, nf, 0.0), axis=1)
        picked_t = jnp.sum(jnp.where(onehot, row[:, C_TERM, :], 0.0), axis=1)

        internal = jnp.any(valid, axis=1) & active
        node_hist.append(cur_vec)
        act_hist.append(jnp.where(internal, best_a, 0))
        cur_vec = jnp.where(internal, picked_child, cur_vec)
        leaf_n = jnp.where(internal, picked_n, leaf_n)
        leaf_term = jnp.where(internal, picked_t, leaf_term)
        depth = jnp.where(internal, depth + 1, depth)
        active = internal

    # Leaf value lookup from the prefetched value rows.
    pltpu.make_async_copy(
        value_hbm.at[pl.ds(b0, tb)], value_rows, vsems.at[0]
    ).wait()
    n_pool = value_rows.shape[1]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (tb, n_pool), 1)
    vsel = jnp.sum(
        jnp.where(iota_n == cur_vec[:, None], value_rows[...], 0.0), axis=1
    )
    unval = jnp.isnan(vsel)
    v = jnp.where(unval, 0.0, vsel)

    # Backprop: level i's row holds the edge to node (i+1); sign is
    # (-1)^(depth - (i+1)) from that node's to-move perspective
    # (MCTS._backpropagate, reference mcts.py:208-217).
    if use_value:
        for i in range(levels):
            upd = i < depth  # (TB,)
            sign = jnp.where((depth - i - 1) % 2 == 0, 1.0, -1.0)
            onehot = iota_lane == act_hist[i][:, None]
            mask = upd[:, None] & onehot
            rown = rows[i, :, C_N, :] + jnp.where(mask, 1.0, 0.0)
            rowv = rows[i, :, C_WV, :] + jnp.where(
                mask, sign[:, None] * v[:, None], 0.0
            )
            rows[i, :, C_N, :] = rown
            rows[i, :, C_WV, :] = rowv
    else:
        for i in range(levels):
            upd = i < depth
            onehot = iota_lane == act_hist[i][:, None]
            mask = upd[:, None] & onehot
            rows[i, :, C_N, :] = rows[i, :, C_N, :] + jnp.where(mask, 1.0, 0.0)

    # Write the touched rows back in place (pstats_out aliases pstats_hbm
    # on hardware).
    for i in range(levels):
        for t in range(tb):
            @pl.when(i < depth[t])
            def _():
                pltpu.make_async_copy(
                    rows.at[i, t], pstats_out.at[b0 + t, node_hist[i][t]], sems.at[t]
                ).start()
        for t in range(tb):
            @pl.when(i < depth[t])
            def _():
                pltpu.make_async_copy(
                    rows.at[i, t], pstats_out.at[b0 + t, node_hist[i][t]], sems.at[t]
                ).wait()

    lane0 = iota_lane == 0
    res = jnp.where(lane0, cur_vec.astype(jnp.float32)[:, None], 0.0)
    res = jnp.where(iota_lane == 1, depth.astype(jnp.float32)[:, None], res)
    res = jnp.where(iota_lane == 2, leaf_n[:, None], res)
    res = jnp.where(iota_lane == 3, v[:, None], res)
    res = jnp.where(iota_lane == 4, unval.astype(jnp.float32)[:, None], res)
    res = jnp.where(iota_lane == 5, leaf_term[:, None], res)
    stage[...] = res
    pltpu.make_async_copy(stage, res_out.at[pl.ds(b0, tb), :], sems.at[0]).start()
    pltpu.make_async_copy(stage, res_out.at[pl.ds(b0, tb), :], sems.at[0]).wait()


@functools.partial(
    jax.jit,
    static_argnames=("c", "w", "use_value", "levels", "tb", "interpret"),
)
def descend_backprop(
    pstats: jnp.ndarray,  # (B, N, 81, 5) f32
    value: jnp.ndarray,  # (B, N) f32
    root: jnp.ndarray,  # (B,) int32
    *,
    c: float,
    w: float,
    use_value: bool = True,
    levels: int = 8,
    tb: int = 8,
    interpret: bool = False,
) -> tuple[jnp.ndarray, KernelDescent]:
    """Run one fused rollout (descend + in-place backprop) on every tree.

    Returns (new_pstats, KernelDescent).  The caller applies the root's own
    stat update (root_stats) and any leaf evaluation/expansion.
    """
    B, n_pool = pstats.shape[0], pstats.shape[1]
    assert B % tb == 0, (B, tb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((levels, tb, CH_PAD, LANE_PAD), jnp.float32),
            pltpu.VMEM((tb, n_pool), jnp.float32),
            pltpu.VMEM((tb, LANE_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA((tb,)),
            pltpu.SemaphoreType.DMA((tb,)),
        ],
    )
    kernel = functools.partial(
        _kernel, tb=tb, levels=levels, c=c, w=w, use_value=use_value,
        interpret=interpret,
    )
    out_shapes = [
        jax.ShapeDtypeStruct(pstats.shape, pstats.dtype),
        jax.ShapeDtypeStruct((B, 128), jnp.float32),
    ]
    new_pstats, res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases={1: 0},  # pstats (first tensor input) -> out 0
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(root, pstats, value)
    return new_pstats, KernelDescent(
        leaf=res[:, 0].astype(jnp.int32),
        leaf_n=res[:, 2],
        leaf_val=res[:, 3],
        leaf_unvalued=res[:, 4],
        depth=res[:, 1].astype(jnp.int32),
        leaf_terminal=res[:, 5],
    )


# ---------------------------------------------------------------------------
# In-place parent-row write (expansion's pstats update without the pool copy).


def _write_rows_kernel(
    node_ref,  # scalar prefetch (B,) int32 target rows
    mask_ref,  # scalar prefetch (B,) int32 write flags
    pstats_hbm,  # (B, N, 8, 128) f32 ANY (aliased)
    rows_in,  # (TB, 8, 128) f32 VMEM block
    pstats_out,  # aliased with pstats_hbm
    sems,
    *,
    tb: int,
    interpret: bool,
):
    prog = pl.program_id(0)
    b0 = prog * tb
    if interpret:
        for t in range(tb):
            pltpu.make_async_copy(
                pstats_hbm.at[b0 + t], pstats_out.at[b0 + t], sems.at[t]
            ).start()
        for t in range(tb):
            pltpu.make_async_copy(
                pstats_hbm.at[b0 + t], pstats_out.at[b0 + t], sems.at[t]
            ).wait()
    for t in range(tb):
        @pl.when(mask_ref[b0 + t] != 0)
        def _():
            pltpu.make_async_copy(
                rows_in.at[t], pstats_out.at[b0 + t, node_ref[b0 + t]], sems.at[t]
            ).start()
    for t in range(tb):
        @pl.when(mask_ref[b0 + t] != 0)
        def _():
            pltpu.make_async_copy(
                rows_in.at[t], pstats_out.at[b0 + t, node_ref[b0 + t]], sems.at[t]
            ).wait()


@functools.partial(jax.jit, static_argnames=("tb", "interpret"))
def write_rows(
    pstats: jnp.ndarray,  # (B, N, 8, 128) f32
    node: jnp.ndarray,  # (B,) int32
    rows: jnp.ndarray,  # (B, 8, 128) f32
    mask: jnp.ndarray,  # (B,) bool
    *,
    tb: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """pstats[b, node[b]] = rows[b] where mask — in place via aliasing."""
    B = pstats.shape[0]
    assert B % tb == 0, (B, tb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tb, CH_PAD, LANE_PAD), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.SemaphoreType.DMA((tb,))],
    )
    kernel = functools.partial(_write_rows_kernel, tb=tb, interpret=interpret)
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(pstats.shape, pstats.dtype)],
        input_output_aliases={2: 0},  # pstats (first tensor input)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(node, mask.astype(jnp.int32), pstats, rows)
    return out
