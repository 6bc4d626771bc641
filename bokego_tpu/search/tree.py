"""Array-based search tree: preallocated node pools in HBM.

Replaces the reference's object-graph tree — ``Go_MCTS`` nodes deepcopied
per move (mcts.py:340-346) and hash-keyed ``Q/N/V/children`` dicts
(mcts.py:50-53) — with struct-of-arrays node pools advanced by
gather/scatter.  One ``Tree`` is a fixed pool of ``max_nodes`` slots;
thousands of trees batch along a leading axis.

Layout (TPU-measured design): all per-edge search state lives in
*per-parent rows* — ``pstats f32[max_nodes, 81, 5]`` holds, for each
(node, action): child visit count N, accumulated simulation reward W_sim,
accumulated value W_val, policy prior, and the child's node index (exact in
f32).  One contiguous row read serves a whole PUCT level (TPU's scattered
gathers are slow; row gathers are fast), and the Pallas rollout kernel
(ops/rollout.py) updates rows in place during backprop, avoiding the
full-array copies XLA materializes for batched scatters.  The root's own
stats (it has no parent edge) live in ``root_stats f32[3]``.

Known divergences from the reference (documented; see SURVEY.md §7 risks):

* The reference merges transpositions across the whole tree because its
  stat dicts key on position equality (mcts.py:294-296).  Array trees are
  path-trees; identical positions reached by different orders keep separate
  stats.
* ``choose`` ties break toward the lowest action index instead of Python
  set iteration order.
* When the node pool is full, expansion is skipped (the search keeps
  sampling value estimates from existing leaves); the reference grows
  without bound.  :func:`compact` reclaims every off-path slot at re-root
  (the reference's ``_prune``), so a served game only fills the pool if
  one move's LIVE subtree outgrows it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from bokego_tpu.coords import NN
from bokego_tpu.env import rules
from bokego_tpu.env.state import GoState

# pstats channel planes. Rows are stored TPU-tile-shaped: each node's row is
# an (8, 128) f32 block (channel planes x lane-padded actions) so the Pallas
# kernel can DMA single rows legally (Mosaic requires sliced trailing dims to
# be tile-aligned). Lanes >= 81 and planes >= 5 are padding; the child plane
# pads with -1 so "no child" masking covers them automatically.
C_N, C_WQ, C_WV, C_PRIOR, C_CHILD = 0, 1, 2, 3, 4
C_TERM = 5  # child-terminal flags (lets the rollout kernel compute the
# expansion-eligibility of the leaf it reaches without extra flag gathers)
NUM_CH = 6
CH_PAD = 8
LANE_PAD = 128
NO_CHILD = -1.0


@struct.dataclass
class Tree:
    """A fixed-capacity search tree (one game). Batched via a leading axis."""

    nodes: GoState  # (max_nodes, ...) — position at each node
    parent: jnp.ndarray  # int32[max_nodes]
    action: jnp.ndarray  # int32[max_nodes] — move that led here
    pstats: jnp.ndarray  # f32[max_nodes, 8, 128] — channel planes (N, Wq,
    # Wv, prior, child) x lane-padded actions (see CH_PAD/LANE_PAD above)
    root_stats: jnp.ndarray  # f32[3] — root's own (N, Wq, Wv)
    value: jnp.ndarray  # f32[max_nodes] — cached leaf value; NaN = unknown
    expanded: jnp.ndarray  # bool[max_nodes]
    terminal: jnp.ndarray  # bool[max_nodes]
    n_nodes: jnp.ndarray  # int32 — allocation pointer
    root: jnp.ndarray  # int32 — current root index

    @property
    def capacity(self) -> int:
        return self.parent.shape[-1]

    @property
    def children(self) -> jnp.ndarray:
        """int32[..., max_nodes, 81] child indices (-1 = none)."""
        return self.pstats[..., C_CHILD, :NN].astype(jnp.int32)

    @property
    def val_known(self) -> jnp.ndarray:
        return ~jnp.isnan(self.value)

    @property
    def visits(self) -> jnp.ndarray:
        """int32[..., max_nodes] per-node visit counts (root included)."""
        return _node_stat(self, C_N).astype(jnp.int32)

    @property
    def wq(self) -> jnp.ndarray:
        return _node_stat(self, C_WQ)

    @property
    def wv(self) -> jnp.ndarray:
        return _node_stat(self, C_WV)

    @property
    def node_prior(self) -> jnp.ndarray:
        """Per-node prior of the action that led to each node."""
        return _node_stat(self, C_PRIOR)


def _node_stat(tree: Tree, channel: int) -> jnp.ndarray:
    """(..., max_nodes) per-node stat gathered from parent rows."""
    p = jnp.maximum(tree.parent, 0)
    a = jnp.maximum(tree.action, 0)
    ch = tree.pstats[..., channel, :NN]  # (..., N, 81)
    p_full = jnp.broadcast_to(p[..., None], p.shape + (NN,))
    rows = jnp.take_along_axis(ch, p_full, axis=-2)  # (..., N, 81)
    vals = jnp.take_along_axis(rows, a[..., None], axis=-1)[..., 0]
    is_root = jnp.arange(tree.parent.shape[-1]) == tree.root[..., None]
    if channel <= C_WV:
        root_val = tree.root_stats[..., channel, None]
    else:
        root_val = jnp.zeros_like(vals[..., :1])  # root has no prior edge
    return jnp.where(is_root, root_val, jnp.where(tree.parent >= 0, vals, 0.0))


def empty_tree(root_state: GoState, max_nodes: int, max_turns: int) -> Tree:
    """Fresh pool with the root at slot 0 (children not yet expanded)."""
    nodes = jax.tree.map(
        lambda x: jnp.zeros((max_nodes,) + x.shape, x.dtype), root_state
    )
    nodes = jax.tree.map(lambda pool, v: pool.at[0].set(v), nodes, root_state)
    pstats = jnp.zeros((max_nodes, CH_PAD, LANE_PAD), jnp.float32)
    pstats = pstats.at[:, C_CHILD, :].set(NO_CHILD)
    return Tree(
        nodes=nodes,
        parent=jnp.full((max_nodes,), -1, jnp.int32),
        action=jnp.full((max_nodes,), -1, jnp.int32),
        pstats=pstats,
        root_stats=jnp.zeros((3,), jnp.float32),
        value=jnp.full((max_nodes,), jnp.nan, jnp.float32),
        expanded=jnp.zeros((max_nodes,), bool),
        terminal=jnp.zeros((max_nodes,), bool)
        .at[0]
        .set(rules.is_terminal(root_state, max_turns)),
        n_nodes=jnp.int32(1),
        root=jnp.int32(0),
    )


def get_state(tree: Tree, idx: jnp.ndarray) -> GoState:
    """Gather one node's position."""
    return jax.tree.map(lambda x: x[idx], tree.nodes)


def expand_core(
    tree: Tree,
    node: jnp.ndarray,
    probs: jnp.ndarray,
    need: jnp.ndarray,
    branch_num: int | None,
    max_turns: int,
    precomputed: tuple | None = None,
) -> tuple[Tree, jnp.ndarray, jnp.ndarray]:
    """Create child nodes for every legal point move of ``node``, except the
    parent-row (pstats) write — returns ``(tree, new_row, did)`` so the
    caller chooses how to land the row (XLA scatter or in-place kernel).

    Mirrors ``MCTS._expand`` + ``Go_MCTS.find_children`` (mcts.py:185-192,
    309-317): all legal point moves (PASS is never a tree edge), optionally
    restricted to the top-``branch_num`` prior moves.  No-op when ``need``
    is False, the node is terminal, or the pool lacks room.  Slot
    allocation is compacted; fresh slots rely on pool defaults (stats 0,
    value NaN) — slots are never reused within a tree's lifetime.
    """
    if precomputed is None:
        state = get_state(tree, node)
        # node hashes are never read by the search; skip the Zobrist reduce
        csts, legal = rules.child_states(state, with_hash=False)
    else:
        csts, legal = precomputed
    mask = legal[:NN]
    if branch_num is not None and 0 <= branch_num < NN:
        order = jnp.argsort(-probs)  # descending; stable => low index on ties
        topk = jnp.zeros((NN,), bool).at[order[:branch_num]].set(True)
        mask = mask & topk
    count = mask.sum(dtype=jnp.int32)
    room = tree.n_nodes + count <= tree.capacity
    need = need & ~tree.terminal[node]  # find_children -> {} when terminal
    write = mask & need & room
    rank = jnp.cumsum(write.astype(jnp.int32)) - 1
    slots = jnp.where(write, tree.n_nodes + rank, tree.capacity)  # OOB -> drop

    point_children = jax.tree.map(lambda x: x[:NN], csts)
    nodes = jax.tree.map(
        lambda pool, v: pool.at[slots].set(v, mode="drop"), tree.nodes, point_children
    )
    child_terminal = rules.is_terminal_batch(point_children, max_turns)

    did = need & room
    new_row = jnp.zeros((CH_PAD, LANE_PAD), jnp.float32)
    new_row = new_row.at[C_CHILD].set(NO_CHILD)
    new_row = new_row.at[C_PRIOR, :NN].set(probs)
    new_row = new_row.at[C_CHILD, :NN].set(
        jnp.where(write, slots.astype(jnp.float32), NO_CHILD)
    )
    new_row = new_row.at[C_TERM, :NN].set(child_terminal.astype(jnp.float32))
    # Masked writes use the OOB-index + mode="drop" form everywhere instead
    # of gather-old -> where(did, new, old) -> scatter-back: the axon TPU
    # backend MISCOMPILES the latter when fused under jit (a refused
    # expansion's row came back holding `slots` in the child plane, turning
    # "no children" into 81 phantom children pointing at the pool cap —
    # engine-level symptom: junk moves like A1/J9 from corrupted visit
    # rows).  Minimal repro: jit(empty_tree + expand) on a terminal root;
    # each half jitted separately is correct.
    exp_idx = jnp.where(did, node, tree.capacity)
    tree = tree.replace(
        nodes=nodes,
        parent=tree.parent.at[slots].set(node, mode="drop"),
        action=tree.action.at[slots].set(jnp.arange(NN), mode="drop"),
        expanded=tree.expanded.at[exp_idx].set(True, mode="drop"),
        terminal=tree.terminal.at[slots].set(child_terminal, mode="drop"),
        n_nodes=jnp.where(did, tree.n_nodes + count, tree.n_nodes),
    )
    return tree, new_row, did


def expand(
    tree: Tree,
    node: jnp.ndarray,
    probs: jnp.ndarray,
    need: jnp.ndarray,
    branch_num: int | None,
    max_turns: int,
) -> Tree:
    """:func:`expand_core` plus the parent-row write via an XLA scatter.

    NOTE (TPU): this scatter materializes a copy of the whole pstats pool;
    the search's kernel path uses :func:`bokego_tpu.ops.rollout.write_rows`
    to land the row in place instead.
    """
    tree, new_row, did = expand_core(tree, node, probs, need, branch_num, max_turns)
    # drop-write form, NOT where(did, new_row, old): see expand_core note
    idx = jnp.where(did, node, tree.capacity)
    return tree.replace(
        pstats=tree.pstats.at[idx].set(new_row, mode="drop")
    )


def reachable_from_root(tree: Tree) -> jnp.ndarray:
    """bool[max_nodes] — nodes in the *current* root's subtree.

    Pointer doubling over the parent array: give the root a self-loop, then
    square the ancestor map log2(max_nodes) times; chains through the root
    saturate at the root, all others (old ancestors, off-path subtrees,
    unallocated slots) saturate at -1.
    """
    n = tree.parent.shape[-1]
    idx = jnp.arange(n, dtype=jnp.int32)
    p = jnp.where(idx == tree.root, idx, tree.parent)

    def dbl(_, p):
        return jnp.where(p >= 0, jnp.take(p, jnp.maximum(p, 0)), -1)

    p = jax.lax.fori_loop(0, max(1, (n - 1).bit_length()), dbl, p)
    return p == tree.root


def compact(tree: Tree) -> Tree:
    """Move the current root's subtree to the pool head, freeing every
    off-path slot for reuse.

    The array-tree analog of the reference's ``_prune`` garbage collection
    (mcts.py:236-255): instead of deleting dict entries node by node, one
    permutation relabels the kept subtree into slots ``[0, k)`` and resets
    the rest to pool defaults (stats 0, child −1, value NaN) so expansion
    can re-allocate them.  Without this, a long served game under a bounded
    pool eventually exhausts it and the search freezes (DIVERGENCES.md §3).

    Identity-preserving: tree *structure* and all per-edge statistics are
    unchanged (only slot numbers move), so a search continued after
    compaction chooses exactly as one continued without it.
    """
    n = tree.parent.shape[-1]
    idx = jnp.arange(n, dtype=jnp.int32)
    keep = reachable_from_root(tree)
    # Kept nodes first, preserving relative order.  Children always allocate
    # after their parent (expand_core slots are monotonic), so the root is
    # the lowest kept index and lands at slot 0.
    order = jnp.argsort(~keep, stable=True).astype(jnp.int32)
    new_of_old = jnp.zeros(n, jnp.int32).at[order].set(idx)
    k = keep.sum(dtype=jnp.int32)
    fresh = idx >= k

    def take(x):
        return jnp.take(x, order, axis=0)

    parent = take(tree.parent)
    parent = jnp.where(
        parent >= 0, jnp.take(new_of_old, jnp.maximum(parent, 0)), -1
    )
    parent = jnp.where(fresh, -1, parent).astype(jnp.int32)
    pstats = take(tree.pstats)
    child = pstats[:, C_CHILD, :]
    remapped = jnp.where(
        child >= 0,
        jnp.take(new_of_old, jnp.maximum(child.astype(jnp.int32), 0)).astype(
            jnp.float32
        ),
        NO_CHILD,
    )
    pstats = pstats.at[:, C_CHILD, :].set(remapped)
    fresh_row = jnp.zeros((CH_PAD, LANE_PAD), jnp.float32).at[C_CHILD].set(NO_CHILD)
    pstats = jnp.where(fresh[:, None, None], fresh_row[None], pstats)
    return tree.replace(
        nodes=jax.tree.map(take, tree.nodes),
        parent=parent,
        action=jnp.where(fresh, -1, take(tree.action)).astype(jnp.int32),
        pstats=pstats,
        value=jnp.where(fresh, jnp.nan, take(tree.value)),
        expanded=jnp.where(fresh, False, take(tree.expanded)),
        terminal=jnp.where(fresh, False, take(tree.terminal)),
        n_nodes=k,
        root=jnp.take(new_of_old, tree.root),
    )


def set_leaf_value(tree: Tree, node: jnp.ndarray, val: jnp.ndarray) -> Tree:
    """Cache the value-net output at first visit (the reference's
    ``_val_cache``, mcts.py:42,393-403).

    Drop-write form, NOT where(isnan(old), val, old) scattered back: see
    the expand_core note on the axon jit-fusion miscompile."""
    idx = jnp.where(jnp.isnan(tree.value[node]), node, tree.capacity)
    return tree.replace(value=tree.value.at[idx].set(val, mode="drop"))
