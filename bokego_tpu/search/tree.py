"""Array-based search tree: preallocated node pools in HBM.

Replaces the reference's object-graph tree — ``Go_MCTS`` nodes deepcopied
per move (mcts.py:340-346) and hash-keyed ``Q/N/V/children`` dicts
(mcts.py:50-53) — with struct-of-arrays node pools that live on device and
are advanced by gather/scatter.  One ``Tree`` is a fixed pool of
``max_nodes`` slots; thousands of trees batch along a leading axis via
``jax.vmap`` (cold paths) or batch-level gathers (hot paths, see mcts.py).

Layout notes (TPU-measured): a batched dynamic-index scatter materializes a
full copy of its target array, so the per-rollout write set is packed into
the fewest/smallest arrays possible —

* ``stats f32[max_nodes, 3]`` holds (visits, W_sim, W_value) so backprop is
  ONE scatter-add;
* ``value`` uses NaN for "not yet evaluated" (merging the reference's
  ``_val_cache`` membership test into the cached value itself);
* ``children`` is int16 (pool capacity < 32768);
* node states / parent / action / prior / flags are written only during
  expansion, which the search gates to rare steps.

Known divergences from the reference (documented; see SURVEY.md §7 risks):

* The reference merges transpositions across the whole tree because its
  stat dicts key on position equality (mcts.py:294-298).  Array trees are
  path-trees; identical positions reached by different orders keep separate
  stats.
* ``choose`` ties break toward the lowest action index instead of Python
  set iteration order.
* When the node pool is full, expansion is skipped (the search keeps
  sampling value estimates from existing leaves); the reference grows
  without bound.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from bokego_tpu.coords import NN
from bokego_tpu.env import rules
from bokego_tpu.env.state import GoState

NULL = jnp.int16(-1)


@struct.dataclass
class Tree:
    """A fixed-capacity search tree (one game). Batched via vmap."""

    nodes: GoState  # (max_nodes, ...) — position at each node
    parent: jnp.ndarray  # int32[max_nodes]
    action: jnp.ndarray  # int32[max_nodes] — move that led here
    children: jnp.ndarray  # int16[max_nodes, 81] — node index or -1
    prior: jnp.ndarray  # float32[max_nodes] — policy prior of own action
    stats: jnp.ndarray  # float32[max_nodes, 3] — (N, W_sim, W_value)
    value: jnp.ndarray  # float32[max_nodes] — cached leaf value; NaN unknown
    expanded: jnp.ndarray  # bool[max_nodes]
    terminal: jnp.ndarray  # bool[max_nodes]
    n_nodes: jnp.ndarray  # int32 — allocation pointer
    root: jnp.ndarray  # int32 — current root index

    @property
    def capacity(self) -> int:
        return self.parent.shape[-1]

    # Compatibility views (reference names: N / Q / V dicts, mcts.py:50-53).
    @property
    def visits(self) -> jnp.ndarray:
        return self.stats[..., 0].astype(jnp.int32)

    @property
    def wq(self) -> jnp.ndarray:
        return self.stats[..., 1]

    @property
    def wv(self) -> jnp.ndarray:
        return self.stats[..., 2]

    @property
    def val_known(self) -> jnp.ndarray:
        return ~jnp.isnan(self.value)


def empty_tree(root_state: GoState, max_nodes: int, max_turns: int) -> Tree:
    """Fresh pool with the root at slot 0 (children not yet expanded)."""
    nodes = jax.tree.map(
        lambda x: jnp.zeros((max_nodes,) + x.shape, x.dtype), root_state
    )
    nodes = jax.tree.map(lambda pool, v: pool.at[0].set(v), nodes, root_state)
    return Tree(
        nodes=nodes,
        parent=jnp.full((max_nodes,), -1, jnp.int32),
        action=jnp.full((max_nodes,), -1, jnp.int32),
        children=jnp.full((max_nodes, NN), NULL, jnp.int16),
        prior=jnp.zeros((max_nodes,), jnp.float32),
        stats=jnp.zeros((max_nodes, 3), jnp.float32),
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


def expand(
    tree: Tree,
    node: jnp.ndarray,
    probs: jnp.ndarray,
    need: jnp.ndarray,
    branch_num: int | None,
    max_turns: int,
) -> Tree:
    """Create child nodes for every legal point move of ``node``.

    Mirrors ``MCTS._expand`` + ``Go_MCTS.find_children`` (mcts.py:185-192,
    309-317): all legal point moves (PASS is never a tree edge), optionally
    restricted to the top-``branch_num`` prior moves.  No-op when ``need``
    is False, the node is terminal, or the pool lacks room.  Slot
    allocation is compacted (one slot per legal child); freshly allocated
    slots rely on pool defaults for stats (0) and value (NaN) — slots are
    never reused within a tree's lifetime.
    """
    state = get_state(tree, node)
    csts, legal = rules.child_states(state)
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
    return tree.replace(
        nodes=nodes,
        parent=tree.parent.at[slots].set(node, mode="drop"),
        action=tree.action.at[slots].set(jnp.arange(NN), mode="drop"),
        children=tree.children.at[node].set(
            jnp.where(
                did,
                jnp.where(write, slots, -1),
                tree.children[node],
            ).astype(jnp.int16)
        ),
        prior=tree.prior.at[slots].set(probs, mode="drop"),
        expanded=tree.expanded.at[node].set(tree.expanded[node] | did),
        terminal=tree.terminal.at[slots].set(child_terminal, mode="drop"),
        n_nodes=jnp.where(did, tree.n_nodes + count, tree.n_nodes),
    )


def set_leaf_value(tree: Tree, node: jnp.ndarray, val: jnp.ndarray) -> Tree:
    """Cache the value-net output at first visit (the reference's
    ``_val_cache``, mcts.py:42,393-403)."""
    old = tree.value[node]
    new = jnp.where(jnp.isnan(old), val, old)
    return tree.replace(value=tree.value.at[node].set(new))
