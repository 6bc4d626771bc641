"""Array-based search tree: preallocated node pools in HBM.

Replaces the reference's object-graph tree — ``Go_MCTS`` nodes deepcopied
per move (mcts.py:340-346) and hash-keyed ``Q/N/V/children`` dicts
(mcts.py:50-53) — with struct-of-arrays node pools that live on device and
are advanced by gather/scatter.  One ``Tree`` is a fixed pool of
``max_nodes`` slots; thousands of trees batch along a leading axis via
``jax.vmap``.

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

NULL = jnp.int32(-1)


@struct.dataclass
class Tree:
    """A fixed-capacity search tree (one game). Batched via vmap."""

    nodes: GoState  # (max_nodes, ...) — position at each node
    parent: jnp.ndarray  # int32[max_nodes]
    action: jnp.ndarray  # int32[max_nodes] — move that led here
    children: jnp.ndarray  # int32[max_nodes, 81] — node index or -1
    prior: jnp.ndarray  # float32[max_nodes] — policy prior of own action
    visits: jnp.ndarray  # int32[max_nodes] — N
    wq: jnp.ndarray  # float32[max_nodes] — accumulated simulation rewards
    wv: jnp.ndarray  # float32[max_nodes] — accumulated value-net rewards
    value: jnp.ndarray  # float32[max_nodes] — cached leaf value (to-move POV)
    val_known: jnp.ndarray  # bool[max_nodes]
    expanded: jnp.ndarray  # bool[max_nodes]
    terminal: jnp.ndarray  # bool[max_nodes]
    n_nodes: jnp.ndarray  # int32 — allocation pointer
    root: jnp.ndarray  # int32 — current root index

    @property
    def capacity(self) -> int:
        return self.parent.shape[0]


def empty_tree(root_state: GoState, max_nodes: int, max_turns: int) -> Tree:
    """Fresh pool with the root at slot 0 (children not yet expanded)."""
    nodes = jax.tree.map(
        lambda x: jnp.zeros((max_nodes,) + x.shape, x.dtype), root_state
    )
    nodes = jax.tree.map(lambda pool, v: pool.at[0].set(v), nodes, root_state)
    return Tree(
        nodes=nodes,
        parent=jnp.full((max_nodes,), NULL, jnp.int32),
        action=jnp.full((max_nodes,), NULL, jnp.int32),
        children=jnp.full((max_nodes, NN), NULL, jnp.int32),
        prior=jnp.zeros((max_nodes,), jnp.float32),
        visits=jnp.zeros((max_nodes,), jnp.int32),
        wq=jnp.zeros((max_nodes,), jnp.float32),
        wv=jnp.zeros((max_nodes,), jnp.float32),
        value=jnp.zeros((max_nodes,), jnp.float32),
        val_known=jnp.zeros((max_nodes,), bool),
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
    is False or the pool lacks room.  Slot allocation is compacted (one slot
    per legal child).
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
            jnp.where(did, jnp.where(write, slots, NULL), tree.children[node])
        ),
        prior=tree.prior.at[slots].set(probs, mode="drop"),
        visits=tree.visits.at[slots].set(0, mode="drop"),
        wq=tree.wq.at[slots].set(0.0, mode="drop"),
        wv=tree.wv.at[slots].set(0.0, mode="drop"),
        value=tree.value.at[slots].set(0.0, mode="drop"),
        val_known=tree.val_known.at[slots].set(False, mode="drop"),
        expanded=tree.expanded.at[node].set(tree.expanded[node] | did),
        terminal=tree.terminal.at[slots].set(child_terminal, mode="drop"),
        n_nodes=jnp.where(did, tree.n_nodes + count, tree.n_nodes),
    )


def set_leaf_value(tree: Tree, node: jnp.ndarray, val: jnp.ndarray) -> Tree:
    """Cache the value-net output at first visit (the reference's
    ``_val_cache``, mcts.py:42,393-403)."""
    known = tree.val_known[node]
    return tree.replace(
        value=tree.value.at[node].set(jnp.where(known, tree.value[node], val)),
        val_known=tree.val_known.at[node].set(True),
    )
