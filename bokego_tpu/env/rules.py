"""Vectorized 9x9 Go rules: stepping, legality, liberties, scoring.

TPU-first redesign of the reference's string/flood-fill engine
(``bokego/go.py``).  Instead of per-move Python flood fills (go.py:375-438),
one *label propagation* pass computes every group's identity, size, and
liberty count for the whole board at once; every rules question (captures,
suicide, ko, legality of all 81 points, liberties-after-playing, capture
counts) then reduces to dense gathers/compares over those labels — no
data-dependent Python, everything ``jit``/``vmap``/``scan`` friendly.

Semantics match go.py exactly (see tests/test_rules.py for the oracle parity
harness):

* captures before suicide check (go.py:146-157),
* ko = single-stone capture where the played point was fully surrounded by
  the opponent (``possible_ko``, go.py:461-468; ko set at go.py:149-152),
* ko point forbidden for exactly one ply, cleared by any move/pass,
* Tromp-Taylor scoring by region reachability (go.py:202-218),
* incremental Zobrist updates (go.py:164-177).

All functions take a single board; batch with ``jax.vmap`` (wrappers at the
bottom).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bokego_tpu.coords import (
    DIAGONALS,
    NEIGHBORS,
    NN,
    NUM_DIAGONALS,
    PASS_ACTION,
)
from bokego_tpu.env import zobrist
from bokego_tpu.env.state import BLACK, EMPTY, NO_KO, WHITE, GoState

_NBRS = jnp.asarray(NEIGHBORS)  # (81, 4), off-board -> NN
_DIAGS = jnp.asarray(DIAGONALS)  # (81, 4), off-board -> NN
_N_DIAGS = jnp.asarray(NUM_DIAGONALS)  # (81,)
_ZTABLE = jnp.asarray(zobrist.TABLE)  # (3, 81, 2) uint32
_ZFLIP = jnp.asarray(zobrist.FLIP)  # (2,) uint32

_OFF = jnp.int8(-1)  # color value returned for off-board gathers
_NO_GROUP = NN  # label sentinel for empty / off-board


def _pad(v: jnp.ndarray, fill) -> jnp.ndarray:
    """Append a sentinel so gathers at index NN (off-board) are neutral."""
    return jnp.concatenate([v, jnp.asarray([fill], dtype=v.dtype)])


class GroupInfo(NamedTuple):
    """Per-point group facts. Empty points carry label NN and zeros."""

    labels: jnp.ndarray  # int32[81] — min point index of the group
    libs: jnp.ndarray  # int32[81] — liberties of the group at each stone
    sizes: jnp.ndarray  # int32[81] — stones in the group at each stone


def group_info(board: jnp.ndarray) -> GroupInfo:
    """Label all chains and count each chain's distinct liberties and size.

    Replaces per-group ``flood_fill``/``get_stone_lib`` (go.py:375-402) and
    the liberty cache ``Game.get_liberties`` (go.py:220-243): ``libs`` equals
    the reference's per-stone liberty list exactly.
    """
    stone = board != EMPTY
    iota = jnp.arange(NN, dtype=jnp.int32)
    init = jnp.where(stone, iota, _NO_GROUP)

    board_p = _pad(board, _OFF)
    nbr_color = board_p[_NBRS]  # (81, 4)
    same = stone[:, None] & (nbr_color == board[:, None])  # same-color adjacency

    def body(labels):
        lab_p = _pad(labels, _NO_GROUP)
        nbr_lab = jnp.where(same, lab_p[_NBRS], _NO_GROUP)
        return jnp.minimum(labels, nbr_lab.min(axis=1))

    def cond(carry):
        labels, prev = carry
        return jnp.any(labels != prev)

    def loop(carry):
        labels, _ = carry
        return body(labels), labels

    labels, _ = jax.lax.while_loop(cond, loop, (body(init), init))

    # Count each group's distinct liberties: every empty point contributes 1
    # to each *distinct* neighbouring group label.
    lab_p = _pad(labels, _NO_GROUP)
    e_nbr_lab = jnp.where((board == EMPTY)[:, None], lab_p[_NBRS], _NO_GROUP)
    # dedup the <=4 labels per empty point
    l0, l1, l2, l3 = (e_nbr_lab[:, k] for k in range(4))
    c0 = l0 != _NO_GROUP
    c1 = (l1 != _NO_GROUP) & (l1 != l0)
    c2 = (l2 != _NO_GROUP) & (l2 != l0) & (l2 != l1)
    c3 = (l3 != _NO_GROUP) & (l3 != l0) & (l3 != l1) & (l3 != l2)
    counts = jnp.zeros(NN + 1, dtype=jnp.int32)
    for lk, ck in ((l0, c0), (l1, c1), (l2, c2), (l3, c3)):
        counts = counts.at[lk].add(ck.astype(jnp.int32))
    libs = jnp.where(stone, counts[labels], 0)

    size_by_label = jnp.zeros(NN + 1, dtype=jnp.int32).at[labels].add(
        stone.astype(jnp.int32)
    )
    sizes = jnp.where(stone, size_by_label[labels], 0)
    return GroupInfo(labels=labels, libs=libs, sizes=sizes)


class MoveTables(NamedTuple):
    """Facts about playing at every point for the side to move.

    ``legal`` matches ``Game.get_legal_moves``/``is_legal`` (go.py:184-260);
    ``libs_after``/``caps`` match the feature-encoder loop (nnet.py:241-247).
    Values at illegal points are zeroed.
    """

    legal: jnp.ndarray  # bool[81]
    libs_after: jnp.ndarray  # int32[81] — own-group liberties after playing
    caps: jnp.ndarray  # int32[81] — opponent stones captured by playing
    info: GroupInfo


def move_tables(board: jnp.ndarray, ko: jnp.ndarray, color: jnp.ndarray) -> MoveTables:
    """Analyze all 81 candidate moves at once.

    For candidate p: the merged group is {p} ∪ (adjacent own chains) — chain
    membership comes from labels, so no per-candidate flood fill is needed.
    An adjacent opponent chain dies iff it had exactly one liberty (that
    liberty is necessarily p).  Liberties-after are counted on the
    post-capture board by dilating the merged-group mask — dense (81, 81)
    boolean algebra, MXU/VPU-friendly.
    """
    info = group_info(board)
    opp = jnp.where(color == BLACK, WHITE, BLACK).astype(board.dtype)
    empty = board == EMPTY

    board_p = _pad(board, _OFF)
    lab_p = _pad(info.labels, _NO_GROUP)
    libs_p = _pad(info.libs, 0)

    nbr_color = board_p[_NBRS]  # (81, 4)
    nbr_lab = lab_p[_NBRS]
    nbr_libs = libs_p[_NBRS]

    own_adj_lab = jnp.where(nbr_color == color, nbr_lab, _NO_GROUP)  # (81,4)
    dying_adj_lab = jnp.where(
        (nbr_color == opp) & (nbr_libs == 1), nbr_lab, _NO_GROUP
    )  # (81, 4)

    labels_q = info.labels[None, :, None]  # (1, 81, 1)
    # grp[p, q]: q belongs to the merged own group after playing at p
    grp = jnp.any(labels_q == own_adj_lab[:, None, :], axis=-1) & (
        board == color
    )[None, :]
    grp = grp | jnp.eye(NN, dtype=bool)
    # cap[p, q]: q is captured by playing at p
    cap = jnp.any(labels_q == dying_adj_lab[:, None, :], axis=-1) & (board == opp)[
        None, :
    ]
    caps = cap.sum(axis=1, dtype=jnp.int32)

    # Post-capture empties (excluding p itself), per candidate.
    empty_after = (empty[None, :] | cap) & ~jnp.eye(NN, dtype=bool)
    libs_after = (empty_after & _dilate_rows(grp)).sum(axis=1, dtype=jnp.int32)

    legal = empty & (libs_after > 0)
    legal = legal & (jnp.arange(NN) != ko)
    return MoveTables(
        legal=legal,
        libs_after=jnp.where(legal, libs_after, 0),
        caps=jnp.where(legal, caps, 0),
        info=info,
    )


def _dilate_rows(m: jnp.ndarray) -> jnp.ndarray:
    """4-neighbour dilation of each row of a (..., 81) boolean mask."""
    g = m.reshape(m.shape[:-1] + (9, 9))
    z = jnp.zeros_like(g[..., :1, :])
    up = jnp.concatenate([g[..., 1:, :], z], axis=-2)
    dn = jnp.concatenate([z, g[..., :-1, :]], axis=-2)
    zc = jnp.zeros_like(g[..., :, :1])
    lf = jnp.concatenate([g[..., :, 1:], zc], axis=-1)
    rt = jnp.concatenate([zc, g[..., :, :-1]], axis=-1)
    out = m.reshape(g.shape) | up | dn | lf | rt
    return out.reshape(m.shape)


def legal_mask(state: GoState) -> jnp.ndarray:
    """bool[82] — legality of each point plus PASS (always legal)."""
    mt = move_tables(state.board, state.ko, state.to_play)
    return jnp.concatenate([mt.legal, jnp.ones((1,), dtype=bool)])


def step(state: GoState, action: jnp.ndarray) -> GoState:
    """Apply an action (0..80 point, 81 pass) for the side to move.

    Pure-array equivalent of ``Game.play_move``/``play_pass``
    (go.py:109-182), including the incremental Zobrist update.  Feeding an
    illegal action leaves the position unchanged and latches ``invalid``
    (device-side stand-in for ``IllegalMove``).
    """
    board, ko, turn = state.board, state.ko, state.turn
    color = state.to_play
    opp = jnp.where(color == BLACK, WHITE, BLACK).astype(board.dtype)
    is_pass = action == PASS_ACTION
    in_range = (action >= 0) & (action < NN)
    p = jnp.where(in_range, action, 0)  # safe gather index

    info = group_info(board)
    board_p = _pad(board, _OFF)
    lab_p = _pad(info.labels, _NO_GROUP)
    libs_p = _pad(info.libs, 0)

    nbrs = _NBRS[p]  # (4,)
    nbr_color = board_p[nbrs]
    nbr_lab = lab_p[nbrs]
    nbr_libs = libs_p[nbrs]
    off = nbr_color == _OFF

    dying_lab = jnp.where((nbr_color == opp) & (nbr_libs == 1), nbr_lab, _NO_GROUP)
    captured = (board == opp) & jnp.any(
        info.labels[:, None] == dying_lab[None, :], axis=1
    )
    n_captured = captured.sum(dtype=jnp.int32)

    # Legality (equivalent to go.py:137-157: occupancy, ko, suicide).
    empty_nbr = jnp.any(nbr_color == EMPTY)
    joins_live = jnp.any((nbr_color == color) & (nbr_libs >= 2))
    legal_point = (
        in_range
        & (board_p[p] == EMPTY)
        & (p != ko)
        & (empty_nbr | (n_captured > 0) | joins_live)
    )

    # possible_ko (go.py:461-468): every on-board neighbour is the opponent.
    surrounded_by_opp = jnp.all(off | (nbr_color == opp))
    cap_idx = jnp.argmax(captured).astype(jnp.int32)
    new_ko = jnp.where((n_captured == 1) & surrounded_by_opp, cap_idx, NO_KO)

    new_board = jnp.where(captured, EMPTY, board.at[p].set(color))

    # Incremental Zobrist (go.py:164-177), vectorized XOR-reduce.
    me, them = (turn % 2).astype(jnp.int32), ((turn + 1) % 2).astype(jnp.int32)
    h = state.hash ^ _ZTABLE[me, p]
    h = h ^ jnp.where(ko != NO_KO, _ZTABLE[2, jnp.maximum(ko, 0)], 0)
    h = h ^ jnp.where(new_ko != NO_KO, _ZTABLE[2, jnp.maximum(new_ko, 0)], 0)
    cap_xor = jax.lax.reduce(
        jnp.where(captured[:, None], _ZTABLE[them], 0),
        jnp.uint32(0),
        jax.lax.bitwise_xor,
        (0,),
    )
    h = h ^ cap_xor ^ _ZFLIP

    # Pass branch (go.py:109-121; ko removal fixed to the ko plane).
    h_pass = state.hash ^ jnp.where(ko != NO_KO, _ZTABLE[2, jnp.maximum(ko, 0)], 0)
    h_pass = h_pass ^ _ZFLIP

    ok = is_pass | legal_point
    return GoState(
        board=jnp.where(is_pass | ~ok, board, new_board),
        ko=jnp.where(~ok, ko, jnp.where(is_pass, NO_KO, new_ko)).astype(jnp.int32),
        turn=jnp.where(ok, turn + 1, turn),
        last_move=jnp.where(ok, action, state.last_move).astype(jnp.int32),
        hash=jnp.where(~ok, state.hash, jnp.where(is_pass, h_pass, h)),
        komi=state.komi,
        invalid=state.invalid | ~ok,
    )


def area_colors(board: jnp.ndarray) -> jnp.ndarray:
    """int8[81] Tromp-Taylor area assignment per point: BLACK, WHITE, or
    EMPTY (neutral dame / shared regions).

    Empty regions are assigned by reachability: an empty point counts for a
    color iff it reaches that color and not the other (go.py:202-218).
    """
    empty = board == EMPTY
    reach_b = board == BLACK
    reach_w = board == WHITE

    def cond(carry):
        rb, rw, prev_rb, prev_rw = carry
        return jnp.any(rb != prev_rb) | jnp.any(rw != prev_rw)

    def loop(carry):
        rb, rw, _, _ = carry
        nrb = rb | (_dilate_rows(rb) & empty)
        nrw = rw | (_dilate_rows(rw) & empty)
        return nrb, nrw, rb, rw

    init = (
        reach_b | (_dilate_rows(reach_b) & empty),
        reach_w | (_dilate_rows(reach_w) & empty),
        reach_b,
        reach_w,
    )
    rb, rw, _, _ = jax.lax.while_loop(cond, loop, init)

    b_pts = (board == BLACK) | (empty & rb & ~rw)
    w_pts = (board == WHITE) | (empty & rw & ~rb)
    return jnp.where(b_pts, BLACK, jnp.where(w_pts, WHITE, EMPTY)).astype(
        jnp.int8
    )


def score(state: GoState) -> jnp.ndarray:
    """Tromp-Taylor area score, black minus (white + komi) (go.py:202-218)."""
    colors = area_colors(state.board)
    b_area = (colors == BLACK).sum(dtype=jnp.float32)
    w_area = (colors == WHITE).sum(dtype=jnp.float32)
    return b_area - w_area - state.komi


def eye_colors(board: jnp.ndarray) -> jnp.ndarray:
    """int8[81] — ``possible_eye`` for every point (0 if not an eye).

    Fixed-diagonals version of go.py:470-485 (the reference's DIAGONALS table
    is buggy — see coords._build_diagonals).  A point is a c-eye iff all
    on-board neighbours are color c and at most one "fault": off-board
    diagonal deficit counts as one fault, each diagonal holding the opponent
    counts as one.
    """
    board_p = _pad(board, _OFF)
    nbr_color = board_p[_NBRS]  # (81, 4)
    off = nbr_color == _OFF
    empty = board == EMPTY

    def for_color(c):
        c = jnp.int8(c)
        surrounded = empty & jnp.all(off | (nbr_color == c), axis=1) & jnp.any(
            ~off, axis=1
        )
        diag_color = board_p[_DIAGS]
        diag_off = diag_color == _OFF
        faults = (_N_DIAGS < 4).astype(jnp.int32) + (
            ~diag_off & (diag_color != c) & (diag_color != EMPTY)
        ).sum(axis=1, dtype=jnp.int32)
        return surrounded & (faults <= 1)

    is_b = for_color(BLACK)
    is_w = for_color(WHITE)
    return jnp.where(is_b, BLACK, jnp.where(is_w, WHITE, EMPTY)).astype(jnp.int8)


def is_terminal(state: GoState, max_turns: int) -> jnp.ndarray:
    """Game over when past max_turns or the last move was a pass
    (``Go_MCTS.is_game_over``, mcts.py:362-364)."""
    return (state.turn > max_turns) | (state.last_move == PASS_ACTION)


def child_states(
    state: GoState, with_hash: bool = True
) -> tuple[GoState, jnp.ndarray]:
    """All 82 successor positions of ``state`` in one pass.

    Returns ``(children, legal)`` where ``children`` is a GoState with a
    leading axis of 82 (index 81 = pass successor) and ``legal`` is bool[82].
    Replaces ``Go_MCTS.find_children``'s deepcopy-per-move loop
    (mcts.py:309-317, 340-346): captures, ko, and incremental Zobrist hashes
    for every candidate move come from one :func:`move_tables` analysis.
    Rows at illegal points carry garbage (masked by ``legal``).

    ``with_hash=False`` skips the per-child Zobrist XOR-reduce (search trees
    never read node hashes; anything that needs hashes steps via
    :func:`step`) and leaves the hash fields zeroed.
    """
    board, ko, turn = state.board, state.ko, state.turn
    color = state.to_play
    opp = jnp.where(color == BLACK, WHITE, BLACK).astype(board.dtype)

    info = group_info(board)
    board_p = _pad(board, _OFF)
    lab_p = _pad(info.labels, _NO_GROUP)
    libs_p = _pad(info.libs, 0)
    nbr_color = board_p[_NBRS]  # (81, 4)
    nbr_lab = lab_p[_NBRS]
    nbr_libs = libs_p[_NBRS]
    off = nbr_color == _OFF

    dying_adj_lab = jnp.where(
        (nbr_color == opp) & (nbr_libs == 1), nbr_lab, _NO_GROUP
    )  # (81, 4)
    labels_q = info.labels[None, :, None]
    cap = jnp.any(labels_q == dying_adj_lab[:, None, :], axis=-1) & (board == opp)[
        None, :
    ]  # (81, 81): cap[a, q] — q captured by playing at a
    n_caps = cap.sum(axis=1, dtype=jnp.int32)  # (81,)

    own_adj_lab = jnp.where(nbr_color == color, nbr_lab, _NO_GROUP)
    grp = jnp.any(labels_q == own_adj_lab[:, None, :], axis=-1) & (board == color)[
        None, :
    ]
    grp = grp | jnp.eye(NN, dtype=bool)
    empty_after = ((board == EMPTY)[None, :] | cap) & ~jnp.eye(NN, dtype=bool)
    libs_after = (empty_after & _dilate_rows(grp)).sum(axis=1, dtype=jnp.int32)
    legal_pt = (board == EMPTY) & (libs_after > 0) & (jnp.arange(NN) != ko)

    # Successor boards: place the stone, clear captures.
    placed = jnp.where(
        jnp.eye(NN, dtype=bool), color, board[None, :]
    ).astype(board.dtype)
    new_boards = jnp.where(cap, EMPTY, placed)  # (81, 81)

    # Ko per candidate (go.py:146-152).
    surrounded = jnp.all(off | (nbr_color == opp), axis=1)  # (81,)
    cap_idx = jnp.argmax(cap, axis=1).astype(jnp.int32)
    new_ko = jnp.where((n_caps == 1) & surrounded, cap_idx, NO_KO)

    # Hashes (go.py:164-177).
    if with_hash:
        me, them = (turn % 2).astype(jnp.int32), ((turn + 1) % 2).astype(jnp.int32)
        h = state.hash[None, :] ^ _ZTABLE[me]  # (81, 2): ^= table[me][a]
        h = h ^ jnp.where(ko != NO_KO, _ZTABLE[2, jnp.maximum(ko, 0)], 0)[None, :]
        ko_term = jnp.where(
            (new_ko != NO_KO)[:, None], _ZTABLE[2, jnp.maximum(new_ko, 0)], 0
        )
        cap_xor = jax.lax.reduce(
            jnp.where(cap[:, :, None], _ZTABLE[them][None, :, :], 0),
            jnp.uint32(0),
            jax.lax.bitwise_xor,
            (1,),
        )  # (81, 2)
        h = h ^ ko_term ^ cap_xor ^ _ZFLIP[None, :]

        # Pass successor (go.py:109-121).
        h_pass = state.hash ^ jnp.where(
            ko != NO_KO, _ZTABLE[2, jnp.maximum(ko, 0)], 0
        )
        h_pass = h_pass ^ _ZFLIP
    else:
        h = jnp.zeros((NN, 2), jnp.uint32)
        h_pass = jnp.zeros((2,), jnp.uint32)

    children = GoState(
        board=jnp.concatenate([new_boards, board[None, :]], axis=0),
        ko=jnp.concatenate([new_ko, jnp.asarray([NO_KO], jnp.int32)]),
        turn=jnp.broadcast_to(turn + 1, (NN + 1,)),
        last_move=jnp.arange(NN + 1, dtype=jnp.int32),
        hash=jnp.concatenate([h, h_pass[None, :]], axis=0),
        komi=jnp.broadcast_to(state.komi, (NN + 1,)),
        invalid=jnp.broadcast_to(state.invalid, (NN + 1,)),
    )
    legal = jnp.concatenate([legal_pt, jnp.ones((1,), dtype=bool)])
    return children, legal


child_states_batch = jax.vmap(child_states)


class LeafAnalysis(NamedTuple):
    """Everything the search's eval/expansion phase needs from one position,
    from a single group analysis: the feature tables AND all successors.

    ``move_tables`` and ``child_states`` each run their own
    :func:`group_info` + (81, 81) mask construction; fusing them halves the
    env cost of an eval step (features and expansion always happen
    together, mcts.py:139-151)."""

    mt: MoveTables
    children: GoState  # (82, ...) successors (hashes zeroed)
    legal: jnp.ndarray  # bool[82]


def leaf_analysis(state: GoState) -> LeafAnalysis:
    """Fused :func:`move_tables` + :func:`child_states` (hashless)."""
    board, ko, turn = state.board, state.ko, state.turn
    color = state.to_play
    opp = jnp.where(color == BLACK, WHITE, BLACK).astype(board.dtype)
    empty = board == EMPTY

    info = group_info(board)
    board_p = _pad(board, _OFF)
    lab_p = _pad(info.labels, _NO_GROUP)
    libs_p = _pad(info.libs, 0)
    nbr_color = board_p[_NBRS]  # (81, 4)
    nbr_lab = lab_p[_NBRS]
    nbr_libs = libs_p[_NBRS]
    off = nbr_color == _OFF

    own_adj_lab = jnp.where(nbr_color == color, nbr_lab, _NO_GROUP)
    dying_adj_lab = jnp.where(
        (nbr_color == opp) & (nbr_libs == 1), nbr_lab, _NO_GROUP
    )
    labels_q = info.labels[None, :, None]
    grp = jnp.any(labels_q == own_adj_lab[:, None, :], axis=-1) & (board == color)[
        None, :
    ]
    grp = grp | jnp.eye(NN, dtype=bool)
    cap = jnp.any(labels_q == dying_adj_lab[:, None, :], axis=-1) & (board == opp)[
        None, :
    ]
    caps = cap.sum(axis=1, dtype=jnp.int32)
    empty_after = (empty[None, :] | cap) & ~jnp.eye(NN, dtype=bool)
    libs_after = (empty_after & _dilate_rows(grp)).sum(axis=1, dtype=jnp.int32)
    legal_pt = empty & (libs_after > 0) & (jnp.arange(NN) != ko)

    mt = MoveTables(
        legal=legal_pt,
        libs_after=jnp.where(legal_pt, libs_after, 0),
        caps=jnp.where(legal_pt, caps, 0),
        info=info,
    )

    placed = jnp.where(jnp.eye(NN, dtype=bool), color, board[None, :]).astype(
        board.dtype
    )
    new_boards = jnp.where(cap, EMPTY, placed)
    surrounded = jnp.all(off | (nbr_color == opp), axis=1)
    cap_idx = jnp.argmax(cap, axis=1).astype(jnp.int32)
    new_ko = jnp.where((caps == 1) & surrounded, cap_idx, NO_KO)

    children = GoState(
        board=jnp.concatenate([new_boards, board[None, :]], axis=0),
        ko=jnp.concatenate([new_ko, jnp.asarray([NO_KO], jnp.int32)]),
        turn=jnp.broadcast_to(turn + 1, (NN + 1,)),
        last_move=jnp.arange(NN + 1, dtype=jnp.int32),
        hash=jnp.zeros((NN + 1, 2), jnp.uint32),
        komi=jnp.broadcast_to(state.komi, (NN + 1,)),
        invalid=jnp.broadcast_to(state.invalid, (NN + 1,)),
    )
    legal = jnp.concatenate([legal_pt, jnp.ones((1,), dtype=bool)])
    return LeafAnalysis(mt=mt, children=children, legal=legal)


leaf_analysis_batch = jax.vmap(leaf_analysis)


# ---------------------------------------------------------------------------
# Batched wrappers (leading batch axis).

step_batch = jax.vmap(step)
legal_mask_batch = jax.vmap(legal_mask)
score_batch = jax.vmap(score)
group_info_batch = jax.vmap(group_info)
move_tables_batch = jax.vmap(move_tables)
eye_colors_batch = jax.vmap(eye_colors)
area_colors_batch = jax.vmap(area_colors)
is_terminal_batch = jax.vmap(is_terminal, in_axes=(0, None))


@partial(jax.jit, static_argnames=())
def play_moves(state: GoState, actions: jnp.ndarray) -> GoState:
    """Replay a fixed-length action sequence with ``lax.scan`` (host helper;
    pad with PASS-after-terminal at the call site if needed)."""

    def body(s, a):
        return step(s, a), None

    out, _ = jax.lax.scan(body, state, actions)
    return out
