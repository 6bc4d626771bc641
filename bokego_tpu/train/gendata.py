"""Policy-SL training data from self-play games.

The reference's SL policy was trained on 63k KGS games (report.pdf p.4
§III.A.1) that are not shipped; training from scratch therefore needs a
self-play data source.  This module records (position, move) pairs from
vectorized policy self-play — the from-scratch replacement for the KGS CSV
pipeline, emitting the same (board, ko, last, move) rows that
``train/data.py`` consumes (optionally ×8 dihedral).
"""

from __future__ import annotations

import numpy as np

import jax

from bokego_tpu.coords import NN
from bokego_tpu.env import state as st
from bokego_tpu.features import features_batch
from bokego_tpu.models import inference
from bokego_tpu.search import playout as po
from bokego_tpu.train.data import d4_apply_moves


def generate(
    rng: jax.Array,
    policy_vars,
    batch: int,
    *,
    max_turns: int = 70,
    opponent_vars=None,
) -> po.Trajectory:
    """Self-play games (policy vs itself or an opponent pool member)."""
    def probs(variables):
        def fn(states):
            return inference.policy_probs(variables, features_batch(states))

        return fn

    states = st.new_game_batch(batch)
    opp = opponent_vars if opponent_vars is not None else policy_vars
    return po.playout(
        rng, probs(policy_vars), probs(opp), states,
        num_steps=max_turns + 1, max_turns=max_turns,
    )


def trajectory_to_rows(traj: po.Trajectory) -> list[tuple[str, int | None, int, int]]:
    """(board, ko, last, move) rows for every real (non-pass) move."""
    dec = {0: ".", 1: "X", 2: "O"}
    boards = np.asarray(traj.states.board)  # (T, B, 81)
    kos = np.asarray(traj.states.ko)
    lasts = np.asarray(traj.states.last_move)
    actions = np.asarray(traj.actions)
    T, B = actions.shape
    rows = []
    for t in range(T):
        for b in range(B):
            a = int(actions[t, b])
            if a >= NN:  # pass / finished
                continue
            last = int(lasts[t, b])
            if last == NN:
                # position right after a pass: the csv schema derives the
                # side to move from the color at `last` (process_csv,
                # nnet.py:377), which is undefined here — skip (rare).
                continue
            bs = "".join(dec[int(c)] for c in boards[t, b])
            ko = None if kos[t, b] < 0 else int(kos[t, b])
            last = last if 0 <= last < NN else -1
            rows.append((bs, ko, last, a))
    return rows


def trajectory_to_packed(traj: po.Trajectory, augment: bool = True):
    """Trajectory -> :class:`PackedDataset`, fully vectorized.

    The at-scale path (reference: 23M pairs, report.pdf p.4 §III.A.1):
    no per-row python, no CSV intermediate — (T, B) arrays are masked,
    flattened, and (optionally) materialized under all 8 dihedral
    symmetries.  Unlike the CSV schema (which derives side-to-move from the
    color at ``last``, nnet.py:377, and so must drop positions following a
    pass), the packed form stores turn parity explicitly and keeps them.
    """
    from bokego_tpu.train.data import (
        PackedDataset, d4_apply_boards, d4_apply_moves,
    )

    boards = np.asarray(traj.states.board).reshape(-1, NN)
    kos = np.asarray(traj.states.ko).reshape(-1)
    lasts = np.asarray(traj.states.last_move).reshape(-1)
    turns = np.asarray(traj.states.turn).reshape(-1)
    actions = np.asarray(traj.actions).reshape(-1)

    keep = actions < NN  # real moves only (pass/finished are not SL targets)
    boards = boards[keep].astype(np.uint8)
    kos = kos[keep].astype(np.int16)
    lasts = lasts[keep].astype(np.int16)
    turns = (turns[keep] % 2).astype(np.int8)
    actions = actions[keep].astype(np.int32)

    if not augment:
        return PackedDataset(boards, kos, lasts, turns, actions, False)

    b8, k8, l8, t8, a8 = [], [], [], [], []
    for k in range(8):
        b8.append(d4_apply_boards(boards, k))
        k8.append(np.where(kos < 0, kos, d4_apply_moves(kos, k)).astype(np.int16))
        # last: -1 (none) and 81 (pass) are fixed points of the action map
        l8.append(
            np.where((lasts < 0) | (lasts >= NN), lasts,
                     d4_apply_moves(lasts, k)).astype(np.int16))
        t8.append(turns)
        a8.append(d4_apply_moves(actions, k).astype(np.int32))
    return PackedDataset(
        np.concatenate(b8), np.concatenate(k8), np.concatenate(l8),
        np.concatenate(t8), np.concatenate(a8), False,
    )


def write_csv(path: str, rows, augment: bool = True, header: bool = True):
    """Append policy rows (board, ko, last, move), optionally ×8 dihedral."""
    import os

    from bokego_tpu.train.genvals import _d4_board

    new = not os.path.exists(path)
    with open(path, "a+") as f:
        if new and header:
            f.write("board,ko,last,move\n")
        for board, ko, last, move in rows:
            ks = range(8) if augment else (0,)
            for k in ks:
                b = _d4_board(board, k)
                m = int(d4_apply_moves(np.asarray(move), k))
                la = last if last < 0 else int(d4_apply_moves(np.asarray(last), k))
                kk = "" if ko is None else int(d4_apply_moves(np.asarray(ko), k))
                f.write(f"{b},{kk},{la},{m}\n")
