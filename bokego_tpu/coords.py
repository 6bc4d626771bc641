"""Board coordinates, adjacency tables, and coordinate conversions.

Coordinate systems (parity with reference ``bokego/go.py:322-373``):

* *pair* ``(x, y)`` with ``0 <= x, y < N`` — ``x`` is the row, ``y`` the column.
* *squashed* ``sq = N*x + y`` in ``[0, N**2)``.
* *alphanumeric* ``"A1".."J9"`` — column letter (skipping ``I``) then 1-based row.

Device code additionally uses an *action* encoding in ``[0, N**2]`` where the
extra index ``N**2`` (81) denotes PASS, so actions stay non-negative and
gather-friendly.  Host-side APIs use the reference's ``PASS = -1`` /
``RESIGN = -2`` sentinels; :func:`to_action` / :func:`from_action` convert.
"""

from __future__ import annotations

import re

import numpy as np

N = 9
NN = N * N

PASS = -1
RESIGN = -2
NO_MOVE = -3  # host-side "no previous move" sentinel (reference uses None)

# Device-side action ids.
PASS_ACTION = NN  # 81
NUM_ACTIONS = NN + 1  # 82

EMPTY, BLACK, WHITE = 0, 1, 2

# Star points in squashed coords (reference go.py:29).
FLOWERS9 = (20, 60, 24, 56, 40)

_COLS = "ABCDEFGHJKLMNOPQRST"  # no 'I'


def squash(c) -> int:
    """Pair/alphanumeric/list -> squashed coordinate (go.py:322-345 semantics)."""
    if isinstance(c, (list, tuple)) and c and isinstance(c[0], (list, tuple, str)):
        return [squash(x) for x in c]
    if isinstance(c, str):
        s = c.upper()
        if s == "PASS":
            return PASS
        m = re.match(r"([A-T])(\d+)", s)
        if m is None:
            raise ValueError(f"bad coordinate {c!r}")
        let, num = m[1], m[2]
        if let < "J":
            y = ord(let) - 65
        elif let == "J":
            y = 8
        else:
            y = ord(let) - 66
        return N * (int(num) - 1) + y
    return N * c[0] + c[1]


def unsquash(sq, alph: bool = True):
    """Squashed coordinate -> alphanumeric (or pair) (go.py:347-365 semantics)."""
    if isinstance(sq, (list, tuple)):
        return [unsquash(x, alph) for x in sq]
    if sq == PASS:
        return "PASS"
    x, y = divmod(int(sq), N)
    if not alph:
        return (x, y)
    if y < 8:
        letr = chr(y + 65)
    elif y == 8:
        letr = "J"
    else:
        letr = chr(y + 66)
    return letr + str(x + 1)


def to_action(sq: int) -> int:
    """Host move id (PASS=-1) -> device action id (PASS=81)."""
    return PASS_ACTION if sq == PASS else sq


def from_action(a: int) -> int:
    """Device action id -> host move id."""
    return PASS if a == PASS_ACTION else int(a)


def is_on_board(c) -> bool:
    return 0 <= c[0] < N and 0 <= c[1] < N


def _build_neighbors() -> np.ndarray:
    """(81, 4) int32 table of orthogonal neighbours, padded with NN (off-board).

    Device code pads per-point vectors to length NN+1 so that gathering at the
    sentinel index returns a neutral value.
    """
    out = np.full((NN, 4), NN, dtype=np.int32)
    for x in range(N):
        for y in range(N):
            sq = N * x + y
            for k, (dx, dy) in enumerate(((1, 0), (-1, 0), (0, 1), (0, -1))):
                if is_on_board((x + dx, y + dy)):
                    out[sq, k] = N * (x + dx) + (y + dy)
    return out


def _build_diagonals() -> np.ndarray:
    """(81, 4) int32 table of diagonal neighbours, padded with NN.

    Note: the reference's ``DIAGONALS`` (go.py:372) lists ``(x-1, y-1)`` twice
    and omits ``(x-1, y+1)``; we implement the four true diagonals and document
    the divergence (see SURVEY.md §2.4 — the eye heuristic built on this is
    deliberately fixed, not replicated).
    """
    out = np.full((NN, 4), NN, dtype=np.int32)
    for x in range(N):
        for y in range(N):
            sq = N * x + y
            for k, (dx, dy) in enumerate(((1, 1), (1, -1), (-1, -1), (-1, 1))):
                if is_on_board((x + dx, y + dy)):
                    out[sq, k] = N * (x + dx) + (y + dy)
    return out


NEIGHBORS = _build_neighbors()
DIAGONALS = _build_diagonals()
NUM_NEIGHBORS = (NEIGHBORS < NN).sum(axis=1).astype(np.int32)  # (81,)
NUM_DIAGONALS = (DIAGONALS < NN).sum(axis=1).astype(np.int32)  # (81,)
