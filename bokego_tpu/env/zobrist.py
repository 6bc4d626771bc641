"""Zobrist hashing for Go positions, as fixed device arrays.

Semantics follow the reference's *incremental* hash path (go.py:164-177): the
hash is the XOR of per-(plane, point) randoms for black stones (plane 0),
white stones (plane 1), and the ko point (plane 2), plus a turn-parity flip
constant.  The reference generates its table with ``getrandbits`` at import
time (go.py:48-49), so its hashes are not stable across processes; we instead
use a fixed seed so hashes are reproducible and checkpointable.

JAX has no uint64 without global x64 mode, so hashes are ``uint32[2]``
(hi, lo) pairs — XOR structure is preserved elementwise, giving a full 64 bits
of collision resistance.

Divergence note (documented, see SURVEY.md §2.4): the reference's
``play_pass`` removes the ko contribution with the *player* plane
(``_hash_table[turn % 2][ko]``, go.py:112) while ``play_move`` uses the ko
plane (``_hash_table[2]``, go.py:168) — an internal inconsistency.  We use
plane 2 everywhere.  The reference's full-recompute ``zobrist_hash`` also
crashes whenever ``ko`` is set (bare-name bug, go.py:272); ours is total.
"""

from __future__ import annotations

import numpy as np

from bokego_tpu.coords import NN

_SEED = 20210815

_rng = np.random.Generator(np.random.PCG64(_SEED))
# (3 planes, 81 points, 2 words)
TABLE = _rng.integers(0, 2**32, size=(3, NN, 2), dtype=np.uint32)
FLIP = _rng.integers(0, 2**32, size=(2,), dtype=np.uint32)


def full_hash_np(board: np.ndarray, ko: int, turn: int) -> np.ndarray:
    """Recompute the hash from scratch (host/NumPy; used by tests and init).

    ``board`` is int8[81] with 0 empty / 1 black / 2 white; ``ko`` is -1 for
    none.  Mirrors go.py:262-277 with the bare-``ko`` bug fixed.
    """
    h = np.zeros(2, dtype=np.uint32)
    for p in range(NN):
        if board[p] == 1:
            h ^= TABLE[0, p]
        elif board[p] == 2:
            h ^= TABLE[1, p]
    if ko >= 0:
        h ^= TABLE[2, ko]
    if turn % 2 == 1:
        h ^= FLIP
    return h
