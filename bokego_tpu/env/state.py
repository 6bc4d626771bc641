"""The Go game state as a JAX pytree.

Replaces the reference's string-board ``go.Game`` object (go.py:33-277) with a
struct of fixed-shape arrays so thousands of boards step in lockstep on TPU.
All fields are per-board; batching is a leading axis added by ``jax.vmap`` /
sharding, never Python objects.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from bokego_tpu.coords import N, NN, PASS_ACTION
from bokego_tpu.env import zobrist

# board cell values
EMPTY, BLACK, WHITE = 0, 1, 2

# last_move / ko sentinels (device encoding)
NO_MOVE = -1  # no move played yet (reference: None)
NO_KO = -1

DEFAULT_KOMI = 5.5


@struct.dataclass
class GoState:
    """One 9x9 Go position (vectorizable).

    Attributes:
      board: int8[81] — 0 empty, 1 black, 2 white.
      ko: int32 — squashed coord of the current ko point, -1 if none.
      turn: int32 — move number starting at 0; black plays on even turns.
      last_move: int32 — 0..80 point, 81 (PASS_ACTION) pass, -1 none.
      hash: uint32[2] — Zobrist hash (hi, lo); incrementally maintained
        exactly like go.py:164-177.
      komi: float32 — komi (reference default 5.5, go.py:54).
      invalid: bool — latches True if an illegal action was ever fed to
        ``step`` (device-side replacement for the reference's IllegalMove
        exception, go.py:279).
    """

    board: jnp.ndarray
    ko: jnp.ndarray
    turn: jnp.ndarray
    last_move: jnp.ndarray
    hash: jnp.ndarray
    komi: jnp.ndarray
    invalid: jnp.ndarray

    @property
    def to_play(self) -> jnp.ndarray:
        """1 (BLACK) on even turns, 2 (WHITE) on odd turns."""
        return (self.turn % 2 + 1).astype(jnp.int8)


def new_game(komi: float = DEFAULT_KOMI) -> GoState:
    """An empty board, black to play."""
    return GoState(
        board=jnp.zeros((NN,), dtype=jnp.int8),
        ko=jnp.int32(NO_KO),
        turn=jnp.int32(0),
        last_move=jnp.int32(NO_MOVE),
        hash=jnp.zeros((2,), dtype=jnp.uint32),
        komi=jnp.float32(komi),
        invalid=jnp.bool_(False),
    )


def new_game_batch(batch_size: int, komi: float = DEFAULT_KOMI) -> GoState:
    """A batch of empty boards (leading axis ``batch_size``)."""
    import jax

    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch_size,) + x.shape), new_game(komi)
    )


def from_board_string(
    board_str: str,
    ko: int | None = None,
    turn: int = 0,
    last_move: int | None = None,
    komi: float = DEFAULT_KOMI,
) -> GoState:
    """Build a state from the reference's 81-char ``'.XO'`` board string.

    The hash is recomputed from scratch (positions built this way have no
    incremental history — mirrors ``Game._hash = None`` lazy init, go.py:65).
    """
    enc = {".": EMPTY, "X": BLACK, "O": WHITE}
    board = np.array([enc[c] for c in board_str], dtype=np.int8)
    ko_i = NO_KO if ko is None else int(ko)
    if last_move is None:
        lm = NO_MOVE
    elif last_move == -1:  # host PASS
        lm = PASS_ACTION
    else:
        lm = int(last_move)
    h = zobrist.full_hash_np(board, ko_i, turn)
    return GoState(
        board=jnp.asarray(board),
        ko=jnp.int32(ko_i),
        turn=jnp.int32(turn),
        last_move=jnp.int32(lm),
        hash=jnp.asarray(h),
        komi=jnp.float32(komi),
        invalid=jnp.bool_(False),
    )


def to_board_string(state: GoState) -> str:
    """State -> reference-style 81-char board string."""
    dec = {EMPTY: ".", BLACK: "X", WHITE: "O"}
    return "".join(dec[int(c)] for c in np.asarray(state.board))


def render(state: GoState) -> str:
    """Pretty-print like ``go.Game.__str__`` (go.py:68-84), with star points."""
    from bokego_tpu.coords import FLOWERS9

    chars = {EMPTY: ".", BLACK: "X", WHITE: "O"}
    cells = [chars[int(c)] for c in np.asarray(state.board)]
    for f in FLOWERS9:
        if cells[f] == ".":
            cells[f] = "+"
    header = "\t   " + " ".join("ABCDEFGHJ"[i] for i in range(N))
    rows = [
        "\t" + str(i + 1) + ("  " if i < 9 else " ") + " ".join(cells[N * i : N * (i + 1)])
        for i in range(N)
    ]
    return header + "\n" + "\n".join(rows)
