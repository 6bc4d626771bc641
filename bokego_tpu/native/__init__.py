"""ctypes bindings to the native host-side Go rules library.

The device rules engine (env/rules.py) is the product path; this C++
library serves host code — instant GTP legality checks, SGF batch
replay/scoring without device roundtrips — and is a third independent
implementation for parity tests.  Builds on demand with ``make -C native``
(g++); all callers degrade gracefully when it's absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_HERE, "libgoboard.so")
_SRC_DIR = os.path.normpath(os.path.join(_HERE, "..", "..", "native"))

_lib = None


def build() -> bool:
    """Compile the library (make -C native). Returns success."""
    try:
        subprocess.run(
            ["make", "-C", _SRC_DIR], check=True, capture_output=True
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    lib.go_play.argtypes = [i8p, c_i32p, c_i32p, ctypes.c_int32]
    lib.go_play.restype = ctypes.c_int
    lib.go_legal.argtypes = [i8p, ctypes.c_int32, ctypes.c_int32, u8p]
    lib.go_liberties.argtypes = [i8p, i32p]
    lib.go_score.argtypes = [i8p, ctypes.c_float]
    lib.go_score.restype = ctypes.c_float
    lib.go_replay.argtypes = [i32p, ctypes.c_int32, i8p, c_i32p, c_i32p]
    lib.go_replay.restype = ctypes.c_int
    lib.go_ownership.argtypes = [
        i8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_uint64, i8p,
    ]
    lib.go_resolved_score.argtypes = [
        i8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_float, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_uint64,
    ]
    lib.go_resolved_score.restype = ctypes.c_float
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeBoard:
    """A mutable host-side game (reference ``go.Game`` surface).

    Board cells: 0 empty / 1 black / 2 white; moves are host coords
    (PASS = -1).
    """

    def __init__(self, komi: float = 5.5):
        if _load() is None:
            raise RuntimeError("libgoboard.so unavailable (g++ build failed?)")
        self.board = np.zeros(81, np.int8)
        self._ko = ctypes.c_int32(-1)
        self._turn = ctypes.c_int32(0)
        self.komi = komi

    @property
    def ko(self) -> int | None:
        return None if self._ko.value < 0 else int(self._ko.value)

    @property
    def turn(self) -> int:
        return int(self._turn.value)

    def play(self, move: int) -> int:
        """Play a host-coord move (PASS=-1). Returns captures; raises on
        illegal moves (the reference's IllegalMove)."""
        action = 81 if move == -1 else move
        caps = _load().go_play(
            self.board, ctypes.byref(self._ko), ctypes.byref(self._turn), action
        )
        if caps < 0:
            raise ValueError(f"illegal move {move}")
        return caps

    def legal_moves(self) -> np.ndarray:
        out = np.zeros(81, np.uint8)
        _load().go_legal(self.board, self._ko.value, self._turn.value, out)
        return out.astype(bool)

    def liberties(self) -> np.ndarray:
        out = np.zeros(81, np.int32)
        _load().go_liberties(self.board, out)
        return out

    def score(self) -> float:
        return float(_load().go_score(self.board, ctypes.c_float(self.komi)))

    def ownership(self, n_playouts: int = 127, max_steps: int = 160,
                  seed: int = 1) -> np.ndarray:
        """int8[81] majority point owner (0 neutral / 1 black / 2 white)
        from ``n_playouts`` random resolutions played to double-pass —
        the dead-group judgment the reference outsourced to gnugo
        (go.py:512-526), computed natively."""
        out = np.zeros(81, np.int8)
        _load().go_ownership(
            self.board, self._ko.value, self._turn.value, n_playouts,
            max_steps, seed, out,
        )
        return out

    def resolved_score(self, n_playouts: int = 127, max_steps: int = 160,
                       seed: int = 1) -> float:
        """Dead-group-aware area score, black minus (white + komi)."""
        return float(_load().go_resolved_score(
            self.board, self._ko.value, self._turn.value,
            ctypes.c_float(self.komi), n_playouts, max_steps, seed,
        ))


def resolved_score_raw(
    board: np.ndarray, ko: int | None, turn: int, komi: float,
    n_playouts: int = 127, max_steps: int = 160, seed: int = 1,
) -> float:
    """Dead-group-aware score for a raw position (0/1/2 board array)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libgoboard.so unavailable")
    return float(lib.go_resolved_score(
        np.ascontiguousarray(board, np.int8),
        -1 if ko is None else int(ko), int(turn),
        ctypes.c_float(komi), n_playouts, max_steps, seed,
    ))


def replay(moves: list[int], komi: float = 5.5) -> NativeBoard:
    """Replay a game from the empty board; raises on the first illegal
    move.  Fast path for SGF scoring (data/score.sh semantics without
    gnugo)."""
    b = NativeBoard(komi)
    arr = np.asarray(moves, np.int32)
    rc = _load().go_replay(
        arr, len(arr), b.board, ctypes.byref(b._ko), ctypes.byref(b._turn)
    )
    if rc != -2:
        raise ValueError(f"illegal move at index {rc}")
    return b
