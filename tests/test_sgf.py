"""SGF I/O + golden-game replay (the reference's 10 boke-vs-gnugo games,
data/bokevgnugo/ — SURVEY.md §4 'golden games')."""

import glob
import os

import numpy as np
import pytest

import jax.numpy as jnp

from bokego_tpu import sgf
from bokego_tpu.coords import NN, PASS, to_action
from bokego_tpu.env import rules, state as st

from tests.oracle import OracleGame
from tests.test_rules import legal_fn, score_fn, step_fn

GOLDEN = sorted(glob.glob("/root/reference/data/bokevgnugo/*.sgf"))


def test_roundtrip(tmp_path):
    moves = [40, 30, PASS, 21, 60]
    p = os.path.join(tmp_path, "t.sgf")
    sgf.write_sgf(moves, p, komi=5.5, black="a", white="b", result="B+2.5")
    assert sgf.read_moves(p) == moves
    assert sgf.read_result(p) == "B+2.5"


@pytest.mark.skipif(not GOLDEN, reason="golden SGFs not present")
@pytest.mark.parametrize("path", GOLDEN)
def test_golden_replay(path):
    """Every golden-game move must be legal for both the engine and the
    oracle, stepping to identical boards."""
    moves = sgf.read_moves(path)
    assert moves, path
    s = st.new_game()
    g = OracleGame()
    for i, mv in enumerate(moves):
        if mv != PASS:
            legal = np.asarray(legal_fn(s))
            assert legal[mv], f"{path}: move {i} ({mv}) illegal in engine"
            assert g.is_legal(mv), f"{path}: move {i} ({mv}) illegal in oracle"
        s = step_fn(s, jnp.int32(to_action(mv)))
        g.play(mv)
        assert not bool(s.invalid)
    np.testing.assert_array_equal(
        np.asarray(s.board), np.array(g.board, dtype=np.int8)
    )
    # the final position scores identically in engine and oracle
    assert float(score_fn(s)) == pytest.approx(g.score())


def test_board_sgf():
    s = st.from_board_string("X" + "." * 79 + "O", turn=1)
    text = sgf.board_to_sgf(st.to_board_string(s), 1)
    assert "AB[aa]" in text
    assert "AW[ii]" in text
    assert "PL[W]" in text
