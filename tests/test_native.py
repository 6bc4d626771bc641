"""Native C++ rules library: three-way parity vs the Python oracle."""

import numpy as np
import pytest

from bokego_tpu import native

from tests.oracle import PASS, OracleGame

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libgoboard.so not buildable"
)


@pytest.mark.parametrize("seed", range(4))
def test_random_game_parity_native(seed):
    rng = np.random.default_rng(seed)
    nb = native.NativeBoard()
    g = OracleGame()
    for i in range(70):
        legal = nb.legal_moves()
        oracle_legal = g.legal_moves()
        np.testing.assert_array_equal(
            legal, np.array([p in oracle_legal for p in range(81)]),
            err_msg=f"move {i}",
        )
        np.testing.assert_array_equal(nb.liberties(), np.array(g.liberties()))
        assert nb.score() == pytest.approx(g.score())
        choices = np.flatnonzero(legal)
        mv = int(rng.choice(choices)) if len(choices) else PASS
        nb.play(mv)
        g.play(mv)
        assert (nb.ko is None) == (g.ko is None)
        assert nb.ko == g.ko
        np.testing.assert_array_equal(nb.board, np.array(g.board, np.int8))


def test_illegal_raises():
    nb = native.NativeBoard()
    nb.play(40)
    with pytest.raises(ValueError):
        nb.play(40)  # occupied


def test_replay_and_score():
    nb = native.replay([40, 30, PASS, 21])
    assert nb.turn == 4
    assert isinstance(nb.score(), float)
    with pytest.raises(ValueError):
        native.replay([40, 40])


def test_golden_replay_native():
    """The 10 boke-vs-gnugo golden games replay legally through the C++
    engine with the same final positions as the Python oracle."""
    import glob

    from bokego_tpu import sgf

    golden = sorted(glob.glob("/root/reference/data/bokevgnugo/*.sgf"))
    if not golden:
        pytest.skip("golden SGFs not present")
    for path in golden:
        moves = sgf.read_moves(path)
        nb = native.replay(moves)
        g = OracleGame()
        for mv in moves:
            g.play(mv)
        np.testing.assert_array_equal(nb.board, np.array(g.board, np.int8))
        assert nb.score() == g.score()
