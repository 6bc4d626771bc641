"""Feature-plane parity vs an oracle-driven reimplementation of
``nnet.features`` semantics (nnet.py:182-262)."""

import numpy as np
import pytest

import jax

from bokego_tpu.coords import NN
from bokego_tpu.features import NUM_PLANES, features, features_batch, to_nchw

from tests.oracle import BLACK, OracleGame
from tests.test_rules import random_game_states

features_fn = jax.jit(features)


def _bucket(arr):
    out = np.zeros((7, NN))
    for i in range(6):
        out[i, arr == i + 1] = i + 1
    out[6, arr > 6] = 7
    return out


def oracle_features(g: OracleGame) -> np.ndarray:
    """(27, 81) expected planes from the oracle."""
    board = np.array(g.board)
    color = g.to_play
    opp = 3 - color
    planes = np.zeros((NUM_PLANES, NN))
    planes[0] = board == color
    planes[1] = board == opp
    planes[2] = board == 0
    planes[3] = 1.0 if color == BLACK else 0.0
    if g.last_move is not None and g.last_move >= 0:
        planes[4, g.last_move] = 1.0
    legal = g.legal_moves()
    planes[5, sorted(legal)] = 1.0
    libs = np.array(g.liberties())
    libs_after = np.zeros(NN)
    caps = np.zeros(NN)
    for p in sorted(legal):
        la, nc = g.move_effects(p)
        libs_after[p] = la
        caps[p] = nc
    planes[6:13] = _bucket(libs)
    planes[13:20] = _bucket(libs_after)
    planes[20:27] = _bucket(caps)
    return planes


@pytest.mark.parametrize("seed", [11, 12])
def test_feature_parity(seed):
    for i, (s, g) in enumerate(random_game_states(seed, n_moves=40)):
        if i % 5:
            continue
        got = np.asarray(to_nchw(features_fn(s))).reshape(NUM_PLANES, NN)
        want = oracle_features(g)
        np.testing.assert_array_equal(got, want, err_msg=f"move {i}")


def test_features_batch_shape():
    from bokego_tpu.env import state as st

    s = st.new_game_batch(4)
    fts = features_batch(s)
    assert fts.shape == (4, 9, 9, NUM_PLANES)
    assert fts.dtype == np.float32
