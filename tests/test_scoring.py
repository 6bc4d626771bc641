"""Dead-group-aware scoring: resolved ownership vs gnugo's golden RE[] tags.

The reference's scoring oracle was gnugo's life-and-death judgment
(go.py:512-526, an external binary); env/scoring.py (device) and
native/goboard.cc go_ownership (host) replace it with playout-majority
ownership.  The 10 golden boke-vs-gnugo finals carry gnugo-computed RE[]
results — the resolver must agree where raw Tromp-Taylor demonstrably does
not (5/10 winners, DIVERGENCES.md §1).
"""

import glob
import os
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bokego_tpu import sgf
from bokego_tpu.coords import to_action
from bokego_tpu.env import rules, scoring, state as st

GOLDEN = "/root/reference/data/bokevgnugo"


def _golden(pattern="*.sgf"):
    return sorted(
        glob.glob(os.path.join(GOLDEN, pattern)),
        key=lambda s: int(re.search(r"_(\d+)\.sgf", s).group(1)),
    )


def _replay_device(moves):
    s = st.new_game(5.5)
    step = jax.jit(rules.step)
    for mv in moves:
        s = step(s, jnp.int32(to_action(mv)))
    assert not bool(s.invalid)
    return s


def _tag(v):
    return f"B+{v:g}" if v > 0 else f"W+{-v:g}" if v < 0 else "0"


@pytest.mark.skipif(not os.path.isdir(GOLDEN), reason="no golden SGFs")
def test_native_resolved_score_matches_gnugo_on_all_golden_finals():
    from bokego_tpu import native

    if not native.available():
        pytest.skip("libgoboard.so unavailable")
    for p in _golden():
        moves = sgf.read_moves(p)
        re_tag = sgf.read_result(p)
        got = _tag(native.replay(moves).resolved_score())
        assert got == re_tag, f"{os.path.basename(p)}: {got} != RE[{re_tag}]"


@pytest.mark.skipif(not os.path.isdir(GOLDEN), reason="no golden SGFs")
def test_device_resolved_score_matches_gnugo_winner():
    """Device resolver on two finals where raw TT flips the winner
    (games 1 and 5: RE[B+...] but dead-stone-blind TT says W+...)."""
    resolved = jax.jit(lambda r, s: scoring.resolved_score(r, s))
    for p in _golden("*_1.sgf")[:1] + _golden("*_5.sgf"):
        moves = sgf.read_moves(p)
        re_tag = sgf.read_result(p)
        s = _replay_device(moves)
        tt = _tag(float(rules.score(s)))
        got = _tag(float(resolved(jax.random.PRNGKey(0), s)))
        assert got == re_tag, f"{os.path.basename(p)}: {got} != RE[{re_tag}]"
        assert tt[0] != re_tag[0], "expected a raw-TT winner flip on this game"


def test_ownership_kills_an_obviously_dead_stone():
    """A lone white stone inside black's territory must be judged dead by
    both resolvers (raw TT counts it alive and the whole region neutral)."""
    board_str = (
        ".X.X.O.O."
        "XXXX.O.O."  # black wall; white alive on the right
        ".XXX.OOO."
        "O.XX.O..."  # lone white stone at (3,0) inside black's left side
        ".XXX.O.O."
        "XXXX.OOO."
        ".X.X.O.O."
        "XXXX.O..."
        ".X.X.OOO."
    )
    s = st.from_board_string(board_str, turn=0, komi=5.5)
    own = scoring.ownership(jax.random.PRNGKey(0), s, n_playouts=63)
    dead = scoring.dead_stones(own, s.board)
    idx = 3 * 9 + 0  # the lone white stone
    assert bool(dead[idx])
    # native twin agrees
    from bokego_tpu import native

    if native.available():
        b = native.NativeBoard(5.5)
        b.board[:] = np.asarray(s.board)
        nown = b.ownership(n_playouts=63)
        assert nown[idx] == 1  # black owns the point under the dead stone


def test_area_colors_matches_score():
    """rules.score must equal counting area_colors (shared region logic)."""
    from tests.test_rules import random_game_states

    for s, _ in list(random_game_states(3, n_moves=40, pass_prob=0.02))[-3:]:
        colors = rules.area_colors(s.board)
        b = int((colors == st.BLACK).sum())
        w = int((colors == st.WHITE).sum())
        assert float(rules.score(s)) == pytest.approx(b - w - float(s.komi))
