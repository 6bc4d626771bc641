"""Vectorized playout: legality, termination, reward semantics."""

import numpy as np

import jax
import jax.numpy as jnp

from bokego_tpu.coords import NN, PASS_ACTION
from bokego_tpu.env import rules, state as st
from bokego_tpu.search import playout as po

from tests.oracle import OracleGame


def uniform_probs(states):
    return jnp.full((states.turn.shape[0], NN), 1.0 / NN)


def test_playout_legal_and_lockstep():
    B, T = 8, 30
    states = st.new_game_batch(B)
    traj = po.playout(
        jax.random.PRNGKey(0), uniform_probs, uniform_probs, states,
        num_steps=T, max_turns=80,
    )
    assert traj.actions.shape == (T, B)
    # replay through the oracle: every non-pass action must be legal
    games = [OracleGame() for _ in range(B)]
    acts = np.asarray(traj.actions)
    for t in range(T):
        for b in range(B):
            a = int(acts[t, b])
            if a == PASS_ACTION:
                games[b].play(-1)
            else:
                assert games[b].is_legal(a), f"t={t} b={b} a={a}"
                games[b].play(a)
    final_board = np.asarray(traj.final.board)
    for b in range(B):
        np.testing.assert_array_equal(final_board[b], np.array(games[b].board))
    # lockstep turn parity
    assert len(set(int(x) for x in np.asarray(traj.final.turn))) == 1


def test_playout_eye_avoidance():
    """With avoid_eyes, a policy playout never fills its own one-point eye."""
    B, T = 16, 40
    states = st.new_game_batch(B)
    traj = po.playout(
        jax.random.PRNGKey(1), uniform_probs, uniform_probs, states,
        num_steps=T, max_turns=80, avoid_eyes=True,
    )
    acts = np.asarray(traj.actions)
    boards = np.asarray(traj.states.board)  # (T, B, 81)
    kos = np.asarray(traj.states.ko)
    turns = np.asarray(traj.states.turn)
    for t in range(T):
        for b in range(B):
            a = int(acts[t, b])
            if a == PASS_ACTION:
                continue
            g = OracleGame(board=list(boards[t, b]),
                           ko=None if kos[t, b] < 0 else int(kos[t, b]),
                           turn=int(turns[t, b]))
            assert g.eye_color(a) != g.to_play, f"filled own eye t={t} b={b}"


def test_rewards_sign():
    s = st.from_board_string("X" * 80 + ".")
    batch = jax.tree.map(lambda x: x[None], s)
    r = po.rewards(batch)
    assert float(r[0]) == 1.0
    s2 = st.from_board_string("O" * 80 + ".")
    batch2 = jax.tree.map(lambda x: x[None], s2)
    assert float(po.rewards(batch2)[0]) == -1.0


def test_done_games_keep_passing():
    """A terminal board stays unchanged while others continue."""
    B = 2
    states = st.new_game_batch(B)
    # make board 0 terminal by passing
    states = rules.step_batch(
        states, jnp.asarray([PASS_ACTION, 40], dtype=jnp.int32)
    )
    traj = po.playout(
        jax.random.PRNGKey(2), uniform_probs, uniform_probs, states,
        num_steps=10, max_turns=80,
    )
    acts = np.asarray(traj.actions)
    assert np.all(acts[:, 0] == PASS_ACTION)
    np.testing.assert_array_equal(
        np.asarray(traj.final.board)[0], np.asarray(states.board)[0]
    )


def test_playout_final_terminates_and_matches_scan_semantics():
    """playout_final reaches a terminal batch (every board done) and agrees
    with the scan variant's terminality rules; from a mid-game start it
    must exit well before the full ply budget (early exit is the point)."""
    B = 8
    states = st.new_game_batch(B)
    # advance every board ~60 plies first (deep-leaf shape of sim mode)
    traj = po.playout(
        jax.random.PRNGKey(2), uniform_probs, uniform_probs, states,
        num_steps=60, max_turns=80,
    )
    final = po.playout_final(
        jax.random.PRNGKey(3), uniform_probs, uniform_probs, traj.final,
        max_turns=80,
    )
    assert bool(jnp.all(rules.is_terminal_batch(final, 80)))
    # rewards are +/-1 and consistent with the final score sign
    r = np.asarray(po.rewards(final))
    s = np.asarray(rules.score_batch(final))
    np.testing.assert_array_equal(r, np.where(s > 0, 1.0, -1.0))
