"""Vectorized policy playouts: thousands of games stepping in lockstep.

Replaces the reference's one-game-at-a-time loops — ``selfplay.playout``
(selfplay.py:18-33), ``MCTS._simulate`` + ``Go_MCTS.find_random_child``
(mcts.py:195-206, 319-360), and ``genvals.gen_game`` (genvals.py:17-42) —
with a single ``lax.scan`` over turns on a batch of boards.  One policy
evaluation per *step* covers the whole batch (the reference pays one forward
pass per *move of one game*, batch size 1 — SURVEY.md §3.1).

Move selection: legal moves (optionally excluding own one-point eyes, the
``possible_eye`` filter of mcts.py:354) are sampled from the policy's
masked, renormalized distribution; a board with no playable point passes.
Finished boards keep passing so the whole batch stays turn-parity-aligned.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from bokego_tpu.coords import NN, PASS_ACTION
from bokego_tpu.env import rules
from bokego_tpu.env.state import GoState
from bokego_tpu.models.inference import sample_moves


class Trajectory(NamedTuple):
    """Stacked playout record (time-major)."""

    states: GoState  # (T, B, ...) — state *before* each action
    actions: jnp.ndarray  # (T, B) int32 device actions
    final: GoState  # (B, ...) — state after the last step


def select_moves(
    rng: jax.Array,
    probs: jnp.ndarray,
    states: GoState,
    avoid_eyes: bool,
    done: jnp.ndarray,
) -> jnp.ndarray:
    """Pick one action per board from policy probs over the 81 points."""
    legal = rules.legal_mask_batch(states)[:, :NN]
    if avoid_eyes:
        eyes = rules.eye_colors_batch(states.board)
        own_eye = eyes == states.to_play[:, None].astype(eyes.dtype)
        legal = legal & ~own_eye
    moves = sample_moves(rng, probs, legal)
    return jnp.where(done, PASS_ACTION, moves).astype(jnp.int32)


def playout(
    rng: jax.Array,
    probs_fn_even: Callable[[jnp.ndarray], jnp.ndarray],
    probs_fn_odd: Callable[[jnp.ndarray], jnp.ndarray],
    states: GoState,
    num_steps: int,
    max_turns: int,
    avoid_eyes: bool = False,
) -> Trajectory:
    """Scan ``num_steps`` plies with two policies alternating by turn parity.

    ``probs_fn_even`` plays the side to move on even global steps (the
    caller aligns this with black/white — all boards in the batch must share
    turn parity).  Each fn maps a batch of GoStates -> probs (B, 81).
    """
    done0 = rules.is_terminal_batch(states, max_turns)

    def body(carry, inp):
        s, done = carry
        step_i, step_rng = inp
        probs = jax.lax.cond(
            step_i % 2 == 0, lambda x: probs_fn_even(x), lambda x: probs_fn_odd(x), s
        )
        actions = select_moves(step_rng, probs, s, avoid_eyes, done)
        s_next = rules.step_batch(s, actions)
        done_next = done | rules.is_terminal_batch(s_next, max_turns)
        return (s_next, done_next), (s, actions)

    steps = jnp.arange(num_steps)
    rngs = jax.random.split(rng, num_steps)
    (final, _), (traj_states, traj_actions) = jax.lax.scan(
        body, (states, done0), (steps, rngs)
    )
    return Trajectory(states=traj_states, actions=traj_actions, final=final)


def playout_final(
    rng: jax.Array,
    probs_fn_even: Callable[[jnp.ndarray], jnp.ndarray],
    probs_fn_odd: Callable[[jnp.ndarray], jnp.ndarray],
    states: GoState,
    max_turns: int,
    avoid_eyes: bool = False,
) -> GoState:
    """Like :func:`playout` but returns ONLY the final state, early-exiting
    once every board is terminal (``lax.while_loop``).

    This is the simulation-mode hot path (``MCTS._simulate``,
    mcts.py:195-206): leaves sit deep in the game, so the scan variant's
    fixed ``max_turns + 1`` ply budget wastes most of its policy forwards
    on already-finished boards.  No trajectory is stacked.
    """
    done0 = rules.is_terminal_batch(states, max_turns)

    def cond(carry):
        step_i, _, _, done = carry
        return (step_i < max_turns + 2) & ~jnp.all(done)

    def body(carry):
        step_i, r, s, done = carry
        r, sub = jax.random.split(r)
        probs = jax.lax.cond(
            step_i % 2 == 0, lambda x: probs_fn_even(x), lambda x: probs_fn_odd(x), s
        )
        actions = select_moves(sub, probs, s, avoid_eyes, done)
        s_next = rules.step_batch(s, actions)
        done_next = done | rules.is_terminal_batch(s_next, max_turns)
        return step_i + 1, r, s_next, done_next

    _, _, final, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), rng, states, done0)
    )
    return final


def rewards(final: GoState) -> jnp.ndarray:
    """(B,) ±1: +1 iff black wins by Tromp-Taylor (``Go_MCTS.reward``,
    mcts.py:330-338, gnugo-less branch)."""
    return jnp.where(rules.score_batch(final) > 0, 1.0, -1.0)
