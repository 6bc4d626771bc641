"""Dead-group-aware final scoring: ownership by vectorized playouts.

The reference's final-score ORACLE is gnugo's life-and-death judgment,
reached through a subprocess (go.py:512-526) — raw Tromp-Taylor on a real
final position counts dead stones as alive and flips the winner on half of
the reference's own golden finals (DIVERGENCES.md §1;
tools/measure_scoring_divergence.py).  This module removes the external
binary: the board plays itself out.

``ownership`` continues K random (eye-preserving) playouts from the
position until each board double-passes, Tromp-Taylor-colors every finished
board (:func:`bokego_tpu.env.rules.area_colors`), and takes each point's
majority color across the K resolutions.  Dead stones — stones whose point
the opponent ends up owning — dissolve in the majority vote, exactly the
judgment gnugo supplied.  ``resolved_score`` turns the vote into a score.

All device code: one ``lax.scan`` over plies for the whole K-batch, no host
round-trips.  K=127 playouts on a 9x9 final position takes ~0.2 s on one
v5e chip and &lt;2 s single-threaded on CPU (the match referee's case).

Uniform random resolution (not policy-guided) is deliberate: it needs no
nets (usable from the referee and ``final_score`` alike), it cannot inherit
a net's blind spots, and with the own-eye filter it is the classic
Monte-Carlo scoring estimator, amply strong at 9x9.  An optional
``probs_fn`` upgrades it to policy playouts when nets are at hand.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bokego_tpu.coords import NN, PASS_ACTION
from bokego_tpu.env import rules
from bokego_tpu.env.state import BLACK, EMPTY, WHITE, GoState


def _resolve(
    rng: jax.Array,
    states: GoState,
    num_steps: int,
    probs_fn=None,
) -> GoState:
    """Play each board out with random legal non-eye moves until it
    double-passes (or the step budget ends).  Unlike the search's playout
    (playout.py), termination ignores ``max_turns`` and single passes: the
    input is already a "finished" position — the continuation exists purely
    to let dead groups be captured, so it runs until neither side has a
    sensible move left."""

    def body(carry, step_rng):
        s, passes = carry
        done = passes >= 2
        if probs_fn is None:
            probs = jnp.full((s.turn.shape[0], NN), 1.0 / NN, jnp.float32)
        else:
            probs = probs_fn(s)
        from bokego_tpu.search.playout import select_moves

        actions = select_moves(step_rng, probs, s, avoid_eyes=True, done=done)
        s_next = rules.step_batch(s, actions)
        passes = jnp.where(
            done, passes, jnp.where(actions == PASS_ACTION, passes + 1, 0)
        )
        return (s_next, passes), None

    passes0 = jnp.zeros(states.turn.shape[0], jnp.int32)
    (final, _), _ = jax.lax.scan(
        body, (states, passes0), jax.random.split(rng, num_steps)
    )
    return final


def ownership(
    rng: jax.Array,
    state: GoState,
    n_playouts: int = 127,
    num_steps: int = 128,
    probs_fn=None,
) -> jnp.ndarray:
    """int8[81] majority owner of every point: BLACK, WHITE, or EMPTY
    (no-majority / persistently neutral).

    ``n_playouts`` odd avoids exact ties on settled points."""
    batch = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_playouts,) + x.shape), state
    )
    final = _resolve(rng, batch, num_steps, probs_fn)
    colors = rules.area_colors_batch(final.board)  # (K, 81) int8
    b_votes = (colors == BLACK).sum(axis=0)
    w_votes = (colors == WHITE).sum(axis=0)
    return jnp.where(
        b_votes > w_votes + (n_playouts - b_votes - w_votes),
        BLACK,
        jnp.where(
            w_votes > b_votes + (n_playouts - b_votes - w_votes), WHITE, EMPTY
        ),
    ).astype(jnp.int8)


def resolved_score(
    rng: jax.Array,
    state: GoState,
    n_playouts: int = 127,
    num_steps: int = 128,
    probs_fn=None,
) -> jnp.ndarray:
    """Dead-group-aware area score, black minus (white + komi).

    Each point goes to its majority owner across the playout resolutions;
    strict-majority voting sends seki-ish/contested points to neither side
    (gnugo's dame handling under ``--chinese-rules`` is the analog)."""
    own = ownership(rng, state, n_playouts, num_steps, probs_fn)
    b = (own == BLACK).sum(dtype=jnp.float32)
    w = (own == WHITE).sum(dtype=jnp.float32)
    return b - w - state.komi


def dead_stones(owner: jnp.ndarray, board: jnp.ndarray) -> jnp.ndarray:
    """bool[81]: stones standing on points the opponent owns (the groups
    gnugo would remove before counting)."""
    return ((board == BLACK) & (owner == WHITE)) | (
        (board == WHITE) & (owner == BLACK)
    )
