"""27-plane feature encoder, vectorized.

Plane semantics follow ``nnet.features`` (nnet.py:182-262) exactly:

====  =====================================================================
 0    player stones (side to move)
 1    opponent stones
 2    empty points
 3    turn plane — all ones iff black to move
 4    last move one-hot (zeros after a pass or at game start)
 5    legal-move mask for the side to move
6-12  liberties, bucketed: plane 6+i holds value i+1 where the stone's
      group has i+1 liberties (i<6); plane 12 holds 7 where libs > 6
13-19 liberties after playing, same bucketing, only at legal points
20-26 opponent stones captured by playing, same bucketing, only at legal
      points (reference computes caps only when a capture occurs — zero
      otherwise, which the bucketing already produces)
====  =====================================================================

The reference computes planes 13-26 with a Python loop over legal moves
doing fresh flood fills per move (nnet.py:241-247) — the single hottest
path in its engine.  Here they fall out of :func:`rules.move_tables` as
dense tensor algebra.

Layout: device-native output is NHWC ``(9, 9, 27)`` (batched:
``(B, 9, 9, 27)``); use :func:`to_nchw` for reference-layout parity tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bokego_tpu.coords import NN
from bokego_tpu.env.rules import move_tables
from bokego_tpu.env.state import BLACK, EMPTY, GoState

NUM_PLANES = 27


def _bucketize(arr: jnp.ndarray) -> jnp.ndarray:
    """(81,) int -> (81, 7) float planes per nnet.py:253-258 ``separate``."""
    cols = [jnp.where(arr == i + 1, float(i + 1), 0.0) for i in range(6)]
    cols.append(jnp.where(arr > 6, 7.0, 0.0))
    return jnp.stack(cols, axis=-1)


def features(state: GoState) -> jnp.ndarray:
    """GoState -> float32 (9, 9, 27) NHWC feature planes."""
    mt = move_tables(state.board, state.ko, state.to_play)
    return features_from_tables(state, mt)


def features_from_tables(state: GoState, mt) -> jnp.ndarray:
    """Feature planes from a precomputed move analysis (lets the search's
    eval phase share one group analysis between features and successor
    generation — rules.leaf_analysis)."""
    board = state.board
    color = state.to_play

    player = (board == color).astype(jnp.float32)
    oppt = ((board != EMPTY) & (board != color)).astype(jnp.float32)
    empty = (board == EMPTY).astype(jnp.float32)
    turn = jnp.full((NN,), (color == BLACK).astype(jnp.float32))
    last_mv = (
        (jnp.arange(NN) == state.last_move) & (state.last_move >= 0)
    ).astype(jnp.float32)
    legal = mt.legal.astype(jnp.float32)

    libs7 = _bucketize(mt.info.libs)  # (81, 7)
    libs_after7 = _bucketize(mt.libs_after)
    caps7 = _bucketize(mt.caps)

    planes = jnp.concatenate(
        [
            jnp.stack([player, oppt, empty, turn, last_mv, legal], axis=-1),
            libs7,
            libs_after7,
            caps7,
        ],
        axis=-1,
    )  # (81, 27)
    return planes.reshape(9, 9, NUM_PLANES)


features_batch = jax.vmap(features)


def to_nchw(fts: jnp.ndarray) -> jnp.ndarray:
    """NHWC (..., 9, 9, 27) -> reference NCHW (..., 27, 9, 9)."""
    return jnp.moveaxis(fts, -1, -3)
