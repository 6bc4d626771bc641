"""Value-net training-data generation.

The reference recipe (report.pdf p.4 §III.B; bin/genvals.py intent — the
committed script is broken, SURVEY.md §2.4): play the SL policy for
``r ~ U[70, 90)`` moves, inject one uniformly-random legal move (the
labeled position), finish the game with the RL policy to turn 90, and label
with whether the random-move player won.  Emitted rows are
``(board, ko, move, val)`` with val ∈ {0, 1}, ×8 dihedral copies.

Vectorized: every game in the batch runs in one ``lax.scan``; per-board
``r`` values switch each board from πSL to πRL independently, and the
random move fires on the board's own step ``r`` — no per-game Python.

Divergence (documented): the reference computes the label with a truthiness
bug (``not result`` on a ±1 score, genvals.py:41); we implement the
documented intent.  Labels default to dead-group-aware resolved scoring
(env/scoring.py — the native equivalent of the reference's gnugo judgment,
go.py:512-526); ``resolved_labels=False`` gives raw device Tromp-Taylor.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from bokego_tpu.coords import NN
from bokego_tpu.env import rules, state as st
from bokego_tpu.features import features_batch
from bokego_tpu.models import inference
from bokego_tpu.search.playout import select_moves
from bokego_tpu.train.data import d4_apply_moves


class ValueSamples(NamedTuple):
    board: jnp.ndarray  # (B, 81) int8 — position after the random move
    ko: jnp.ndarray  # (B,)
    move: jnp.ndarray  # (B,) the injected random move
    val: jnp.ndarray  # (B,) 1 iff the random-move player won
    ok: jnp.ndarray  # (B,) sample validity (game reached its r-th turn)


def generate(
    rng: jax.Array,
    sl_vars,
    rl_vars,
    batch: int,
    *,
    max_turns: int = 90,
    min_r: int = 70,
    max_r: int = 90,
    resolved_labels: bool = True,
    resolve_playouts: int = 17,  # odd: avoids exact ownership-vote ties
) -> ValueSamples:
    """One batch of labeled positions (gen_game, genvals.py:17-42)."""
    r_rng, play_rng, res_rng = jax.random.split(rng, 3)
    r = jax.random.randint(r_rng, (batch,), min_r, max_r)  # (B,)

    states = st.new_game_batch(batch)
    done0 = jnp.zeros((batch,), bool)
    rec0 = ValueSamples(
        board=states.board,
        ko=states.ko,
        move=jnp.zeros((batch,), jnp.int32),
        val=jnp.zeros((batch,), jnp.int32),
        ok=jnp.zeros((batch,), bool),
    )

    def body(carry, step_rng):
        s, done, rec, step_i = carry
        fts = features_batch(s)
        probs_sl = inference.policy_probs(sl_vars, fts)
        probs_rl = inference.policy_probs(rl_vars, fts)
        probs = jnp.where((step_i < r)[:, None], probs_sl, probs_rl)
        # on each board's step r, override with a uniformly-random legal move
        legal = rules.legal_mask_batch(s)[:, :NN]
        uniform = legal.astype(jnp.float32)
        is_r = step_i == r
        probs = jnp.where(is_r[:, None], uniform, probs)
        actions = select_moves(step_rng, probs, s, avoid_eyes=False, done=done)
        s_next = rules.step_batch(s, actions)
        # record the labeled position right after the random move
        take = is_r & ~done & (actions < NN)
        rec = ValueSamples(
            board=jnp.where(take[:, None], s_next.board, rec.board),
            ko=jnp.where(take, s_next.ko, rec.ko),
            move=jnp.where(take, actions, rec.move),
            val=rec.val,
            ok=rec.ok | take,
        )
        done = done | rules.is_terminal_batch(s_next, max_turns)
        return (s_next, done, rec, step_i + 1), None

    rngs = jax.random.split(play_rng, max_turns + 1)
    (final, _, rec, _), _ = jax.lax.scan(
        body, (states, done0, rec0, jnp.int32(0)), rngs
    )

    if resolved_labels:
        # gnugo-style dead-group judgment of each final position (the
        # reference labels with ``gnu_score``, genvals.py:38-41)
        from bokego_tpu.env import scoring

        score = jax.vmap(
            lambda r, s: scoring.resolved_score(
                r, s, n_playouts=resolve_playouts, num_steps=96
            )
        )(jax.random.split(res_rng, batch), final)
    else:
        score = rules.score_batch(final)
    black_won = score > 0
    rand_is_black = r % 2 == 0
    val = (black_won == rand_is_black).astype(jnp.int32)
    return rec._replace(val=val)


def samples_to_rows(samples: ValueSamples) -> list[tuple[str, int | None, int, int]]:
    """Host rows (board, ko, move, val), valid samples only."""
    dec = {0: ".", 1: "X", 2: "O"}
    rows = []
    board = np.asarray(samples.board)
    ko = np.asarray(samples.ko)
    move = np.asarray(samples.move)
    val = np.asarray(samples.val)
    ok = np.asarray(samples.ok)
    for b in range(board.shape[0]):
        if not ok[b]:
            continue
        bs = "".join(dec[int(c)] for c in board[b])
        rows.append((bs, None if ko[b] < 0 else int(ko[b]), int(move[b]), int(val[b])))
    return rows


def _d4_board(board_str: str, k: int) -> str:
    arr = np.frombuffer(board_str.encode(), dtype=np.uint8).reshape(9, 9)
    if k >= 4:
        arr = arr.T
    arr = np.rot90(arr, k % 4)
    return arr.tobytes().decode()


def write_csv(path: str, rows, augment: bool = True, header: bool = True):
    """Append rows ×8 dihedral copies (genvals.py:73-80 intent)."""
    import os

    new = not os.path.exists(path)
    with open(path, "a+") as f:
        if new and header:
            f.write("board,ko,last,val\n")
        for board, ko, move, val in rows:
            ks = range(8) if augment else (0,)
            for k in ks:
                b = _d4_board(board, k)
                m = int(d4_apply_moves(np.asarray(move), k))
                kk = ko if ko is None else int(d4_apply_moves(np.asarray(ko), k))
                f.write(f"{b},{'' if kk is None else kk},{m},{val}\n")
