"""Batched MCTS self-play: full games at scale (BASELINE.json config 4).

Every move of every game runs a fresh-tree PUCT search (the reference plays
one game per process with one shared tree, SURVEY.md §3.3); here a batch of
B games advances in lockstep — per move: init B trees, run R synchronized
rollouts (each a single batched net eval), choose, step.  Sharding the game
batch over a ``('dp',)`` mesh scales this across chips with no code change:
all collectives are XLA-inserted from the sharding annotations (GSPMD).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bokego_tpu.config import SearchConfig
from bokego_tpu.coords import PASS_ACTION
from bokego_tpu.env import rules, state as st
from bokego_tpu.env.state import GoState
from bokego_tpu.search import mcts


class SelfplayResult(NamedTuple):
    final: GoState  # (B,)
    actions: jnp.ndarray  # (n_moves, B) — PASS once a game is done
    scores: jnp.ndarray  # (B,) Tromp-Taylor


@partial(jax.jit, static_argnames=("ev", "cfg", "batch", "n_moves", "n_rollouts"))
def selfplay(
    rng: jax.Array,
    params,
    ev: mcts.Evaluator,
    cfg: SearchConfig,
    batch: int,
    n_moves: int,
    n_rollouts: int,
) -> SelfplayResult:
    """Play ``batch`` games for ``n_moves`` plies of MCTS each."""
    states = st.new_game_batch(batch)

    def move_body(carry, move_rng):
        s, done = carry
        actions, _ = mcts.search(move_rng, s, ev, params, cfg, n_rollouts)
        actions = jnp.where(done, PASS_ACTION, actions)
        s_next = rules.step_batch(s, actions)
        done = done | rules.is_terminal_batch(s_next, cfg.max_turns)
        return (s_next, done), actions

    rngs = jax.random.split(rng, n_moves)
    (final, _), actions = jax.lax.scan(
        move_body, (states, jnp.zeros((batch,), bool)), rngs
    )
    return SelfplayResult(final=final, actions=actions, scores=rules.score_batch(final))


def selfplay_sharded(
    mesh,
    rng: jax.Array,
    params,
    ev: mcts.Evaluator,
    cfg: SearchConfig,
    batch: int,
    n_moves: int,
    n_rollouts: int,
) -> SelfplayResult:
    """Run self-play with the game batch sharded across the mesh.

    Params are replicated; every batched tensor (boards, trees, features,
    net activations) shards along 'dp'.  XLA partitions the whole program
    from these annotations — the net forwards become per-chip batches and
    no manual collectives are required on this path.
    """
    from bokego_tpu.parallel import mesh as mesh_lib

    params = mesh_lib.replicate(mesh, params)
    with jax.set_mesh(mesh):
        return selfplay(rng, params, ev, cfg, batch, n_moves, n_rollouts)
