"""REINFORCE policy-gradient self-play training.

Replaces ``bin/selfplay.py`` with the algorithm it *documents* (report.pdf
p.4 §III.A.2): policy-gradient over whole batches of self-play games.  Two
reference defects are deliberately fixed (SURVEY.md §2.4):

* the committed ``reinforce`` backpropagates only the final game's loss per
  iteration (selfplay.py:116-120); here the loss sums over every game,
* hogwild unsynchronized Adam on shared memory (selfplay.py:157,118-120)
  becomes one synchronous update (dp-sharded with ``pmean`` when run on a
  mesh).

Structure parity: the trained policy plays half its games as black and half
as white against a sampled opponent from the versioned pool
(selfplay.py:161-195); rewards are ±1 game outcomes (Tromp-Taylor on
device; gnugo scoring optional on host); winrate stats are logged every 10
iterations (selfplay.py:112-114) and appended to ``RL_stats.txt``-style
files.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax

from bokego_tpu.coords import NN
from bokego_tpu.env import state as st
from bokego_tpu.features import features_batch
from bokego_tpu.models import inference
from bokego_tpu.search import playout as po


def _probs_fn(variables):
    def fn(states):
        return inference.policy_probs(variables, features_batch(states))

    return fn


def play_games(
    rng: jax.Array,
    train_vars,
    opp_vars,
    batch: int,
    max_turns: int,
    train_as_black: bool,
) -> tuple[po.Trajectory, jnp.ndarray]:
    """One batch of games; returns (trajectory, ±1 rewards for the trained
    policy).  Mirrors ``self_play`` (selfplay.py:49-57)."""
    states = st.new_game_batch(batch)
    even = _probs_fn(train_vars if train_as_black else opp_vars)
    odd = _probs_fn(opp_vars if train_as_black else train_vars)
    traj = po.playout(
        rng, even, odd, states, num_steps=max_turns + 1, max_turns=max_turns
    )
    r_black = po.rewards(traj.final)
    reward = r_black if train_as_black else -r_black
    return traj, reward


def reinforce_loss(params, batch_stats, traj: po.Trajectory, rewards, train_parity):
    """-(1/B) Σ_b R_b Σ_t log π(a_tb | s_tb) over the trained color's moves
    (selfplay.py:88-107 intent, summed over the whole batch).

    BN runs in inference mode for the gradient pass (design divergence: the
    reference forwards batch-size-1 through train-mode BatchNorm during
    replay, an artifact we do not reproduce).
    """
    T, B = traj.actions.shape
    flat_states = jax.tree.map(lambda x: x.reshape((T * B,) + x.shape[2:]), traj.states)
    fts = features_batch(flat_states)
    from bokego_tpu.models.nets import PolicyNet

    logits = PolicyNet().apply(
        {"params": params, "batch_stats": batch_stats}, fts, train=False
    )
    logp = jax.nn.log_softmax(logits, axis=-1).reshape(T, B, NN)

    actions = traj.actions  # (T, B)
    steps = jnp.arange(T)[:, None]
    mask = (steps % 2 == train_parity) & (actions < NN)
    safe_a = jnp.minimum(actions, NN - 1)
    chosen = jnp.take_along_axis(logp, safe_a[..., None], axis=-1)[..., 0]
    per_game = jnp.sum(jnp.where(mask, chosen, 0.0), axis=0)  # (B,)
    return -jnp.mean(per_game * rewards)


@dataclasses.dataclass
class ReinforceResult:
    variables: Any
    opt_state: Any
    winrates: list[float]


def make_update_step(tx: optax.GradientTransformation):
    @jax.jit
    def update(variables, opt_state, traj, rewards, train_parity):
        params, stats = variables["params"], variables["batch_stats"]
        loss, grads = jax.value_and_grad(reinforce_loss)(
            params, stats, traj, rewards, train_parity
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return {"params": params, "batch_stats": stats}, opt_state, loss

    return update


def train_epoch(
    rng: jax.Array,
    variables,
    opp_variables,
    *,
    n_iters: int = 64,
    batch_games: int = 16,
    max_turns: int = 70,
    lr: float = 1e-5,
    opt_state=None,
    log_fn=print,
    stats: list[float] | None = None,
) -> ReinforceResult:
    """One epoch of REINFORCE vs a fixed opponent (selfplay.py:59-122).

    Each iteration plays ``batch_games`` as black and ``batch_games`` as
    white (the reference's black/white worker split, selfplay.py:183-195)
    and applies one synchronous update per color batch.
    """
    tx = optax.adamw(lr)
    if opt_state is None:
        opt_state = tx.init(variables["params"])
    update = make_update_step(tx)
    play = jax.jit(partial(play_games, batch=batch_games, max_turns=max_turns,
                           train_as_black=True))
    play_w = jax.jit(partial(play_games, batch=batch_games, max_turns=max_turns,
                             train_as_black=False))

    winrates = stats if stats is not None else []
    for it in range(n_iters):
        rng, r1, r2 = jax.random.split(rng, 3)
        for as_black, player in ((True, play), (False, play_w)):
            traj, rewards = player(
                r1 if as_black else r2, variables, opp_variables
            )
            parity = 0 if as_black else 1
            variables, opt_state, _ = update(
                variables, opt_state, traj, rewards, parity
            )
            winrates.append(float((np.asarray(rewards) > 0).mean()))
        if (it + 1) % 10 == 0:
            recent = winrates[-20:]
            log_fn(f"iter {it + 1}: winrate {np.mean(recent):.2f}")
    return ReinforceResult(variables=variables, opt_state=opt_state, winrates=winrates)
