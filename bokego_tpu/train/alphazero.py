"""AlphaZero-style training: batched-MCTS self-play with visit-count policy
targets and outcome value targets.

Beyond the reference's capability set (its RL is REINFORCE over raw policy
playouts, selfplay.py; its value data comes from the genvals recipe) — this
is the modern closed loop the reference's architecture points toward
(report.pdf cites AlphaGo): every move of every game runs the full PUCT
search, the normalized root visit counts supervise the policy, and the
final Tromp-Taylor outcome supervises the value net.  Everything stays on
device; the game batch shards over a ``('dp',)`` mesh like the rest of the
framework.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from bokego_tpu.config import SearchConfig
from bokego_tpu.coords import NN, PASS_ACTION
from bokego_tpu.env import rules, state as st
from bokego_tpu.env.state import GoState
from bokego_tpu.features import features_batch
from bokego_tpu.models.nets import PolicyNet, ValueNet
from bokego_tpu.search import mcts
from bokego_tpu.search.tree import C_N


class AZTrajectory(NamedTuple):
    states: GoState  # (T, B, ...) — position before each move
    dists: jnp.ndarray  # (T, B, 81) — normalized root visit counts
    live: jnp.ndarray  # (T, B) — game still running at this move
    final: GoState  # (B,)


def selfplay_with_targets(
    rng: jax.Array,
    ev: mcts.Evaluator,
    params,
    cfg: SearchConfig,
    batch: int,
    n_moves: int,
    n_rollouts: int,
    temperature: float = 0.0,
    temp_moves: int | None = None,
) -> AZTrajectory:
    """Play ``batch`` games with full search per move, recording targets.

    ``temperature``: 0 = most-visited (the reference's ``choose``);
    > 0 samples actions proportional to visits^(1/T) (AlphaZero exploration).
    ``temp_moves``: when set, the sampling temperature applies only to the
    first ``temp_moves`` plies and play is greedy (most-visited) after —
    the AlphaZero opening-diversity schedule; endgame targets stay sharp.
    """

    def move_body(carry, xs):
        s, done = carry
        i, move_rng = xs
        init_rng, run_rng, sample_rng = jax.random.split(move_rng, 3)
        trees = mcts.init_trees(init_rng, s, ev, params, cfg)
        trees = mcts.run_search(run_rng, trees, ev, params, cfg, n_rollouts)
        row = mcts._take_rows(trees.pstats, trees.root)  # (B, 8, 128)
        visits = row[:, C_N, :NN]
        total = jnp.maximum(visits.sum(axis=1, keepdims=True), 1.0)
        dist = visits / total
        if temperature > 0:
            logits = jnp.log(jnp.maximum(visits, 1e-9)) / temperature
            logits = jnp.where(visits > 0, logits, -jnp.inf)
            actions = jax.random.categorical(sample_rng, logits, axis=-1)
            actions = jnp.where(
                visits.sum(axis=1) > 0, actions, PASS_ACTION
            ).astype(jnp.int32)
            if temp_moves is not None:
                greedy = jax.vmap(mcts.choose_action)(trees)
                actions = jnp.where(i < temp_moves, actions, greedy)
        else:
            actions = jax.vmap(mcts.choose_action)(trees)
        actions = jnp.where(done, PASS_ACTION, actions)
        s_next = rules.step_batch(s, actions)
        done_next = done | rules.is_terminal_batch(s_next, cfg.max_turns)
        return (s_next, done_next), (s, dist, ~done)

    rngs = jax.random.split(rng, n_moves)
    (final, _), (states, dists, live) = jax.lax.scan(
        move_body,
        (st.new_game_batch(batch), jnp.zeros((batch,), bool)),
        (jnp.arange(n_moves), rngs),
    )
    return AZTrajectory(states=states, dists=dists, live=live, final=final)


def az_losses(
    policy_params,
    policy_stats,
    value_params,
    value_stats,
    traj: AZTrajectory,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(policy CE vs visit dists, value MSE vs outcomes), masked to live
    moves.  Values target the side to move: z_t = outcome * (-1)^t."""
    T, B = traj.live.shape
    flat = jax.tree.map(lambda x: x.reshape((T * B,) + x.shape[2:]), traj.states)
    fts = features_batch(flat)
    logits = PolicyNet().apply(
        {"params": policy_params, "batch_stats": policy_stats}, fts, train=False
    ).reshape(T, B, NN)
    values = ValueNet().apply(
        {"params": value_params, "batch_stats": value_stats}, fts, train=False
    ).reshape(T, B)

    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -(traj.dists * logp).sum(axis=-1)  # (T, B)
    mask = traj.live.astype(jnp.float32)
    n = jnp.maximum(mask.sum(), 1.0)
    policy_loss = (ce * mask).sum() / n

    outcome = jnp.where(rules.score_batch(traj.final) > 0, 1.0, -1.0)  # (B,)
    parity = jnp.where(jnp.arange(T)[:, None] % 2 == 0, 1.0, -1.0)
    z = outcome[None, :] * parity
    value_loss = (((values - z) ** 2) * mask).sum() / n
    return policy_loss, value_loss


class AZState(NamedTuple):
    policy: Any  # {'params', 'batch_stats'}
    value: Any
    policy_opt: Any
    value_opt: Any


def make_az_step(tx_p: optax.GradientTransformation, tx_v: optax.GradientTransformation):
    @jax.jit
    def step(state: AZState, traj: AZTrajectory):
        def p_loss(params):
            pl, _ = az_losses(
                params, state.policy["batch_stats"],
                state.value["params"], state.value["batch_stats"], traj,
            )
            return pl

        def v_loss(params):
            _, vl = az_losses(
                state.policy["params"], state.policy["batch_stats"],
                params, state.value["batch_stats"], traj,
            )
            return vl

        pl, p_grads = jax.value_and_grad(p_loss)(state.policy["params"])
        vl, v_grads = jax.value_and_grad(v_loss)(state.value["params"])
        p_upd, p_opt = tx_p.update(p_grads, state.policy_opt, state.policy["params"])
        v_upd, v_opt = tx_v.update(v_grads, state.value_opt, state.value["params"])
        new = AZState(
            policy={**state.policy, "params": optax.apply_updates(
                state.policy["params"], p_upd)},
            value={**state.value, "params": optax.apply_updates(
                state.value["params"], v_upd)},
            policy_opt=p_opt,
            value_opt=v_opt,
        )
        return new, pl, vl

    return step


def train(
    rng: jax.Array,
    policy_vars,
    value_vars,
    *,
    iters: int = 4,
    batch: int = 64,
    n_moves: int = 80,
    n_rollouts: int = 64,
    cfg: SearchConfig | None = None,
    lr: float = 1e-3,
    temperature: float = 1.0,
    temp_moves: int | None = 12,
    updates_per_iter: int = 1,
    start_iter: int = 0,
    checkpoint_fn=None,
    log_fn=print,
) -> AZState:
    """Closed AZ loop: search self-play -> ``updates_per_iter`` updates per
    iteration (replaying the same trajectory batch; cheap sample reuse).

    Restartable: ``start_iter`` offsets the rng stream so a resumed run
    sees fresh games, and ``checkpoint_fn(it, state)``, when given, is
    called after every iteration (the CLI saves orbax checkpoints there —
    optimizer state intentionally restarts fresh, matching the reference's
    per-invocation Adam, selfplay.py:137).
    """
    if cfg is None:
        cfg = SearchConfig(
            expand_thresh=8, no_sim=True, max_nodes=512,
            noise_weight=0.25, max_turns=min(80, n_moves + 2),
        )
    ev = mcts.net_evaluator(has_value=True)
    tx_p, tx_v = optax.adamw(lr), optax.adamw(lr)
    state = AZState(
        policy=policy_vars,
        value=value_vars,
        policy_opt=tx_p.init(policy_vars["params"]),
        value_opt=tx_v.init(value_vars["params"]),
    )
    step = make_az_step(tx_p, tx_v)

    @jax.jit
    def play(rng, params):
        return selfplay_with_targets(
            rng, ev, params, cfg, batch, n_moves, n_rollouts, temperature,
            temp_moves,
        )
    for it in range(start_iter, start_iter + iters):
        sub = jax.random.fold_in(rng, it)
        traj = play(sub, {"policy": state.policy, "value": state.value})
        for _ in range(updates_per_iter):
            state, pl, vl = step(state, traj)
        wins = float((np.asarray(rules.score_batch(traj.final)) > 0).mean())
        log_fn(f"az iter {it + 1}: policy_ce {float(pl):.3f} "
               f"value_mse {float(vl):.3f} black_winrate {wins:.2f}")
        if checkpoint_fn is not None:
            checkpoint_fn(it + 1, state)
    return state
