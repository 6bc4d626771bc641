"""Supervised training for the policy and value nets.

Replaces ``bin/train.py`` (fixed: the committed script imports a stale
module name, train.py:6, and only the ValueNet path is live).  Both heads
are supported: cross-entropy on moves for the policy, MSE on game outcomes
for the value net (train.py:27-32; report.pdf p.4 §III.A.1/III.B).

Multi-chip: the train step is wrapped in ``shard_map`` over a ``('dp',)``
mesh — batches shard along the data axis, params are replicated, gradients
all-reduce with ``psum`` over ICI (the synchronous-DP replacement for the
reference's hogwild shared-memory updates — SURVEY.md §2.2).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp
import optax

from bokego_tpu.models.nets import PolicyNet, ValueNet
from bokego_tpu.parallel import mesh as mesh_lib
from bokego_tpu.train.data import GoDataset


@dataclasses.dataclass
class TrainState:
    variables: Any  # {'params', 'batch_stats'}
    opt_state: Any
    epoch: int = 0


def make_policy_loss(net: PolicyNet):
    def loss_fn(params, batch_stats, fts, moves):
        logits, updates = net.apply(
            {"params": params, "batch_stats": batch_stats},
            fts,
            train=True,
            mutable=["batch_stats"],
        )
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, moves).mean()
        return loss, updates["batch_stats"]

    return loss_fn


def make_value_loss(net: ValueNet):
    def loss_fn(params, batch_stats, fts, vals):
        out, updates = net.apply(
            {"params": params, "batch_stats": batch_stats},
            fts,
            train=True,
            mutable=["batch_stats"],
        )
        loss = jnp.mean((out[:, 0] - vals) ** 2)
        return loss, updates["batch_stats"]

    return loss_fn


def make_train_step(loss_fn, tx: optax.GradientTransformation, n_devices: int = 1):
    """Build the jitted (optionally dp-sharded) SGD step."""

    def step(variables, opt_state, fts, targets):
        params, batch_stats = variables["params"], variables["batch_stats"]

        def dp_step(fts_l, targets_l):
            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, fts_l, targets_l
            )
            if n_devices > 1:
                grads = jax.lax.pmean(grads, "dp")
                loss = jax.lax.pmean(loss, "dp")
                new_stats = jax.lax.pmean(new_stats, "dp")
            return loss, new_stats, grads

        if n_devices > 1:
            from jax.sharding import PartitionSpec as P
            from jax import shard_map

            m = mesh_lib.get_mesh(n_devices)
            loss, new_stats, grads = shard_map(
                dp_step,
                mesh=m,
                in_specs=(P("dp"), P("dp")),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )(fts, targets)
        else:
            loss, new_stats, grads = dp_step(fts, targets)

        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return {"params": params, "batch_stats": new_stats}, opt_state, loss

    return jax.jit(step)


def train(
    dataset: GoDataset,
    variables,
    *,
    kind: str = "value",
    epochs: int = 1,
    batch_size: int = 32,
    lr: float = 1e-2,
    weight_decay: float = 0.0,
    n_devices: int = 1,
    seed: int = 0,
    opt_state=None,
    start_epoch: int = 0,
    log_every: int = 100,
    log_fn: Callable[[str], None] = print,
    stats_path: str | None = None,
) -> TrainState:
    """Epoch loop matching train.py:52-93 (loss logging, checkpointable
    state, stats file append)."""
    net = ValueNet() if kind == "value" else PolicyNet()
    loss_fn = make_value_loss(net) if kind == "value" else make_policy_loss(net)
    tx = (
        optax.adamw(lr, weight_decay=weight_decay)
        if weight_decay
        else optax.adam(lr)
    )
    if opt_state is None:
        opt_state = tx.init(variables["params"])
    step = make_train_step(loss_fn, tx, n_devices)

    rng = np.random.default_rng(seed)
    epoch = start_epoch
    t_all = time.monotonic()
    total_steps = 0
    for _ in range(epochs):
        t0 = time.monotonic()
        losses, count = [], 0
        # running loss stays ON DEVICE between logs: float(loss) every step
        # would sync the pipeline and cap throughput at dispatch latency
        running = jnp.zeros(())
        for fts, targets in dataset.batches(batch_size, rng):
            variables, opt_state, loss = step(
                variables, opt_state, jnp.asarray(fts), jnp.asarray(targets)
            )
            running = running + loss
            count += 1
            if count % log_every == 0:
                r = float(running)
                log_fn(f"epoch {epoch + 1} step {count}: loss {r:.4f}")
                losses.append(r)
                running = jnp.zeros(())
        jax.block_until_ready(variables["params"])
        epoch += 1
        total_steps += count
        dt = time.monotonic() - t0
        pos_s = count * batch_size / dt
        log_fn(
            f"epoch {epoch} done in {dt:.1f}s ({count} steps, "
            f"{1e3 * dt / max(count, 1):.1f} ms/step, {pos_s:,.0f} positions/s)"
        )
        if stats_path:
            with open(stats_path, "a+") as f:
                f.write(f"Epoch: {epoch}\n")
                f.write(",".join(f"{x:.3f}" for x in losses) + "\n")
    dt_all = time.monotonic() - t_all
    if total_steps and epochs > 1:
        log_fn(
            f"{epochs} epochs in {dt_all:.1f}s: "
            f"{total_steps * batch_size / dt_all:,.0f} positions/s overall"
        )
    return TrainState(variables=variables, opt_state=opt_state, epoch=epoch)
