"""Batched inference helpers over the policy/value nets.

Replaces ``nnet.policy_dist`` / ``nnet.value`` / ``nnet.policy_sample``
(nnet.py:265-297) — but batch-first: every function takes ``(B, ...)``
feature stacks, because on TPU the unit of work is thousands of positions,
never one (the reference evaluates batch=1 per tree node — SURVEY.md §3.1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from bokego_tpu.features import features_batch
from bokego_tpu.models.nets import PolicyNet, PolicyNetV2, ValueNet

_policy = PolicyNet()
_policy_v2 = PolicyNetV2()
_value = ValueNet()


def policy_logits(variables: dict, fts: jnp.ndarray) -> jnp.ndarray:
    """(B, 9, 9, 27) -> (B, 81) logits (eval mode, running BN stats)."""
    return _policy.apply(variables, fts, train=False)


def policy_logits_v2(variables: dict, fts: jnp.ndarray) -> jnp.ndarray:
    return _policy_v2.apply(variables, fts, train=False)


def policy_probs(variables: dict, fts: jnp.ndarray) -> jnp.ndarray:
    """Softmax over the 81 points (the reference's ``policy_dist``)."""
    return jax.nn.softmax(policy_logits(variables, fts), axis=-1)


def value_fn(variables: dict, fts: jnp.ndarray) -> jnp.ndarray:
    """(B, 9, 9, 27) -> (B,) value in (-1, 1) for the side to move."""
    return _value.apply(variables, fts, train=False)[..., 0]


def policy_value_states(policy_vars, value_vars, states):
    """Batch of GoStates -> (probs (B, 81), values (B,)); features computed
    on device."""
    fts = features_batch(states)
    return policy_probs(policy_vars, fts), value_fn(value_vars, fts)


@partial(jax.jit, static_argnames=())
def sample_moves(
    rng: jax.Array, probs: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Sample one move per row from ``probs`` restricted to ``mask``.

    Masked-renormalized categorical sampling.  (Design divergence from
    ``selfplay.legal_sample`` (selfplay.py:35-47), which samples the
    unmasked distribution and falls back to the highest-ranked legal move on
    a miss; masking is branch-free and keeps everything on device.  If no
    masked probability mass remains, falls back to uniform over the mask.)
    Rows with an all-false mask return PASS (81).
    """
    p = jnp.where(mask[..., : probs.shape[-1]], probs, 0.0)
    total = p.sum(axis=-1, keepdims=True)
    any_legal = mask[..., : probs.shape[-1]].any(axis=-1)
    uniform = mask[..., : probs.shape[-1]].astype(probs.dtype)
    p = jnp.where(total > 0, p, uniform)
    logits = jnp.log(jnp.maximum(p, 1e-30))
    logits = jnp.where(mask[..., : probs.shape[-1]], logits, -jnp.inf)
    mv = jax.random.categorical(rng, logits, axis=-1)
    return jnp.where(any_legal, mv, jnp.int32(probs.shape[-1]))
