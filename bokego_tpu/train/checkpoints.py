"""Orbax checkpointing and the versioned opponent pool.

Replaces the reference's torch-pickle ``{"model_state_dict",
"optimizer_state_dict"[, "epoch"]}`` files (train.py:35-44, selfplay.py:
143-157, boke.py:31-38) with orbax directories holding the same logical
contents: net variables, optimizer state, and step/epoch metadata.  The
``policy_<n>`` naming convention doubles as the RL opponent pool exactly
like the reference's weights directory (selfplay.py:139-144).
"""

from __future__ import annotations

import os
import re

import jax
import orbax.checkpoint as ocp


def _ckptr():
    return ocp.StandardCheckpointer()


def save_variables(path: str, variables, opt_state=None, meta: dict | None = None):
    """Save net variables (+ optional optimizer state and metadata)."""
    path = os.path.abspath(path)
    payload = {"variables": variables}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if meta:
        payload["meta"] = meta
    c = _ckptr()
    c.save(path, payload, force=True)
    c.wait_until_finished()


def load_checkpoint(path: str) -> dict:
    """Load the full payload dict saved by :func:`save_variables`.

    Restores to host numpy arrays so checkpoints are portable across
    backends (a TPU-saved checkpoint must load in a CPU-forced process —
    StandardCheckpointer would try to re-place arrays on the saved device
    and fail).  JAX re-commits the arrays on first use.
    """
    import numpy as np

    c = ocp.PyTreeCheckpointer()
    path = os.path.abspath(path)
    meta = c.metadata(path)
    tree = meta.item_metadata if hasattr(meta, "item_metadata") else meta
    return c.restore(
        path,
        restore_args=jax.tree.map(
            lambda m: ocp.RestoreArgs(restore_type=np.ndarray), tree
        ),
    )


def load_variables(path: str):
    return load_checkpoint(path)["variables"]


# -- opponent pool (policy_<n> directories) ---------------------------------

_POOL_RE = re.compile(r"policy_(\d+)$")


def pool_ids(weights_dir: str) -> list[int]:
    """Sorted generation numbers present in the pool."""
    if not os.path.isdir(weights_dir):
        return []
    out = []
    for name in os.listdir(weights_dir):
        m = _POOL_RE.match(name)
        if m and os.path.isdir(os.path.join(weights_dir, name)):
            out.append(int(m.group(1)))
    return sorted(out)


def pool_path(weights_dir: str, n: int) -> str:
    return os.path.join(weights_dir, f"policy_{n}")


def latest_policy(weights_dir: str) -> tuple[int, dict] | None:
    ids = pool_ids(weights_dir)
    if not ids:
        return None
    n = ids[-1]
    return n, load_checkpoint(pool_path(weights_dir, n))


def save_next_policy(weights_dir: str, variables, opt_state=None) -> int:
    """Append the next generation to the pool (selfplay.py:206-208)."""
    ids = pool_ids(weights_dir)
    n = (ids[-1] + 1) if ids else 0
    os.makedirs(weights_dir, exist_ok=True)
    save_variables(pool_path(weights_dir, n), variables, opt_state)
    return n


def sample_opponent(weights_dir: str, rng) -> tuple[int, dict]:
    """Pick a random previous generation (selfplay.py:161-174: random
    opponent from the pool, policy_0 = the SL policy)."""
    ids = pool_ids(weights_dir)
    if not ids:
        raise FileNotFoundError(f"no policies in {weights_dir}")
    n = int(rng.choice(ids))
    return n, load_checkpoint(pool_path(weights_dir, n))
