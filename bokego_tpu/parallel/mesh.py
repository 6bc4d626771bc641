"""Device mesh and sharding helpers.

The framework's scaling axis is the batch of boards/trees/games
(SURVEY.md §2.2): a 1-D ``('dp',)`` mesh shards every batch dimension across
chips while net params stay replicated; gradients and stats combine with
``psum``/``pmean`` over ICI.  This replaces the reference's
``torch.multiprocessing`` hogwild fan-out (selfplay.py:177-199) with
synchronous SPMD.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("dp",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across 'dp'."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree with its leading axis sharded over the mesh."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
