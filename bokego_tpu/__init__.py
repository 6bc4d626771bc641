"""bokego_tpu — a TPU-native 9x9 Go engine and training framework.

A ground-up JAX/XLA rebuild of the capabilities of BokeGo
(github.com/meiji163/bokego): exact 9x9 rules with Zobrist hashing, 27-plane
features, policy/value convnets, batched PUCT MCTS, a GTP frontend, and
supervised/REINFORCE/value-data training pipelines — all designed so that
thousands of boards and search trees step in lockstep on TPU.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    # Honor JAX_PLATFORMS=cpu in THIS container: the axon sitecustomize
    # pre-registers the TPU plugin in a way that outranks the env var, so
    # `JAX_PLATFORMS=cpu python tool.py` would still try (and, during a
    # tunnel outage, hang forever on) the TPU backend.  jax.config wins
    # over the plugin as long as no backend is initialized yet — which
    # holds at first import of this package.  No-op everywhere else.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", "cpu")
    except Exception:  # backend already up: respect whatever won
        pass

from bokego_tpu import coords
from bokego_tpu.coords import BLACK, EMPTY, N, NN, PASS, RESIGN, WHITE

__all__ = [
    "coords",
    "N",
    "NN",
    "PASS",
    "RESIGN",
    "EMPTY",
    "BLACK",
    "WHITE",
]
