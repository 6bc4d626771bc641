"""bokego_tpu — a TPU-native 9x9 Go engine and training framework.

A ground-up JAX/XLA rebuild of the capabilities of BokeGo
(github.com/meiji163/bokego): exact 9x9 rules with Zobrist hashing, 27-plane
features, policy/value convnets, batched PUCT MCTS, a GTP frontend, and
supervised/REINFORCE/value-data training pipelines — all designed so that
thousands of boards and search trees step in lockstep on TPU.
"""

__version__ = "0.1.0"

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
