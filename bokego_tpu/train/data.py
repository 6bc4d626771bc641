"""Training data: npz/csv loading, feature precomputation, D4 augmentation.

Replaces ``nnet.NinebyNineGames`` + ``process_csv`` + ``rand_refl/rand_rot``
(nnet.py:299-384), several of which are broken as committed (SURVEY.md §2.4)
— this is the working implementation of their documented intent.

Formats (reference-compatible):
* ``.npz`` with ``features`` (n, 27, 9, 9) NCHW float and either ``moves``
  or ``vals`` (n, 1) (nnet.py:316-325).  Stored NCHW for reference
  compatibility; loaded into NHWC for the TPU nets.
* ``.csv`` with positional columns (board, ko, last, move|val): board is the
  81-char ``.XO`` string; the side to move is the opponent of the stone at
  ``last`` (process_csv, nnet.py:366-383).

The dihedral (D4) group acts on features by spatial transform and on move
indices by the matching coordinate map — all 8 symmetries, with remapping
verified against feature-plane equivariance in tests.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import numpy as np

import jax
import jax.numpy as jnp

from bokego_tpu.coords import N
from bokego_tpu.env import state as st
from bokego_tpu.features import features_batch


def d4_apply_planes(fts: np.ndarray, k: int) -> np.ndarray:
    """Apply symmetry k (0..7) to NHWC planes (..., 9, 9, C).

    k = rot + 4 * refl: first (optionally) transpose (reflect about the main
    diagonal), then rotate 90° counterclockwise ``rot`` times.
    """
    out = fts
    if k >= 4:
        out = np.swapaxes(out, -3, -2)
    return np.rot90(out, k % 4, axes=(-3, -2))


def d4_apply_moves(moves: np.ndarray, k: int) -> np.ndarray:
    """Apply the same symmetry to squashed move indices (PASS < 0 fixed)."""
    moves = np.asarray(moves)
    x, y = moves // N, moves % N
    if k >= 4:
        x, y = y, x
    for _ in range(k % 4):
        # rot90 counterclockwise on (row, col): (x, y) -> (N-1-y, x)
        x, y = N - 1 - y, x
    out = N * x + y
    return np.where(moves < 0, moves, out)


def augment_batch(fts, targets, k, is_move_target: bool):
    f = d4_apply_planes(fts, k)
    t = d4_apply_moves(targets, k) if is_move_target else targets
    return f, t


@dataclasses.dataclass
class GoDataset:
    """In-memory dataset of (features NHWC, targets)."""

    features: np.ndarray  # (n, 9, 9, 27) float32
    targets: np.ndarray  # (n,) int32 moves or float32 values
    is_value: bool

    def __len__(self):
        return self.features.shape[0]

    def batches(
        self, batch_size: int, rng: np.random.Generator, augment: bool = True
    ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        """Shuffled epoch of minibatches with random D4 augmentation."""
        idx = rng.permutation(len(self))
        for i in range(0, len(self) - batch_size + 1, batch_size):
            sel = idx[i : i + batch_size]
            f, t = self.features[sel], self.targets[sel]
            if augment:
                k = int(rng.integers(8))
                f, t = augment_batch(f, t, k, not self.is_value)
            yield f, t


def load_npz(path: str) -> GoDataset:
    """Reference npz layout (nnet.py:316-325)."""
    z = np.load(path)
    fts = np.moveaxis(z["features"].astype(np.float32), 1, -1)  # NCHW -> NHWC
    if "vals" in z.files:
        return GoDataset(fts, z["vals"].reshape(-1).astype(np.float32), True)
    key = "moves" if "moves" in z.files else "targets"
    return GoDataset(fts, z[key].reshape(-1).astype(np.int32), False)


_feat_jit = jax.jit(features_batch)


def rows_to_features(rows: list[tuple[str, int | None, int]], chunk: int = 1024):
    """Featurize (board, ko, last) rows on device in chunks.

    The side to move is derived from the color of the ``last`` stone
    (process_csv: turn = 1 iff board[last] is black, nnet.py:377).
    """
    out = []
    for i in range(0, len(rows), chunk):
        block = rows[i : i + chunk]
        states = [
            st.from_board_string(
                b, ko=ko, turn=(1 if b[last] == "X" else 0), last_move=last
            )
            for b, ko, last in block
        ]
        batch = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        out.append(np.asarray(_feat_jit(batch)))
    return np.concatenate(out, axis=0)


def load_csv(path: str) -> GoDataset:
    """Reference csv layout: board, ko, last, move|val (positional)."""
    import csv as _csv

    rows, targets = [], []
    with open(path) as f:
        reader = _csv.reader(f)
        header = next(reader)
        is_value = header[-1].strip().lower() == "val"
        for rec in reader:
            if not rec:
                continue
            board, ko, last, target = rec[0], rec[1], rec[2], rec[3]
            ko_i = None if ko in ("", "None") else int(ko)
            rows.append((board, ko_i, int(last)))
            targets.append(target)
    fts = rows_to_features(rows)
    if is_value:
        # val ∈ {0,1}: 1 = the player who made the labeled (random) move
        # won; value for the side to move is the negation (nnet.py:379-380)
        t = np.array([-1.0 if v in ("1", "True") else 1.0 for v in targets],
                     np.float32)
    else:
        t = np.array([int(v) for v in targets], np.int32)
    return GoDataset(fts, t, is_value)


def load(path: str) -> GoDataset:
    if path.endswith(".npz"):
        return load_npz(path)
    if path.endswith(".csv"):
        return load_csv(path)
    raise ValueError(f"unsupported dataset {path}")


def save_npz(path: str, dataset: GoDataset):
    """Write the reference-compatible compressed npz (NCHW)."""
    payload = {"features": np.moveaxis(dataset.features, -1, 1)}
    payload["vals" if dataset.is_value else "moves"] = dataset.targets.reshape(-1, 1)
    np.savez_compressed(path, **payload)
