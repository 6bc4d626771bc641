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

from bokego_tpu.coords import N, NN
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


# -- packed / streaming datasets ---------------------------------------------
#
# The in-memory GoDataset holds precomputed feature planes — (n, 9, 9, 27)
# f32 is ~8.7 KB/position, which caps out long before the reference's SL
# scale (23M pairs ≈ 200 GB, report.pdf p.4 §III.A.1).  The TPU-native
# answer: keep positions in their RAW form (84 bytes each: board + ko + last
# + turn) and compute the 27 feature planes ON DEVICE per minibatch — one
# extra label-propagation per step, overlapped with the optimizer update.
# 23M raw positions ≈ 1.9 GB; shards stream from disk at constant memory.

_BOARD_LUT = np.zeros(256, np.uint8)
_BOARD_LUT[ord("X")] = 1
_BOARD_LUT[ord("O")] = 2


def _encode_boards(board_strs: list[str]) -> np.ndarray:
    """81-char '.XO' strings -> uint8 (n, 81)."""
    raw = np.frombuffer("".join(board_strs).encode(), np.uint8)
    return _BOARD_LUT[raw.reshape(-1, NN)]


def d4_apply_boards(boards: np.ndarray, k: int) -> np.ndarray:
    """Apply symmetry k to raw boards (..., 81) — same group action as
    :func:`d4_apply_planes` (index sq = 9*row + col)."""
    b = boards.reshape(boards.shape[:-1] + (N, N))
    if k >= 4:
        b = np.swapaxes(b, -2, -1)
    b = np.rot90(b, k % 4, axes=(-2, -1))
    return np.ascontiguousarray(b).reshape(boards.shape)


@dataclasses.dataclass
class PackedDataset:
    """Raw positions in memory; feature planes computed on device per batch.

    Fields use the device encoding of :class:`GoState`: ``ko``/``last`` are
    -1 when absent, ``last`` may be 81 (PASS).  ``turn`` is the move parity
    (0 = black to play).
    """

    boards: np.ndarray  # uint8 (n, 81)
    ko: np.ndarray  # int16 (n,)
    last: np.ndarray  # int16 (n,)
    turn: np.ndarray  # int8 (n,)
    targets: np.ndarray  # int32 moves or float32 values
    is_value: bool

    def __len__(self):
        return self.boards.shape[0]

    def _featurize(self, sel: np.ndarray, k: int | None):
        boards = self.boards[sel]
        ko = self.ko[sel].astype(np.int32)
        last = self.last[sel].astype(np.int32)
        targets = self.targets[sel]
        if k:
            boards = d4_apply_boards(boards, k)
            ko = d4_apply_moves(ko, k)
            # PASS (81) and none (-1) are fixed points of the action map
            last = np.where(last >= NN, last, d4_apply_moves(last, k))
            if not self.is_value:
                targets = d4_apply_moves(targets, k).astype(np.int32)
        n = boards.shape[0]
        states = st.GoState(
            board=jnp.asarray(boards.astype(np.int8)),
            ko=jnp.asarray(ko),
            turn=jnp.asarray(self.turn[sel], jnp.int32),
            last_move=jnp.asarray(last),
            hash=jnp.zeros((n, 2), jnp.uint32),  # unused by features
            komi=jnp.full((n,), st.DEFAULT_KOMI, jnp.float32),
            invalid=jnp.zeros((n,), bool),
        )
        return _feat_jit(states), targets

    def batches(
        self, batch_size: int, rng: np.random.Generator, augment: bool = True
    ) -> Iterator[tuple[jnp.ndarray, np.ndarray]]:
        idx = rng.permutation(len(self))
        for i in range(0, len(self) - batch_size + 1, batch_size):
            sel = idx[i : i + batch_size]
            k = int(rng.integers(8)) if augment else 0
            yield self._featurize(sel, k)


def pack_csv(path: str) -> PackedDataset:
    """Parse a reference-layout CSV straight into packed arrays (no
    featurization — constant-time per row)."""
    import csv as _csv

    boards, kos, lasts, targets = [], [], [], []
    with open(path) as f:
        reader = _csv.reader(f)
        header = next(reader)
        is_value = header[-1].strip().lower() == "val"
        for rec in reader:
            if not rec:
                continue
            boards.append(rec[0])
            kos.append(-1 if rec[1] in ("", "None") else int(rec[1]))
            lasts.append(int(rec[2]))
            targets.append(rec[3])
    return _pack_rows(boards, kos, lasts, targets, is_value)


def _pack_rows(boards, kos, lasts, targets, is_value) -> PackedDataset:
    b = _encode_boards(boards)
    last = np.array(lasts, np.int16)
    # side to move = opponent of the last stone (process_csv, nnet.py:377)
    turn = (b[np.arange(len(b)), np.clip(last, 0, NN - 1)] == 1).astype(np.int8)
    if is_value:
        t = np.array([-1.0 if v in ("1", "True") else 1.0 for v in targets],
                     np.float32)
    else:
        t = np.array([int(v) for v in targets], np.int32)
    return PackedDataset(b, np.array(kos, np.int16), last, turn, t, is_value)


def pack_csv_to_shards(
    path: str, prefix: str, shard_size: int = 262144
) -> list[str]:
    """Stream a reference-layout CSV into ``.pshard.npz`` files at constant
    memory — the at-scale replacement for :func:`pack_csv`, which buffers
    the whole file in Python lists (fine at 2M rows, not at the reference's
    23M, report.pdf p.4 §III.A.1)."""
    import csv as _csv

    paths = []
    boards, kos, lasts, targets = [], [], [], []
    is_value = False

    def flush():
        nonlocal boards, kos, lasts, targets
        if not boards:
            return
        ds = _pack_rows(boards, kos, lasts, targets, is_value)
        p = f"{prefix}-{len(paths):05d}.pshard.npz"
        np.savez_compressed(
            p, boards=ds.boards, ko=ds.ko, last=ds.last, turn=ds.turn,
            targets=ds.targets, is_value=np.array(ds.is_value),
        )
        paths.append(p)
        boards, kos, lasts, targets = [], [], [], []

    with open(path) as f:
        reader = _csv.reader(f)
        header = next(reader)
        is_value = header[-1].strip().lower() == "val"
        for rec in reader:
            if not rec:
                continue
            boards.append(rec[0])
            kos.append(-1 if rec[1] in ("", "None") else int(rec[1]))
            lasts.append(int(rec[2]))
            targets.append(rec[3])
            if len(boards) >= shard_size:
                flush()
    flush()
    return paths


def save_shards(prefix: str, ds: PackedDataset, shard_size: int = 262144) -> list[str]:
    """Write ``<prefix>-NNNNN.pshard.npz`` files of <= shard_size positions."""
    paths = []
    for s, i in enumerate(range(0, len(ds), shard_size)):
        sl = slice(i, i + shard_size)
        path = f"{prefix}-{s:05d}.pshard.npz"
        np.savez_compressed(
            path,
            boards=ds.boards[sl], ko=ds.ko[sl], last=ds.last[sl],
            turn=ds.turn[sl], targets=ds.targets[sl],
            is_value=np.array(ds.is_value),
        )
        paths.append(path)
    return paths


def load_shard(path: str) -> PackedDataset:
    z = np.load(path)
    return PackedDataset(
        z["boards"], z["ko"], z["last"], z["turn"], z["targets"],
        bool(z["is_value"]),
    )


@dataclasses.dataclass
class ShardedDataset:
    """Multi-shard dataset streamed one shard at a time (constant memory).

    Epoch order: shuffled shard order, shuffled positions within each shard
    (standard sharded-shuffle; full-epoch uniformity isn't needed for SGD).
    """

    paths: list[str]
    _lengths: list[int] = dataclasses.field(default=None)
    is_value: bool = dataclasses.field(default=None)

    def __post_init__(self):
        if self._lengths is None:
            self._lengths = []
            for p in self.paths:
                with np.load(p) as z:
                    self._lengths.append(z["boards"].shape[0])
                    self.is_value = bool(z["is_value"])

    def __len__(self):
        return sum(self._lengths)

    def batches(
        self, batch_size: int, rng: np.random.Generator, augment: bool = True
    ) -> Iterator[tuple[jnp.ndarray, np.ndarray]]:
        # double-buffered shard loading: decompress shard i+1 on a worker
        # thread while the device trains on shard i (np.load decompress is
        # ~0.5-1s per 256k shard — pure stall otherwise)
        from concurrent.futures import ThreadPoolExecutor

        order = [self.paths[int(si)] for si in rng.permutation(len(self.paths))]
        with ThreadPoolExecutor(max_workers=1) as pool:
            nxt = pool.submit(load_shard, order[0])
            for i, _ in enumerate(order):
                shard = nxt.result()
                if i + 1 < len(order):
                    nxt = pool.submit(load_shard, order[i + 1])
                yield from shard.batches(batch_size, rng, augment)


def load_streaming(path: str):
    """Load any dataset form for constant-memory training: a csv (packed
    in-RAM, featurized on device), one ``.pshard.npz``, a glob of shards, or
    a legacy npz (in-memory fallback)."""
    import glob as _glob

    if "*" in path or "?" in path:
        paths = sorted(_glob.glob(path))
        if not paths:
            raise FileNotFoundError(path)
        return ShardedDataset(paths)
    if path.endswith(".pshard.npz"):
        return load_shard(path)
    if path.endswith(".csv"):
        return pack_csv(path)
    if path.endswith(".npz"):
        return load_npz(path)
    # directory of shards
    import os as _os

    if _os.path.isdir(path):
        paths = sorted(_glob.glob(_os.path.join(path, "*.pshard.npz")))
        if paths:
            return ShardedDataset(paths)
    raise ValueError(f"unsupported dataset {path}")


def save_npz(path: str, dataset: GoDataset):
    """Write the reference-compatible compressed npz (NCHW)."""
    payload = {"features": np.moveaxis(dataset.features, -1, 1)}
    payload["vals" if dataset.is_value else "moves"] = dataset.targets.reshape(-1, 1)
    np.savez_compressed(path, **payload)
