"""Training stack: data/augmentation, SL step, REINFORCE step, genvals,
checkpoints."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bokego_tpu.coords import NN
from bokego_tpu.env import state as st
from bokego_tpu.features import features
from bokego_tpu.models import init_policy, init_value
from bokego_tpu.train import checkpoints, data, genvals, reinforce, sl

from tests.test_rules import random_game_states


def test_d4_equivariance():
    """Transforming features == features of the transformed position, and
    the move remap matches the last-move plane's transform."""
    states = list(random_game_states(3, n_moves=25, pass_prob=0.0))
    s, _ = states[-1]
    fts = np.asarray(features(s))  # (9, 9, 27)
    lm = int(s.last_move)
    for k in range(8):
        tf = data.d4_apply_planes(fts, k)
        # plane 4 is the one-hot last move; its argmax must be the remap
        plane = tf[..., 4].reshape(NN)
        want = int(data.d4_apply_moves(np.asarray(lm), k))
        assert int(plane.argmax()) == want, f"k={k}"
        # round trip check on moves: each k is a bijection on 0..80
        m = data.d4_apply_moves(np.arange(NN), k)
        assert sorted(m.tolist()) == list(range(NN))


def test_npz_roundtrip(tmp_path):
    fts = np.random.default_rng(0).random((10, 9, 9, 27)).astype(np.float32)
    moves = np.arange(10, dtype=np.int32)
    ds = data.GoDataset(fts, moves, is_value=False)
    p = os.path.join(tmp_path, "d.npz")
    data.save_npz(p, ds)
    ds2 = data.load_npz(p)
    np.testing.assert_allclose(ds2.features, fts)
    np.testing.assert_array_equal(ds2.targets, moves)
    batches = list(ds2.batches(4, np.random.default_rng(0), augment=True))
    assert len(batches) == 2
    assert batches[0][0].shape == (4, 9, 9, 27)


def test_sl_policy_step_reduces_loss():
    rng = np.random.default_rng(0)
    fts = rng.random((64, 9, 9, 27)).astype(np.float32)
    moves = rng.integers(0, NN, 64).astype(np.int32)
    ds = data.GoDataset(fts, moves, is_value=False)
    variables = init_policy(jax.random.PRNGKey(0))
    state = sl.train(ds, variables, kind="policy", epochs=2, batch_size=32,
                     lr=1e-3, log_every=10**9, log_fn=lambda s: None)
    assert state.epoch == 2


def test_sl_value_step(tmp_path):
    rng = np.random.default_rng(0)
    fts = rng.random((32, 9, 9, 27)).astype(np.float32)
    vals = rng.choice([-1.0, 1.0], 32).astype(np.float32)
    ds = data.GoDataset(fts, vals, is_value=True)
    variables = init_value(jax.random.PRNGKey(0))
    stats = os.path.join(tmp_path, "stats.txt")
    state = sl.train(ds, variables, kind="value", epochs=1, batch_size=16,
                     lr=1e-3, log_fn=lambda s: None, stats_path=stats)
    assert os.path.exists(stats)
    assert state.epoch == 1


@pytest.mark.slow
def test_reinforce_epoch_smoke():
    variables = init_policy(jax.random.PRNGKey(0))
    opp = init_policy(jax.random.PRNGKey(1))
    res = reinforce.train_epoch(
        jax.random.PRNGKey(2), variables, opp,
        n_iters=2, batch_games=2, max_turns=8, lr=1e-5,
        log_fn=lambda s: None,
    )
    assert len(res.winrates) == 4
    # params changed
    a = jax.tree.leaves(variables["params"])[0]
    b = jax.tree.leaves(res.variables["params"])[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_genvals_generate_and_csv(tmp_path):
    sl_vars = init_policy(jax.random.PRNGKey(0))
    samples = genvals.generate(
        jax.random.PRNGKey(1), sl_vars, sl_vars, batch=4,
        max_turns=14, min_r=4, max_r=8,
    )
    rows = genvals.samples_to_rows(samples)
    assert rows, "no valid samples generated"
    for board, ko, move, val in rows:
        assert len(board) == NN and board[move] in "XO"
        assert val in (0, 1)
    p = os.path.join(tmp_path, "vals.csv")
    genvals.write_csv(p, rows)
    with open(p) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 1 + 8 * len(rows)
    # the produced CSV round-trips through the dataset loader
    ds = data.load_csv(p)
    assert ds.is_value and len(ds) == 8 * len(rows)


@pytest.mark.slow
def test_packed_dataset_matches_legacy_csv_loader(tmp_path):
    """PackedDataset (raw positions + on-device featurization) must produce
    byte-identical feature planes and targets to the legacy load_csv path."""
    sl_vars = init_policy(jax.random.PRNGKey(0))
    samples = genvals.generate(
        jax.random.PRNGKey(1), sl_vars, sl_vars, batch=4,
        max_turns=14, min_r=4, max_r=8,
    )
    rows = genvals.samples_to_rows(samples)
    p = os.path.join(tmp_path, "vals.csv")
    genvals.write_csv(p, rows)
    legacy = data.load_csv(p)
    packed = data.pack_csv(p)
    assert len(packed) == len(legacy) and packed.is_value
    np.testing.assert_array_equal(packed.targets, legacy.targets)
    sel = np.arange(len(packed))
    fts, t = packed._featurize(sel, k=0)
    np.testing.assert_array_equal(np.asarray(fts), legacy.features)

    # augmented batch: features of transformed raw positions == transformed
    # features of the originals (equivariance, checked end to end)
    fts3, _ = packed._featurize(sel, k=3)
    np.testing.assert_array_equal(
        np.asarray(fts3), data.d4_apply_planes(legacy.features, 3)
    )


def test_sharded_dataset_roundtrip_and_streaming(tmp_path):
    rng = np.random.default_rng(0)
    n = 20
    boards = rng.integers(0, 3, (n, NN)).astype(np.uint8)
    ds = data.PackedDataset(
        boards=boards,
        ko=np.full(n, -1, np.int16),
        last=rng.integers(0, NN, n).astype(np.int16),
        turn=rng.integers(0, 2, n).astype(np.int8),
        targets=rng.integers(0, NN, n).astype(np.int32),
        is_value=False,
    )
    prefix = os.path.join(tmp_path, "pol")
    paths = data.save_shards(prefix, ds, shard_size=8)
    assert len(paths) == 3
    sharded = data.load_streaming(os.path.join(tmp_path, "*.pshard.npz"))
    assert len(sharded) == n and not sharded.is_value
    seen = 0
    for fts, targets in sharded.batches(4, np.random.default_rng(1)):
        assert np.asarray(fts).shape == (4, 9, 9, 27)
        seen += len(targets)
    assert seen == 20  # 3 shards of (8, 8, 4), each a multiple of bs=4
    # directory form loads too
    assert len(data.load_streaming(str(tmp_path))) == n


def test_checkpoint_roundtrip_and_pool(tmp_path):
    variables = init_policy(jax.random.PRNGKey(0))
    path = os.path.join(tmp_path, "ckpt")
    checkpoints.save_variables(path, variables, meta={"epoch": 3})
    back = checkpoints.load_checkpoint(path)
    assert int(back["meta"]["epoch"]) == 3
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(back["variables"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    pool = os.path.join(tmp_path, "weights")
    assert checkpoints.save_next_policy(pool, variables) == 0
    assert checkpoints.save_next_policy(pool, variables) == 1
    assert checkpoints.pool_ids(pool) == [0, 1]
    n, ck = checkpoints.latest_policy(pool)
    assert n == 1
    nid, _ = checkpoints.sample_opponent(pool, np.random.default_rng(0))
    assert nid in (0, 1)


@pytest.mark.slow
def test_gendata_policy_rows(tmp_path):
    from bokego_tpu.train import gendata

    variables = init_policy(jax.random.PRNGKey(0))
    traj = gendata.generate(jax.random.PRNGKey(1), variables, batch=3, max_turns=10)
    rows = gendata.trajectory_to_rows(traj)
    assert rows
    # every row's recorded move must be legal in the recorded position
    from tests.oracle import OracleGame

    for board, ko, last, move in rows[:20]:
        enc = {".": 0, "X": 1, "O": 2}
        g = OracleGame(board=[enc[c] for c in board], ko=ko,
                       turn=(1 if last >= 0 and board[last] == "X" else 0))
        assert g.is_legal(move), (board, move)
    p = os.path.join(tmp_path, "pol.csv")
    gendata.write_csv(p, rows)
    ds = data.load_csv(p)
    assert not ds.is_value
    assert len(ds) == 8 * len(rows)


@pytest.mark.slow
def test_trajectory_to_packed_matches_csv_path(tmp_path):
    """The vectorized packed path agrees with the CSV path row-for-row
    (on the rows the CSV schema can represent — it drops post-pass
    positions, the packed form keeps them)."""
    from bokego_tpu.train import gendata

    variables = init_policy(jax.random.PRNGKey(0))
    traj = gendata.generate(jax.random.PRNGKey(1), variables, batch=4,
                            max_turns=16)
    rows = gendata.trajectory_to_rows(traj)
    p = os.path.join(tmp_path, "pol.csv")
    gendata.write_csv(p, rows, augment=False)
    via_csv = data.pack_csv(p)

    packed = gendata.trajectory_to_packed(traj, augment=False)
    import numpy as np

    keep = np.asarray(packed.last) != 81  # rows the csv schema kept
    assert keep.sum() == len(via_csv)
    np.testing.assert_array_equal(packed.boards[keep], via_csv.boards)
    np.testing.assert_array_equal(packed.ko[keep], via_csv.ko)
    np.testing.assert_array_equal(packed.last[keep], via_csv.last)
    np.testing.assert_array_equal(packed.turn[keep], via_csv.turn)
    np.testing.assert_array_equal(packed.targets[keep], via_csv.targets)

    # x8 augmentation: every symmetry's rows featurize to the same planes
    # as transforming the k=0 features directly (equivariance, and the
    # move targets remap consistently)
    aug = gendata.trajectory_to_packed(traj, augment=True)
    n = len(packed)
    assert len(aug) == 8 * n
    for k in (1, 5):
        sel = np.arange(k * n, k * n + 3)
        fts_k, tgt_k = aug._featurize(sel, None)
        fts_0, tgt_0 = packed._featurize(np.arange(3), None)
        np.testing.assert_allclose(
            np.asarray(fts_k), data.d4_apply_planes(np.asarray(fts_0), k),
            atol=1e-6)
        np.testing.assert_array_equal(tgt_k, data.d4_apply_moves(tgt_0, k))


@pytest.mark.slow
def test_alphazero_loop_smoke():
    """Closed AZ loop: search self-play targets -> one update each net."""
    from bokego_tpu.config import SearchConfig
    from bokego_tpu.train import alphazero as az

    pv = init_policy(jax.random.PRNGKey(0))
    vv = init_value(jax.random.PRNGKey(1))
    cfg = SearchConfig(expand_thresh=2, no_sim=True, max_nodes=256,
                       noise_weight=0.25, max_turns=6)
    state = az.train(
        jax.random.PRNGKey(2), pv, vv,
        iters=1, batch=2, n_moves=4, n_rollouts=4, cfg=cfg,
        temperature=1.0, log_fn=lambda s: None,
    )
    a = jax.tree.leaves(pv["params"])[0]
    b = jax.tree.leaves(state.policy["params"])[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_pack_csv_to_shards_matches_pack_csv(tmp_path):
    """The constant-memory streaming packer produces the same packed rows
    as the whole-file pack_csv, just split into shards."""
    sl_vars = init_policy(jax.random.PRNGKey(0))
    samples = genvals.generate(
        jax.random.PRNGKey(2), sl_vars, sl_vars, batch=4,
        max_turns=14, min_r=4, max_r=8,
    )
    p = os.path.join(tmp_path, "vals.csv")
    genvals.write_csv(p, genvals.samples_to_rows(samples))
    whole = data.pack_csv(p)
    paths = data.pack_csv_to_shards(p, os.path.join(tmp_path, "sh"),
                                    shard_size=7)
    parts = [data.load_shard(q) for q in paths]
    assert len(paths) > 1 and all(q.endswith(".pshard.npz") for q in paths)
    for field in ("boards", "ko", "last", "turn", "targets"):
        np.testing.assert_array_equal(
            np.concatenate([getattr(q, field) for q in parts]),
            getattr(whole, field),
        )
    assert all(q.is_value == whole.is_value for q in parts)


@pytest.mark.slow
def test_alphazero_cli_combined_checkpoint_resume(tmp_path):
    """bin/alphazero.py saves policy+value+iter as ONE atomic orbax
    payload ({out}_ckpt) and --resume prefers it over the legacy split
    layout, so a crash mid-checkpoint can never hand resume a
    mixed-generation pair (ADVICE r4 #3)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "az")
    env = dict(os.environ, JAX_PLATFORMS="cpu", BOKEGO_TPU_PLATFORM="cpu")
    base = [
        sys.executable, os.path.join(repo, "bin/alphazero.py"),
        "--iters", "1", "--batch", "2", "--moves", "4", "--rollouts", "4",
        "--save-every", "99", "-o", out,
    ]
    r1 = subprocess.run(
        base, env=env, capture_output=True, text=True, timeout=400
    )
    assert r1.returncode == 0, r1.stderr[-2000:]
    # the combined payload exists and carries all three pieces
    assert os.path.isdir(out + "_ckpt")
    from bokego_tpu.train import checkpoints

    payload = checkpoints.load_checkpoint(out + "_ckpt")["variables"]
    assert set(payload) == {"policy", "value", "iter"}
    assert int(payload["iter"]) == 1
    # --resume picks the combined checkpoint (not the legacy split dirs)
    r2 = subprocess.run(
        base + ["--resume"], env=env, capture_output=True, text=True,
        timeout=400,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert f"resuming from {out}_ckpt at iter 1" in r2.stdout
