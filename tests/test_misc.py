"""Determinism, metrics, coordinates, gnugo bridge fallbacks, CLI."""

import numpy as np
import pytest

import jax

from bokego_tpu import coords, gnugo
from bokego_tpu.env import state as st
from bokego_tpu.search import playout as po
from bokego_tpu.utils.metrics import Metrics


@pytest.mark.slow
def test_selfplay_determinism():
    """Same seed => identical self-play stream (SURVEY.md §5: JAX purity
    replaces the reference's deliberate hogwild races)."""
    from bokego_tpu.models import init_policy
    from bokego_tpu.models.inference import policy_probs
    from bokego_tpu.features import features_batch

    variables = init_policy(jax.random.PRNGKey(0))

    def probs(s):
        return policy_probs(variables, features_batch(s))

    def run(seed):
        states = st.new_game_batch(4)
        traj = po.playout(
            jax.random.PRNGKey(seed), probs, probs, states,
            num_steps=12, max_turns=80,
        )
        return np.asarray(traj.actions)

    a, b = run(7), run(7)
    np.testing.assert_array_equal(a, b)
    c = run(8)
    assert not np.array_equal(a, c)


def test_metrics():
    m = Metrics()
    with m.phase("rollout", n=100):
        pass
    m.count("expansions", 3)
    assert m.phases["rollout"].count == 100
    assert "rollout" in m.report() and "expansions" in m.report()
    assert m.rollouts_per_sec() > 0


def test_coords_roundtrip():
    for sq in range(81):
        assert coords.squash(coords.unsquash(sq)) == sq
        x, y = coords.unsquash(sq, alph=False)
        assert coords.squash((x, y)) == sq
    assert coords.squash("PASS") == coords.PASS
    assert coords.unsquash(coords.PASS) == "PASS"
    # GTP letters skip I
    assert coords.unsquash(8) == "J1"
    assert coords.squash("J1") == 8


def test_gnugo_absent_fallback():
    """Without gnugo installed, scoring returns None (silent Tromp-Taylor
    fall-through, go.py:515-517 semantics)."""
    if gnugo.available():
        assert gnugo.gnu_score_moves([40, 30]) in (1, -1)
    else:
        assert gnugo.gnu_score_moves([40, 30]) is None


def test_cli_parser():
    from bokego_tpu.cli import build_parser

    args = build_parser().parse_args(["-t", "5", "--simulate", "--forest", "3"])
    assert args.t == 5.0 and args.simulate and args.forest == 3


def test_bench_queue_artifact_reuse(monkeypatch):
    """bench.py reuses a same-round real-TPU queue measurement (with
    provenance) instead of colliding with the queue on the one chip, and
    never reuses smoke/error artifacts or bypasses the A/B variants."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import bench

    good = {
        "metric": "selfplay games/min/chip (... backend tpu)",
        "value": 2100.0,
        "unit": "games/min/chip",
        "vs_baseline": 3.36,
    }
    os.makedirs("/tmp/r4", exist_ok=True)
    p = "/tmp/r4/bench.txt"  # the queue's stage-1 artifact path
    bak = open(p).read() if os.path.exists(p) else None
    try:
        with open(p, "w") as f:
            f.write("== log noise ==\n" + json.dumps(good) + "\n")
        got = bench._queue_artifact()
        assert got is not None and got["value"] == 2100.0
        assert "source" in got
        # smoke artifacts are never reused
        with open(p, "w") as f:
            f.write(json.dumps(dict(good, vs_baseline=None, smoke=True)) + "\n")
        assert bench._queue_artifact() is None
        # error artifacts are never reused
        with open(p, "w") as f:
            f.write(json.dumps(dict(good, error="boom")) + "\n")
        assert bench._queue_artifact() is None
        # A/B env overrides and the escape hatch disable reuse
        with open(p, "w") as f:
            f.write(json.dumps(good) + "\n")
        monkeypatch.setenv("BOKEGO_BENCH_DTYPE", "bf16")
        assert bench._queue_artifact() is None
        monkeypatch.delenv("BOKEGO_BENCH_DTYPE")
        monkeypatch.setenv("BOKEGO_BENCH_BATCH", "4096")
        assert bench._queue_artifact() is None
        monkeypatch.delenv("BOKEGO_BENCH_BATCH")
        monkeypatch.setenv("BOKEGO_BENCH_FRESH", "1")
        assert bench._queue_artifact() is None
    finally:
        if bak is None:
            os.remove(p)
        else:
            with open(p, "w") as f:
                f.write(bak)
