#!/usr/bin/env python
"""Quantify Tromp-Taylor vs gnugo scoring on the 10 golden final positions.

The reference scores finished games with gnugo's dead-group judgment
(/root/reference/bokego/go.py:512-526); device playouts here score raw
Tromp-Taylor (go.py:202-218 semantics, env/rules.py:282).  The golden
boke-vs-gnugo SGFs carry gnugo-computed ``RE[]`` tags — replaying them and
re-scoring measures the divergence on real final positions.

Usage: python tools/measure_scoring_divergence.py [sgf_dir]
"""

import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from bokego_tpu import sgf  # noqa: E402
from bokego_tpu.coords import to_action  # noqa: E402
from bokego_tpu.env import rules, state as st  # noqa: E402


def main():
    sgf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/data/bokevgnugo"
    step = jax.jit(rules.step)
    from bokego_tpu.env import scoring
    from bokego_tpu import native

    resolved = jax.jit(lambda r, s: scoring.resolved_score(r, s))
    stats = {"tt": [0, 0], "resolved": [0, 0], "native": [0, 0]}
    n = 0
    print(
        f"{'game':22s} {'RE[] (gnugo)':13s} {'Tromp-Taylor':13s} "
        f"{'resolved(dev)':14s} {'resolved(C++)':14s}"
    )
    for p in sorted(
        glob.glob(os.path.join(sgf_dir, "*.sgf")),
        key=lambda s: int(re.search(r"_(\d+)\.sgf", s).group(1)),
    ):
        moves = sgf.read_moves(p)
        re_tag = sgf.read_result(p)
        s = st.new_game(5.5)
        for mv in moves:
            s = step(s, jnp.int32(to_action(mv)))
        assert not bool(s.invalid), f"illegal move replaying {p}"

        def tag(v):
            return f"B+{v:g}" if v > 0 else f"W+{-v:g}" if v < 0 else "0"

        got = {
            "tt": tag(float(rules.score(s))),
            "resolved": tag(float(resolved(jax.random.PRNGKey(0), s))),
            "native": tag(native.replay(moves).resolved_score()),
        }
        n += 1
        for k, v in got.items():
            stats[k][0] += bool(re_tag and re_tag[0] == v[0])
            stats[k][1] += re_tag == v
        print(
            f"{os.path.basename(p):22s} {re_tag!s:13s} {got['tt']:13s} "
            f"{got['resolved']:14s} {got['native']:14s}"
        )
    print(f"\n{n} golden finals vs gnugo's RE[] (winner / exact):")
    print(f"  raw Tromp-Taylor        {stats['tt'][0]}/{n} / {stats['tt'][1]}/{n}"
          "   (dead stones counted as alive)")
    print(f"  resolved score (device) {stats['resolved'][0]}/{n} / "
          f"{stats['resolved'][1]}/{n}")
    print(f"  resolved score (native) {stats['native'][0]}/{n} / "
          f"{stats['native'][1]}/{n}")


if __name__ == "__main__":
    main()
