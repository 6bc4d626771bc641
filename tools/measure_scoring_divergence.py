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
    same_winner, same_score, n = 0, 0, 0
    print(f"{'game':22s} {'RE[] (gnugo)':14s} {'Tromp-Taylor':14s} verdict")
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
        tt = float(rules.score(s))
        tt_str = f"B+{tt}" if tt > 0 else f"W+{-tt}" if tt < 0 else "0"
        n += 1
        winner_ok = re_tag and re_tag[0] == tt_str[0]
        same_winner += bool(winner_ok)
        same_score += re_tag == tt_str
        verdict = (
            "exact" if re_tag == tt_str
            else "same-winner" if winner_ok
            else "DIFFERENT WINNER"
        )
        print(f"{os.path.basename(p):22s} {re_tag!s:14s} {tt_str:14s} {verdict}")
    print(
        f"\n{n} golden finals: winner agreement {same_winner}/{n}, "
        f"exact score {same_score}/{n} (disagreements = dead groups left on "
        f"the board that gnugo removes and raw Tromp-Taylor counts as alive)"
    )


if __name__ == "__main__":
    main()
