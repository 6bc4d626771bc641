#!/usr/bin/env python
"""Render the round-3 match tally as a STRENGTH.md table + exact CI.

Reads data/matches_r3/tally.txt and the per-game SGF ``RE[]`` results,
prints a markdown table and the Clopper-Pearson 95% interval for the win
probability (the statistic VERDICT round 2 asked the strength claim to
rest on).
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from elo_table import clopper_pearson  # shared exact-CI helper


def main(out_dir="data/matches_r3"):
    rows, wins = [], 0
    with open(os.path.join(out_dir, "tally.txt")) as f:
        for line in f:
            m = re.match(
                r"game (\d+): bokego-tpu as (\w) (WON|lost) \((\d+)s", line
            )
            if not m:
                continue
            i, color, res, secs = m.groups()
            sgf = open(os.path.join(out_dir, f"match_{i}.sgf")).read()
            score = re.search(r"RE\[([^\]]*)\]", sgf).group(1)
            how = (
                "resignation" if score.endswith("+R")
                else "forfeit (desync)" if score.endswith("+F")
                else "on the board (resolved)"
            )
            won = res == "WON"
            wins += won
            rows.append(
                f"| {i} | {color} | {'**won**' if won else 'lost'} "
                f"| {score} {how} |"
            )
    n = len(rows)
    print("| game | our color | result | how it ended |")
    print("|---|---|---|---|")
    print("\n".join(rows))
    lo, hi = clopper_pearson(wins, n)
    print(f"\n{wins}-{n - wins} (n={n}); exact binomial 95% CI for the win "
          f"probability: {lo:.3f}-{hi:.3f}")


if __name__ == "__main__":
    main(*sys.argv[1:])
