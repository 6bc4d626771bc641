#!/usr/bin/env python
"""Engine-vs-engine strength match: bokego-tpu vs the reference engine.

The reference's headline capability is a 10-0 match vs GNU Go 3.8
(report.pdf §III.C, played through the GTP_match harness,
/root/reference/bokego/gtp.py:533-604).  This container ships no gnugo
binary, so per VERDICT.md round-1 item 2 the opponent is the reference
engine itself (torch, CPU): its shipped RL policy `policy_17.pt` plus OUR
trained ValueNet exported back to torch format (the reference's own value
net was never shipped — .MISSING_LARGE_BLOBS), running the reference's
default value-leaf-eval config.  Both engines get equal wall-clock per move.

Results append to a tally file after every game (restartable).

Usage: python tools/strength_match.py [n_games] [sec_per_move] [out_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bokego_tpu.gtp.process import gtp_match

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def main():
    n_games = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sec = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
    out_dir = sys.argv[3] if len(sys.argv) > 3 else os.path.join(REPO, "data", "matches")
    os.makedirs(out_dir, exist_ok=True)
    tally_path = os.path.join(out_dir, "tally.txt")

    ours = (
        f"env JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp "
        f"python {REPO}/boke.py -p {REPO}/data/weights/policy_17_flax "
        f"-v {REPO}/data/weights/value_r2 -t {sec} --strong"
    )
    ref = (
        f"env PYTHONPATH={REF} python {REF}/boke.py "
        f"-p {REF}/data/weights/policy_17.pt "
        f"-v {REPO}/data/weights/value_r2.pt -t {sec}"
    )

    done = 0
    if os.path.exists(tally_path):
        with open(tally_path) as f:
            done = sum(1 for line in f if line.startswith("game"))

    for i in range(done, n_games):
        we_are_black = i % 2 == 0
        sgf_path = os.path.join(out_dir, f"match_{i + 1}.sgf")
        t0 = time.monotonic()
        black_won = gtp_match(
            ours if we_are_black else ref,
            ref if we_are_black else ours,
            sgf_path=sgf_path,
            max_moves=170,
        )
        we_won = black_won == we_are_black
        line = (
            f"game {i + 1}: bokego-tpu as {'B' if we_are_black else 'W'} "
            f"{'WON' if we_won else 'lost'} "
            f"({time.monotonic() - t0:.0f}s, {sgf_path})"
        )
        print(line, flush=True)
        with open(tally_path, "a") as f:
            f.write(line + "\n")

    wins = 0
    with open(tally_path) as f:
        for line in f:
            wins += " WON " in line
    print(f"\nbokego-tpu {wins}-{n_games - wins} vs reference engine "
          f"({sec}s/move, alternating colors)")


if __name__ == "__main__":
    main()
