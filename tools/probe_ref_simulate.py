#!/usr/bin/env python
"""Probe: the reference's --simulate mode is broken as committed.

``Go_MCTS.get_move`` (mcts.py:348-360) samples from the CACHED class-level
``dist`` (mcts.py:371-403) and zeroes rejected probs in place
("#zero out absurd moves", mcts.py:357).  In a simulation to terminal the
sampled game passes through low-entropy positions where most policy mass
is illegal/own-eye; the zeroing drives the Categorical's total mass to 0
and ``sample()`` raises ``RuntimeError: invalid multinomial distribution``
before the tries>=81 PASS fallback can fire.  With the shipped policy_17
weights this crashes on the FIRST rollout from an empty board (seeds 0-2),
so no engine-vs-engine match against the reference's --simulate is
playable; sim-mode strength evidence instead comes from the in-process
sim-vs-nosim match at equal rollouts (tools/config_match.py, PERF.md).

Usage: python tools/probe_ref_simulate.py
"""
import random
import sys
import time
import traceback

REF = "/root/reference"
sys.path.insert(0, REF)

import torch  # noqa: E402

torch.set_grad_enabled(False)

from bokego.mcts import MCTS, Go_MCTS  # noqa: E402
from bokego.nnet import PolicyNet, ValueNet  # noqa: E402

REPO = "/root/repo"


def main():
    pi = PolicyNet()
    pi.load_state_dict(torch.load(REF + "/data/weights/policy_17.pt",
                                  map_location="cpu")["model_state_dict"])
    pi.eval()
    val = ValueNet()
    val.load_state_dict(torch.load(REPO + "/data/weights/value_r2.pt",
                                   map_location="cpu")["model_state_dict"])
    val.eval()
    for seed in (0, 1, 2):
        random.seed(seed)
        torch.manual_seed(seed)
        MCTS._val_cache.clear()
        MCTS._dist_cache.clear()
        MCTS._fts_cache.clear()
        tree = MCTS(Go_MCTS(), policy_net=pi, value_net=val, no_sim=False)
        n, t0 = 0, time.monotonic()
        try:
            for _ in range(200):
                tree.rollout(1)
                n += 1
            print(f"seed {seed}: 200 rollouts OK "
                  f"({200 / (time.monotonic() - t0):.1f} r/s)")
        except Exception as e:
            tb = [f for f in traceback.extract_tb(e.__traceback__)
                  if "bokego" in f.filename][-1]
            print(f"seed {seed}: CRASH after {n} completed rollouts: "
                  f"{type(e).__name__} at "
                  f"{tb.filename.split('/')[-1]}:{tb.lineno}")


if __name__ == "__main__":
    main()
