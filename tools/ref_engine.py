#!/usr/bin/env python
"""Launch the REFERENCE engine (torch, CPU) at a FIXED rollout budget.

The round-3 strength match runs the reference opponent count-limited
instead of wall-clock-limited (its GTP supports both: gtp.py:357-360), so
host CPU contention can never weaken it — every confound in the match
design biases AGAINST bokego-tpu.  Pondering stays at the reference's
default (ON, gtp.py:24), which grants it EXTRA rollouts during our think
time on top of the fixed budget.

Usage: python tools/ref_engine.py N_ROLLOUTS POLICY_PT VALUE_PT
"""

import sys

REF = "/root/reference"
sys.path.insert(0, REF)

import torch  # noqa: E402

from bokego.gtp import GTP  # noqa: E402
from bokego.mcts import Go_MCTS  # noqa: E402
from bokego.nnet import PolicyNet, ValueNet  # noqa: E402


def main():
    n_rollouts = int(sys.argv[1])
    policy_pt, value_pt = sys.argv[2], sys.argv[3]
    torch.set_grad_enabled(False)
    device = torch.device("cpu")

    pi = PolicyNet()
    pi.load_state_dict(torch.load(policy_pt, map_location=device)["model_state_dict"])
    pi.eval()
    val = ValueNet()
    val.load_state_dict(torch.load(value_pt, map_location=device)["model_state_dict"])
    val.eval()

    gtp = GTP(
        Go_MCTS(),
        policy_net=pi,
        value_net=val,
        no_sim=True,
        time_lim=None,
        n_rollouts=n_rollouts,
        device=device,
    )
    gtp.start()


if __name__ == "__main__":
    main()
