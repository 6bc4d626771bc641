#!/usr/bin/env python
"""Quantify the array tree's documented transposition divergence.

The reference merges search statistics across move orders because its
Q/N/V/children dicts key on position equality (board, ko, last_move) —
/root/reference/bokego/mcts.py:42-53, 294-298.  The array tree is a
path-tree: transpositions keep separate stats (search/tree.py docstring).

This script measures what that costs at equal rollouts: it runs the dict
PUCT oracle twice per fixed midgame position — once with position-keyed
merging (reference semantics) and once path-keyed (array semantics, which
is visit-count-parity-tested against the real array implementation in
tests/test_mcts.py) — and reports top-move agreement, visit-distribution
overlap, and winrate deltas.  A deterministic hash-derived evaluator keeps
the comparison about TREE SEMANTICS, not net quality.

Usage: python tools/measure_tree_divergence.py [n_positions] [n_rollouts]
"""

import hashlib
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle import OracleGame
from tests.oracle_mcts import DictMCTS


def _hash01(game, salt: int) -> float:
    key = ("".join(map(str, game.board)) + f"|{game.ko}|{game.last_move}|{salt}")
    h = int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big")
    return h / 2**64


def probs_fn(game):
    """Deterministic, smooth-ish pseudo-policy."""
    raw = [0.0] * 81
    legal = set(game.legal_moves())
    for a in range(81):
        raw[a] = 0.05 + _hash01(game, a) if a in legal else 1e-9
    s = sum(raw)
    return [x / s for x in raw]


def value_fn(game):
    """Deterministic pseudo-value in (-1, 1), side-to-move POV."""
    return 2.0 * _hash01(game, -1) - 1.0


def midgame(seed: int, n_moves: int = 30) -> OracleGame:
    rng = random.Random(seed)
    g = OracleGame()
    for _ in range(n_moves):
        legal = sorted(g.legal_moves())
        if not legal:
            break
        g.play(rng.choice(legal))
    return g


def overlap(va: dict, vb: dict) -> float:
    """Visit-distribution overlap: sum of min shares per action."""
    ta, tb = sum(va.values()) or 1, sum(vb.values()) or 1
    keys = set(va) | set(vb)
    return sum(min(va.get(k, 0) / ta, vb.get(k, 0) / tb) for k in keys)


def main():
    n_pos = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_roll = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    agree, overlaps, wr_deltas = 0, [], []
    merged_nodes, path_nodes = [], []
    for i in range(n_pos):
        g = midgame(seed=1000 + i)
        kw = dict(expand_thresh=int(os.environ.get("THRESH", 16)),
                  branch_num=(int(os.environ["BRANCH"]) if "BRANCH" in os.environ else None),
                  max_turns=80)
        a = DictMCTS(g.copy(), probs_fn, value_fn, merge_transpositions=True, **kw)
        b = DictMCTS(g.copy(), probs_fn, value_fn, merge_transpositions=False, **kw)
        a.rollout(n_roll)
        b.rollout(n_roll)
        ca, cb = a.choose(), b.choose()
        agree += ca == cb
        overlaps.append(overlap(a.root_child_visits(), b.root_child_visits()))
        wr_deltas.append(abs(a.winrate() - b.winrate()))
        merged_nodes.append(len(a.N))
        path_nodes.append(len(b.N))
        print(
            f"pos {i:2d}: choose {'==' if ca == cb else f'{ca} vs {cb}'}  "
            f"overlap {overlaps[-1]:.3f}  |Δwr| {wr_deltas[-1]:.4f}  "
            f"nodes {merged_nodes[-1]} vs {path_nodes[-1]}"
        )
    print(
        f"\n{n_pos} midgames x {n_roll} rollouts: "
        f"top-move agreement {agree}/{n_pos}, "
        f"mean visit overlap {sum(overlaps)/n_pos:.3f}, "
        f"mean |Δwinrate| {sum(wr_deltas)/n_pos:.4f}, "
        f"mean stat-entries merged {sum(merged_nodes)/n_pos:.0f} "
        f"vs path {sum(path_nodes)/n_pos:.0f}"
    )


if __name__ == "__main__":
    main()
