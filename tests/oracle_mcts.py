"""Clean-room dict-based PUCT searcher replicating the reference algorithm
(`/root/reference/bokego/mcts.py` semantics) for parity-testing the array
implementation.  Deterministic: takes injected probs/value functions of the
oracle game position; no sampling, no nets, no_sim mode only.
"""

from __future__ import annotations

import math

from tests.oracle import PASS, OracleGame


class Node:
    """Position key: (board, ko, last_move) equality like Go_MCTS
    (mcts.py:294-296) — but used as a plain tree node (no transposition
    merging, matching the array tree's path semantics)."""

    __slots__ = ("game", "uid", "action")
    _counter = [0]

    def __init__(self, game: OracleGame, action=None):
        self.game = game
        self.action = action
        self.uid = Node._counter[0]
        Node._counter[0] += 1

    def __hash__(self):
        return self.uid

    def __eq__(self, other):
        return self.uid == other.uid


class PosNode:
    """TRUE reference keying: equality on (board, ko, last_move) so
    identical positions reached by different move orders MERGE their
    Q/N/V stats across the whole tree (mcts.py:294-298 + the shared
    class-level dicts, mcts.py:50-53)."""

    __slots__ = ("game", "action", "_key")

    def __init__(self, game: OracleGame, action=None):
        self.game = game
        self.action = action
        self._key = (tuple(game.board), game.ko, game.last_move)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return self._key == other._key


class DictMCTS:
    """Reference-semantics PUCT: Q/N/V dicts, expand_thresh, value-only
    leaves (no_sim), most-visited choose."""

    def __init__(self, root_game, probs_fn, value_fn, *, exploration_weight=4.0,
                 expand_thresh=100, branch_num=None, max_turns=80,
                 merge_transpositions=False):
        self.probs_fn = probs_fn  # game -> list[81] of probs
        self.value_fn = value_fn  # game -> float (side-to-move POV)
        self.c = exploration_weight
        self.expand_thresh = expand_thresh
        self.branch_num = branch_num
        self.max_turns = max_turns
        # merge_transpositions=True reproduces the reference's position-keyed
        # stat sharing (mcts.py:294-298); False matches the array path-tree.
        self._node_cls = PosNode if merge_transpositions else Node
        self.N, self.Q, self.V = {}, {}, {}
        self.children = {}
        self.dists = {}
        self.root = self._node_cls(root_game)
        self._expand(self.root)

    def _terminal(self, game):
        return game.turn > self.max_turns or game.last_move == PASS

    def _dist(self, node):
        if node not in self.dists:
            self.dists[node] = self.probs_fn(node.game)
        return self.dists[node]

    def _expand(self, node):
        if node in self.children:
            return
        if self._terminal(node.game):
            self.children[node] = []
            return
        legal = sorted(node.game.legal_moves())
        if self.branch_num is not None:
            probs = self._dist(node)
            top = sorted(range(81), key=lambda a: -probs[a])[: self.branch_num]
            legal = [a for a in top if a in set(legal)]
        kids = []
        for a in legal:
            g = node.game.copy()
            g.play(a)
            kids.append(self._node_cls(g, action=a))
        self.children[node] = kids

    def _puct_select(self, node):
        kids = self.children[node]
        total = sum(self.N.get(k, 0) for k in kids) or 1
        probs = self._dist(node)

        def puct(k):
            n = self.N.get(k, 0)
            avg = 0.0 if n == 0 else self.V.get(k, 0.0) / n  # w = 1 (no_sim)
            return -avg + self.c * probs[k.action] * math.sqrt(total) / (1 + n)

        return max(kids, key=puct)

    def rollout(self, n=1):
        for _ in range(n):
            path = [self.root]
            node = self.root
            while len(path) < 4 * (self.max_turns + 2):
                # depth bound: with transposition merging, shared children
                # dicts can form cycles (turn isn't part of the position key)
                if node not in self.children or not self.children[node]:
                    if self.N.get(node, 0) > self.expand_thresh:
                        self._expand(node)
                    break
                node = self._puct_select(node)
                path.append(node)
            leaf_val = self.value_fn(node.game)
            v = leaf_val
            for nd in reversed(path):
                self.N[nd] = self.N.get(nd, 0) + 1
                self.V[nd] = self.V.get(nd, 0.0) + v
                v = -v

    def root_child_visits(self):
        return {k.action: self.N.get(k, 0) for k in self.children[self.root]}

    def choose(self):
        kids = self.children[self.root]
        if not kids:
            return PASS
        best = max(kids, key=lambda k: self.N.get(k, 0) if self.N.get(k, 0) else -1)
        return best.action

    def winrate(self):
        n = self.N.get(self.root, 0)
        if n == 0:
            return 0.0
        return (self.V[self.root] / n + 1) / 2
