"""Unified configuration tree.

The reference scatters knobs across module constants and kwargs
(SURVEY.md §5 "Config / flag system"): ``MCTS.__init__`` kwargs
(mcts.py:58-70), GTP kwargs (gtp.py:51-54), per-stage ``MAX_TURNS``
(mcts.py:13 / selfplay.py:16 / genvals.py:12), komi (go.py:54), CLI flags
(boke.py:14-26).  Every one of those knobs appears here with the same
default.
"""

from __future__ import annotations

import dataclasses
import warnings


@dataclasses.dataclass(frozen=True)
class SearchConfig:
    """PUCT search knobs (mcts.py:58-70 defaults)."""

    expand_thresh: int = 100  # visits before a leaf is expanded
    branch_num: int | None = None  # top-k children to expand; None = all legal
    exploration_weight: float = 4.0  # PUCT c
    value_net_weight: float = 0.5  # λ mixing sims and value net
    noise_weight: float = 0.0  # Dirichlet root-noise weight
    dirichlet_alpha: float = 0.1  # mcts.py:41
    no_sim: bool = True  # value-net-only leaf eval (boke.py default)
    max_turns: int = 80  # terminal cutoff in search (mcts.py:13)
    max_nodes: int = 1024  # node-pool size per tree (array-tree capacity)
    n_rollouts: int = 400  # rollouts per move when not time-limited
    max_depth: int = 64  # PUCT descend depth bound (path-recording size);
    # deeper descents stop early at an internal node (never reached with
    # default expand_thresh; raise for thresh≈0 AlphaZero-style searches)
    use_kernel: bool = False  # use the Pallas fused descend/backprop kernel
    # (ops/rollout.py) for the rollout hot loop. no_sim mode only. Combines
    # with eval_every > 1; on eval steps the first visit of a fresh leaf
    # backs up a neutral value (the kernel backprops before valuation).
    kernel_levels: int = 8  # kernel descend depth bound (rows scratch size)
    kernel_block: int = 8  # trees per kernel program
    eval_every: int = 1  # run the leaf-eval/expansion phase only on every
    # E-th rollout. 1 = exact reference semantics. >1 amortizes the net
    # forward + successor generation across rollouts for large tree
    # batches (where SOME tree always needs work): expansion and
    # first-visit valuation are delayed up to E-1 rollouts, during which
    # an unvalued leaf backs up a neutral 0 value — a small, documented
    # throughput/fidelity trade (measured: see PERF.md "fast-mode fidelity").
    leaf_batch: int = 1  # K leaf-parallel rollouts per search step with
    # virtual loss (search/leafpar.py — AlphaGo-style tree parallelism;
    # the reference's search is strictly sequential, mcts.py:133-151).
    # K=1 is bitwise the sequential algorithm; K>1 batches K descents
    # into ONE net forward, the right lever for single-tree serving
    # where the MXU otherwise sees B=1. Composes with forest_size
    # (B trees × K leaves per evaluation). XLA path only.
    leaf_vloss: float = 1.0  # virtual loss per traversed edge (K>1 only)

    def __post_init__(self):
        if self.leaf_batch > 1:
            if self.eval_every != 1:
                raise ValueError(
                    "leaf_batch > 1 requires eval_every == 1 (leaf-parallel "
                    "search already amortizes evaluation across K descents)"
                )
            if self.use_kernel:
                raise ValueError(
                    "leaf_batch > 1 is XLA-path only (the Pallas rollout "
                    "kernel fuses the K=1 cadence); set use_kernel=False"
                )
        if self.use_kernel and self.eval_every == 1:
            # The kernel backprops BEFORE valuation, so even at E=1 a fresh
            # leaf's first visit backs up a neutral value — NOT the exact
            # reference cadence the eval_every=1 XLA path gives.  Loud, not
            # silent (round-1 review finding).
            warnings.warn(
                "SearchConfig(use_kernel=True, eval_every=1): the Pallas "
                "rollout kernel delays first-visit valuation by one rollout "
                "even at eval_every=1; for exact reference semantics use "
                "use_kernel=False, for throughput use eval_every>=2.",
                stacklevel=2,
            )


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """GTP engine / serving knobs (gtp.py:51-54, boke.py:14-26)."""

    time_lim: float | None = 10.0  # seconds per move (boke.py default 10)
    n_rollouts: int | None = None  # rollout-count mode instead of timed
    pondering: bool = True  # rollouts while waiting for input
    resign_threshold: float = 0.1  # surrender if winrate < this (gtp.py:341)
    resign_turn: int = 50  # ... after this turn (gtp.py:342)
    komi: float = 5.5
    forest_size: int = 1  # root-parallel trees (Forest, gtp.py:403)


@dataclasses.dataclass(frozen=True)
class SelfplayConfig:
    """RL self-play (bin/selfplay.py defaults; max_turns selfplay.py:16)."""

    max_turns: int = 70
    batch_games: int = 16  # bs per iteration (selfplay.py kwargs)
    n_iters: int = 64  # iterations per epoch (CLI -n)
    lr: float = 1e-5  # AdamW lr (selfplay.py:137)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """SL training (bin/train.py + report.pdf p.4)."""

    batch_size: int = 32  # train.py:19 (report uses 128)
    lr: float = 1e-2  # train.py:32 (report: 1e-3 Adam)
    epochs: int = 1


@dataclasses.dataclass(frozen=True)
class GenvalsConfig:
    """Value-net data generation (bin/genvals.py; max_turns genvals.py:12)."""

    max_turns: int = 90
    min_random_turn: int = 70  # r ~ U[70, 90) (genvals.py:22)
    max_random_turn: int = 90


@dataclasses.dataclass(frozen=True)
class Config:
    search: SearchConfig = dataclasses.field(default_factory=SearchConfig)
    engine: EngineConfig = dataclasses.field(default_factory=EngineConfig)
    selfplay: SelfplayConfig = dataclasses.field(default_factory=SelfplayConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    genvals: GenvalsConfig = dataclasses.field(default_factory=GenvalsConfig)
