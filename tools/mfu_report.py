#!/usr/bin/env python
"""MFU + roofline report for the two search phase types (VERDICT r3 #4).

The headline bench (bench.py) interleaves two kinds of device step:

  * **eval steps** (1 in ``eval_every``): descend + ONE batched net
    forward over all B leaves + expansion scatters + backprop — the MXU
    phase; its ceiling is peak matmul FLOPs.
  * **light steps** (the other E−1): Pallas fused descend/backprop only —
    the memory phase; its ceiling is HBM bandwidth (row DMAs).

This tool measures both at the bench config and reports, for each:
FLOPs (from XLA's own ``cost_analysis`` — not hand math), bytes
accessed, wall time, MFU against the chip's peak, achieved bandwidth
against HBM peak, and which roof each phase sits under.  The combined
number is the model-FLOPs utilization of the whole selfplay step — the
"is 1,955 g/min good?" answer VERDICT round 3 asked for.

Peaks default to TPU v5e (the bench chip): 197 TFLOP/s bf16,
49.2 TFLOP/s f32 (MXU f32 runs at 1/4 bf16 rate), 819 GB/s HBM.
Override with --peak-tflops / --peak-gbs for other chips.

Run on the TPU (python tools/mfu_report.py); --smoke runs a tiny CPU
config to exercise the code path.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--rollouts", type=int, default=400)
    ap.add_argument("--eval-every", type=int, default=8)
    ap.add_argument("--peak-tflops-f32", type=float, default=49.2)
    ap.add_argument("--peak-tflops-bf16", type=float, default=197.0)
    ap.add_argument("--peak-gbs", type=float, default=819.0)
    ap.add_argument("--smoke", action="store_true", help="tiny CPU config")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.rollouts, args.eval_every = 8, 16, 4

    from bokego_tpu.config import SearchConfig
    from bokego_tpu.env import state as st
    from bokego_tpu.features import features_batch
    from bokego_tpu.models import init_policy, init_value
    from bokego_tpu.search import mcts

    on_tpu = jax.default_backend() not in ("cpu",)
    B = args.batch
    cfg = SearchConfig(
        expand_thresh=100,
        no_sim=True,
        max_turns=80,
        max_nodes=512,
        n_rollouts=args.rollouts,
        use_kernel=on_tpu,
        kernel_block=64,
        kernel_levels=6,
        eval_every=args.eval_every,
    )
    ev = mcts.net_evaluator(has_value=True)
    params = {
        "policy": init_policy(jax.random.PRNGKey(0)),
        "value": init_value(jax.random.PRNGKey(1)),
    }

    def timed(fn, *a, n=10):
        out = fn(*a)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.monotonic()
        for _ in range(n):
            out = fn(*a)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        return (time.monotonic() - t0) / n

    def cost(lowered):
        c = lowered.compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0)), float(
            c.get("bytes accessed", 0.0)
        )

    states = st.new_game_batch(B)
    trees = jax.jit(
        lambda r, s, p: mcts.init_trees(r, s, ev, p, cfg)
    )(jax.random.PRNGKey(0), states, params)

    # ---- phase 1: the net forward (eval phase's MXU core) ----------------
    fts = features_batch(states)

    net = jax.jit(lambda p, f: ev.evaluate_fts(p, f))
    t_net = timed(net, params, fts)
    f_net, b_net = cost(net.lower(params, fts))

    # ---- phase 2: one full search step at each cadence -------------------
    step = jax.jit(
        lambda r, t, i: mcts.search_step(r, t, ev, params, cfg, i)
    )
    # step_idx=1: light (non-eval) step; step_idx=0: eval-cadence step.
    t_light = timed(step, jax.random.PRNGKey(1), trees, jnp.int32(1))
    t_eval = timed(step, jax.random.PRNGKey(2), trees, jnp.int32(0))
    f_step, b_step = cost(
        step.lower(jax.random.PRNGKey(1), trees, jnp.int32(1))
    )

    # ---- phase 3: the whole bench move (n_rollouts rollouts + env step) --
    from bokego_tpu.coords import PASS_ACTION
    from bokego_tpu.env import rules

    @jax.jit
    def one_move(rng, states, done):
        actions, _ = mcts.search(rng, states, ev, params, cfg, args.rollouts)
        actions = jnp.where(done, PASS_ACTION, actions)
        nxt = rules.step_batch(states, actions)
        done = done | rules.is_terminal_batch(nxt, cfg.max_turns)
        return nxt, done

    done = jnp.zeros((B,), bool)
    t_move = timed(one_move, jax.random.PRNGKey(3), states, done, n=3)
    f_move, b_move = cost(
        one_move.lower(jax.random.PRNGKey(3), states, done)
    )

    peak_f = (args.peak_tflops_f32 if on_tpu else 0.05) * 1e12  # f32 trunks
    peak_b = (args.peak_gbs if on_tpu else 20.0) * 1e9

    def row(name, f, b, t):
        mfu = f / t / peak_f
        bw = b / t / peak_b
        # a phase is compute-bound when its FLOP roof is the binding one
        bound = "compute" if mfu >= bw else "memory"
        return (
            f"| {name} | {f / 1e9:.2f} | {b / 1e6:.1f} | {t * 1e3:.2f} "
            f"| {100 * mfu:.1f}% | {100 * bw:.1f}% | {bound} |"
        )

    # Attribution notes (XLA cost_analysis is STATIC: it counts a while
    # body once regardless of trip count and both cond branches together,
    # so executed totals must be assembled per phase):
    #  * f_net/b_net — one batched policy+value forward, the per-eval unit.
    #  * light step — the step minus its cond body: flops ~ f_step - f_net
    #    (descend/backprop has no matmuls), bytes ~ b_step - b_net.
    #  * eval step — the full static step (cond body executes).
    #  * a move at eval_every=E executes n_rollouts steps of which
    #    ceil(n/E) are eval steps, plus one init eval.
    f_light = max(f_step - f_net, 0.0)
    b_light = max(b_step - b_net, 0.0)
    n_eval = -(-args.rollouts // cfg.eval_every) + 1  # + init eval
    # One consistent step count for FLOPs and bytes (ADVICE r4 #4): every
    # one of the `rollouts` steps executes the light descend/backprop work,
    # and n_eval net forwards run on top (eval-cadence steps + the init
    # eval).  NOTE the subtraction above assumes cost_analysis counts BOTH
    # lax.cond branches of the step together, so f_step/b_step already
    # include one net forward; printed below so a reviewer can recompute.
    f_move_exec = n_eval * f_net + args.rollouts * f_light
    b_move_exec = n_eval * b_net + args.rollouts * b_light

    print(f"backend={jax.default_backend()} batch={B} "
          f"rollouts={args.rollouts} eval_every={cfg.eval_every} "
          f"peaks: {args.peak_tflops_f32} TF/s f32, {args.peak_gbs} GB/s")
    print()
    print("| phase | GFLOPs | MB accessed | ms | MFU | %HBM roof | bound |")
    print("|---|---|---|---|---|---|---|")
    print(row(f"net forward (policy+value, B={B})", f_net, b_net, t_net))
    print(row("light rollout step (descend+backprop)", f_light, b_light,
              t_light))
    # the eval step executes the light step's work PLUS the net forward
    print(row("eval rollout step (+net fwd+expand)", f_step, b_step,
              t_eval))
    print(row(f"full move ({args.rollouts} rollouts + env step, executed "
              f"totals)", f_move_exec, b_move_exec, t_move))
    print()
    rps = B * args.rollouts / t_move
    print(f"rollouts/s (batched): {rps:,.0f}; "
          f"move latency {t_move:.3f}s; "
          f"games/min/chip at 80 moves ~= {B * 60 / (t_move * 80):,.1f}")
    print(f"(static one-step cost for reference: {f_move / 1e9:.2f} GFLOPs "
          f"/ {b_move / 1e6:.1f} MB — loop bodies counted once)")
    print(f"(executed-totals model: {args.rollouts} light-step executions "
          f"+ {n_eval} net forwards; light cost = static step minus net "
          f"forward, which assumes cost_analysis sums both cond branches)")


if __name__ == "__main__":
    main()
