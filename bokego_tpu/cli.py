"""CLI entry point — the ``boke.py`` equivalent (boke.py:14-45).

Flags mirror the reference launcher: ``-t`` seconds per move, ``-r``
rollouts per move (actually wired here, unlike boke.py:17 which parsed but
dropped it), ``-p``/``-v`` checkpoint paths (reference torch ``.pt`` or our
orbax directories), ``--simulate`` to enable playout rollouts.  ``-g`` is
accepted for interface parity; device selection is JAX's (TPU when present).
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=f"bokego-tpu GTP engine")
    p.add_argument("-t", metavar="SEC", type=float, dest="t", default=10.0,
                   help="time limit in seconds for each move")
    p.add_argument("-r", dest="r", type=int, default=None,
                   help="number of rollouts per move (overrides -t)")
    p.add_argument("-p", metavar="PATH", type=str, dest="p", default=None,
                   help="path to policy weights (.pt or orbax dir)")
    p.add_argument("-v", metavar="PATH", type=str, dest="v", default=None,
                   help="path to value weights (.pt or orbax dir)")
    p.add_argument("-g", "--gpu", action="store_true",
                   help="accepted for parity; accelerator choice is JAX's")
    p.add_argument("--simulate", action="store_true",
                   help="enable simulations to end of game")
    p.add_argument("--forest", type=int, default=1,
                   help="number of root-parallel trees")
    p.add_argument("--no-ponder", action="store_true",
                   help="disable pondering between commands")
    p.add_argument("--fast", action="store_true",
                   help="TPU perf mode: Pallas rollout kernel + amortized "
                        "leaf evaluation (eval_every=8)")
    p.add_argument("--noise", type=float, default=None,
                   help="Dirichlet root-noise weight (mcts.py:41,366-369); "
                        "per-tree noise diversifies --forest root-parallel "
                        "search (fresh noise re-applied at every re-root, "
                        "so subtree reuse is kept)")
    p.add_argument("--expand-thresh", type=int, default=None,
                   help="visits before leaf expansion (default: reference's "
                        "100, mcts.py:61 — tuned for its ~450-rollout "
                        "budget; at this engine's budgets deeper is "
                        "measurably stronger, see PERF.md)")
    p.add_argument("--max-nodes", type=int, default=None,
                   help="node-pool capacity per tree")
    p.add_argument("--leaf-batch", type=int, default=None, dest="leaf_batch",
                   help="K leaf-parallel rollouts per device step with "
                        "virtual loss (search/leafpar.py): one K-wide net "
                        "forward replaces K dependent B=1 evals — the "
                        "single-tree serving throughput lever. Composes "
                        "with --forest (K x forest leaves per eval). "
                        "Incompatible with --fast (XLA path only)")
    p.add_argument("--strong", action="store_true",
                   help="tuned serving preset: expand_thresh=16, "
                        "max_nodes=65536 (PERF.md search-config strength; "
                        "the big pool feeds deep searches at multi-thousand "
                        "rollout budgets — each expansion allocates up to "
                        "82 child slots)")
    return p


def load_variables(path: str | None, kind: str):
    """Load net variables from a torch .pt checkpoint, an orbax directory,
    or fall back to random init (the reference's default weights are
    LFS-missing — SURVEY.md §5 checkpoint notes)."""
    import jax

    from bokego_tpu.models import convert, init_policy, init_value

    if path and path.endswith(".pt") and os.path.exists(path):
        return convert.load_policy(path) if kind == "policy" else convert.load_value(path)
    if path and os.path.isdir(path):
        from bokego_tpu.train import checkpoints

        return checkpoints.load_variables(path)
    return (init_policy if kind == "policy" else init_value)(jax.random.PRNGKey(0))


def main(argv=None):
    args = build_parser().parse_args(argv)

    # Allow forcing a backend (e.g. BOKEGO_TPU_PLATFORM=cpu for host-side
    # engine-vs-engine matches where two processes can't share one chip).
    platform = os.environ.get("BOKEGO_TPU_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    from bokego_tpu.config import EngineConfig, SearchConfig
    from bokego_tpu.gtp.engine import GTPEngine
    from bokego_tpu.search.mcts import net_evaluator

    policy_vars = load_variables(args.p, "policy")
    value_vars = load_variables(args.v, "value")
    params = {"policy": policy_vars, "value": value_vars}

    import jax

    on_accel = jax.default_backend() != "cpu"
    noise = 0.0 if args.noise is None else args.noise
    if args.fast and on_accel:
        scfg = SearchConfig(
            no_sim=not args.simulate,
            use_kernel=not args.simulate,
            eval_every=8,
            max_nodes=512,
            noise_weight=noise,
        )
    else:
        scfg = SearchConfig(no_sim=not args.simulate, noise_weight=noise)
    overrides = {}
    if args.strong:
        overrides.update(expand_thresh=16, max_nodes=65536)
    if args.expand_thresh is not None:
        overrides["expand_thresh"] = args.expand_thresh
    if args.max_nodes is not None:
        overrides["max_nodes"] = args.max_nodes
    if args.leaf_batch is not None and args.leaf_batch > 1:
        # leaf-parallel is XLA-path only; drop --fast's kernel/eval_every
        overrides.update(leaf_batch=args.leaf_batch, use_kernel=False,
                         eval_every=1)
    if overrides:
        import dataclasses

        scfg = dataclasses.replace(scfg, **overrides)
    ecfg = EngineConfig(
        time_lim=None if args.r else args.t,
        n_rollouts=args.r,
        pondering=not args.no_ponder,
        forest_size=args.forest,
    )
    engine = GTPEngine(net_evaluator(has_value=True), params, scfg, ecfg)
    engine.start()


if __name__ == "__main__":
    main()
