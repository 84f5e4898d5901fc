"""Command-line closed-loop experiment runner.

Reference: scripts/main.py (stale at HEAD — SURVEY.md §1 caveat; this
implements the intended flow): run a configured MPPI experiment
(``--config``/``--task``/``--model``), or replay a logged one
(``--replay --log-dir``), with optional periodic model training, logging,
and rendering.

Usage:
    python -m mppi_tf_tpu.cli --config envs/point_mass \
        --task tasks/static_cost --model models/point_mass_model -s 100
    python -m mppi_tf_tpu.cli --replay --log-dir logs/2026.08.17-...
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", help="env config: bundled name "
                                    "(envs/point_mass) or YAML path")
    p.add_argument("--task", help="task config: bundled name or YAML path")
    p.add_argument("--model", help="model config: bundled name or YAML path")
    p.add_argument("--replay", action="store_true",
                   help="re-run an experiment from a logdir's snapshots")
    p.add_argument("--log-dir", default="logs",
                   help="log output dir (or replay source with --replay)")
    p.add_argument("-s", "--steps", type=int, default=100,
                   help="number of control steps")
    p.add_argument("-t", "--train", type=int, default=0,
                   help="train the model every N steps (0 = never)")
    p.add_argument("-l", "--log", action="store_true",
                   help="write TensorBoard/JSONL metrics + config snapshots")
    p.add_argument("-r", "--render", action="store_true",
                   help="render the simulation (needs a display)")
    p.add_argument("-g", "--gif", action="store_true",
                   help="write an animated GIF of the run (run.gif in the "
                        "logdir, or ./run.gif without -l)")
    p.add_argument("-f", "--filter", action="store_true",
                   help="Savitzky-Golay smooth the action sequence "
                        "(reference main.py:44-48; equivalent to "
                        "'filter: true' in the env config)")
    p.add_argument("--on-device", action="store_true",
                   help="compile the whole experiment (solve + plant) into "
                        "one device program (needs a jax:/analytic-AUV "
                        "plant; excludes -t)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--f64", action="store_true",
                   help="run in float64 on CPU (parity mode)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    return p.parse_args(argv)


def _load(name_or_path: str):
    from .cfg import load_config

    return load_config(name_or_path)


def main(argv=None):
    args = parse_args(argv)

    import jax

    if args.cpu or args.f64:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from .cfg import parse_dir
    from .envs.runner import run_experiment

    if args.replay:
        env_cfg, task_cfg, model_cfg = parse_dir(args.log_dir)
    else:
        env_cfg = _load(args.config)
        task_cfg = _load(args.task)
        model_cfg = _load(args.model)
        if env_cfg is None or task_cfg is None or model_cfg is None:
            print("error: --config, --task and --model are required "
                  "(or --replay --log-dir)", file=sys.stderr)
            return 2
    if args.filter:
        # the factory reads the env-config 'filter' key; the flag forces it
        env_cfg = dict(env_cfg, filter=True)

    result = run_experiment(
        env_cfg, task_cfg, model_cfg,
        steps=args.steps, log=args.log,
        log_path=None if args.replay else args.log_dir,
        render=args.render, seed=args.seed,
        train_every=args.train,
        dtype=jnp.float64 if args.f64 else jnp.float32,
        on_device=args.on_device,
    )
    states = result["states"]
    ctrl = result["controller"]
    timing = ctrl.timing
    summary = {
        "steps": int(args.steps),
        "final_state": [round(float(v), 4) for v in states[-1]],
        "logdir": result["observer"].get_logdir() if result["observer"] else None,
    }
    if "on_device_ms_per_step" in result:
        # one compiled program: the host-side controller timing never ticks,
        # so per-step wall time (incl. compile) is the honest number
        summary["on_device_ms_per_step"] = round(
            result["on_device_ms_per_step"], 3)
    else:
        summary["avg_solve_ms"] = round(
            1e3 * timing["total"] / max(timing["calls"], 1), 3)
    if args.gif:
        from .utils.plotting import run_to_gif

        out = os.path.join(
            result["observer"].get_logdir() if result["observer"] else ".",
            "run.gif")
        goal = task_cfg.get("goal")
        gif = run_to_gif(states, out, goal=goal)
        summary["gif"] = gif
    if result["observer"]:
        result["observer"].close()
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
