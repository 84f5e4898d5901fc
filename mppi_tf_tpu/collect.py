"""Random-policy transition collection (+ optional NN-model pretraining).

Reference: scripts/src/mujoco/save_rng_sim.py — drive the environment with
random actions, store (x, u, x') transitions in the replay buffer, save
them, and optionally train the NN dynamics model on the collected data.
The stale reference script is completed here: bounded uniform actions from
the model's limits, seeded, works with any env from the config families.

Usage:
    python -m mppi_tf_tpu.collect --config envs/point_mass \
        --model models/nn_model -n 2000 --out transitions.npz --train 50
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def collect_transitions(env, buffer, steps: int, a_dim: int, act_low,
                        act_high, seed: int = 0, control_dt: float = 0.1):
    """Step the env with uniform random actions, filling ``buffer``.

    Mirrors the closed-loop runner's sim/control rate decoupling so the
    collected transitions match what the controller will see.
    """
    rng = np.random.default_rng(seed)
    x = env.getState()
    for _ in range(steps):
        u = rng.uniform(act_low, act_high, size=(a_dim,))
        prev = env.getTime()
        x_next = x
        while env.getTime() - prev < control_dt - 1e-12:
            x_next = env.step(np.reshape(u, (1, -1)), goal=env.getGoal())
        buffer.add(np.reshape(x, (-1, 1)), np.reshape(u, (-1, 1)),
                   np.reshape(x_next, (-1, 1)))
        x = x_next
    return buffer


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True, help="env config name or path")
    p.add_argument("--model", default=None,
                   help="NN model config to pretrain on the collected data")
    p.add_argument("-n", "--steps", type=int, default=1000)
    p.add_argument("--out", default="transitions.npz")
    p.add_argument("--train", type=int, default=0,
                   help="training epochs after collection (needs --model)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import os

    from .cfg import default_config, parse_config
    from .envs import get_env
    from .learning.replay import ReplayBuffer

    def load(name):
        return parse_config(name) if os.path.exists(name) else \
            default_config(name)

    env_cfg = load(args.config)
    sdim = env_cfg.get("state-dim", 2)
    adim = env_cfg.get("action-dim", 1)
    dt = env_cfg.get("dt", 0.1)
    env = get_env(env_cfg, render=False)
    buf = ReplayBuffer(max(args.steps, 1), sdim, adim)

    max_u = np.broadcast_to(
        np.asarray(env_cfg.get("max-a", 1.0), np.float64).reshape(-1),
        (adim,))
    collect_transitions(env, buf, args.steps, adim, -max_u, max_u,
                        seed=args.seed, control_dt=dt)
    buf.save_transitions(args.out)

    summary = {"collected": len(buf), "out": args.out}
    if args.train and args.model:
        from .learning import Learner
        from .models import get_model

        model = get_model(load(args.model), dt=dt, state_dim=sdim,
                          action_dim=adim)
        learner = Learner(model)
        data = buf.get_all_transitions()
        for x, u, xn in zip(data["obs"], data["act"], data["next_obs"]):
            learner.add_rb(x.reshape(-1, 1), u.reshape(-1, 1),
                           xn.reshape(-1, 1))
        learner.stats()
        losses = learner.train_all(epoch=args.train)
        summary["final_loss"] = float(np.asarray(losses)[-1]) \
            if np.ndim(losses) else float(losses)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
