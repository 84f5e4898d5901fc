"""Metrics observer: TensorBoard scalars/histograms + config snapshotting.

Reference: scripts/src/observer/observer_base.py — per-step TensorBoard
scalars/histograms of sample costs, weights, nabla (as % of K), exp
argument, noise, applied input, state; one-step prediction error decomposed
into position/rotation/velocity; YAML config snapshots into the logdir for
experiment replay (observer_base.py:46-59); a step counter (``advance``).

TPU-native differences:
- writes through ``torch.utils.tensorboard`` (no TF dependency) with a JSONL
  fallback so headless pods always record something;
- the controller hands over a single ``info`` dict per solve (the jitted
  solve's auxiliary outputs) instead of the reference's string-keyed
  write_control dispatch from inside the graph (observer_base.py:101-187) —
  keeping host logging out of the compiled hot path.
"""

from __future__ import annotations

import json
import os
from datetime import datetime
from typing import Optional

import numpy as np

try:
    from torch.utils.tensorboard import SummaryWriter

    HAVE_TB = True
except Exception:  # pragma: no cover
    SummaryWriter = None
    HAVE_TB = False


class Observer:
    """Writes control/prediction metrics and snapshots configs for replay."""

    def __init__(self, log_path: Optional[str] = None, env_cfg=None,
                 task_cfg=None, model_cfg=None, use_tensorboard: bool = True,
                 log: bool = True):
        self.log = log
        self._step = 0
        stamp = datetime.now().strftime("%Y.%m.%d-%H.%M.%S")
        self.logdir = os.path.join(log_path or "logs", stamp)
        os.makedirs(self.logdir, exist_ok=True)
        self._writer = None
        if use_tensorboard and HAVE_TB:
            self._writer = SummaryWriter(self.logdir)
        self._jsonl = open(os.path.join(self.logdir, "metrics.jsonl"), "a")
        self._snapshot_configs(env_cfg, task_cfg, model_cfg)

    # --- config snapshotting (observer_base.py:46-59) --------------------
    def _snapshot_configs(self, env_cfg, task_cfg, model_cfg):
        import yaml

        for name, cfg in (("config", env_cfg), ("task", task_cfg),
                          ("model", model_cfg)):
            if cfg is not None:
                with open(os.path.join(self.logdir, f"{name}.yaml"), "w") as f:
                    yaml.safe_dump(cfg, f)

    def get_logdir(self) -> str:
        return self.logdir

    # --- step counter (observer_base.py:95-99) ----------------------------
    def advance(self):
        self._step += 1

    @property
    def step(self) -> int:
        return self._step

    # --- writers -----------------------------------------------------------
    def scalar(self, tag: str, value, step: Optional[int] = None):
        """Scalars go to BOTH sinks by design: metrics.jsonl is the
        machine-readable record (replay tooling and the test suite parse
        it) and TensorBoard is the optional human view. Histograms are
        TB-first with a summary-stats JSONL fallback — raw per-sample
        arrays would bloat the JSONL without being replay-usable."""
        if not self.log:
            return
        step = self._step if step is None else step
        value = float(np.asarray(value))
        if self._writer is not None:
            self._writer.add_scalar(tag, value, step)
        self._jsonl.write(json.dumps({"step": step, tag: value}) + "\n")

    def histogram(self, tag: str, values, step: Optional[int] = None):
        if not self.log:
            return
        step = self._step if step is None else step
        values = np.asarray(values)
        if self._writer is not None:
            self._writer.add_histogram(tag, values, step)
        else:
            self._jsonl.write(json.dumps({
                "step": step, tag + "/mean": float(values.mean()),
                tag + "/std": float(values.std()),
                tag + "/min": float(values.min()),
                tag + "/max": float(values.max()),
            }) + "\n")

    # --- controller hooks ----------------------------------------------
    def write_control(self, state=None, action=None, info=None):
        """Per-solve metrics. Catalogue mirrors observer_base.py:101-187."""
        if not self.log:
            return
        if info is not None:
            for key in ("cost_min", "cost_mean", "cost_max"):
                if key in info:
                    self.scalar(f"Cost/{key}", info[key])
            if "nabla" in info:
                self.scalar("Controller/nabla", info["nabla"])
                if "sample_costs" in info:
                    k = np.asarray(info["sample_costs"]).shape[0]
                    self.scalar("Controller/nabla_percent",
                                100.0 * float(np.asarray(info["nabla"])) / k)
            for key in ("sample_costs", "weights", "arg", "noise"):
                if key in info:
                    self.histogram(f"Controller/{key}", info[key])
            if "weighted_noise" in info:
                self.histogram("Controller/weighted_noise",
                               info["weighted_noise"])
        if action is not None:
            for i, a in enumerate(np.asarray(action).reshape(-1)):
                self.scalar(f"Input/axis_{i}", a)
        if state is not None:
            self.histogram("State/state", np.asarray(state))

    def write_predict(self, x=None, u=None, x_next=None, pred=None,
                      cost=None, cparams=None):
        """One-step prediction-error metrics.

        Error decomposition follows controller_base.py:162-210: position
        (L2 on [:3]), rotation (1 - <q, q_pred>), velocity (L2 on [-6:]) for
        quaternion states; plain L2 otherwise.
        """
        if not self.log or pred is None or x_next is None:
            return
        gt = np.asarray(x_next).reshape(-1)
        pr = np.asarray(pred).reshape(-1)
        if gt.shape[0] >= 13:  # quaternion state
            self.scalar("Predict/error_position",
                        np.linalg.norm(gt[:3] - pr[:3]))
            self.scalar("Predict/error_rotation",
                        1.0 - float(gt[3:7] @ pr[3:7]))
            self.scalar("Predict/error_velocity",
                        np.linalg.norm(gt[-6:] - pr[-6:]))
        else:
            self.scalar("Predict/error", np.linalg.norm(gt - pr))
        if cost is not None and cparams is not None and x is not None:
            import jax.numpy as jnp

            state_b = jnp.asarray(np.asarray(x).reshape(1, -1))
            self.scalar("Predict/step_cost",
                        np.asarray(cost.state_cost(cparams, state_b))[0])
            try:
                dist = cost.dist(cparams, state_b)
                if isinstance(dist, dict):
                    for k, v in dist.items():
                        self.scalar(f"Predict/dist_{k}", v)
                else:
                    self.scalar("Predict/dist",
                                np.linalg.norm(np.asarray(dist)))
            except NotImplementedError:
                pass

    def save_graph(self, hlo_text: str):
        """Persist the compiled solve's HLO — the graph-dump analogue
        (observer_base.py:84-93, utile.cpp:46-54)."""
        with open(os.path.join(self.logdir, "solve_hlo.txt"), "w") as f:
            f.write(hlo_text)

    def close(self):
        if self._writer is not None:
            self._writer.flush()
            self._writer.close()
        self._jsonl.flush()
        self._jsonl.close()
