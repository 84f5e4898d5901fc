"""Model-verification tool: roll recorded action sequences through one or
more models and compare against ground truth.

Reference: scripts/verify_models.py — load N model configs (or learner
logdirs, auto-discovering the latest ``weights_step*`` checkpoint), roll an
action-sequence file, plot / report errors vs ground truth, and
scripts/src/misc/test_models.py (the comparison plots).

Usage:
    python -m mppi_tf_tpu.verify_models --models models/rexrov2 \
        --seq seq.npz --gt gt.npz [--plot out.png]

``--seq`` is an npz with ``actions`` [tau, aDim]; ``--gt`` an npz with
``traj`` [tau+1, sDim].
"""

from __future__ import annotations

import argparse
import json
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", nargs="+", required=True,
                   help="model configs (bundled names / YAML paths) or "
                        "learner logdirs containing weights_step*")
    p.add_argument("--labels", nargs="*", default=None)
    p.add_argument("--seq", required=True, help="npz with actions [tau, aDim]")
    p.add_argument("--gt", required=True, help="npz with traj [tau+1, sDim]")
    p.add_argument("--dt", type=float, default=0.1)
    p.add_argument("--plot", default=None, help="write a comparison PNG")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv)


def load_model(spec: str, dt: float, state_dim: int, action_dim: int):
    """Build a model from a config name/path or a learner logdir.

    Reference: verify_models.py:49-76 — logdirs are recognised by containing
    a ``weights_step*`` checkpoint, which is then loaded.
    """
    from .cfg import default_config, parse_config
    from .learning.checkpoint import latest_checkpoint, load_checkpoint
    from .models import get_model

    if os.path.isdir(spec):
        ckpt = latest_checkpoint(spec)
        if ckpt is None:
            raise FileNotFoundError(f"no weights_step* checkpoint in {spec}")
        model_cfg_path = os.path.join(spec, "model.yaml")
        model_cfg = parse_config(model_cfg_path) if os.path.exists(
            model_cfg_path) else {"type": "auv_nn"}
        model = get_model(model_cfg, dt=dt, state_dim=state_dim,
                          action_dim=action_dim)
        params = load_checkpoint(ckpt, like=model.init_params())
        return model, params
    cfg = parse_config(spec) if os.path.exists(spec) else default_config(spec)
    model = get_model(cfg, dt=dt, state_dim=state_dim, action_dim=action_dim)
    return model, model.init_params()


def main(argv=None):
    args = parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    def _load_array(path, key):
        """Accept a plain .npy array or an .npz archive (named ``key``,
        else its sole array) — fail with the available keys otherwise."""
        data = np.load(path)
        if isinstance(data, np.ndarray):
            return data
        if key in data:
            return data[key]
        if len(data.files) == 1:
            return data[data.files[0]]
        raise KeyError(
            f"{path}: expected array {key!r} (or a single-array archive); "
            f"found keys {data.files}")

    seq = _load_array(args.seq, "actions")
    gt = _load_array(args.gt, "traj")
    seq = np.asarray(seq, np.float64).reshape(-1, seq.shape[-1])
    gt = np.asarray(gt, np.float64).reshape(-1, gt.shape[-1])
    tau, adim = seq.shape
    sdim = gt.shape[1]

    labels = args.labels or args.models
    results = []
    trajs = {}
    for spec, label in zip(args.models, labels):
        model, params = load_model(spec, args.dt, sdim, adim)
        traj = np.asarray(model.run_model(
            params,
            jnp.asarray(gt[0], dtype=model.dtype),
            jnp.asarray(seq, dtype=model.dtype)))
        n = min(traj.shape[0], gt.shape[0])
        err = np.mean((traj[:n] - gt[:n]) ** 2, axis=0)
        results.append({"model": label,
                        "mse_per_dim": [round(float(e), 6) for e in err],
                        "mse": round(float(err.mean()), 6)})
        trajs[label] = traj

    if args.plot:
        _plot(trajs, gt, args.plot)
    print(json.dumps(results))
    return 0


def _plot(trajs, gt, path):
    """Trajectory comparison plot. Reference: test_models.py:110-127."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sdim = gt.shape[1]
    cols = min(sdim, 7)
    rows = (sdim + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 2.5 * rows),
                             squeeze=False)
    for d in range(sdim):
        ax = axes[d // cols][d % cols]
        ax.plot(gt[:, d], "k-", label="ground truth")
        for label, traj in trajs.items():
            n = min(traj.shape[0], gt.shape[0])
            ax.plot(traj[:n, d], "--", label=label)
        ax.set_title(f"dim {d}", fontsize=8)
    axes[0][0].legend(fontsize=6)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


if __name__ == "__main__":
    raise SystemExit(main())
