"""Parameter checkpointing.

Reference mechanisms (SURVEY.md §5.4): Keras SavedModel at
``weights_step{n}`` (nn_model.py:137-142), replay-buffer save/load
(learner_base.py:54-64), and YAML config snapshots for replay
(observer_base.py:46-59 — handled by Observer).

Here: Orbax (the JAX-native checkpointer, atomic + async-capable) when
available, with an npz fallback; the ``weights_step{n}`` naming and
latest-checkpoint discovery (verify_models.py:55-64) are preserved.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np


def _try_orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except Exception:  # pragma: no cover
        return None


def save_checkpoint(path: str, params: Any) -> str:
    """Save a params pytree. Directory -> Orbax; otherwise npz."""
    ocp = _try_orbax()
    if ocp is not None:
        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, params, force=True)
        return path
    flat, _treedef = jax.tree.flatten(params)
    np.savez(path + ".npz", *[np.asarray(x) for x in flat])
    return path + ".npz"


def load_checkpoint(path: str, like: Any) -> Any:
    """Load a params pytree saved by :func:`save_checkpoint`.

    ``like`` supplies the tree structure (and dtypes for the npz fallback).
    """
    ocp = _try_orbax()
    if ocp is not None and os.path.isdir(path):
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(os.path.abspath(path))
        # restore as plain arrays, cast onto the reference structure
        return jax.tree.map(
            lambda l, r: jax.numpy.asarray(r, dtype=l.dtype), like, restored)
    npz_path = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz_path)
    flat_like, treedef = jax.tree.flatten(like)
    flat = [jax.numpy.asarray(data[f"arr_{i}"], dtype=l.dtype)
            for i, l in enumerate(flat_like)]
    return jax.tree.unflatten(treedef, flat)


def latest_checkpoint(logdir: str) -> Optional[str]:
    """Find the newest ``weights_step{n}`` checkpoint in a logdir.

    Reference: verify_models.py:55-64 (scan for the latest weights_step*).
    """
    best, best_step = None, -1
    if not os.path.isdir(logdir):
        return None
    for name in os.listdir(logdir):
        m = re.match(r"weights_step(\d+)", name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(logdir, name)
    return best
