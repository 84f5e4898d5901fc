"""Cost-params (goal / mission queue) checkpointing shared by the
controller ``save_state``/``load_state`` implementations.

The cost params pytree is mutable controller state: ``set_goal``,
``set_waypoints`` and every mission pop rewrite it. Without it in the
checkpoint, a resumed closed-loop run silently reverts to the cost's
initial goal — and a mission resumes from leg one (gap found in round 4;
SURVEY.md §5.4: the reference never checkpoints controller state at all).

Leaves are stored as ``cp_<i>`` arrays in the same .npz, in the pytree's
flatten order; loading validates leaf count and shapes against the LIVE
cost's params so a checkpoint from a different cost family fails loudly.
Checkpoints written before round 4 simply lack the keys and load with the
controller's current cost params untouched (back-compat).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cparams_entries(cparams) -> dict:
    """npz entries for the cost-params pytree leaves."""
    leaves = jax.tree.leaves(cparams)
    return {f"cp_{i}": np.asarray(v) for i, v in enumerate(leaves)}


def load_cparams(d, cparams):
    """Rebuild cost params from npz ``d`` against the live pytree's
    structure; returns the (possibly unchanged) params."""
    leaves, treedef = jax.tree.flatten(cparams)
    keys = sorted((k for k in d.files if k.startswith("cp_")),
                  key=lambda s: int(s[3:]))
    if not keys:  # pre-round-4 checkpoint: no cost params recorded
        return cparams
    if len(keys) != len(leaves):
        raise ValueError(
            f"checkpoint cost params carry {len(keys)} leaves but the "
            f"controller's cost has {len(leaves)} — different cost family?")
    new = []
    for i, leaf in enumerate(leaves):
        arr = d[f"cp_{i}"]
        if tuple(arr.shape) != tuple(jnp.shape(leaf)):
            raise ValueError(
                f"checkpoint cost-param leaf {i} has shape {arr.shape}, "
                f"the controller's cost expects {tuple(jnp.shape(leaf))}")
        new.append(jnp.asarray(arr, jnp.asarray(leaf).dtype))
    return jax.tree.unflatten(treedef, new)
