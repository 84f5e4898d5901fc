"""Device-mesh construction for pod-scale MPPI.

The reference is single-process, single-device (SURVEY.md §2.8); this module
is the greenfield TPU-native scale-out layer: the K samples axis is sharded
over a 1-D (or the flattened majority of an N-D) mesh, with ICI carrying the
four collectives the update law needs (pmin/pmax/psum — ops/update.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

# the canonical mesh-axis name for the samples (K) axis
SAMPLE_AXIS = "k"


def sample_axis() -> str:
    return SAMPLE_AXIS


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = (SAMPLE_AXIS,),
    devices=None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    With one axis name the mesh is 1-D over all requested devices (DP over
    K — the natural MPPI decomposition since rollouts are embarrassingly
    parallel and only the update's reductions communicate).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if len(axis_names) == 1:
        return Mesh(devices, axis_names)
    # N-D: factor devices as evenly as possible over the requested axes.
    shape = _factor(n_devices, len(axis_names))
    return Mesh(devices.reshape(shape), axis_names)


def _factor(n: int, dims: int):
    """Factor n into `dims` integers, largest first."""
    shape = [1] * dims
    remaining = n
    for i in range(dims - 1):
        f = _largest_factor_leq(remaining, int(round(remaining ** (1.0 / (dims - i)))))
        shape[i] = f
        remaining //= f
    shape[-1] = remaining
    shape.sort(reverse=True)
    return tuple(shape)


def _largest_factor_leq(n: int, target: int) -> int:
    for f in range(max(target, 1), 0, -1):
        if n % f == 0:
            return f
    return 1
