"""Point-mass double-integrator LTI model.

Reference: scripts/src/models/point_mass_model.py (Python) and
src/model_base.cpp:53-84 (C++ — the C++ ModelBase *is* the point-mass).

Dynamics: x' = A x + (B / mass) u with per-DoF blocks

    A = [[1, dt], [0, 1]]        B = [[dt^2 / 2], [dt]]

assembled block-diagonally over stateDim/2 DoFs (point_mass_model.py:134-151).
State layout is interleaved [q0, v0, q1, v1, ...] matching the reference's
MuJoCo state read (scripts/src/mujoco/simulation.py:32-37).

The mass is the single trainable parameter (a gradient-descent convergence
test on it exists in the reference suite, scripts/test.py:220) — here it
lives in the ``params`` pytree.

TPU note: the batched update is two matmuls on [k, sDim] x [sDim, sDim]^T —
XLA fuses A x + B u into one pass; for sDim=6 this is VPU-bound and the hot
path is instead the fused Pallas rollout kernel (kernels/rollout_pm.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.blockdiag import block_diag
from .base import ModelBase


class PointMassModel(ModelBase):
    """LTI double integrator with trainable mass."""

    def __init__(
        self,
        mass: float = 1.0,
        dt: float = 0.1,
        state_dim: int = 2,
        action_dim: int = 1,
        act_max=None,
        act_min=None,
        name: str = "point_mass",
        dtype=jnp.float32,
    ):
        if state_dim != 2 * action_dim:
            raise ValueError(
                f"point-mass expects state_dim == 2*action_dim, got {state_dim}/{action_dim}"
            )
        super().__init__(state_dim, action_dim, dt=dt, name=name,
                         act_max=act_max, act_min=act_min, dtype=dtype)
        self._mass0 = float(mass)

        a = np.array([[1.0, dt], [0.0, 1.0]])
        self._A = jnp.asarray(block_diag(a, state_dim // 2), dtype=dtype)
        b = np.array([[dt * dt / 2.0], [dt]])
        self._B = jnp.asarray(block_diag(b, action_dim), dtype=dtype)

    def init_params(self):
        return {"mass": jnp.asarray(self._mass0, dtype=self._dtype)}

    def step(self, params, x: jax.Array, u: jax.Array) -> jax.Array:
        """x_next = A x + (B / mass) u, batched over the leading axis.

        Reference: point_mass_model.py:66-125 (build_free_step_graph +
        build_action_step_graph).
        """
        free = x @ self._A.T
        forced = (u @ self._B.T) / params["mass"]
        return free + forced

    def get_mass(self, params) -> jax.Array:
        """Reference: point_mass_model.py:127-132."""
        return params["mass"]
