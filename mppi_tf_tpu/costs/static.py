"""Static (fixed-goal) quadratic costs.

Reference: scripts/src/costs/static_cost.py — ``StaticCost`` (quadratic
(x-g)^T Q (x-g), :6-70) and ``StaticQuatCost`` (13-dim quaternion state
against a 10-dim error vector, :73-159).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import quaternion as quat
from .base import CostBase


class StaticCost(CostBase):
    """Quadratic goal-tracking cost (x - g)^T Q (x - g).

    Reference: static_cost.py:6-70. ``diag=True`` expands a vector Q into a
    diagonal matrix (static_cost.py:25-26).
    """

    def __init__(self, lam, gamma, upsilon, sigma, goal, Q, diag=False,
                 dtype=jnp.float32):
        super().__init__(lam, gamma, upsilon, sigma, dtype=dtype)
        Qm = np.asarray(Q, dtype=np.float64)
        if diag:
            Qm = np.diag(Qm)
        self.Q = jnp.asarray(Qm, dtype=dtype)
        goal = np.asarray(goal, dtype=np.float64).reshape(-1)
        if goal.shape[0] != self.Q.shape[0]:
            raise AssertionError(
                f"goal shape {goal.shape} incompatible with Q {self.Q.shape}"
            )
        self._goal0 = jnp.asarray(goal, dtype=dtype)

    def init_params(self):
        return {"goal": self._goal0}

    def set_goal(self, cp, goal):
        goal = jnp.asarray(goal, dtype=self._dtype).reshape(-1)
        return {**cp, "goal": goal}

    def state_cost(self, cp, state: jax.Array) -> jax.Array:
        """(x-g)^T Q (x-g), batched. Reference: static_cost.py:40-63."""
        diff = state - cp["goal"][None, :]
        return jnp.sum((diff @ self.Q.T) * diff, axis=-1)

    def dist(self, cp, state: jax.Array) -> jax.Array:
        """Reference: static_cost.py:69-70."""
        return state - cp["goal"]

    def draw_goal(self, cp):
        """Reference: static_cost.py:65-67."""
        return cp["goal"][0], cp["goal"][1]


class StaticQuatCost(CostBase):
    """Quadratic cost for the 13-dim quaternion AUV state.

    Distance vector is 10-dim: [pos err (3), 2*acos(<q, q_goal>) (1),
    vel err (6)] scored against a 10x10 Q. The goal is a dynamic parameter
    (moving targets) — the reference keeps it in a ``tf.Variable``
    (static_cost.py:99-111); here it lives in the cost params pytree.

    Reference: static_cost.py:73-159.
    """

    STATE_DIM = 13

    def __init__(self, lam, gamma, upsilon, sigma, goal, Q, diag=False,
                 dtype=jnp.float32):
        super().__init__(lam, gamma, upsilon, sigma, dtype=dtype)
        Qm = np.asarray(Q, dtype=np.float64)
        if diag:
            Qm = np.diag(Qm)
        if Qm.shape != (10, 10):
            raise AssertionError(f"Q must be [10, 10], got {Qm.shape}")
        self.Q = jnp.asarray(Qm, dtype=dtype)
        goal = np.asarray(goal, dtype=np.float64).reshape(-1)
        if goal.shape[0] != self.STATE_DIM:
            raise AssertionError(f"goal must be [13], got {goal.shape}")
        self._goal0 = jnp.asarray(goal, dtype=dtype)

    def init_params(self):
        return {"goal": self._goal0}

    def set_goal(self, cp, goal):
        goal = jnp.asarray(goal, dtype=self._dtype).reshape(-1)
        return {**cp, "goal": goal}

    def draw_goal(self, cp):
        """Plot anchor (x, y). Reference: static_cost.py:141-143."""
        goal = cp["goal"]
        return float(goal[0]), float(goal[1])

    def dist(self, cp, state: jax.Array) -> jax.Array:
        """10-dim error vector [pos, angle, vel]. Reference: static_cost.py:145-159."""
        goal = cp["goal"]
        pos_dist = state[:, :3] - goal[None, :3]
        dot = jnp.clip(state[:, 3:7] @ goal[3:7], -1.0, 1.0)
        theta = 2.0 * jnp.arccos(dot)
        vel_dist = state[:, 7:13] - goal[None, 7:13]
        return jnp.concatenate([pos_dist, theta[:, None], vel_dist], axis=-1)

    def state_cost(self, cp, state: jax.Array) -> jax.Array:
        """d^T Q d on the 10-dim error. Reference: static_cost.py:116-139."""
        diff = self.dist(cp, state)
        return jnp.sum((diff @ self.Q.T) * diff, axis=-1)
