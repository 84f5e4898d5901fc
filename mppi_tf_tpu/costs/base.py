"""Cost-function protocol and the information-theoretic action cost.

Reference: scripts/src/costs/cost_base.py (Python, full gamma/upsilon
algebra) and include/cost_base.hpp + src/cost_base.cpp (C++, simplified
``lam * u^T Sigma^-1 eps`` form).

The Python reference's action cost (cost_base.py:114-170) is the canonical
one reproduced here:

    action_cost = 0.5 * ( gamma * (u^T S^-1 u  +  2 u^T S^-1 eps)
                          + lam * (1 - 1/upsilon) * (eps^T S^-1 eps) )

Like the models, costs are stateless: mutable quantities (the goal — a
``tf.Variable`` for moving targets in the reference, static_cost.py:99-111)
live in an explicit ``params`` pytree so goal updates never retrace the
compiled solve.

Shapes are flat: state [k, sDim], action [aDim] (the *unperturbed* nominal
action — the reference scores u_t un-batched, controller_base.py:404,
cost_base.py:63-65), noise [k, aDim]; costs return [k].
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


class CostBase:
    """Abstract cost: running state cost + info-theoretic action cost."""

    def __init__(self, lam: float, gamma: float, upsilon: float, sigma,
                 dtype=jnp.float32):
        """
        Args:
            lam: inverse temperature lambda.
            gamma: action/noise decoupling parameter.
            upsilon: noise covariance augmentation.
            sigma: noise covariance matrix [aDim, aDim].

        Reference: cost_base.py:12-41 (Sigma^-1 computed once at setup).
        """
        self.lam = float(lam)
        self.gamma = float(gamma)
        self.upsilon = float(upsilon)
        sig = np.asarray(sigma, dtype=np.float64)
        if sig.ndim != 2 or sig.shape[0] != sig.shape[1]:
            raise AssertionError(
                "noise covariance must be a square [aDim, aDim] matrix"
            )
        # Invert on host in f64 once, like the reference's setup-time inv
        # (cost_base.py:41); store at working precision.
        self._inv_sigma = jnp.asarray(np.linalg.inv(sig), dtype=dtype)
        self._dtype = dtype

    # --- protocol -------------------------------------------------------
    def init_params(self) -> Any:
        """Dynamic cost parameters (goal etc.) as a pytree."""
        return {}

    def state_cost(self, cp: Any, state: jax.Array) -> jax.Array:
        """Running state cost q(x). state: [k, sDim] -> [k].

        Reference: cost_base.py:172-185 (abstract).
        """
        raise NotImplementedError

    def action_cost(self, action: jax.Array, noise: jax.Array,
                    sched_scale=None) -> jax.Array:
        """Information-theoretic action cost. action: [aDim], noise: [k, aDim] -> [k].

        ``sched_scale``: the per-step noise-schedule factor c_t (scalar).
        When set, the step's covariance is Sigma_t = c_t * sigma, so the
        whole cost is evaluated with Sigma_t^-1 = Sigma^-1 / c_t — the
        importance-sampling correction that matches a schedule-scaled noise
        draw (ops/noise.resolve_noise_schedule).

        Reference: cost_base.py:114-170 (constant sigma).
        """
        inv_sig = self._inv_sigma
        if sched_scale is not None:
            inv_sig = inv_sig / jnp.asarray(sched_scale, inv_sig.dtype)
        # S^-1 u : [aDim]; S^-1 eps : [k, aDim]
        rhs_a = inv_sig @ action
        rhs_n = noise @ inv_sig.T
        a_cost = self.gamma * (action @ rhs_a)
        mix_cost = 2.0 * self.gamma * (noise @ rhs_a)
        n_cost = (self.lam * (1.0 - 1.0 / self.upsilon)) * jnp.sum(
            noise * rhs_n, axis=-1
        )
        return 0.5 * (a_cost + mix_cost + n_cost)

    def step_cost(self, cp: Any, state: jax.Array, action: jax.Array,
                  noise: jax.Array) -> jax.Array:
        """q(x) + action_cost. Reference: cost_base.py:43-77."""
        return self.state_cost(cp, state) + self.action_cost(action, noise)

    def final_cost(self, cp: Any, state: jax.Array) -> jax.Array:
        """Terminal cost phi(x) — the state cost by default.

        Reference: cost_base.py:98-112.
        """
        return self.state_cost(cp, state)

    def dist(self, cp: Any, state: jax.Array):
        """Distance diagnostic from state to goal. Reference: cost_base.py:193-205."""
        raise NotImplementedError

    def set_goal(self, cp: Any, goal) -> Any:
        """Functional goal update: returns new cost params (no retrace)."""
        raise NotImplementedError

    @property
    def inv_sigma(self) -> jax.Array:
        return self._inv_sigma

    @property
    def dtype(self):
        return self._dtype
