"""Dynamics-model protocol.

TPU-native counterpart of the reference ModelBase
(scripts/src/models/model_base.py, include/model_base.hpp). Differences by
design:

- models are *stateless*: trainable quantities live in an explicit ``params``
  pytree returned by :meth:`init_params` and threaded through :meth:`step`
  (the reference mutates ``tf.Variable``s; that pattern doesn't jit/pjit);
- the batch size k is implicit in the array shapes — no ``set_k`` variable
  (reference model_base.py:118) because XLA shapes are static per trace;
- states are flat ``[k, sDim]`` (the reference's trailing singleton is a TF
  graph artifact).

The controller only needs ``step``; ``predict`` and ``run_model`` parity
wrappers (model_base.py:59-100) are provided for the learner/verification
tooling.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..ops.rollout import rollout_trajectory


class ModelBase:
    """Abstract batched one-step dynamics model."""

    def __init__(
        self,
        state_dim: int,
        action_dim: int,
        dt: float = 0.1,
        name: str = "model",
        act_max=None,
        act_min=None,
        dtype=jnp.float32,
    ):
        self._state_dim = int(state_dim)
        self._action_dim = int(action_dim)
        self._dt = float(dt)
        self._name = name
        self._dtype = dtype
        one = jnp.ones((action_dim,), dtype=dtype)
        self._act_max = one if act_max is None else jnp.asarray(act_max, dtype).reshape(-1) * jnp.ones_like(one)
        self._act_min = -one if act_min is None else jnp.asarray(act_min, dtype).reshape(-1) * jnp.ones_like(one)

    # --- protocol -------------------------------------------------------
    def init_params(self) -> Any:
        """Return the trainable-parameter pytree."""
        return {}

    def step(self, params: Any, x: jax.Array, u: jax.Array) -> jax.Array:
        """One-step prediction f(x, u). x: [k, sDim], u: [k, aDim] -> [k, sDim].

        Reference: model_base.py:41-57 (``build_step_graph``).
        """
        raise NotImplementedError

    # --- trainable surface ------------------------------------------------
    # The reference gives EVERY model an Adam handle and trains whatever
    # tf.Variables it holds (model_base.py:30-39; the point-mass mass
    # convergence test is scripts/test.py:220). Here the same contract is
    # the (trainable, with_trainable, trainable_init) triple the Learner
    # drives: for analytic models the trainable sub-pytree is the physical
    # parameters themselves (mass, inertia); NN models override to expose
    # only the network weights (models/nn.py).
    def trainable(self, params: Any) -> Any:
        """Sub-pytree gradients flow through. Default: the whole params pytree."""
        return params

    def with_trainable(self, params: Any, tr: Any) -> Any:
        """Merge an updated trainable sub-pytree back into ``params``."""
        if isinstance(params, dict) and isinstance(tr, dict):
            return {**params, **tr}
        return tr

    def trainable_init(self, key: jax.Array) -> Any:
        """A fresh trainable init for k-fold clones (reference ``copy_model``,
        scripts/src/model.py:70-78). Analytic models are deterministic —
        re-init returns the configured physical parameters; NN models draw
        fresh weights from ``key``."""
        del key
        return self.trainable(self.init_params())

    def precompute(self, params: Any) -> Any:
        """Hoist solve-invariant derived quantities out of the rollout loop.

        Called once per solve (controller/mppi.py, parallel/sharded.py)
        before the ``lax.scan`` over the horizon; ``step`` must accept the
        augmented pytree. Default: identity. AUVModel uses this to compute
        the 6x6 total-mass inverse once instead of per scan step (XLA does
        not hoist the LU custom-call out of scan bodies)."""
        return params

    # --- parity helpers -------------------------------------------------
    def predict(self, params: Any, x: jax.Array, u: jax.Array) -> jax.Array:
        """Single-sample prediction. x: [sDim], u: [aDim] -> [sDim].

        Reference: model_base.py:59-73.
        """
        return self.step(params, x[None, :], u[None, :])[0]

    def run_model(self, params: Any, x0: jax.Array, useq: jax.Array) -> jax.Array:
        """Sequential open-loop rollout. Reference: model_base.py:75-100.

        x0: [sDim] or [k, sDim]; useq: [tau, aDim] or [k, tau, aDim].
        Returns the trajectory including x0.
        """
        return rollout_trajectory(lambda x, u: self.step(params, x, u), x0, useq)

    # --- metadata -------------------------------------------------------
    def get_name(self) -> str:
        return self._name

    def get_state_dim(self) -> int:
        return self._state_dim

    def get_action_dim(self) -> int:
        return self._action_dim

    @property
    def dt(self) -> float:
        return self._dt

    @property
    def dtype(self):
        return self._dtype

    def max_act(self) -> jax.Array:
        return self._act_max

    def min_act(self) -> jax.Array:
        return self._act_min
