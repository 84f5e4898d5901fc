"""Analytic point-mass environment (MJCF-equivalent, no MuJoCo dependency).

Replaces the reference's mujoco_py Simulation + MJCF point-mass scenes
(scripts/src/mujoco/simulation.py, envs/point_mass{1,2,3}d.xml) with a pure
numpy integrator using the same semantics:

- unit point mass on N frictionless slide joints, force actuators;
- RK4 integration at the physics timestep dt=0.01 (the MJCF scenes set
  ``integrator="RK4" timestep="0.01"``) — for this LTI plant RK4 at any dt
  is exact, so the env matches both MuJoCo and the PointMassModel;
- interleaved state read [q0, v0, q1, v1, ...] (simulation.py:32-37);
- a ``target`` goal site (simulation.py:19-24).

Being exact for the double integrator, this env doubles as the ground truth
for model-parity tests.
"""

from __future__ import annotations

import numpy as np


class PointMassEnv:
    """N-DoF frictionless point mass driven by per-axis forces."""

    def __init__(self, n_dof: int = 3, mass: float = 1.0, dt: float = 0.01,
                 goal=None, render: bool = False):
        self.n_dof = int(n_dof)
        self.mass = float(mass)
        self.dt = float(dt)
        self.render = render  # accepted for API parity; nothing to draw
        self._q = np.zeros(self.n_dof)
        self._v = np.zeros(self.n_dof)
        self._t = 0.0
        self._ctrl = np.zeros(self.n_dof)
        if goal is None:
            goal = np.zeros(2 * self.n_dof)
        self.goal = np.asarray(goal, np.float64).reshape(2 * self.n_dof, 1)

    # --- reference Simulation API (simulation.py:26-55) -----------------
    def getTime(self) -> float:
        return self._t

    def getGoal(self) -> np.ndarray:
        return self.goal

    def getState(self) -> np.ndarray:
        """Interleaved [q0, v0, q1, v1, ...] column. Reference: simulation.py:32-37."""
        x = np.zeros((2 * self.n_dof, 1))
        x[0::2, 0] = self._q
        x[1::2, 0] = self._v
        return x

    def setState(self, x) -> None:
        x = np.asarray(x, np.float64).reshape(-1)
        self._q = x[0::2].copy()
        self._v = x[1::2].copy()

    def step(self, u, goal=None) -> np.ndarray:
        """Apply control and advance one physics step. Reference: simulation.py:39-55.

        u: [1, aDim] or [aDim]-shaped force command.
        """
        u = np.asarray(u, np.float64).reshape(-1)[: self.n_dof]
        self._ctrl = u
        a = u / self.mass
        # exact double-integrator update over dt (== RK4 for LTI)
        self._q = self._q + self._v * self.dt + 0.5 * a * self.dt * self.dt
        self._v = self._v + a * self.dt
        self._t += self.dt
        return self.getState()

    def reset(self, x0=None) -> np.ndarray:
        self._t = 0.0
        if x0 is None:
            self._q[:] = 0.0
            self._v[:] = 0.0
        else:
            self.setState(x0)
        return self.getState()


class AUVEnv:
    """Analytic AUV plant: the Fossen dynamics themselves as the simulator.

    The reference has no AUV simulation environment in-tree (its live AUV
    consumers were external ROS/uuv_sim nodes, SURVEY.md §1 status caveat);
    closed-loop AUV experiments therefore use the analytic AUVModel as the
    plant, stepped at a finer physics dt than the controller (the same
    sim/control rate decoupling as the point-mass env). The 13-dim state is
    NOT interleaved: [x y z | qx qy qz qw | u v w p q r].
    """

    STATE_DIM = 13

    def __init__(self, model_cfg: dict, dt: float = 0.02, goal=None,
                 x0=None, render: bool = False):
        import jax

        from ..models import get_model

        self.dt = float(dt)
        self.render = render
        cfg = dict(model_cfg)
        cfg.setdefault("type", "auv")
        # the plant integrates at the fine dt
        self._model = get_model(cfg, dt=self.dt, action_dim=6)
        self._params = self._model.precompute(self._model.init_params())
        self._step_jit = jax.jit(self.step_fn)
        self._t = 0.0
        if goal is None:
            goal = np.zeros(self.STATE_DIM)
            goal[6] = 1.0
        self.goal = np.asarray(goal, np.float64).reshape(-1, 1)
        self._x = np.zeros(self.STATE_DIM)
        self._x[6] = 1.0
        if x0 is not None:
            self._x = np.asarray(x0, np.float64).reshape(-1).copy()

    def step_fn(self, x, u):
        """Pure jittable plant step (the on-device-loop surface,
        mjx_env.build_on_device_loop): full Fossen dynamics at the plant dt.
        x: [13], u: [6] -> [13]."""
        return self._model.step(self._params, x[None, :], u[None, :])[0]

    def getTime(self) -> float:
        return self._t

    def getGoal(self) -> np.ndarray:
        return self.goal

    def getState(self) -> np.ndarray:
        return self._x.reshape(-1, 1).copy()

    def setState(self, x) -> None:
        self._x = np.asarray(x, np.float64).reshape(-1).copy()

    def step(self, u, goal=None) -> np.ndarray:
        import jax.numpy as jnp

        u = np.asarray(u, np.float64).reshape(-1)[:6]
        self._x = np.asarray(
            self._step_jit(jnp.asarray(self._x, self._model.dtype),
                           jnp.asarray(u, self._model.dtype)),
            np.float64)
        self._t += self.dt
        return self.getState()

    def reset(self, x0=None) -> np.ndarray:
        self._t = 0.0
        if x0 is None:
            self._x = np.zeros(self.STATE_DIM)
            self._x[6] = 1.0
        else:
            self.setState(x0)
        return self.getState()
