"""Environment tests: analytic env exactness, MuJoCo parity, runner flow.

The env-parity test (mujoco vs analytic) is the coverage the reference
lacks (SURVEY.md §4 "env parity tests" — the reference never unit-tests its
MuJoCo env).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mppi_tf_tpu.envs.analytic import PointMassEnv
from mppi_tf_tpu.envs.runner import ClosedLoopRunner
from mppi_tf_tpu.models.point_mass import PointMassModel


class TestAnalyticEnv:
    def test_state_layout_interleaved(self):
        env = PointMassEnv(n_dof=3)
        env.setState([1.0, 0.1, 2.0, 0.2, 3.0, 0.3])
        x = env.getState()
        assert x.shape == (6, 1)
        np.testing.assert_allclose(x[:, 0], [1.0, 0.1, 2.0, 0.2, 3.0, 0.3])

    def test_free_drift(self):
        env = PointMassEnv(n_dof=1, dt=0.01)
        env.setState([0.0, 1.0])  # unit velocity
        for _ in range(100):
            env.step([0.0])
        x = env.getState()[:, 0]
        np.testing.assert_allclose(x, [1.0, 1.0], rtol=1e-12)
        np.testing.assert_allclose(env.getTime(), 1.0, rtol=1e-12)

    def test_constant_force(self):
        env = PointMassEnv(n_dof=2, mass=2.0, dt=0.01)
        for _ in range(100):
            env.step([2.0, 0.0])
        x = env.getState()[:, 0]
        # a = 1, t = 1: q = 0.5, v = 1
        np.testing.assert_allclose(x, [0.5, 1.0, 0.0, 0.0], rtol=1e-9)

    def test_matches_point_mass_model(self):
        """The env (dt=0.01 substeps) must equal the controller's model
        (dt=0.1) over one control period — exact for LTI."""
        env = PointMassEnv(n_dof=3, dt=0.01)
        model = PointMassModel(mass=1.0, dt=0.1, state_dim=6, action_dim=3,
                               dtype=jnp.float64)
        params = model.init_params()
        rng = np.random.default_rng(30)
        x0 = rng.normal(size=6)
        u = rng.normal(size=3)
        env.setState(x0)
        for _ in range(10):
            env.step(u)
        pred = model.predict(params, jnp.asarray(x0), jnp.asarray(u))
        np.testing.assert_allclose(env.getState()[:, 0], pred, rtol=1e-9)


@pytest.mark.skipif(
    not pytest.importorskip("mujoco", reason="mujoco unavailable"),
    reason="mujoco unavailable")
class TestMujocoParity:
    def test_mujoco_matches_analytic(self):
        from mppi_tf_tpu.envs.mujoco_env import make_point_mass_env

        mj_env = make_point_mass_env(n_dof=3)
        an_env = PointMassEnv(n_dof=3, dt=0.01)
        rng = np.random.default_rng(31)
        u = rng.normal(size=3)
        for _ in range(50):
            mj_env.step(u)
            an_env.step(u)
        np.testing.assert_allclose(
            mj_env.getState(), an_env.getState(), rtol=1e-6, atol=1e-9)

    def test_goal_from_target_site(self):
        from mppi_tf_tpu.envs.mujoco_env import make_point_mass_env

        env = make_point_mass_env(n_dof=3, goal=(1.0, 0.5, -0.5))
        g = env.getGoal()[:, 0]
        np.testing.assert_allclose(g[0::2], [1.0, 0.5, -0.5], atol=1e-12)


class TestRunner:
    def test_rate_decoupling(self):
        """Controller at dt=0.1, plant at dt=0.01: 10 physics steps per
        control step (main.py:98-100 semantics)."""

        class CountingEnv(PointMassEnv):
            def __init__(self):
                super().__init__(n_dof=1, dt=0.01)
                self.calls = 0

            def step(self, u, goal=None):
                self.calls += 1
                return super().step(u, goal)

        class ZeroCtrl:
            def next(self, x):
                return np.zeros(1)

        env = CountingEnv()
        runner = ClosedLoopRunner(env, ZeroCtrl(), control_dt=0.1)
        states, actions = runner.run(5)
        assert env.calls == 50
        assert states.shape == (6, 2)
        assert actions.shape == (5, 1)

    def test_closed_loop_with_mppi_reaches_goal(self):
        from mppi_tf_tpu.controller.mppi import MPPI
        from mppi_tf_tpu.costs.static import StaticCost

        sigma = np.diag([0.25])
        model = PointMassModel(mass=1.0, dt=0.1, state_dim=2, action_dim=1,
                               dtype=jnp.float64)
        cost = StaticCost(0.8, 0.2, 1.0, sigma, [1.0, 0.0],
                          np.diag([5.0, 1.0]), dtype=jnp.float64)
        ctrl = MPPI(model, cost, k=500, tau=25, lam=0.8, upsilon=1.0,
                    sigma=sigma)
        env = PointMassEnv(n_dof=1, dt=0.01)
        runner = ClosedLoopRunner(env, ctrl, control_dt=0.1)
        states, _ = runner.run(60)
        assert abs(states[-1, 0] - 1.0) < 0.2, states[-1]


def test_flagship_auv_elipse3d_experiment():
    """The bluerov + elipse3d + rexrov2 config combo runs closed loop
    (regression: a missing env key used to silently build a point-mass
    plant for the 13-dim AUV state)."""
    import numpy as np

    from mppi_tf_tpu.cfg import default_config
    from mppi_tf_tpu.envs.runner import run_experiment

    env_cfg = dict(default_config("envs/bluerov"), samples=64, horizon=4)
    task_cfg = default_config("tasks/elipse3d_task")
    model_cfg = default_config("models/rexrov2")
    out = run_experiment(env_cfg, task_cfg, model_cfg, steps=3, log=False)
    states = out["states"]
    assert states.shape[1] == 13
    assert np.all(np.isfinite(states))
    qn = np.linalg.norm(states[-1][3:7])
    assert abs(qn - 1.0) < 1e-5, qn
