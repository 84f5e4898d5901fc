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


class TestOnDevicePlant:
    """On-device plant + TPU-resident closed loop (VERDICT r1 item 5 /
    SURVEY §7 step 5). mjx itself is gated on the mujoco-mjx package."""

    def test_jax_env_matches_analytic(self):
        from mppi_tf_tpu.envs.mjx_env import JaxPointMassEnv

        ref = PointMassEnv(n_dof=3, dt=0.01)
        dev = JaxPointMassEnv(n_dof=3, dt=0.01)
        rng = np.random.default_rng(50)
        x0 = rng.normal(size=6)
        ref.reset(x0)
        dev.reset(x0)
        for _ in range(40):
            u = rng.normal(size=3)
            xr = ref.step(u.reshape(1, -1))
            xd = dev.step(u.reshape(1, -1))
        np.testing.assert_allclose(np.asarray(xd), np.asarray(xr),
                                   rtol=1e-5, atol=1e-6)
        assert dev.getTime() == pytest.approx(ref.getTime())

    def test_jax_env_step_fn_pure_and_jittable(self):
        import jax

        from mppi_tf_tpu.envs.mjx_env import JaxPointMassEnv

        env = JaxPointMassEnv(n_dof=2, dt=0.01)
        x = jnp.asarray([0.1, 0.2, -0.3, 0.4])
        u = jnp.asarray([1.0, -1.0])
        a = jax.jit(env.step_fn)(x, u)
        b = env.step_fn(x, u)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_mjx_env_removed_with_guidance(self):
        """The MJX plant class was deleted (VERDICT r3 missing #3: the
        mujoco-mjx package is absent from this image, so the class never
        executed in three rounds). The 'mjx:' env route now fails loudly
        with a pointer at the semantically identical 'jax:' plant."""
        from mppi_tf_tpu.envs import get_env

        with pytest.raises(ValueError, match="jax:point_mass"):
            get_env({"env": "mjx:point_mass", "state-dim": 6,
                     "action-dim": 3})

    def test_on_device_closed_loop_reaches_goal(self):
        """The whole MBRL control loop as ONE jitted scan: solve + plant
        substeps stay on-device; the trajectory converges to the goal."""
        from mppi_tf_tpu.controller.mppi import MPPI
        from mppi_tf_tpu.costs import get_cost
        from mppi_tf_tpu.envs.mjx_env import (JaxPointMassEnv,
                                              on_device_closed_loop)
        from mppi_tf_tpu.models import get_model

        sigma = np.diag([0.4, 0.4])
        model = get_model({"type": "point_mass", "mass": 1.0}, dt=0.1,
                          state_dim=4, action_dim=2)
        cost = get_cost({"type": "static", "diag": True,
                         "goal": [1.0, 0.0, -0.5, 0.0],
                         "Q": [8.0, 1.5, 8.0, 1.5]},
                        lam=0.6, gamma=0.2, upsilon=1.0, sigma=sigma)
        ctrl = MPPI(model, cost, k=256, tau=15, lam=0.6, upsilon=1.0,
                    sigma=sigma, seed=2)
        env = JaxPointMassEnv(n_dof=2, dt=0.01)
        states, actions = on_device_closed_loop(
            ctrl, env.step_fn, np.zeros(4), steps=60, substeps=10)
        states = np.asarray(states)
        assert states.shape == (60, 4)
        assert np.asarray(actions).shape == (60, 2)
        err = np.linalg.norm(states[-1, 0::2] - np.array([1.0, -0.5]))
        assert err < 0.25, err

    def test_on_device_loop_cache_and_warm_start(self):
        """Regression (code review): (a) the compiled-loop cache must hit
        across calls even though env.step_fn is a fresh bound method each
        access; (b) the loop must start from the controller's CURRENT
        nominal sequence, not zeros (init_seq warm start)."""
        from mppi_tf_tpu.controller.mppi import MPPI
        from mppi_tf_tpu.costs import get_cost
        from mppi_tf_tpu.envs.mjx_env import (JaxPointMassEnv,
                                              on_device_closed_loop)
        from mppi_tf_tpu.models import get_model

        sigma = np.diag([0.4, 0.4])
        model = get_model({"type": "point_mass", "mass": 1.0}, dt=0.1,
                          state_dim=4, action_dim=2)
        cost = get_cost({"type": "static", "diag": True,
                         "goal": [1.0, 0.0, -0.5, 0.0],
                         "Q": [8.0, 1.5, 8.0, 1.5]},
                        lam=0.6, gamma=0.2, upsilon=1.0, sigma=sigma)
        env = JaxPointMassEnv(n_dof=2, dt=0.01)
        init = np.tile([[0.7, -0.7]], (8, 1))
        ctrl = MPPI(model, cost, k=64, tau=8, lam=0.6, upsilon=1.0,
                    sigma=sigma, seed=2, init_seq=init)
        _, actions_warm = on_device_closed_loop(ctrl, env.step_fn,
                                                np.zeros(4), steps=3,
                                                substeps=2)
        _, _ = on_device_closed_loop(ctrl, env.step_fn, np.zeros(4),
                                     steps=3, substeps=2)
        assert len(ctrl._ondevice_loops) == 1  # bound-method cache hit

        ctrl0 = MPPI(model, cost, k=64, tau=8, lam=0.6, upsilon=1.0,
                     sigma=sigma, seed=2)
        _, actions_cold = on_device_closed_loop(ctrl0, env.step_fn,
                                                np.zeros(4), steps=3,
                                                substeps=2)
        # warm start carries: first action is near init+noise, not near 0
        assert not np.allclose(np.asarray(actions_warm)[0],
                               np.asarray(actions_cold)[0], atol=0.2)

    def test_on_device_loop_params_fresh_across_calls(self):
        """Regression (code review r3): the compiled loop must read the
        controller's CURRENT model/cost params at each call — set_goal and
        learner updates between calls were silently ignored (baked as
        closure constants at build time) and the cached program never saw
        them."""
        from mppi_tf_tpu.controller.mppi import MPPI
        from mppi_tf_tpu.costs import get_cost
        from mppi_tf_tpu.envs.mjx_env import (JaxPointMassEnv,
                                              on_device_closed_loop)
        from mppi_tf_tpu.models import get_model

        sigma = np.diag([0.4, 0.4])
        model = get_model({"type": "point_mass", "mass": 1.0}, dt=0.1,
                          state_dim=4, action_dim=2)
        cost = get_cost({"type": "static", "diag": True,
                         "goal": [1.0, 0.0, -0.5, 0.0],
                         "Q": [8.0, 1.5, 8.0, 1.5]},
                        lam=0.6, gamma=0.2, upsilon=1.0, sigma=sigma)
        ctrl = MPPI(model, cost, k=256, tau=15, lam=0.6, upsilon=1.0,
                    sigma=sigma, seed=2)
        env = JaxPointMassEnv(n_dof=2, dt=0.01)
        states, _ = on_device_closed_loop(ctrl, env.step_fn, np.zeros(4),
                                          steps=60, substeps=10)
        err1 = np.linalg.norm(
            np.asarray(states)[-1, 0::2] - np.array([1.0, -0.5]))
        assert err1 < 0.25, err1

        # (a) cost params: a new goal steers the SAME cached program
        ctrl.set_goal(np.array([-0.6, 0.0, 0.8, 0.0]))
        states, _ = on_device_closed_loop(ctrl, env.step_fn, np.zeros(4),
                                          steps=60, substeps=10)
        assert len(ctrl._ondevice_loops) == 1  # no rebuild
        err2 = np.linalg.norm(
            np.asarray(states)[-1, 0::2] - np.array([-0.6, 0.8]))
        assert err2 < 0.25, err2

        # (b) model params: a learner-style update changes the rollouts
        a_before = np.asarray(on_device_closed_loop(
            ctrl, env.step_fn, np.zeros(4), steps=60, substeps=10)[1])
        import jax.numpy as jnp

        ctrl.model_params = {"mass": jnp.asarray(4.0, model.dtype)}
        a_after = np.asarray(on_device_closed_loop(
            ctrl, env.step_fn, np.zeros(4), steps=60, substeps=10)[1])
        assert len(ctrl._ondevice_loops) == 1
        assert not np.allclose(a_before, a_after, atol=1e-6)

    def test_on_device_waypoint_mission(self):
        """Single-vehicle on-device mission: WayPointsCost queue pops run
        INSIDE the compiled scan (waypoint_radius=), the plant flies both
        legs with zero host round trips, and the final queue state syncs
        back to the controller."""
        from mppi_tf_tpu.controller.mppi import MPPI
        from mppi_tf_tpu.costs import get_cost
        from mppi_tf_tpu.envs.mjx_env import (JaxPointMassEnv,
                                              build_on_device_loop)
        from mppi_tf_tpu.models import get_model

        sigma = np.diag([0.4, 0.4])
        model = get_model({"type": "point_mass", "mass": 1.0}, dt=0.1,
                          state_dim=4, action_dim=2)
        cost = get_cost({"type": "waypoints", "diag": True, "alpha": 0.2,
                         "waypoints": [[0.8, 0.0, 0.0, 0.0],
                                       [0.8, 0.0, 0.8, 0.0]],
                         "Q": [8.0, 1.5, 8.0, 1.5]},
                        lam=0.6, gamma=0.2, upsilon=1.0, sigma=sigma)
        ctrl = MPPI(model, cost, k=256, tau=15, lam=0.6, upsilon=1.0,
                    sigma=sigma, seed=2)
        env = JaxPointMassEnv(n_dof=2, dt=0.01)
        run = build_on_device_loop(ctrl, env.step_fn, steps=100,
                                   substeps=10, waypoint_radius=0.35)
        import jax

        states, _ = run(np.zeros(4), jax.random.PRNGKey(0))
        states = np.asarray(states)
        assert int(ctrl._cparams["count"]) == 1  # queue advanced in-scan
        err = np.linalg.norm(states[-1, 0::2] - np.array([0.8, 0.8]))
        assert err < 0.3, (err, states[-1])

        with pytest.raises(TypeError, match="WayPointsCost"):
            build_on_device_loop(
                MPPI(model, get_cost(
                    {"type": "static", "diag": True,
                     "goal": [1.0, 0.0, -0.5, 0.0],
                     "Q": [8.0, 1.5, 8.0, 1.5]},
                    lam=0.6, gamma=0.2, upsilon=1.0, sigma=sigma),
                    k=16, tau=3, lam=0.6, upsilon=1.0, sigma=sigma),
                env.step_fn, steps=2, waypoint_radius=0.1)

    def test_run_experiment_on_device(self):
        """Config-driven on-device experiment (cli --on-device): the whole
        run compiles into one program, converges, and the guards for
        host-only plants / train_every fail loudly."""
        import pytest

        from mppi_tf_tpu.envs.runner import run_experiment

        env_cfg = {"env": "jax:point_mass", "state-dim": 4, "action-dim": 2,
                   "dt": 0.1, "noise": (0.4 * np.eye(2)).tolist(),
                   "lambda": 0.6, "gamma": 0.2, "upsilon": 1.0,
                   "samples": 256, "horizon": 15}
        task_cfg = {"type": "static", "diag": True,
                    "goal": [1.0, 0.0, -0.5, 0.0], "Q": [8.0, 1.5, 8.0, 1.5]}
        model_cfg = {"type": "point_mass", "mass": 1.0}
        res = run_experiment(env_cfg, task_cfg, model_cfg, steps=50,
                             on_device=True)
        states = res["states"]
        assert states.shape == (51, 4)  # x0 + one row per control step
        err = np.linalg.norm(states[-1, 0::2] - np.array([1.0, -0.5]))
        assert err < 0.25, err
        assert res["on_device_ms_per_step"] > 0

        with pytest.raises(ValueError, match="train_every"):
            run_experiment(env_cfg, task_cfg, model_cfg, steps=5,
                           on_device=True, train_every=5)
        host_cfg = dict(env_cfg, env="analytic:point_mass")
        with pytest.raises(ValueError, match="step_fn"):
            run_experiment(host_cfg, task_cfg, model_cfg, steps=5,
                           on_device=True)

    @pytest.mark.slow
    def test_on_device_loop_with_sharded_controllers(self):
        """Pod-scale on-device experiment: the shard_map'ed solves
        (ShardedMPPI and ShardedFusedMPPI) inline into the same one-program
        scan; closed loop converges on the 8-device virtual mesh."""
        from mppi_tf_tpu.costs import get_cost
        from mppi_tf_tpu.envs.mjx_env import (JaxPointMassEnv,
                                              on_device_closed_loop)
        from mppi_tf_tpu.models import get_model
        from mppi_tf_tpu.parallel import ShardedMPPI, make_mesh
        from mppi_tf_tpu.parallel.fused import ShardedFusedMPPI

        mesh = make_mesh(8, ("k",))
        sigma = np.diag([0.4, 0.4])
        model = get_model({"type": "point_mass", "mass": 1.0}, dt=0.1,
                          state_dim=4, action_dim=2)
        cost = get_cost({"type": "static", "diag": True,
                         "goal": [1.0, 0.0, -0.5, 0.0],
                         "Q": [8.0, 1.5, 8.0, 1.5]},
                        lam=0.6, gamma=0.2, upsilon=1.0, sigma=sigma)
        env = JaxPointMassEnv(n_dof=2, dt=0.01)
        sx = ShardedMPPI(model, cost, mesh, k=256, tau=15, lam=0.6,
                         upsilon=1.0, sigma=sigma, seed=2)
        states, _ = on_device_closed_loop(sx, env.step_fn, np.zeros(4),
                                          steps=50, substeps=10)
        states = np.asarray(states)
        err = np.linalg.norm(states[-1, 0::2] - np.array([1.0, -0.5]))
        assert err < 0.25, err

        sf = ShardedFusedMPPI(model, cost, mesh, k=256, tau=15, lam=0.6,
                              upsilon=1.0, sigma=sigma, tile=16, seed=2,
                              interpret=True)
        states, actions = on_device_closed_loop(sf, env.step_fn, np.zeros(4),
                                                steps=8, substeps=10)
        # interpret-mode PRNG is stubbed (noise = Box-Muller of zeros-bits)
        # so convergence isn't meaningful on CPU — the contract here is that
        # the fused sharded solve scans on-device and stays finite
        assert np.all(np.isfinite(np.asarray(states)))
        assert np.asarray(actions).shape == (8, 2)

    def test_on_device_auv_closed_loop(self):
        """Flagship on-device loop: the analytic Fossen plant exposes the
        same pure step_fn surface, so the full 6-DoF AUV experiment (solve +
        physics substeps) also compiles into one scan. Depth-setpoint dive
        converges; the plant keeps the quaternion normalized."""
        from tests.test_auv_kernel import _auv_cfg

        from mppi_tf_tpu.controller.mppi import MPPI
        from mppi_tf_tpu.costs import get_cost
        from mppi_tf_tpu.envs.analytic import AUVEnv
        from mppi_tf_tpu.envs.mjx_env import on_device_closed_loop
        from mppi_tf_tpu.models import get_model

        goal = np.zeros(13)
        goal[2] = -1.0
        goal[6] = 1.0
        sigma = np.diag([2000.0] * 3 + [200.0] * 3)  # rexrov-scale thrust
        model = get_model(_auv_cfg(), dt=0.1, action_dim=6)
        cost = get_cost({"type": "static_quat", "diag": True,
                         "goal": goal.tolist(),
                         "Q": [60.0, 60.0, 60.0, 10.0,
                               1.0, 1.0, 1.0, 1.0, 1.0, 1.0]},
                        lam=0.5, gamma=0.2, upsilon=1.0, sigma=sigma)
        # normalize_cost: with rexrov-scale unnormalized costs and lam=0.5
        # the softmax collapses to near-argmax and the closed loop becomes
        # noise-stream-sensitive; the bounded-exponent normalization is
        # exactly the option for this regime (controller_base.py:468-474)
        ctrl = MPPI(model, cost, k=256, tau=15, lam=0.5, upsilon=1.0,
                    sigma=sigma, seed=3, normalize_cost=True)
        env = AUVEnv(_auv_cfg(), dt=0.02)
        x0 = np.zeros(13)
        x0[6] = 1.0
        states, actions = on_device_closed_loop(
            ctrl, env.step_fn, x0, steps=160, substeps=5)
        states = np.asarray(states)
        assert states.shape == (160, 13)
        assert np.asarray(actions).shape == (160, 6)
        qn = np.linalg.norm(states[:, 3:7], axis=1)
        np.testing.assert_allclose(qn, 1.0, atol=1e-3)
        assert abs(states[-1, 2] - goal[2]) < 0.2, states[-1, 2]


class TestOnDeviceAdaptiveDMD:
    """On-device MBRL (VERDICT r2 item 5): the DMD identification runs
    INSIDE the scan — the scan carries (A, B) plus a fixed-capacity
    transition window, refitting every refit_every periods with the
    static-shape DMDc least-squares. The reference's train-every-N loop
    (main.py:105-106) with zero host round trips."""

    def _setup(self, plant_mass=3.0):
        from mppi_tf_tpu.costs import get_cost
        from mppi_tf_tpu.envs.mjx_env import JaxPointMassEnv
        from mppi_tf_tpu.models import get_model

        sigma = np.diag([0.4, 0.4])
        goal = [1.0, 0.0, -0.5, 0.0]
        cost = get_cost({"type": "static", "diag": True, "goal": goal,
                         "Q": [8.0, 1.5, 8.0, 1.5]},
                        lam=0.6, gamma=0.2, upsilon=1.0, sigma=sigma)
        # prior: the WRONG plant (mass 1.0); the true plant is heavier
        prior = get_model({"type": "point_mass", "mass": 1.0}, dt=0.1,
                          state_dim=4, action_dim=2)
        truth = get_model({"type": "point_mass", "mass": plant_mass},
                          dt=0.1, state_dim=4, action_dim=2)
        env = JaxPointMassEnv(n_dof=2, mass=plant_mass, dt=0.01)
        return sigma, goal, cost, prior, truth, env

    def test_identification_inside_the_scan_converges(self):
        import jax.numpy as jnp

        from mppi_tf_tpu.controller.dmd import DMDMPPI
        from mppi_tf_tpu.envs.mjx_env import on_device_closed_loop
        from mppi_tf_tpu.models.dmd import DMDModel

        sigma, goal, cost, prior, truth, env = self._setup()
        dmd = DMDModel(4, 2, reg=1e-11, dtype=jnp.float64,
                       init_A=prior._A, init_B=prior._B)
        ctrl = DMDMPPI(dmd, cost, k=256, tau=15, lam=0.6, upsilon=1.0,
                       sigma=sigma, seed=2, refit_every=5)
        states, actions, mp_f = on_device_closed_loop(
            ctrl, env.step_fn, np.zeros(4), steps=60, substeps=10)
        states = np.asarray(states)
        assert states.shape == (60, 4)
        # the in-scan refits identified the TRUE (mass-3) control-period
        # map despite the mass-1 prior
        np.testing.assert_allclose(np.asarray(mp_f["A"]),
                                   np.asarray(truth._A), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(mp_f["B"]),
            np.asarray(truth._B) / 3.0, atol=1e-5)
        err = np.linalg.norm(states[-1, 0::2] - np.array([1.0, -0.5]))
        assert err < 0.25, err

    def test_run_experiment_on_device_dmd_syncs_params(self):
        """Regression (code review r3): the config-driven on-device path
        crashed unpacking the adaptive controller's 3-tuple; it must return
        the identified params AND sync them back into the controller."""
        from mppi_tf_tpu.envs.runner import run_experiment

        env_cfg = {"env": "jax:point_mass", "state-dim": 4, "action-dim": 2,
                   "dt": 0.1, "noise": (0.4 * np.eye(2)).tolist(),
                   "lambda": 0.6, "gamma": 0.2, "upsilon": 1.0,
                   "samples": 128, "horizon": 10, "refit-every": 5}
        task_cfg = {"type": "static", "diag": True,
                    "goal": [1.0, 0.0, -0.5, 0.0], "Q": [8.0, 1.5, 8.0, 1.5]}
        model_cfg = {"type": "dmd", "reg": 1e-8}
        res = run_experiment(env_cfg, task_cfg, model_cfg, steps=40,
                             on_device=True)
        fitted = res["fitted_model_params"]
        assert fitted is not None
        assert np.all(np.isfinite(res["states"]))
        ctrl = res["controller"]
        np.testing.assert_array_equal(np.asarray(ctrl.model_params["A"]),
                                      np.asarray(fitted["A"]))
        # identified from the identity/zero prior: the fitted map must be
        # the plant's true control-period LTI map (mass 1, dt 0.1)
        from mppi_tf_tpu.models import get_model

        truth = get_model({"type": "point_mass", "mass": 1.0}, dt=0.1,
                          state_dim=4, action_dim=2)
        np.testing.assert_allclose(np.asarray(fitted["A"]),
                                   np.asarray(truth._A), atol=1e-3)

    def test_sharded_adaptive_dmd_on_device(self):
        """The adaptive scan composes with the mesh-sharded solve: one
        program carries identification AND the cross-device collectives."""
        import jax.numpy as jnp

        from mppi_tf_tpu.controller.dmd import ShardedDMDMPPI
        from mppi_tf_tpu.envs.mjx_env import on_device_closed_loop
        from mppi_tf_tpu.models.dmd import DMDModel
        from mppi_tf_tpu.parallel import make_mesh

        sigma, goal, cost, prior, truth, env = self._setup()
        dmd = DMDModel(4, 2, reg=1e-11, dtype=jnp.float64,
                       init_A=prior._A, init_B=prior._B)
        ctrl = ShardedDMDMPPI(dmd, cost, make_mesh(8, ("k",)), k=256,
                              tau=15, lam=0.6, upsilon=1.0, sigma=sigma,
                              seed=2, refit_every=5)
        states, _actions, mp_f = on_device_closed_loop(
            ctrl, env.step_fn, np.zeros(4), steps=50, substeps=10)
        states = np.asarray(states)
        np.testing.assert_allclose(np.asarray(mp_f["A"]),
                                   np.asarray(truth._A), atol=1e-5)
        err = np.linalg.norm(states[-1, 0::2] - np.array([1.0, -0.5]))
        assert err < 0.25, err


class TestSeedStreamUnified:
    def test_host_and_on_device_share_one_step_counter(self):
        """Review finding: seed-based (fused) controllers kept a separate
        on-device step counter starting at 0, so a host-driven run and an
        on-device run on the same controller replayed IDENTICAL kernel
        seeds. The on-device loop now consumes and advances the
        controller's own _steps counter — one seed stream."""
        from mppi_tf_tpu.controller.mppi import MPPI
        from mppi_tf_tpu.costs import get_cost
        from mppi_tf_tpu.envs.mjx_env import (JaxPointMassEnv,
                                              build_on_device_loop)
        from mppi_tf_tpu.models import get_model

        import jax

        sigma = np.diag([0.4, 0.4])
        model = get_model({"type": "point_mass", "mass": 1.0}, dt=0.1,
                          state_dim=4, action_dim=2)
        cost = get_cost({"type": "static", "diag": True,
                         "goal": [1.0, 0.0, -0.5, 0.0],
                         "Q": [8.0, 1.5, 8.0, 1.5]},
                        lam=0.6, gamma=0.2, upsilon=1.0, sigma=sigma)
        ctrl = MPPI(model, cost, k=64, tau=3, lam=0.6, upsilon=1.0,
                    sigma=sigma, seed=4, kernel="pallas", kernel_tile=16)
        assert ctrl._fused is not None
        env = JaxPointMassEnv(n_dof=2, dt=0.01)
        # 3 host periods consume steps 0..2
        x = np.zeros(4)
        for _ in range(3):
            ctrl.next(x)
        assert ctrl._steps == 3
        # the on-device run continues at step 3 and advances past it
        run = build_on_device_loop(ctrl, env.step_fn, steps=5, substeps=2)
        run(np.zeros(4), jax.random.PRNGKey(0))
        assert ctrl._steps == 8
        # a later host period continues the SAME stream (no replay of 0..7)
        ctrl.next(x)
        assert ctrl._steps == 9
        # an explicit step0 (what-if run) must not disturb the counter
        run(np.zeros(4), jax.random.PRNGKey(0), step0=100)
        assert ctrl._steps == 9

    def test_fleet_on_device_shares_the_fleet_counter(self):
        from mppi_tf_tpu.controller import FleetMPPI
        from mppi_tf_tpu.costs import get_cost
        from mppi_tf_tpu.envs.mjx_env import JaxPointMassEnv
        from mppi_tf_tpu.models import get_model

        sigma = np.diag([0.4, 0.4])
        model = get_model({"type": "point_mass", "mass": 1.0}, dt=0.1,
                          state_dim=4, action_dim=2)
        cost = get_cost({"type": "static", "diag": True,
                         "goal": [1.0, 0.0, -0.5, 0.0],
                         "Q": [8.0, 1.5, 8.0, 1.5]},
                        lam=0.6, gamma=0.2, upsilon=1.0, sigma=sigma)
        fleet = FleetMPPI(model, cost, n_vehicles=2, k=16, tau=3, lam=0.6,
                          upsilon=1.0, sigma=sigma, seed=2)
        env = JaxPointMassEnv(n_dof=2, dt=0.01)
        states = np.zeros((2, 4))
        fleet.next(states)
        assert fleet._steps == 1
        run = fleet.build_on_device_loop(env.step_fn, steps=4, substeps=2)
        run(states)
        assert fleet._steps == 5


def test_auv_env_rejects_learned_model_as_plant():
    """Review finding: a learned-model config silently became the
    simulator (circular MBRL experiment); the env factory now demands
    analytic 'auv' vehicle parameters for the plant."""
    from mppi_tf_tpu.envs import get_env

    with pytest.raises(ValueError, match="plant"):
        get_env({"state-dim": 13, "action-dim": 6},
                model_cfg={"type": "auv_nn"})
