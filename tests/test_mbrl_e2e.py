"""End-to-end model-based RL loop: collect -> train -> control.

The reference's core use case (SURVEY.md §3.3/§3.4: closed-loop MPPI with a
learned dynamics model, trained from collected transitions): random-policy
data collection on the analytic point-mass env, NNModel training via the
Learner, then MPPI over the LEARNED model must still drive the plant to the
goal. Small sizes — this is a correctness/integration test, not a benchmark.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mppi_tf_tpu.collect import collect_transitions
from mppi_tf_tpu.controller.mppi import MPPI
from mppi_tf_tpu.costs import get_cost
from mppi_tf_tpu.envs import get_env
from mppi_tf_tpu.learning import Learner
from mppi_tf_tpu.learning.replay import ReplayBuffer
from mppi_tf_tpu.models import get_model
from mppi_tf_tpu.models.nn import NNModel

# oracle/cluster/serve tail: excluded from the fast developer loop
# (pytest -m 'not slow'); the driver default runs everything
pytestmark = pytest.mark.slow


def test_mbrl_loop_reaches_goal():
    env_cfg = {"env": "analytic:point_mass", "state-dim": 2, "action-dim": 1,
               "dt": 0.1, "max-a": [1.0]}
    env = get_env(env_cfg, render=False)

    # 1. collect random transitions
    buf = ReplayBuffer(512, 2, 1)
    collect_transitions(env, buf, 400, 1, -1.0, 1.0, seed=0, control_dt=0.1)

    # 2. train a learned dynamics model
    model = NNModel(state_dim=2, action_dim=1, dt=0.1, hidden=(16, 16),
                    dtype=jnp.float64, seed=1)
    learner = Learner(model)
    data = buf.get_all_transitions()
    for x, u, xn in zip(data["obs"], data["act"], data["next_obs"]):
        learner.add_rb(x.reshape(-1, 1), u.reshape(-1, 1), xn.reshape(-1, 1))
    learner.stats()
    learner.train_all(epoch=300, learning_rate=1e-2)

    # learned one-step prediction must beat a "state stays put" baseline
    params = learner.params
    pred = model.step(params, jnp.asarray(data["obs"]),
                      jnp.asarray(data["act"]))
    mse = float(jnp.mean((pred - jnp.asarray(data["next_obs"])) ** 2))
    base = float(jnp.mean((jnp.asarray(data["obs"])
                           - jnp.asarray(data["next_obs"])) ** 2))
    assert mse < 0.1 * base, (mse, base)

    # 3. control THROUGH the learned model against the true plant
    sigma = np.asarray([[0.4]])
    cost = get_cost({"type": "static", "diag": True, "goal": [1.0, 0.0],
                     "Q": [8.0, 1.5]},
                    lam=0.6, gamma=0.2, upsilon=1.0, sigma=sigma,
                    dtype=jnp.float64)
    ctrl = MPPI(model, cost, k=256, tau=20, lam=0.6, upsilon=1.0,
                sigma=sigma, seed=4)
    ctrl.model_params = params

    env.reset(np.zeros(2))
    x = env.getState()
    for _ in range(60):
        u = ctrl.next(x)
        prev = env.getTime()
        while env.getTime() - prev < 0.1 - 1e-12:
            x = env.step(np.reshape(u, (1, -1)))
    err = abs(float(np.reshape(x, (-1,))[0]) - 1.0)
    assert err < 0.3, f"learned-model control missed the goal: pos err {err}"


def test_run_experiment_train_every_analytic_model():
    """Regression (VERDICT r1 weak #1): the closed loop with train_every > 0
    and an ANALYTIC model crashed in Learner._loss (NN-only path). Now the
    Learner fits the model's physical params (mass) online and the
    controller consumes the updated params."""
    from mppi_tf_tpu.envs.runner import run_experiment

    env_cfg = {"env": "analytic:point_mass", "state-dim": 2, "action-dim": 1,
               "dt": 0.1, "max-a": [1.0], "samples": 64, "horizon": 10,
               "lambda": 0.6, "upsilon": 1.0, "noise": [[0.4]]}
    task_cfg = {"type": "static", "diag": True, "goal": [1.0, 0.0],
                "Q": [8.0, 1.5], "lambda": 0.6, "gamma": 0.2,
                "upsilon": 1.0}
    model_cfg = {"type": "point_mass", "mass": 1.0}
    out = run_experiment(env_cfg, task_cfg, model_cfg, steps=12,
                         train_every=5)
    assert out["learner"] is not None
    assert len(out["learner"].rb) >= 12
    assert np.all(np.isfinite(out["states"]))
    # controller now rolls out with the learner's (trained) params
    np.testing.assert_allclose(
        float(out["controller"].model_params["mass"]),
        float(out["learner"].params["mass"]))


def test_mbrl_loop_on_mujoco_env():
    """Same MBRL loop against the MuJoCo plant (1-DoF slide-joint
    point-mass, generated MJCF): the learned model trained on MuJoCo
    transitions must control the MuJoCo env to the target site."""
    import pytest

    pytest.importorskip("mujoco")
    from mppi_tf_tpu.envs.mujoco_env import make_point_mass_env

    env = make_point_mass_env(n_dof=1, goal=(1.0,))

    buf = ReplayBuffer(512, 2, 1)
    collect_transitions(env, buf, 400, 1, -1.0, 1.0, seed=2, control_dt=0.1)

    model = NNModel(state_dim=2, action_dim=1, dt=0.1, hidden=(16, 16),
                    dtype=jnp.float64, seed=3)
    learner = Learner(model)
    data = buf.get_all_transitions()
    for x, u, xn in zip(data["obs"], data["act"], data["next_obs"]):
        learner.add_rb(x.reshape(-1, 1), u.reshape(-1, 1), xn.reshape(-1, 1))
    learner.stats()
    learner.train_all(epoch=300, learning_rate=1e-2)

    sigma = np.asarray([[0.4]])
    cost = get_cost({"type": "static", "diag": True, "goal": [1.0, 0.0],
                     "Q": [8.0, 1.5]},
                    lam=0.6, gamma=0.2, upsilon=1.0, sigma=sigma,
                    dtype=jnp.float64)
    ctrl = MPPI(model, cost, k=256, tau=20, lam=0.6, upsilon=1.0,
                sigma=sigma, seed=5)
    ctrl.model_params = learner.params

    env.reset(np.zeros(2))
    x = env.getState()
    for _ in range(60):
        u = ctrl.next(x)
        prev = env.getTime()
        while env.getTime() - prev < 0.1 - 1e-12:
            x = env.step(np.reshape(u, (1, -1)))
    err = abs(float(np.reshape(x, (-1,))[0]) - 1.0)
    assert err < 0.3, f"mujoco MBRL control missed the goal: pos err {err}"
