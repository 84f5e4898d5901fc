"""Fail-loudly probes: malformed configs must raise with clear messages.

The reference guards these with assert_shape (utile.py:31-38; used in
cost_base.py:63-69, static_cost.py:32) and constructor asserts
(auv_model.py:131-159). Silent mis-shapes in a controller are how vehicles
hit walls — every probe here must raise, never coerce.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mppi_tf_tpu.controller.mppi import MPPI
from mppi_tf_tpu.costs import get_cost
from mppi_tf_tpu.costs.static import StaticCost, StaticQuatCost
from mppi_tf_tpu.models import get_model
from mppi_tf_tpu.models.auv import AUVModel


def _pm():
    return get_model({"type": "point_mass", "mass": 1.0}, dt=0.1,
                     state_dim=6, action_dim=3)


def _static_cost(sigma):
    return get_cost({"type": "static", "diag": True,
                     "goal": [1, 0, 0, 0, 0, 0], "Q": [5, 1, 5, 1, 5, 1]},
                    lam=0.8, gamma=0.2, upsilon=1.0, sigma=sigma)


def test_sigma_none_raises():
    model = _pm()
    cost = _static_cost(np.eye(3))
    with pytest.raises(ValueError, match="sigma"):
        MPPI(model, cost, k=8, tau=2, lam=0.8, upsilon=1.0, sigma=None)


def test_wrong_shape_sigma_raises():
    model = _pm()
    cost = _static_cost(np.eye(3))
    with pytest.raises(AssertionError, match="sigma"):
        MPPI(model, cost, k=8, tau=2, lam=0.8, upsilon=1.0,
             sigma=np.eye(2))


def test_goal_q_size_mismatch_raises():
    with pytest.raises(AssertionError, match="goal"):
        StaticCost(0.8, 0.2, 1.0, np.eye(3), goal=[1.0, 0.0],
                   Q=[5, 1, 5, 1, 5, 1], diag=True)


def test_static_quat_wrong_q_size_raises():
    with pytest.raises((AssertionError, ValueError)):
        goal = np.zeros(13)
        goal[6] = 1.0
        StaticQuatCost(0.8, 0.2, 1.0, np.eye(6), goal=goal,
                       Q=np.ones(9), diag=True)  # needs 10 entries


def test_static_quat_wrong_goal_size_raises():
    with pytest.raises((AssertionError, ValueError)):
        StaticQuatCost(0.8, 0.2, 1.0, np.eye(6), goal=np.zeros(12),
                       Q=np.ones(10), diag=True)


def test_bad_rk_raises():
    p = {"mass": 10.0, "volume": 0.01, "density": 1000.0,
         "cog": [0, 0, 0], "cob": [0, 0, 0],
         "Ma": np.eye(6).tolist(),
         "linear_damping": [-1.0] * 6, "quad_damping": [-1.0] * 6,
         "linear_damping_forward_speed": [0.0] * 6,
         "inertial": {"ixx": 1, "iyy": 1, "izz": 1,
                      "ixy": 0, "ixz": 0, "iyz": 0},
         "rk": 3}
    with pytest.raises(AssertionError, match="rk"):
        AUVModel(p, dt=0.1)


def test_unknown_factory_types_raise():
    with pytest.raises(ValueError, match="unknown model type"):
        get_model({"type": "quadrotor"})
    with pytest.raises((ValueError, KeyError)):
        get_cost({"type": "spline"}, lam=1.0, gamma=1.0, upsilon=1.0,
                 sigma=np.eye(2))


def test_point_mass_dim_mismatch_raises():
    with pytest.raises(ValueError, match="state_dim"):
        get_model({"type": "point_mass"}, dt=0.1, state_dim=7, action_dim=3)
