"""Waypoint-mission surface (controller/missions.py): set_waypoints /
advance_waypoints / waypoints_remaining uniformly on MPPI, the sharded
controllers, and (per-vehicle) FleetMPPI — the wiring the reference's
WayPointsCost draft never got (scripts/src/costs/cost_base.py:210-284,
scripts/src/cost.py:45-48).
"""

import numpy as np
import pytest

from mppi_tf_tpu.controller import MPPI
from mppi_tf_tpu.costs import get_cost
from mppi_tf_tpu.costs.waypoints import WayPointsCost
from mppi_tf_tpu.models import get_model

WP1 = [0.8, 0.0, 0.0, 0.0]    # interleaved [x, vx, y, vy]
WP2 = [0.8, 0.0, -0.7, 0.0]
WP3 = [0.0, 0.0, -0.7, 0.0]


def _mission_controller(max_waypoints=8, k=300, tau=12):
    sigma = np.diag([0.4, 0.4])
    model = get_model({"type": "point_mass", "mass": 1.0}, dt=0.1,
                      state_dim=4, action_dim=2)
    cost = WayPointsCost(0.4, 0.1, 1.0, sigma, Q=np.array(
        [6.0, 0.6, 6.0, 0.6]), diag=True, waypoints=[WP1],
        max_waypoints=max_waypoints)
    ctrl = MPPI(model, cost, k=k, tau=tau, lam=0.4, upsilon=1.0,
                sigma=sigma, seed=5)
    return model, ctrl


class TestMissionSurface:
    def test_set_waypoints_replaces_the_queue(self):
        _, ctrl = _mission_controller()
        ctrl.set_waypoints([WP1, WP2, WP3])
        assert ctrl.waypoints_remaining() == 3
        np.testing.assert_allclose(
            np.asarray(ctrl._cparams["waypoints"][:3]),
            np.asarray([WP1, WP2, WP3]), atol=1e-6)
        # uploads REPLACE (not append): a second mission starts fresh
        ctrl.set_waypoints([WP3])
        assert ctrl.waypoints_remaining() == 1
        np.testing.assert_allclose(
            np.asarray(ctrl._cparams["waypoints"][0]), WP3, atol=1e-6)

    def test_advance_pops_only_inside_radius(self):
        _, ctrl = _mission_controller()
        ctrl.set_waypoints([WP1, WP2])
        far = np.zeros(4)
        assert ctrl.advance_waypoints(far, radius=0.25) is False
        assert ctrl.waypoints_remaining() == 2
        near = np.asarray(WP1) + 0.05
        assert ctrl.advance_waypoints(near, radius=0.25) is True
        assert ctrl.waypoints_remaining() == 1
        # the last leg behaves as the single goal: never pops below 1
        assert ctrl.advance_waypoints(np.asarray(WP2), radius=9.0) is False
        assert ctrl.waypoints_remaining() == 1

    def test_validation(self):
        _, ctrl = _mission_controller(max_waypoints=2)
        with pytest.raises(ValueError, match="non-empty"):
            ctrl.set_waypoints([])
        with pytest.raises(ValueError, match="capacity"):
            ctrl.set_waypoints([WP1, WP2, WP3])
        with pytest.raises(ValueError, match="dim"):
            ctrl.set_waypoints([[1.0, 2.0]])

    def test_non_waypoint_cost_rejected(self):
        sigma = np.diag([0.4, 0.4])
        model = get_model({"type": "point_mass", "mass": 1.0}, dt=0.1,
                          state_dim=4, action_dim=2)
        cost = get_cost({"type": "static", "diag": True,
                         "goal": [1.0, 0.0, 0.0, 0.0],
                         "Q": [6.0, 0.6, 6.0, 0.6]},
                        lam=0.4, gamma=0.1, upsilon=1.0, sigma=sigma)
        ctrl = MPPI(model, cost, k=64, tau=5, lam=0.4, upsilon=1.0,
                    sigma=sigma, seed=0)
        with pytest.raises(TypeError, match="WayPointsCost"):
            ctrl.set_waypoints([WP1])
        with pytest.raises(TypeError, match="WayPointsCost"):
            ctrl.advance_waypoints(np.zeros(4), 0.1)
        with pytest.raises(TypeError, match="WayPointsCost"):
            ctrl.waypoints_remaining()

    def test_mission_closed_loop_flies_all_legs(self):
        """Upload a 3-leg mission, fly it with next() + advance_waypoints
        — every leg is visited within the pop radius and the plant ends
        on the final leg."""
        model, ctrl = _mission_controller()
        ctrl.set_waypoints([WP1, WP2, WP3])
        mp = model.init_params()
        x = np.zeros(4)
        visited = []
        for _ in range(240):
            u = ctrl.next(x)
            x = np.asarray(model.predict(mp, x, u)).reshape(-1)
            if ctrl.advance_waypoints(x, radius=0.25):
                visited.append(x.copy())
            if ctrl.waypoints_remaining() == 1 and \
                    np.linalg.norm(x - np.asarray(WP3)) < 0.2:
                break
        assert len(visited) == 2  # popped WP1 then WP2
        np.testing.assert_allclose(visited[0], WP1, atol=0.3)
        np.testing.assert_allclose(visited[1], WP2, atol=0.3)
        assert np.linalg.norm(x - np.asarray(WP3)) < 0.2


class TestShardedMissionSurface:
    def test_sharded_controller_flies_a_mission(self):
        from mppi_tf_tpu.parallel import ShardedMPPI, make_mesh

        sigma = np.diag([0.4, 0.4])
        model = get_model({"type": "point_mass", "mass": 1.0}, dt=0.1,
                          state_dim=4, action_dim=2)
        cost = WayPointsCost(0.4, 0.1, 1.0, sigma, Q=np.array(
            [6.0, 0.6, 6.0, 0.6]), diag=True, waypoints=[WP1])
        ctrl = ShardedMPPI(model, cost, make_mesh(), k=512, tau=12,
                           lam=0.4, upsilon=1.0, sigma=sigma, seed=5)
        ctrl.set_waypoints([WP1, WP2])
        assert ctrl.waypoints_remaining() == 2
        mp = model.init_params()
        x = np.zeros(4)
        for _ in range(120):
            x = np.asarray(model.predict(mp, x, ctrl.next(x))).reshape(-1)
            ctrl.advance_waypoints(x, radius=0.25)
            if ctrl.waypoints_remaining() == 1 and \
                    np.linalg.norm(x - np.asarray(WP2)) < 0.2:
                break
        assert ctrl.waypoints_remaining() == 1
        assert np.linalg.norm(x - np.asarray(WP2)) < 0.2
