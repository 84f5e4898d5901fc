"""Ellipse and waypoint cost tests with hand-computed expectations.

Mirrors the reference TestElipseCost / TestElipse3DCost strategy
(scripts/test.py:841-1361): per-term errors (position/orientation/velocity).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from mppi_tf_tpu.costs.elipse import ElipseCost, ElipseCost3D
from mppi_tf_tpu.costs.waypoints import WayPointsCost


def _mk2d(a=4.0, b=2.0, cx=0.0, cy=0.0, gv=5.0, mx=1.0, mv=0.1):
    return ElipseCost(1.0, 1.0, 1.0, np.eye(2), a, b, cx, cy, gv, mx, mv,
                      dtype=jnp.float64)


class TestElipseCost:
    def test_on_ellipse_at_speed_is_zero(self):
        cost = _mk2d()
        cp = cost.init_params()
        # point on the ellipse moving at target speed
        state = np.array([[4.0, 5.0, 0.0, 0.0]])  # x=a, v=(5,0)
        got = np.asarray(cost.state_cost(cp, jnp.asarray(state)))
        np.testing.assert_allclose(got, [0.0], atol=1e-12)

    def test_hand_computed_values(self):
        cost = _mk2d(a=2.0, b=1.0, cx=1.0, cy=-1.0, gv=2.0, mx=3.0, mv=0.5)
        state = np.array([[2.0, 1.0, 0.5, 2.0]])  # x=2, vx=1, y=0.5, vy=2
        d = abs(((2.0 - 1.0) / 2.0) ** 2 + ((0.5 + 1.0) / 1.0) ** 2 - 1.0)
        v = np.sqrt(1.0 + 4.0)
        expect = 3.0 * d + 0.5 * (v - 2.0) ** 2
        got = np.asarray(cost.state_cost(cost.init_params(),
                                         jnp.asarray(state)))
        np.testing.assert_allclose(got, [expect], rtol=1e-12)

    def test_dist_diagnostics(self):
        cost = _mk2d()
        out = cost.dist(cost.init_params(), jnp.asarray([4.0, 5.0, 0.0, 0.0]))
        np.testing.assert_allclose(float(out["x_dist"]), 0.0, atol=1e-12)
        np.testing.assert_allclose(float(out["v_dist"]), 0.0, atol=1e-12)

    def test_draw_goal_on_ellipse(self):
        cost = _mk2d(a=3.0, b=1.5, cx=2.0, cy=-1.0)
        x, y = cost.draw_goal()
        r = ((x - 2.0) / 3.0) ** 2 + ((y + 1.0) / 1.5) ** 2
        np.testing.assert_allclose(r, 1.0, rtol=1e-12)


def _mk3d(normal=(0, 0, 1), a_vec=(1, 0, 0), axis=(4.0, 2.0),
          center=(0, 0, 0), gv=5.0, ms=1.0, mv=0.1):
    return ElipseCost3D(
        1.0, 1.0, 1.0, np.eye(6),
        normal=np.asarray(normal, float).reshape(3, 1),
        aVec=np.asarray(a_vec, float).reshape(3, 1),
        axis=np.asarray(axis, float).reshape(2, 1),
        center=np.asarray(center, float).reshape(3, 1),
        speed=gv, m_state=ms, m_vel=mv, dtype=jnp.float64)


def _auv_state(pos, q_xyzw, vel):
    s = np.zeros(13)
    s[0:3] = pos
    s[3:7] = q_xyzw
    s[7:13] = vel
    return s[None, :]


class TestElipseCost3D:
    def test_zero_cost_on_ellipse_tangent_at_speed(self):
        """Point at (a, 0, 0) on an xy-plane ellipse, heading along +y
        (the tangent), moving at target speed -> all three terms vanish."""
        cost = _mk3d()
        cp = cost.init_params()
        q = Rotation.from_euler("z", 90, degrees=True).as_quat()  # x -> +y
        state = _auv_state([4.0, 0.0, 0.0], q, [5.0, 0.0, 0.0, 0, 0, 0])
        got = float(cost.state_cost(cp, jnp.asarray(state))[0])
        assert got < 1e-8, f"expected ~0 cost, got {got}"

    def test_position_error_off_plane(self):
        cost = _mk3d()
        # 1m above the ellipse point -> (z/1)^2 = 1 extra
        pos_pf = jnp.asarray([[4.0, 0.0, 1.0]])
        err = float(cost.position_error(pos_pf)[0])
        np.testing.assert_allclose(err, 1.0, rtol=1e-12)

    def test_velocity_error(self):
        cost = _mk3d(gv=2.0)
        vel = jnp.asarray([[3.0, 0.0, 0.0, 0.0, 0.0, 0.0]])
        np.testing.assert_allclose(float(cost.velocity_error(vel)[0]), 5.0,
                                   rtol=1e-12)

    def test_center_translation(self):
        """Intent fix vs reference: positions are taken relative to the
        ellipse center."""
        center = [10.0, -5.0, 2.0]
        cost = _mk3d(center=center)
        cp = cost.init_params()
        q = Rotation.from_euler("z", 90, degrees=True).as_quat()
        state = _auv_state([14.0, -5.0, 2.0], q, [5.0, 0, 0, 0, 0, 0])
        got = float(cost.state_cost(cp, jnp.asarray(state))[0])
        assert got < 1e-8

    def test_tilted_plane(self):
        """Ellipse in the xz plane (normal = y): a point on the major axis
        with zero velocity has only orientation+velocity cost; position
        error is zero."""
        cost = _mk3d(normal=(0, 1, 0), a_vec=(1, 0, 0))
        pos_pf = quatpos = None
        cp = cost.init_params()
        state = _auv_state([4.0, 0.0, 0.0], [0, 0, 0, 1], np.zeros(6))
        pos = jnp.asarray(state[:, :3])
        from mppi_tf_tpu.ops import quaternion as quat
        q_plane = jnp.broadcast_to(cost.q_plane, (1, 4))
        pos_pf = quat.rotate(pos, q_plane)
        np.testing.assert_allclose(float(cost.position_error(pos_pf)[0]),
                                   0.0, atol=1e-9)


class TestWayPointsCost:
    def _mk(self, wps):
        return WayPointsCost(1.0, 1.0, 1.0, np.eye(2), Q=np.eye(4),
                             waypoints=wps, alpha=0.2, dtype=jnp.float64)

    def test_single_waypoint_quadratic(self):
        w = np.array([1.0, 0.0, 2.0, 0.0])
        cost = self._mk([w])
        cp = cost.init_params()
        state = np.zeros((1, 4))
        got = float(cost.state_cost(cp, jnp.asarray(state))[0])
        np.testing.assert_allclose(got, w @ w, rtol=1e-12)

    def test_two_waypoint_blend(self):
        w1 = np.array([1.0, 0.0, 0.0, 0.0])
        w2 = np.array([2.0, 0.0, 0.0, 0.0])
        cost = self._mk([w1, w2])
        cp = cost.init_params()
        state = np.zeros((1, 4))
        d1, d2 = 1.0, 4.0
        expect = 0.8 * d1 + 0.2 * d2
        got = float(cost.state_cost(cp, jnp.asarray(state))[0])
        np.testing.assert_allclose(got, expect, rtol=1e-12)

    def test_pop_advances_queue(self):
        w1 = np.array([1.0, 0.0, 0.0, 0.0])
        w2 = np.array([2.0, 0.0, 0.0, 0.0])
        cost = self._mk([w1, w2])
        cp = cost.pop(cost.init_params())
        state = np.zeros((1, 4))
        got = float(cost.state_cost(cp, jnp.asarray(state))[0])
        np.testing.assert_allclose(got, 4.0, rtol=1e-12)  # single wp w2

    def test_add_waypoint_no_retrace(self):
        import jax

        cost = self._mk([np.array([1.0, 0.0, 0.0, 0.0])])
        cp = cost.init_params()
        traces = 0

        @jax.jit
        def f(cp, x):
            nonlocal traces
            traces += 1
            return cost.state_cost(cp, x)

        x = jnp.zeros((1, 4))
        f(cp, x)
        cp = cost.add_waypoint(cp, np.array([2.0, 0.0, 0.0, 0.0]))
        f(cp, x)
        assert traces == 1, "adding a waypoint retraced the cost"
