"""Elliptic trajectory-tracking costs (2D and 3D).

Reference: scripts/src/costs/elipse_cost.py — ``ElipseCost`` (2D ellipse in
the interleaved point-mass state, :9-98) and ``ElipseCost3D`` (ellipse in an
arbitrary plane for the 13-dim AUV state, :101-246). The spelling "elipse"
is kept for parity with the reference's config ``type`` strings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import quaternion as quat
from .base import CostBase


class ElipseCost(CostBase):
    """2D ellipse tracking for the 4-dim interleaved state [x, vx, y, vy].

    state_cost = m_state * | ((x-cx)/a)^2 + ((y-cy)/b)^2 - 1 |
               + m_vel * (|v| - gv)^2

    Reference: elipse_cost.py:9-98.
    """

    def __init__(self, lam, gamma, upsilon, sigma, a, b, center_x, center_y,
                 speed, m_state, m_vel, dtype=jnp.float32):
        super().__init__(lam, gamma, upsilon, sigma, dtype=dtype)
        self.a = float(a)
        self.b = float(b)
        self.cx = float(center_x)
        self.cy = float(center_y)
        self.gv = float(speed)
        self.mx = float(m_state)
        self.mv = float(m_vel)

    def init_params(self):
        return {}

    def set_goal(self, cp, goal):  # the ellipse itself is the goal
        return cp

    def state_cost(self, cp, state: jax.Array) -> jax.Array:
        """Reference: elipse_cost.py:46-79. state: [k, 4] -> [k]."""
        x = state[:, 0]
        vx = state[:, 1]
        y = state[:, 2]
        vy = state[:, 3]
        v = jnp.sqrt(vx * vx + vy * vy)
        dx = (x - self.cx) / self.a
        dy = (y - self.cy) / self.b
        d = jnp.abs(dx * dx + dy * dy - 1.0)
        dv = (v - self.gv) ** 2
        return self.mx * d + self.mv * dv

    def dist(self, cp, state: jax.Array):
        """Diagnostics: radial and velocity distance. Reference: elipse_cost.py:87-98."""
        state = jnp.reshape(state, (-1,))
        x, vx, y, vy = state[0], state[1], state[2], state[3]
        v = jnp.sqrt(vx * vx + vy * vy)
        x_dist = ((x - self.cx) / self.a) ** 2 + ((y - self.cy) / self.b) ** 2 - 1.0
        v_dist = jnp.abs(v - self.gv)
        return {"x_dist": x_dist, "v_dist": v_dist}

    def draw_goal(self, cp=None, n: int = 1000):
        """Reference: elipse_cost.py:81-85."""
        alpha = np.linspace(0, 2 * np.pi, n)
        return self.a * np.cos(alpha) + self.cx, self.b * np.sin(alpha) + self.cy


class ElipseCost3D(CostBase):
    """3D ellipse tracking in an arbitrary plane for the 13-dim AUV state.

    The plane frame is built from the ellipse normal and major-axis vector;
    poses are rotated into it, then scored by position (algebraic ellipse
    distance), orientation (alignment with the ellipse tangent), and velocity
    magnitude error. Reference: elipse_cost.py:101-246. The reference's
    factory for this cost is broken at HEAD (cost.py:33-42 passes the old
    signature); this is the completed version.

    Intent fix: the reference stores the ellipse center (``self.t``,
    elipse_cost.py:165) but never applies it in ``state_cost`` — the plane
    transform rotates raw positions (elipse_cost.py:170). Here positions are
    translated by the center before rotating, the evident intent.
    """

    def __init__(self, lam, gamma, upsilon, sigma, normal, aVec, axis,
                 center, speed, m_state, m_vel, dtype=jnp.float32):
        """
        Args:
            normal: [3] ellipse plane normal.
            aVec: [3] unit vector along the major axis (in the plane).
            axis: [2] (a, b) ellipse semi-axes.
            center: [3] ellipse center in the inertial frame.
            speed: target linear speed magnitude.
            m_state / m_vel: state / velocity cost multipliers.
        """
        super().__init__(lam, gamma, upsilon, sigma, dtype=dtype)
        normal = np.asarray(normal, np.float64).reshape(3)
        a_vec = np.asarray(aVec, np.float64).reshape(3)
        axis = np.asarray(axis, np.float64).reshape(-1)
        # axis padded with 1 for the z term (elipse_cost.py:132-133)
        axis3 = np.concatenate([axis, [1.0]])
        b_vec = np.cross(normal, a_vec)

        # plane frame: R rotates inertial -> plane (elipse_cost.py:160-164)
        N = np.stack([a_vec, b_vec, normal], axis=-1)
        R = np.linalg.inv(N).T
        self.axis = jnp.asarray(axis3, dtype=dtype)
        self.center = jnp.asarray(np.asarray(center, np.float64).reshape(3),
                                  dtype=dtype)
        self.q_plane = jnp.asarray(
            np.asarray(quat.from_rotation_matrix(jnp.asarray(R))),
            dtype=dtype)
        # tangent mapping: swap x/y scaled by the axis ratio
        # (elipse_cost.py:144-151)
        self.mapping = jnp.asarray(
            [-axis3[0] / axis3[1], axis3[1] / axis3[0], 0.0], dtype=dtype)
        self.gv = float(speed)
        self.mS = float(m_state)
        self.mV = float(m_vel)

    def init_params(self):
        return {}

    def set_goal(self, cp, goal):  # the ellipse itself is the goal
        return cp

    def position_error(self, pos_pf: jax.Array) -> jax.Array:
        """| sum((p/axis)^2) - 1 | in the plane frame. [k, 3] -> [k].

        Reference: elipse_cost.py:181-200.
        """
        d = (pos_pf / self.axis) ** 2
        return jnp.abs(jnp.sum(d, axis=-1) - 1.0)

    def orientation_error(self, pos_pf: jax.Array, quat_pf: jax.Array) -> jax.Array:
        """Angle between the body x-axis and the ellipse tangent. -> [k].

        Reference: elipse_cost.py:202-226.
        """
        tg = pos_pf[:, [1, 0, 2]] * self.mapping
        tg = tg / jnp.maximum(
            jnp.linalg.norm(tg, axis=-1, keepdims=True), 1e-12)
        x_axis = jnp.broadcast_to(
            jnp.asarray([1.0, 0.0, 0.0], dtype=tg.dtype), tg.shape)
        q_tangent = quat.between_two_vectors(x_axis, tg)
        return quat.relative_angle(q_tangent, quat_pf)

    def velocity_error(self, vel: jax.Array) -> jax.Array:
        """| |v_lin|^2 - gv^2 |. [k, 6] -> [k]. Reference: elipse_cost.py:228-246."""
        v = jnp.linalg.norm(vel[:, 0:3], axis=-1)
        return jnp.abs(v * v - self.gv * self.gv)

    def state_cost(self, cp, state: jax.Array) -> jax.Array:
        """mS*(position + orientation) + mV*velocity. Reference: elipse_cost.py:166-179."""
        pos = state[:, 0:3]
        q = state[:, 3:7]
        q_plane = jnp.broadcast_to(self.q_plane, q.shape)
        pos_pf = quat.rotate(pos - self.center, q_plane)
        quat_pf = quat.multiply(q_plane, q)
        p_cost = self.position_error(pos_pf)
        o_cost = self.orientation_error(pos_pf, quat_pf)
        v_cost = self.velocity_error(state[:, 7:13])
        return self.mS * p_cost + self.mS * o_cost + self.mV * v_cost

    def dist(self, cp, state: jax.Array):
        state = jnp.reshape(state, (1, -1))
        pos_pf = quat.rotate(state[:, 0:3] - self.center,
                             jnp.broadcast_to(self.q_plane, (1, 4)))
        return {
            "x_dist": self.position_error(pos_pf)[0],
            "v_dist": self.velocity_error(state[:, 7:13])[0],
        }
