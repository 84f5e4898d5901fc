"""Waypoint-tracking cost (completed — the reference left it unwired).

Reference: scripts/src/costs/cost_base.py:210-284 (``WayPointsCost`` draft:
weighted quadratic distance to the first two waypoints, reverting to a
single-goal cost when one waypoint remains; the factory referenced an
undefined ``WaypointCost`` symbol, cost.py:45-48).

TPU-first completion: the waypoint list lives in the cost params pytree as a
fixed-capacity [max_waypoints, dim] array plus an active count, so advancing
or appending waypoints never retraces the compiled solve (dynamic Python
lists would). Weighting follows the reference's blend
``(alpha-1)*d_first + alpha*d_second`` — with the evident sign fix to
``(1-alpha)*d_first + alpha*d_second`` (the reference's expression makes the
first-waypoint term negative for alpha<1, rewarding distance; the docstring
says "weighted average between the two").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import CostBase


class WayPointsCost(CostBase):
    """Quadratic tracking of a waypoint queue."""

    def __init__(self, lam, gamma, upsilon, sigma, Q, waypoints=None,
                 alpha: float = 0.2, max_waypoints: int = 32, diag=False,
                 dtype=jnp.float32):
        super().__init__(lam, gamma, upsilon, sigma, dtype=dtype)
        Qm = np.asarray(Q, dtype=np.float64)
        if diag:
            Qm = np.diag(Qm)
        self.Q = jnp.asarray(Qm, dtype=dtype)
        self.dim = self._waypoint_dim(Qm)
        self.alpha = float(alpha)
        self.max_waypoints = int(max_waypoints)
        self._init_wps = []
        if waypoints is not None:
            wps = [np.asarray(w, np.float64).reshape(-1) for w in waypoints]
            for w in wps:
                if w.shape[0] != self.dim:
                    raise AssertionError(
                        f"waypoint dim {w.shape[0]} != expected {self.dim}")
            self._init_wps = [self.validate_waypoint(w) for w in wps]

    def _waypoint_dim(self, Qm: np.ndarray) -> int:
        """Waypoint row length implied by Q; subclass hook."""
        if Qm.shape[0] == 13:
            # A 13-dim flat quadratic treats the raw quaternion components
            # as Euclidean coordinates — wrong metric, and double-cover
            # ambiguous (q and -q are the same attitude but maximally
            # distant). The AUV state family must use the quaternion-aware
            # metric (reference: static_cost.py:145-159).
            raise TypeError(
                "a 13-dim state needs WayPointsQuatCost (task type "
                "'waypoints_quat', 10x10 Q over [pos err, 2*acos|q.g_q|, "
                "vel err]); the flat 13-dim quadratic is not a valid "
                "attitude metric")
        return int(Qm.shape[0])

    def validate_waypoint(self, w: np.ndarray) -> np.ndarray:
        """Per-waypoint validation hook (host-side); base: no constraint.
        Runs on EVERY queue-mutation surface — __init__, set_goal,
        add_waypoint, and controller/missions.validate_mission."""
        return np.asarray(w, np.float64)

    def init_params(self):
        wps = np.zeros((self.max_waypoints, self.dim))
        for i, w in enumerate(self._init_wps):
            wps[i] = w
        return {
            "waypoints": jnp.asarray(wps, dtype=self._dtype),
            "count": jnp.asarray(len(self._init_wps), dtype=jnp.int32),
        }

    def _checked(self, waypoint):
        """Validate host-provided waypoints; pass tracers through (inside
        a jit — e.g. the on-device scan's pop — host validation cannot
        inspect values and queue rotations are norm-preserving anyway)."""
        if isinstance(waypoint, jax.core.Tracer):
            return waypoint
        return self.validate_waypoint(
            np.asarray(waypoint, np.float64).reshape(-1))

    # --- queue management (functional; reference: cost_base.py:230-238) ---
    def _set_queue(self, cp, rows):
        """Replace the whole queue from PRE-VALIDATED float64 rows (the
        missions layer validates once; re-validating per waypoint through
        set_goal + N add_waypoint calls doubled the host work — review
        finding). One upload instead of N functional updates."""
        rows = np.asarray(rows, np.float64).reshape(-1, self.dim)
        n = min(rows.shape[0], self.max_waypoints)
        wps = np.zeros((self.max_waypoints, self.dim))
        wps[:n] = rows[:n]
        return {"waypoints": jnp.asarray(wps, self._dtype),
                "count": jnp.asarray(max(n, 1), jnp.int32)}

    def add_waypoint(self, cp, waypoint):
        w = jnp.asarray(self._checked(waypoint),
                        dtype=self._dtype).reshape(-1)
        idx = jnp.minimum(cp["count"], self.max_waypoints - 1)
        return {
            "waypoints": cp["waypoints"].at[idx].set(w),
            "count": jnp.minimum(cp["count"] + 1, self.max_waypoints),
        }

    def add_waypoints(self, cp, waypoints):
        for w in waypoints:
            cp = self.add_waypoint(cp, w)
        return cp

    def pop(self, cp):
        """Drop the first waypoint (reached), shifting the queue."""
        wps = jnp.roll(cp["waypoints"], -1, axis=0)
        return {
            "waypoints": wps,
            "count": jnp.maximum(cp["count"] - 1, 1),
        }

    def set_goal(self, cp, goal):
        """Single-goal override: reset the queue to one waypoint."""
        w = jnp.asarray(self._checked(goal), dtype=self._dtype).reshape(-1)
        wps = jnp.zeros_like(cp["waypoints"]).at[0].set(w)
        return {"waypoints": wps, "count": jnp.asarray(1, jnp.int32)}

    # --- cost -------------------------------------------------------------
    def _dist_waypoint(self, state: jax.Array, wp: jax.Array) -> jax.Array:
        """(x - w)^T Q (x - w). Reference: cost_base.py:273-281."""
        diff = state - wp[None, :]
        return jnp.sum((diff @ self.Q.T) * diff, axis=-1)

    def state_cost(self, cp, state: jax.Array) -> jax.Array:
        """Blend of distances to the first two waypoints; single-goal when
        only one remains. Reference: cost_base.py:240-271.
        """
        d_first = self._dist_waypoint(state, cp["waypoints"][0])
        d_second = self._dist_waypoint(state, cp["waypoints"][1])
        blended = (1.0 - self.alpha) * d_first + self.alpha * d_second
        return jnp.where(cp["count"] < 2, d_first, blended)

    def dist(self, cp, state: jax.Array) -> jax.Array:
        return jnp.reshape(state, (-1,)) - cp["waypoints"][0]


class WayPointsQuatCost(WayPointsCost):
    """Waypoint queue over the 13-dim quaternion AUV state.

    Each waypoint is scored with a quaternion-aware 10-dim error vector
    [pos err (3), theta (1), vel err (6)] against a 10x10 Q — NOT a flat
    13-dim quadratic, which treats raw quaternion components as Euclidean
    coordinates. The attitude term is ``theta = 2*acos(|<q, w_q>|)``: the
    GEODESIC angle on SO(3), identical for q and -q. This deliberately
    deviates from StaticQuatCost's reference-mirrored ``2*acos(<q, w_q>)``
    (static_cost.py:145-159), which is double-cover ambiguous — a waypoint
    authored in the opposite hemisphere (or a plant whose quaternion
    drifts sign mid-mission) would score theta = 2*pi AT the goal
    attitude, permanently stalling the mission pop. Queue semantics
    (fixed-capacity functional queue, blend of the two leading waypoints,
    pop/add) are inherited unchanged, so missions / the on-device pop /
    fleet queues / serve all work the same way as the flat cost; every
    queue-mutation surface (init, set_goal, add_waypoint, missions)
    validates the waypoint's attitude block as a unit quaternion.

    Also fused-eligible: kernels/auv_mppi.py runs the blend as TWO SMEM
    goals with runtime blend weights, so queue pops never recompile.
    """

    STATE_DIM = 13

    def _waypoint_dim(self, Qm: np.ndarray) -> int:
        if Qm.shape != (10, 10):
            raise AssertionError(f"Q must be [10, 10], got {Qm.shape}")
        return self.STATE_DIM  # waypoint rows are full 13-dim states

    def validate_waypoint(self, w: np.ndarray) -> np.ndarray:
        """Reject a waypoint whose attitude block is not a unit quaternion
        (a degenerate q makes the acos angle meaningless); mild drift
        (|1 - |q|| <= 1e-3, e.g. f32 round-trips) is renormalised."""
        w = np.asarray(w, np.float64).reshape(-1)
        if w.shape[0] != self.STATE_DIM:
            raise ValueError(
                f"waypoint dim {w.shape[0]} != state dim {self.STATE_DIM}")
        q = w[3:7]
        n = float(np.linalg.norm(q))
        if abs(n - 1.0) > 1e-3:
            raise ValueError(
                f"waypoint attitude |q| = {n:.4f} is not a unit "
                "quaternion (components 3:7 of the 13-dim waypoint)")
        out = np.array(w, np.float64)
        out[3:7] = q / n
        return out

    def _err10(self, state: jax.Array, wp: jax.Array) -> jax.Array:
        """[n, 13] states, [13] waypoint -> [n, 10] error vector."""
        pos = state[:, :3] - wp[None, :3]
        # |dot|: geodesic attitude angle, double-cover safe (see class doc)
        dot = jnp.clip(jnp.abs(state[:, 3:7] @ wp[3:7]), -1.0, 1.0)
        theta = 2.0 * jnp.arccos(dot)
        vel = state[:, 7:13] - wp[None, 7:13]
        return jnp.concatenate([pos, theta[:, None], vel], axis=-1)

    def _dist_waypoint(self, state: jax.Array, wp: jax.Array) -> jax.Array:
        d = self._err10(state, wp)
        return jnp.sum((d @ self.Q.T) * d, axis=-1)

    def dist(self, cp, state: jax.Array) -> jax.Array:
        """10-dim quaternion-aware error to the leading waypoint; accepts
        one state [13] (-> [10]) or a batch [n, 13] (-> [n, 10]). The
        mission pop radius (envs/mjx_env.waypoint_pop_fn: sum(d*d) < r^2)
        therefore measures attitude as an angle, not as raw quaternion
        component distance."""
        x = jnp.asarray(state)
        single = x.ndim == 1
        d = self._err10(x.reshape(-1, self.STATE_DIM), cp["waypoints"][0])
        return d[0] if single else d
