"""Waypoint missions as a first-class controller surface.

The reference drafted ``WayPointsCost`` but never wired queue advancement
into any runner or controller (scripts/src/costs/cost_base.py:210-284;
the factory referenced an undefined symbol, scripts/src/cost.py:45-48).
Here missions are a uniform surface across every stateful controller:

- ``set_waypoints(mission)`` replaces the controller's queue with a
  multi-leg mission (validated against the cost's fixed capacity — the
  functional queue clamps at ``max_waypoints``, which would silently drop
  the middle legs of an over-long mission).
- ``advance_waypoints(state, radius)`` pops the queue when the plant is
  within ``radius`` of the leading waypoint — ONE cached jitted dispatch
  (the pop itself is the same ``envs/mjx_env.waypoint_pop_fn`` the
  on-device scan uses, so host-driven and compiled missions share queue
  semantics).

``MissionMixin`` is mixed into :class:`~mppi_tf_tpu.controller.mppi.MPPI`
and the sharded controllers (``parallel/sharded.py`` / ``parallel/
fused.py``); :class:`~mppi_tf_tpu.controller.fleet.FleetMPPI` carries the
per-vehicle analogues (``set_vehicle_waypoints`` / ``advance_waypoints``)
over the same validation helper.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np


def validate_mission(cost, waypoints: Sequence) -> list:
    """Check a mission against a WayPointsCost; returns float64 rows.

    Raises TypeError unless ``cost`` is a WayPointsCost, ValueError when
    the mission is empty, exceeds the cost's queue capacity, or any
    waypoint's dimension differs from the cost's Q dimension.
    """
    from ..costs.waypoints import WayPointsCost

    if not isinstance(cost, WayPointsCost):
        raise TypeError(
            f"waypoint missions need a WayPointsCost, the controller runs "
            f"{type(cost).__name__}")
    wps = [np.asarray(w, np.float64).reshape(-1) for w in waypoints]
    if not wps:
        raise ValueError("waypoints must be non-empty")
    if len(wps) > cost.max_waypoints:
        raise ValueError(
            f"mission has {len(wps)} waypoints but the cost's queue "
            f"capacity is {cost.max_waypoints} (raise max_waypoints on "
            "the WayPointsCost)")
    for w in wps:
        if w.shape[0] != cost.dim:
            raise ValueError(
                f"waypoint dim {w.shape[0]} != Q dim {cost.dim}")
    validate = getattr(cost, "validate_waypoint", None)
    if validate is not None:  # e.g. unit-quaternion check (WayPointsQuat)
        wps = [validate(w) for w in wps]
    return wps


def mission_params(cost, cp, waypoints: Sequence):
    """Cost params with the queue replaced by ``waypoints`` (validated
    ONCE here; ``_set_queue`` uploads the pre-validated rows in one shot
    instead of re-validating through set_goal + N add_waypoint calls)."""
    wps = validate_mission(cost, waypoints)
    return cost._set_queue(cp, wps)


class MissionMixin:
    """Mission surface for single-vehicle controllers.

    Concrete classes provide ``_cost``, ``_cparams``, ``_model``,
    ``_dtype`` (MPPI, ShardedMPPI, ShardedFusedMPPI and the DMD
    subclasses all do).
    """

    def set_waypoints(self, waypoints) -> None:
        """Replace the mission queue. Never retraces the compiled solve
        (the queue is a fixed-capacity array in the cost params)."""
        self._cparams = mission_params(self._cost, self._cparams, waypoints)

    def waypoints_remaining(self) -> int:
        """Active queue length (1 once the final leg is the goal)."""
        from ..costs.waypoints import WayPointsCost

        if not isinstance(self._cost, WayPointsCost):
            raise TypeError(
                f"waypoint missions need a WayPointsCost, the controller "
                f"runs {type(self._cost).__name__}")
        return int(np.asarray(self._cparams["count"]))

    def advance_waypoints(self, state, radius: float) -> bool:
        """Pop the leading waypoint when ``state`` is within ``radius`` of
        it (and more than one leg remains). Returns whether the queue
        advanced. ONE cached jitted pop with the squared radius as a
        traced argument — a long-running serve endpoint receiving varying
        client-computed radii reuses the same executable (advisor r3:
        a per-radius cache key grew without bound)."""
        from ..costs.waypoints import WayPointsCost
        from ..envs.mjx_env import waypoint_pop_arg_fn

        if not isinstance(self._cost, WayPointsCost):
            raise TypeError(
                f"waypoint missions need a WayPointsCost, the controller "
                f"runs {type(self._cost).__name__}")
        pop = getattr(self, "_mission_pop_jit", None)
        if pop is None:
            pop = self._mission_pop_jit = jax.jit(
                waypoint_pop_arg_fn(self._cost))
        import jax.numpy as jnp

        x = jnp.asarray(
            np.asarray(state, np.float64).reshape(-1), self._dtype)
        r2 = jnp.asarray(float(radius) ** 2, self._dtype)
        old = int(np.asarray(self._cparams["count"]))
        self._cparams = pop(self._cparams, x, r2)
        return int(np.asarray(self._cparams["count"])) < old
