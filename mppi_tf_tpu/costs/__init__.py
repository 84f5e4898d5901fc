from .base import CostBase
from .static import StaticCost, StaticQuatCost

__all__ = ["CostBase", "StaticCost", "StaticQuatCost", "get_cost"]


def get_cost(task_dict, lam, gamma, upsilon, sigma, dtype=None):
    """Type-dispatch cost factory.

    Reference: scripts/src/cost.py:51-64 — dispatch on the task dict's
    ``type`` field over static / static_quat / elipse / elipse3d / waypoints.
    The reference's waypoints and elipse3d branches are broken at HEAD
    (SURVEY.md §1 caveat); this implements the intended API, completed.
    """
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float32
    ctype = task_dict["type"]
    if ctype == "static":
        return StaticCost(
            lam, gamma, upsilon, sigma,
            goal=task_dict["goal"], Q=task_dict["Q"],
            diag=task_dict.get("diag", False), dtype=dtype,
        )
    if ctype == "static_quat":
        return StaticQuatCost(
            lam, gamma, upsilon, sigma,
            goal=task_dict["goal"], Q=task_dict["Q"],
            diag=task_dict.get("diag", False), dtype=dtype,
        )
    if ctype == "elipse":
        from .elipse import ElipseCost

        return ElipseCost(
            lam, gamma, upsilon, sigma,
            a=task_dict["a"], b=task_dict["b"],
            center_x=task_dict["center_x"], center_y=task_dict["center_y"],
            speed=task_dict["speed"], m_state=task_dict["m_state"],
            m_vel=task_dict["m_vel"], dtype=dtype,
        )
    if ctype == "elipse3d":
        from .elipse import ElipseCost3D

        return ElipseCost3D(
            lam, gamma, upsilon, sigma,
            normal=task_dict["normal"], aVec=task_dict["aVec"],
            axis=task_dict["axis"], center=task_dict["center"],
            speed=task_dict["speed"], m_state=task_dict["m_state"],
            m_vel=task_dict["m_vel"], dtype=dtype,
        )
    if ctype in ("waypoints", "waypoints_quat"):
        from .waypoints import WayPointsCost, WayPointsQuatCost

        cls = WayPointsQuatCost if ctype == "waypoints_quat" \
            else WayPointsCost
        return cls(
            lam, gamma, upsilon, sigma,
            Q=task_dict["Q"], waypoints=task_dict.get("waypoints"),
            alpha=task_dict.get("alpha", 0.2),
            max_waypoints=task_dict.get("max_waypoints", 32),
            diag=task_dict.get("diag", False), dtype=dtype,
        )
    raise ValueError(f"unknown cost type: {ctype!r}")
