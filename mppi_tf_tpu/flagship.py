"""Flagship workload definitions: the rexrov2 AUV and its default task.

The bench suite and the driver entry points resolve the rexrov2 vehicle
through the bundled YAML (cfg/defaults/models/rexrov2.yaml — the single
copy of the physical-constant table the framework must accept; reference:
config/models/rexrov2.default.yaml).
"""

import numpy as np


def auv_params():
    """rexrov2 vehicle parameters — loaded from the bundled YAML
    (cfg/defaults/models/rexrov2.yaml, the single copy of the table;
    reference rexrov2.default.yaml)."""
    from .cfg.config import default_config

    return default_config("models/rexrov2")


def auv_task():
    """Depth-setpoint quaternion task (the flagship bench target)."""
    goal = np.zeros(13)
    goal[2] = -5.0
    goal[6] = 1.0
    return {
        "type": "static_quat",
        "diag": True,
        "goal": goal.tolist(),
        "Q": [100.0, 100.0, 100.0, 10.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
    }
