"""Flagship workload definitions: the rexrov2 AUV and its default task.

One canonical copy of the vehicle table used by the bench suite, the
driver entry points and the examples (reference:
config/models/rexrov2.default.yaml — the physical constants the framework
must accept; the same data ships as cfg/defaults/models/rexrov2.yaml for
the YAML config path).
"""

import numpy as np


def auv_params():
    """rexrov2 vehicle parameters (reference rexrov2.default.yaml)."""
    return {
        "type": "auv",
        "mass": 1862.87,
        "volume": 1.8121303501945525,
        "density": 1028.0,
        "cog": [0.0, 0.0, 0.0],
        "cob": [0.0, 0.0, 0.3],
        "Ma": [
            [779.79, -6.8773, -103.32, 8.5426, -165.54, -7.8033],
            [-6.8773, 1222.0, 51.29, 409.44, -5.8488, 62.726],
            [-103.32, 51.29, 3659.9, 6.1112, -386.42, 10.774],
            [8.5426, 409.44, 6.1112, 534.9, -10.027, 21.019],
            [-165.54, -5.8488, -386.42, -10.027, 842.69, -1.1162],
            [-7.8033, 62.726, 10.775, 21.019, -1.1162, 224.32],
        ],
        "linear_damping": [-74.82, -69.48, -728.4, -268.8, -309.77, -105.0],
        "quad_damping": [-748.22, -992.53, -1821.01, -672.0, -774.44,
                         -523.27],
        "linear_damping_forward_speed": [0.0] * 6,
        "inertial": {"ixx": 525.39, "iyy": 794.2, "izz": 691.23,
                     "ixy": 1.44, "ixz": 33.41, "iyz": 2.6},
        "rk": 2,
    }


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
