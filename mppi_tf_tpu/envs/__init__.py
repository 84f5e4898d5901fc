from .analytic import PointMassEnv
from .runner import ClosedLoopRunner, run_experiment

__all__ = ["PointMassEnv", "ClosedLoopRunner", "run_experiment", "get_env"]


def get_env(env_cfg, render: bool = False):
    """Build a simulation environment from an env config dict.

    Reference: scripts/src/mujoco/simulation.py (mujoco_py wrapper) — the
    env file is named by the config's ``env`` key (e.g.
    ``../envs/point_mass3d.xml``, config/envs/point_mass.default.yaml).
    Here: ``.xml`` files load through the MuJoCo bindings when available;
    the name ``analytic:point_massNd`` (or a missing ``env`` key with
    state/action dims) selects the MJCF-equivalent analytic integrator.
    """
    sdim = env_cfg.get("state-dim", 2)
    adim = env_cfg.get("action-dim", 1)
    name = env_cfg.get("env", "analytic:point_mass")
    if str(name).endswith(".xml"):
        from .mujoco_env import MujocoEnv

        return MujocoEnv(name, sdim, adim, render=render)
    return PointMassEnv(n_dof=adim, render=render)
