from .analytic import AUVEnv, PointMassEnv
from .mjx_env import (JaxPointMassEnv, build_on_device_loop,
                      on_device_closed_loop)
from .runner import ClosedLoopRunner, run_experiment

__all__ = ["AUVEnv", "PointMassEnv", "ClosedLoopRunner", "run_experiment",
           "get_env", "JaxPointMassEnv",
           "on_device_closed_loop", "build_on_device_loop"]


def get_env(env_cfg, render: bool = False, model_cfg=None):
    """Build a simulation environment from an env config dict.

    Reference: scripts/src/mujoco/simulation.py (mujoco_py wrapper) — the
    env file is named by the config's ``env`` key (e.g.
    ``../envs/point_mass3d.xml``, config/envs/point_mass.default.yaml).
    Here: ``.xml`` files load through the MuJoCo bindings when available;
    ``analytic:point_massNd`` (or a missing ``env`` key) selects the
    MJCF-equivalent analytic integrator; ``analytic:auv`` (or a missing
    ``env`` key with a 13-dim state) uses the Fossen dynamics as the plant
    (vehicle parameters from ``model_cfg`` or the env config's ``plant``
    sub-dict).
    """
    sdim = env_cfg.get("state-dim", 2)
    adim = env_cfg.get("action-dim", 1)
    name = env_cfg.get("env", "analytic:point_mass")
    if str(name).endswith(".xml"):
        from .mujoco_env import MujocoEnv

        return MujocoEnv(name, sdim, adim, render=render)
    if str(name).startswith("mjx:"):
        raise ValueError(
            "the 'mjx:' plant was removed (the mujoco-mjx package is not "
            "shipped in this image and the class could never execute); "
            "use 'jax:point_mass' — identical semantics for this scene "
            "(exact LTI == RK4) — or a .xml env for host-side MuJoCo")
    if str(name).startswith("jax:"):
        return JaxPointMassEnv(n_dof=adim, render=render)
    if str(name) == "analytic:auv" or sdim == AUVEnv.STATE_DIM:
        plant_cfg = env_cfg.get("plant") or model_cfg
        if plant_cfg is None:
            raise ValueError(
                "AUV env needs vehicle parameters: pass model_cfg or put a "
                "'plant' sub-dict in the env config")
        ptype = plant_cfg.get("type", "auv")
        if ptype != "auv":
            # a learned-model config must never silently become the
            # simulator: an untrained NN plant makes the experiment
            # circular (plant == the model being learned) with no error
            raise ValueError(
                f"the AUV plant needs analytic 'auv' vehicle parameters, "
                f"got a {ptype!r} model config — give the env config a "
                f"'plant' sub-dict with the physical vehicle (e.g. the "
                f"rexrov2 table) when the controller's model is learned")
        return AUVEnv(plant_cfg, render=render)
    return PointMassEnv(n_dof=adim, render=render)
