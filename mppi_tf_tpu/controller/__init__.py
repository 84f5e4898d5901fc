from .mppi import MPPI, savgol_matrix

__all__ = ["MPPI", "savgol_matrix", "get_controller"]


def get_controller(model, cost, config_dict, observer=None, **overrides):
    """Build an MPPI controller from a parsed env config dict.

    Reference: scripts/src/controller.py:3-38 (``get_controller``). Keys
    follow the reference's env-config YAML family
    (config/envs/point_mass.default.yaml): samples, horizon, lambda, noise,
    upsilon, init-act, normalize.
    """
    import numpy as np

    kwargs = dict(
        k=config_dict.get("samples", 1),
        tau=config_dict.get("horizon", 1),
        lam=config_dict.get("lambda", 1.0),
        upsilon=config_dict.get("upsilon", 1.0),
        sigma=np.asarray(config_dict["noise"]),
        normalize_cost=config_dict.get("normalize", False),
        filter_seq=config_dict.get("filter", False),
        kernel=config_dict.get("kernel", "auto"),
        antithetic=config_dict.get("antithetic", False),
    )
    if "init-act" in config_dict:
        tau = kwargs["tau"]
        ia = np.asarray(config_dict["init-act"], dtype=np.float64).reshape(1, -1)
        kwargs["init_seq"] = np.tile(ia, (tau, 1))
    kwargs.update(overrides)
    return MPPI(model, cost, observer=observer, **kwargs)
