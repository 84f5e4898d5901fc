from .base import ModelBase
from .point_mass import PointMassModel

__all__ = ["ModelBase", "PointMassModel", "get_model"]


def get_model(model_dict, dt=0.1, state_dim=2, action_dim=None, name=None,
              dtype=None, **kwargs):
    """Type-dispatch model factory.

    Reference: scripts/src/model.py:53-67 — dispatch on the config dict's
    ``type`` field over point_mass / auv / neural_net / auv_nn / auv_nn_speed.
    The reference factory at HEAD is stale (undefined limMax/limMin, wrong
    kwarg names, SURVEY.md §1 caveat); this implements the intended API.

    ``action_dim=None`` keeps each family's own default (1 for point-mass /
    generic NN, 6 for the AUV families).
    """
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float32
    mtype = model_dict.get("type", "point_mass")
    if mtype == "point_mass":
        return PointMassModel(
            mass=model_dict.get("mass", 1.0),
            dt=dt,
            state_dim=state_dim,
            action_dim=action_dim if action_dim else 1,
            act_max=model_dict.get("limMax"),
            act_min=model_dict.get("limMin"),
            name=name or "point_mass",
            dtype=dtype,
        )
    if mtype == "auv":
        from .auv import AUVModel

        return AUVModel(
            parameters=model_dict,
            dt=dt,
            action_dim=action_dim if action_dim else 6,
            act_max=model_dict.get("limMax"),
            act_min=model_dict.get("limMin"),
            name=name or model_dict.get("model", "auv"),
            dtype=dtype,
        )
    if mtype == "neural_net":
        from .nn import NNModel

        return NNModel(
            state_dim=state_dim,
            action_dim=action_dim if action_dim else 1,
            dt=dt,
            act_max=model_dict.get("limMax"),
            act_min=model_dict.get("limMin"),
            name=name or "nn_model",
            dtype=dtype,
            **kwargs,
        )
    if mtype == "auv_nn":
        from .nn import NNAUVModel

        # limMax/limMin forward like every other family (review finding:
        # dropping them clipped learned-AUV controllers to the +-1 default)
        return NNAUVModel(action_dim=action_dim if action_dim else 6, dt=dt,
                          act_max=model_dict.get("limMax"),
                          act_min=model_dict.get("limMin"),
                          name=name or "auv_nn_model", dtype=dtype, **kwargs)
    if mtype == "auv_nn_speed":
        from .nn import NNAUVModelSpeed

        return NNAUVModelSpeed(action_dim=action_dim if action_dim else 6,
                               dt=dt,
                               act_max=model_dict.get("limMax"),
                               act_min=model_dict.get("limMin"),
                               name=name or "auv_nn_speed_model",
                               dtype=dtype, **kwargs)
    if mtype == "dmd":
        from .dmd import DMDModel

        return DMDModel(
            state_dim=state_dim,
            action_dim=action_dim if action_dim else 1,
            dt=dt,
            rank=model_dict.get("rank"),
            reg=model_dict.get("reg", 1e-9),
            act_max=model_dict.get("limMax"),
            act_min=model_dict.get("limMin"),
            name=name or "dmd_model",
            dtype=dtype,
            **kwargs,
        )
    raise ValueError(f"unknown model type: {mtype!r}")


def copy_model(model):
    """Structural clone of a model (used for k-fold validation).

    Reference: scripts/src/model.py:70-78. Models here are stateless — the
    trainable state is the params pytree — so a "copy" is just a fresh
    params pytree from the same model object; provided for API parity.
    """
    return model, model.init_params()
