"""mppi_tf_tpu — a TPU-native MPPI (Model Predictive Path Integral) framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of the
reference implementation NicolayP/mppi-tf (TF2 Python + TF C++ r2.1):

- information-theoretic MPPI controller (reference:
  scripts/src/controllers/controller_base.py, src/controller_base.cpp)
- analytic point-mass and AUV (Fossen) dynamics models, learned NN models
  (scripts/src/models/)
- quadratic / quaternion / ellipse / waypoint cost functions
  (scripts/src/costs/)
- replay-buffer model learner with k-fold CV and grid search
  (scripts/src/learners/learner_base.py)
- closed-loop simulation driver, YAML config system, metrics observer

Design is TPU-first, not a port: pure functions over pytrees, explicit PRNG
keys, ``lax.scan`` over the horizon, ``vmap``/sharded batch over samples,
``shard_map`` over a device mesh for pod-scale K, Pallas kernels for the
fused rollout hot path.
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401

_TOP_LEVEL = {
    "MPPI": ("mppi_tf_tpu.controller.mppi", "MPPI"),
    "ShardedMPPI": ("mppi_tf_tpu.parallel", "ShardedMPPI"),
    "get_controller": ("mppi_tf_tpu.controller", "get_controller"),
    "get_model": ("mppi_tf_tpu.models", "get_model"),
    "get_cost": ("mppi_tf_tpu.costs", "get_cost"),
    "get_env": ("mppi_tf_tpu.envs", "get_env"),
    "Learner": ("mppi_tf_tpu.learning", "Learner"),
    "Observer": ("mppi_tf_tpu.observer", "Observer"),
    "default_config": ("mppi_tf_tpu.cfg", "default_config"),
}


def __getattr__(name):
    """Lazy top-level exports: ``from mppi_tf_tpu import MPPI`` without
    importing every subsystem at package-import time."""
    try:
        mod_name, attr = _TOP_LEVEL[name]
    except KeyError:
        raise AttributeError(name) from None
    import importlib

    return getattr(importlib.import_module(mod_name), attr)


def __dir__():
    return sorted(list(globals()) + list(_TOP_LEVEL))
