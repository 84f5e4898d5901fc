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
