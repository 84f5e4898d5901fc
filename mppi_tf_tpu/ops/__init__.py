from .update import (
    beta,
    norm_arg,
    exp_arg,
    exp,
    nabla,
    weights,
    weighted_noise,
    mppi_update,
    shift,
    get_next,
    init_zeros,
)
from .noise import sample_noise, scale_noise
from .rollout import rollout_costs

__all__ = [
    "beta",
    "norm_arg",
    "exp_arg",
    "exp",
    "nabla",
    "weights",
    "weighted_noise",
    "mppi_update",
    "shift",
    "get_next",
    "init_zeros",
    "sample_noise",
    "scale_noise",
    "rollout_costs",
]
