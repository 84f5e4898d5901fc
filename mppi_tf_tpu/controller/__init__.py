from .mppi import MPPI, savgol_matrix

__all__ = ["MPPI", "savgol_matrix", "get_controller"]


def get_controller(model, cost, config_dict, observer=None, mesh=None,
                   **overrides):
    """Build an MPPI controller from a parsed env config dict.

    Reference: scripts/src/controller.py:3-38 (``get_controller``). Keys
    follow the reference's env-config YAML family
    (config/envs/point_mass.default.yaml): samples, horizon, lambda, noise,
    upsilon, init-act, normalize.

    Passing ``mesh`` (a ``jax.sharding.Mesh``) returns the mesh-sharded
    controller instead — ``ShardedFusedMPPI`` when ``kernel`` requests (and
    a fused Pallas kernel supports) the model/cost pair, else the XLA
    ``ShardedMPPI``. Same user-facing surface either way.
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
    # an attached observer implies the full per-sample metrics catalogue
    # (observer_base.py:101-187) unless explicitly overridden
    kwargs["log"] = observer is not None
    kwargs.update(overrides)
    if mesh is not None:
        import jax.numpy as jnp

        from ..parallel.fused import ShardedFusedMPPI
        from ..parallel.sharded import ShardedMPPI

        kernel = kwargs.pop("kernel", "auto")
        kwargs.pop("init_seq", None)  # sharded controllers start from zeros
        base = dict(k=kwargs["k"], tau=kwargs["tau"], lam=kwargs["lam"],
                    upsilon=kwargs["upsilon"], sigma=kwargs["sigma"])
        # the fused kernels are f32, draw i.i.d. in-kernel noise, and do the
        # beta-softmax in one pass — same eligibility rules as MPPI(kernel=)
        import jax

        fused_ok = (not kwargs.get("normalize_cost")
                    and not kwargs.get("antithetic")
                    and not kwargs.get("filter_seq")
                    and jnp.dtype(model.dtype) == jnp.float32
                    and jax.default_backend() == "tpu")
        if kernel == "pallas" or (kernel == "auto" and fused_ok):
            try:
                return ShardedFusedMPPI(model, cost, mesh, **base)
            except TypeError:
                if kernel == "pallas":
                    raise
        return ShardedMPPI(model, cost, mesh,
                           normalize_cost=kwargs.get("normalize_cost", False),
                           antithetic=kwargs.get("antithetic", False),
                           filter_seq=kwargs.get("filter_seq", False),
                           **base)
    return MPPI(model, cost, observer=observer, **kwargs)
