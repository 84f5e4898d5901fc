from .fleet import FleetMPPI
from .mppi import MPPI, savgol_matrix

__all__ = ["MPPI", "FleetMPPI", "savgol_matrix", "get_controller"]


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
        noise_schedule=config_dict.get("noise-schedule"),
        kernel_dtype=config_dict.get("kernel-dtype", "float32"),
    )
    if "init-act" in config_dict:
        tau = kwargs["tau"]
        ia = np.asarray(config_dict["init-act"], dtype=np.float64).reshape(1, -1)
        kwargs["init_seq"] = np.tile(ia, (tau, 1))
    # an attached observer implies the full per-sample metrics catalogue
    # (observer_base.py:101-187) unless explicitly overridden
    kwargs["log"] = observer is not None
    kwargs.update(overrides)

    from ..models.dmd import DMDModel

    is_dmd = isinstance(model, DMDModel)
    if is_dmd:
        # a DMD model implies the adaptive controller family: the
        # closed-loop runner's save(x, u, x_next) hook re-identifies
        # (A, B) online (controller/dmd.py)
        for cfg_key, kw in (("refit-every", "refit_every"),
                            ("min-samples", "min_samples"),
                            ("buffer-capacity", "buffer_capacity")):
            if cfg_key in config_dict:
                # explicit **overrides win over config keys, like every
                # other option
                kwargs.setdefault(kw, config_dict[cfg_key])
    dmd_opts = ("refit_every", "min_samples", "buffer_capacity")
    n_fleet = int(kwargs.pop("fleet", config_dict.get("fleet", 0)) or 0)
    if n_fleet:
        # fleet serving: N vehicles, one compiled dispatch. With mesh=,
        # the mesh shards the FLEET axis (collective-free data
        # parallelism) instead of the sample axis.
        if is_dmd:
            raise ValueError(
                "fleet does not compose with the adaptive DMD family — "
                "build FleetMPPI over an identified DMDModel directly")
        if observer is not None:
            raise ValueError(
                "fleet controllers have no observer surface (per-vehicle "
                "log mode is a single-vehicle debugging tool); drop the "
                "observer or the fleet key")
        from .fleet import FleetMPPI

        kwargs.pop("log", None)
        # explicit goals= override wins over the config key, like every
        # other option
        kwargs.setdefault("goals", config_dict.get("goals"))
        return FleetMPPI(model, cost, n_vehicles=n_fleet, mesh=mesh,
                         **kwargs)
    if mesh is not None:
        import jax
        import jax.numpy as jnp

        from ..parallel.fused import ShardedFusedMPPI
        from ..parallel.sharded import ShardedMPPI

        from ..kernels.errors import KernelUnsupportedError

        if is_dmd:
            from .dmd import ShardedDMDMPPI, ShardedFusedDMDMPPI

            fused_cls, xla_cls = ShardedFusedDMDMPPI, ShardedDMDMPPI
        else:
            fused_cls, xla_cls = ShardedFusedMPPI, ShardedMPPI

        kernel = kwargs.pop("kernel", "auto")
        kwargs.pop("log", None)  # sharded info is the collective-reduced set
        base = dict(k=kwargs.pop("k"), tau=kwargs.pop("tau"),
                    lam=kwargs.pop("lam"), upsilon=kwargs.pop("upsilon"),
                    sigma=kwargs.pop("sigma"), observer=observer,
                    init_seq=kwargs.pop("init_seq", None),
                    seed=kwargs.pop("seed", 0))
        # the fused kernels are f32 — same eligibility rules as
        # MPPI(kernel=); normalize_cost/clip/filter/antithetic are
        # kernel-supported (pm_mppi/auv_mppi second-pass + merge +
        # in-kernel lane-mirror pairs)
        blockers = []
        if jnp.dtype(model.dtype) != jnp.float32:
            blockers.append(f"dtype={jnp.dtype(model.dtype).name} "
                            "(kernel is f32)")
        on_tpu = jax.default_backend() == "tpu"
        if kernel == "pallas" or (kernel == "auto" and not blockers
                                  and on_tpu):
            if kernel == "pallas" and blockers:
                raise TypeError(
                    f"kernel='pallas' does not support {blockers}")
            fused_kwargs = dict(base)
            if kwargs.get("kernel_tile") is not None:
                fused_kwargs["tile"] = int(kwargs["kernel_tile"])
            fused_opts = ("normalize_cost", "clip_actions", "filter_seq",
                          "filter_window", "filter_polyorder", "antithetic",
                          "noise_schedule", "kernel_dtype")
            if is_dmd:
                fused_opts = fused_opts + dmd_opts
            for opt in fused_opts:
                if opt in kwargs:
                    fused_kwargs[opt] = kwargs[opt]
            # validate BEFORE constructing (kernel builds are not free, and
            # the error surface must not depend on kernel eligibility)
            leftovers = {k_ for k_ in kwargs
                         if k_ not in ("kernel_tile",) + fused_opts}
            if leftovers:
                raise TypeError(
                    f"unknown controller option(s) {sorted(leftovers)} "
                    "for the fused sharded path")
            try:
                return fused_cls(model, cost, mesh,
                                 interpret=not on_tpu, **fused_kwargs)
            except KernelUnsupportedError:
                if kernel == "pallas":
                    raise
        kwargs.pop("kernel_tile", None)  # XLA path has no kernel tile
        if kwargs.pop("kernel_dtype", "float32") != "float32":
            raise ValueError(
                "kernel-dtype applies to the fused Pallas path only — "
                "this controller resolved to the XLA sharded solve")
        return xla_cls(
            model, cost, mesh,
            noise_schedule=kwargs.pop("noise_schedule", None),
            normalize_cost=kwargs.pop("normalize_cost", False),
            antithetic=kwargs.pop("antithetic", False),
            filter_seq=kwargs.pop("filter_seq", False),
            filter_window=kwargs.pop("filter_window", 9),
            filter_polyorder=kwargs.pop("filter_polyorder", 3),
            clip_actions=kwargs.pop("clip_actions", False),
            **base, **kwargs)
    if is_dmd:
        from .dmd import DMDMPPI

        return DMDMPPI(model, cost, observer=observer, **kwargs)
    return MPPI(model, cost, observer=observer, **kwargs)
