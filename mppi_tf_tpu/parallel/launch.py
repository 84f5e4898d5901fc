"""Multi-host launch glue: one controller, K sharded across a TPU pod.

Greenfield (the reference is single-process, SURVEY.md §2.8). The model:
every host runs THIS same program (JAX SPMD); `initialize()` wires the
hosts into one runtime, `global_mesh()` builds a mesh over every chip in
the slice, and the sharded solves in parallel/sharded.py /
parallel/fused.py then run with their four collectives (pmin/pmax/psum)
riding ICI within a host and DCN across hosts.

Typical pod launch (same command on every worker):

    python -m my_experiment  # calls initialize() first thing

On Cloud TPU the coordinator/process count/process id are discovered from
the TPU metadata automatically; on other clusters pass them explicitly.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host JAX runtime (idempotent).

    No-op on a single process with no coordinator configured — safe to call
    unconditionally at program start.
    """
    import logging
    import os

    import jax

    try:
        # Cross-process collectives on the CPU client need an explicit
        # implementation (default "none" fails at the first psum); gloo is
        # the one shipped with jaxlib. Applies to BOTH the explicit-args
        # and the auto-detected (env/cluster-metadata) paths. Irrelevant
        # for TPU backends (collectives ride ICI/DCN) and rejected once
        # backends are already initialized — both cases are safe to ignore.
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass

    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception as e:
            # A REAL cluster that fails to initialize must not silently
            # degrade to a single-process run (each worker would shard K
            # over only its local chips): re-raise when cluster metadata
            # is evidently present.
            multi_host = (
                os.environ.get("COORDINATOR_ADDRESS")
                or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
                # multiple workers listed => a real slice, not localhost
                or "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
            )
            if multi_host:
                raise
            logging.getLogger(__name__).info(
                "no cluster metadata, running single-process (%s)", e)
            return
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def global_mesh(axis_names: Sequence[str] = ("k",),
                axis_shape: Optional[Tuple[int, ...]] = None):
    """Mesh over every device in the (possibly multi-host) slice.

    Default: one flat sample-parallel axis ``k`` over all chips. Pass
    ``axis_shape`` to factor, e.g. (("dp", "tp"), (4, 2)).
    """
    import jax
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    if axis_shape is None:
        axis_shape = (devices.size,)
    if int(np.prod(axis_shape)) != devices.size:
        raise ValueError(
            f"axis_shape {axis_shape} != {devices.size} devices")
    return Mesh(devices.reshape(axis_shape), tuple(axis_names))


def process_info() -> dict:
    """Host-level topology facts for logging/debugging."""
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
