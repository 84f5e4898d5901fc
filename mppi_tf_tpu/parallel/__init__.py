from .mesh import make_mesh, sample_axis
from .sharded import ShardedMPPI, build_sharded_solve

__all__ = ["make_mesh", "sample_axis", "ShardedMPPI", "build_sharded_solve",
           "ShardedFusedMPPI", "build_sharded_fused_solve", "launch"]


def __getattr__(name):
    # lazy: parallel.fused pulls in the Pallas kernels
    import importlib

    if name in ("ShardedFusedMPPI", "build_sharded_fused_solve"):
        mod = importlib.import_module(".fused", __name__)
        return getattr(mod, name)
    if name == "launch":
        return importlib.import_module(".launch", __name__)
    raise AttributeError(name)
