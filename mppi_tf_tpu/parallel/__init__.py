from .mesh import make_mesh, sample_axis
from .sharded import ShardedMPPI, build_sharded_solve

__all__ = ["make_mesh", "sample_axis", "ShardedMPPI", "build_sharded_solve"]
