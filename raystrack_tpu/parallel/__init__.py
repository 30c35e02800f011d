"""Multi-device sharding and multi-host distribution."""
from .sharding import ray_mesh, trace_chunk_sharded, RAY_AXIS
from .distribute import partition_emitters, view_factor_matrix_partition

__all__ = [
    "ray_mesh",
    "trace_chunk_sharded",
    "RAY_AXIS",
    "partition_emitters",
    "view_factor_matrix_partition",
]
