from .partition import partition_mesh, rcb_partition
from .sharding import make_device_mesh, shard_context, sharded_sw2d_rhs

__all__ = [
    "partition_mesh",
    "rcb_partition",
    "make_device_mesh",
    "shard_context",
    "sharded_sw2d_rhs",
]
