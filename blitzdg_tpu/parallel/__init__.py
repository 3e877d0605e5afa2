from .halo import (
    HaloPlan,
    halo_poisson2d_op,
    build_halo_plan,
    halo_sw2d_rhs,
    halo_sw2d_timestep,
    halo_tables,
    halo_traces,
)
from .partition import partition_mesh, rcb_partition
from .sharding import (
    context_shard_specs,
    make_device_mesh,
    shard_context,
    sharded_sw2d_rhs,
)

__all__ = [
    "partition_mesh",
    "rcb_partition",
    "make_device_mesh",
    "shard_context",
    "context_shard_specs",
    "sharded_sw2d_rhs",
    "HaloPlan",
    "build_halo_plan",
    "halo_tables",
    "halo_traces",
    "halo_sw2d_rhs",
    "halo_sw2d_timestep",
    "halo_poisson2d_op",
]
