from .halo import (
    HaloPlan,
    halo_poisson2d_op,
    build_gauss_halo_plan,
    build_halo_plan,
    halo_face_rows,
    halo_sw2d_curved_rhs,
    halo_sw2d_rhs,
    halo_sw2d_timestep,
    halo_tables,
    halo_traces,
)
from .partition import (
    pad_context,
    partition_mesh,
    compute_partition,
    graph_partition,
    partition_block_sizes,
    partition_cut,
    rcb_block_sizes,
    rcb_partition,
    rcm_order,
)
from .distributed import distributed_init, make_global_mesh
from .sharding import (
    context_shard_specs,
    cubature_shard_specs,
    gauss_shard_specs,
    make_device_mesh,
    shard_context,
)

__all__ = [
    "partition_mesh",
    "rcb_partition",
    "compute_partition",
    "graph_partition",
    "partition_block_sizes",
    "partition_cut",
    "rcb_block_sizes",
    "pad_context",
    "rcm_order",
    "make_device_mesh",
    "shard_context",
    "context_shard_specs",
    "cubature_shard_specs",
    "gauss_shard_specs",
    "distributed_init",
    "make_global_mesh",
    "HaloPlan",
    "build_halo_plan",
    "build_gauss_halo_plan",
    "halo_face_rows",
    "halo_sw2d_curved_rhs",
    "halo_tables",
    "halo_traces",
    "halo_sw2d_rhs",
    "halo_sw2d_timestep",
    "halo_poisson2d_op",
]

from .blocked_shard import (  # noqa: E402,F401
    ShardedBlocked,
    build_sharded_blocked,
    initial_packed_traces,
    initial_send_buffer,
    make_sharded_blocked_step,
    make_sharded_blocked_step_diff,
    make_sharded_blocked_step_fused,
    make_sharded_blocked_step_rdma,
)

__all__ += [
    "ShardedBlocked",
    "build_sharded_blocked",
    "initial_packed_traces",
    "initial_send_buffer",
    "make_sharded_blocked_step",
    "make_sharded_blocked_step_fused",
    "make_sharded_blocked_step_rdma",
    "make_sharded_blocked_step_diff",
]
