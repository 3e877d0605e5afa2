"""Element-sharded BLOCKED-kernel step benchmark (reproduces the
SCALING_r05.json sharded-blocked rows).

Runs the per-shard fused Pallas stage kernels + kernel-I/O lean halo
exchange (parallel/blocked_shard.py) over an n-device element mesh and
prints us/step. On this single-chip environment ndev=1 measures the
fixed per-step overhead of the sharded formulation (2 kernel launches +
slice/ppermute/concat of the tiny send buffer) against the pure
in-kernel rollout; on a pod slice the same program scales over real
ICI. Scenario batching (B > 1) amortizes the per-launch overhead across
the kernel grid exactly like the in-kernel rollout's B=8 bench. Usage:

    python examples/sharded_blocked_bench.py [ndev] [cells] [B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
_p = os.environ.get("JAX_PLATFORMS", "")
if _p and "cpu" not in _p:
    os.environ["JAX_PLATFORMS"] = _p + ",cpu"

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from blitzdg_tpu.mesh import box_triangles
from blitzdg_tpu.ops.sw2d import SWPhysics, SWState
from blitzdg_tpu.parallel import partition_mesh
from blitzdg_tpu.parallel.blocked_shard import (
    build_sharded_blocked,
    initial_send_buffer,
    make_sharded_blocked_step_fused,
    pack_local,
)
from blitzdg_tpu.specgrid.triangle import build_triangle_context


def main(ndev=1, cells=32, batch=1, n_order=3, n_steps=2048):
    mesh0 = box_triangles(cells, cells)
    mesh2d, _, _ = partition_mesh(mesh0, max(ndev, 2))
    ctx = build_triangle_context(n_order, mesh2d,
                                 filter_cutoff=0.9 * n_order,
                                 filter_order=4, dtype=jnp.float32)
    phys = SWPhysics(g=9.81)
    sb = build_sharded_blocked(ctx, phys, ndev, dtype=jnp.float32,
                               precision="high")
    meta = sb.meta
    dt = 1.8e-4
    step = make_sharded_blocked_step_fused(sb, dt)
    el_mesh = Mesh(np.array(jax.devices()[:ndev]), ("element",))
    k_loc = sb.k_loc
    eta = jnp.exp(-10.0 * (ctx.x**2 + ctx.y**2))
    state = SWState(h=10.0 + eta, hu=jnp.zeros_like(eta),
                    hv=jnp.zeros_like(eta))
    # (ndev*B, p, NP, M): shard_map slices the leading axis to (B, ...)
    packed = tuple(jnp.concatenate(
        [jnp.broadcast_to(
            pack_local(meta,
                       np.asarray(f, np.float32)[s * k_loc:(s + 1) * k_loc]),
            (batch,) + (meta.p, meta.NP, meta.M))
         for s in range(ndev)], axis=0) for f in state)
    op_specs = jax.tree.map(
        lambda a: P("element", *([None] * (a.ndim - 1))), sb.ops)
    st_spec = P("element", None, None, None)

    def roll(ops_l, *pk):
        sb0 = initial_send_buffer(sb, ops_l, tuple(pk))

        def body(carry, _):
            return step(ops_l, carry, 0.0), None

        (out, _), _ = jax.lax.scan(body, (tuple(pk), sb0), None,
                                   length=n_steps)
        return out

    fn = jax.jit(jax.shard_map(
        roll, mesh=el_mesh, in_specs=(op_specs,) + (st_spec,) * 3,
        out_specs=(st_spec,) * 3, check_vma=False))
    out = jax.block_until_ready(fn(sb.ops, *packed))
    assert bool(jnp.isfinite(out[0]).all())
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(sb.ops, *packed))
        best = min(best, time.perf_counter() - t0)
    K = ctx.k_elem
    print(f"sharded-blocked K={K} N={n_order} ndev={ndev} B={batch}: "
          f"{1e6 * best / n_steps:.2f} us/step "
          f"({1e6 * best / n_steps / batch:.2f} us/step/scenario)")
    return best / n_steps


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
