"""Multi-chip trajectory optimization over the DIFFERENTIABLE sharded
blocked rollout (parallel/blocked_shard.make_sharded_blocked_step_diff).

Demonstrates the full multi-chip MPC machinery end to end: an Adam loop
optimizes the initial free-surface perturbation to hit a target terminal
state, with jax.grad flowing through per-shard Pallas stage kernels
(custom VJP, in-kernel pullback), the transposed ppermute halo exchange,
and a psum-reduced cost. Runs on any element mesh — 8 virtual CPU devices
here (set XLA_FLAGS=--xla_force_host_platform_device_count=8), real chips
on a pod slice with the identical program.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/mpc_sharded.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

if os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu"):
    pass  # real accelerators: use them as-is
else:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from blitzdg_tpu.mesh import box_triangles
from blitzdg_tpu.ops.sw2d import SWPhysics
from blitzdg_tpu.parallel import partition_mesh
from blitzdg_tpu.parallel.blocked_shard import (
    build_sharded_blocked,
    initial_packed_traces,
    make_sharded_blocked_step_diff,
    pack_local,
)
from blitzdg_tpu.specgrid.triangle import build_triangle_context


def main(ndev=None, n_steps=8, iters=30):
    devices = jax.devices()
    ndev = ndev or min(8, len(devices))
    interpret = devices[0].platform == "cpu"
    mesh0 = box_triangles(8, 8)
    mesh2d, _, _ = partition_mesh(mesh0, ndev)
    ctx = build_triangle_context(1, mesh2d, filter_cutoff=0.9,
                                 filter_order=1, dtype=jnp.float32)
    phys = SWPhysics(g=9.81)
    sb = build_sharded_blocked(ctx, phys, ndev, dtype=jnp.float32)
    meta = sb.meta
    k_loc = sb.k_loc
    DT = 1e-3
    step = make_sharded_blocked_step_diff(sb, DT, interpret=interpret)
    el_mesh = Mesh(np.array(devices[:ndev]), ("element",))

    # target: a displaced bump at the terminal time
    tgt = 10.0 + 0.2 * jnp.exp(-8.0 * ((ctx.x - 0.3) ** 2 + ctx.y**2))
    tgt_pk = jnp.concatenate([
        pack_local(meta, np.asarray(tgt, np.float32)[s * k_loc:(s + 1) * k_loc])
        for s in range(ndev)], axis=0)
    zero_pk = jnp.concatenate([
        pack_local(meta, np.zeros((k_loc, ctx.n_p), np.float32))
        for _ in range(ndev)], axis=0)
    vm = sb.ops.vmask[0][None]

    op_specs = jax.tree.map(
        lambda a: P("element", *([None] * (a.ndim - 1))), sb.ops)
    ln_specs = tuple(P("element", *([None] * (a.ndim - 1))) for a in sb.lean)
    st_spec = P("element", None, None, None)

    def loss_local(ops_l, ln_l, eta_pk, tgt_l, z_l):
        h_pk = 10.0 * vm + eta_pk
        pk = (h_pk, z_l, z_l)
        tr0 = initial_packed_traces(sb, ops_l, pk)

        def body(carry, _):
            return step(ops_l, ln_l, carry, 0.0), None

        ((out, _), _) = jax.lax.scan(body, (pk, tr0), None,
                                     length=n_steps)[0], None
        h_end = out[0]
        loc = (jnp.sum(vm * (h_end - tgt_l) ** 2)
               + 1e-3 * jnp.sum(vm * eta_pk**2))
        return jax.lax.psum(loc, "element")

    def total(eta_pk):
        fn = jax.shard_map(
            loss_local, mesh=el_mesh,
            in_specs=(op_specs, ln_specs) + (st_spec,) * 3,
            out_specs=P(), check_vma=False)
        return fn(sb.ops, sb.lean, eta_pk, tgt_pk, zero_pk)

    vg = jax.jit(jax.value_and_grad(total))
    opt = optax.adam(0.05)
    eta = jnp.zeros_like(zero_pk)
    state = opt.init(eta)
    v0 = None
    for i in range(iters):
        v, g = vg(eta)
        upd, state = opt.update(g, state, eta)
        eta = optax.apply_updates(eta, upd)
        if v0 is None:
            v0 = float(v)
        if i % 10 == 0 or i == iters - 1:
            print(f"iter {i:3d}: cost {float(v):.6f}", flush=True)
    vf = float(vg(eta)[0])
    print(f"cost {v0:.6f} -> {vf:.6f} ({vf / v0:.3f}x) over {ndev} shards")
    assert vf < 0.5 * v0, "optimization failed to reduce the cost"
    print("done: multi-chip differentiable rollout optimization OK")


if __name__ == "__main__":
    main()
