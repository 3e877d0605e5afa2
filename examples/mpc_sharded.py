"""Multi-chip MPC over the DIFFERENTIABLE sharded blocked rollout
(parallel/blocked_shard.make_sharded_blocked_step_diff).

Demonstrates the full multi-chip MPC machinery end to end: an Adam loop
optimizes a PER-STEP CONTROL SEQUENCE (linear momentum-forcing injectors
compiled into the per-shard stage kernels) to steer the flow to a target
terminal state, with jax.grad flowing through the Pallas stage kernels
(custom VJP, in-kernel pullback incl. control cotangents), the
transposed ppermute halo exchange, and a psum-reduced cost. Runs on any
element mesh — 8 virtual CPU devices here (set
XLA_FLAGS=--xla_force_host_platform_device_count=8), real chips on a
pod slice with the identical program.

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
    initial_send_buffer,
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
    bump = np.exp(-8.0 * (np.asarray(ctx.x) ** 2 + np.asarray(ctx.y) ** 2))
    BU = np.stack([bump, 0 * bump])
    BV = np.stack([0 * bump, bump])
    sb = build_sharded_blocked(ctx, phys, ndev, dtype=jnp.float32,
                               forcing_bu=BU, forcing_bv=BV)
    meta = sb.meta
    k_loc = sb.k_loc
    DT = 1e-3
    step = make_sharded_blocked_step_diff(sb, DT, interpret=interpret)
    el_mesh = Mesh(np.array(devices[:ndev]), ("element",))

    zero_pk = jnp.concatenate([
        pack_local(meta, np.zeros((k_loc, ctx.n_p), np.float32))
        for _ in range(ndev)], axis=0)
    vm = sb.ops.vmask[0][None]

    op_specs = jax.tree.map(
        lambda a: P("element", *([None] * (a.ndim - 1))), sb.ops)
    st_spec = P("element", None, None, None)

    # target: the terminal momentum REACHED by a hidden reference control
    # sequence — the optimizer must rediscover an equivalent sequence
    # (guaranteed-reachable system-identification-style demo)
    cs_ref = jnp.asarray(
        np.array([[0.8, -0.4]] * n_steps, np.float32))

    def rollout_local(ops_l, cs, z_l):
        pk = (10.0 * vm, z_l, z_l)
        sb0 = initial_send_buffer(sb, ops_l, pk)

        def body(carry, c):
            return step(ops_l, carry, 0.0, ctrl=c), None

        ((out, _), _) = jax.lax.scan(body, (pk, sb0), cs)[0], None
        return out[1]  # terminal hu (packed)

    roll_fn = jax.jit(jax.shard_map(
        rollout_local, mesh=el_mesh,
        in_specs=(op_specs, P(), st_spec),
        out_specs=st_spec, check_vma=False))
    tgt_pk = roll_fn(sb.ops, cs_ref, zero_pk)

    def loss_local(ops_l, cs, tgt_l, z_l):
        h_pk = 10.0 * vm  # rest start; the CONTROLS must do the steering
        pk = (h_pk, z_l, z_l)
        sb0 = initial_send_buffer(sb, ops_l, pk)

        def body(carry, c):
            return step(ops_l, carry, 0.0, ctrl=c), None

        ((out, _), _) = jax.lax.scan(body, (pk, sb0), cs)[0], None
        hu_end = out[1]
        loc = jnp.sum(vm * (hu_end - tgt_l) ** 2)
        return jax.lax.psum(loc, "element") + 1e-7 * jnp.sum(cs**2)

    def total(cs):
        fn = jax.shard_map(
            loss_local, mesh=el_mesh,
            in_specs=(op_specs, P()) + (st_spec,) * 2,
            out_specs=P(), check_vma=False)
        return fn(sb.ops, cs, tgt_pk, zero_pk)

    vg = jax.jit(jax.value_and_grad(total))
    opt = optax.adam(0.5)
    cs = jnp.zeros((n_steps, 2), jnp.float32)
    state = opt.init(cs)
    v0 = None
    for i in range(iters):
        v, g = vg(cs)
        upd, state = opt.update(g, state, cs)
        cs = optax.apply_updates(cs, upd)
        if v0 is None:
            v0 = float(v)
        if i % 10 == 0 or i == iters - 1:
            print(f"iter {i:3d}: cost {float(v):.6f}", flush=True)
    vf = float(vg(cs)[0])
    print(f"cost {v0:.6f} -> {vf:.6f} ({vf / v0:.3f}x) over {ndev} shards")
    print(f"recovered controls (step 0): {np.asarray(cs[0])} "
          f"vs reference {np.asarray(cs_ref[0])}")
    assert vf < 0.05 * v0, "optimization failed to reduce the cost"
    print("done: multi-chip differentiable MPC over controls OK")


if __name__ == "__main__":
    main()
