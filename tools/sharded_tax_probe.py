"""Where does the sharded-blocked step's fixed tax go? (VERDICT r4 weak #1)

Measures, on the real chip at K=2048/N=3 (the bench shape, n_shards=1):
  A. in-kernel fused rollout, B=1      (the 7.7us reference is B=8)
  B. scan of ONE stage launch/iter, emit_traces=False, zero ext
  C. scan of ONE stage launch/iter, emit_traces=True
  D. scan of TWO stage launches/iter (a full SSP-RK2 step), no lean glue
  E. the shipping fused sharded step (2 launches + lean-exchange glue)

B-A = per-launch overhead; C-B = trace-emission matmul; E-D = XLA glue.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from blitzdg_tpu.mesh import box_triangles
from blitzdg_tpu.ops.sw2d import SWPhysics
from blitzdg_tpu.ops.sw2d_blocked import (
    build_blocked_step_ops, pack_state, sw2d_rollout_blocked,
    sw2d_stage_blocked)
from blitzdg_tpu.parallel.blocked_shard import (
    build_sharded_blocked, initial_packed_traces, pack_local)
from blitzdg_tpu.specgrid.triangle import build_triangle_context

N_MEAS = 2048


def cfl_dt(ctx, g, h_max, cfl=0.7):
    c = float(np.sqrt(g * h_max))
    fs = float(np.abs(np.asarray(ctx.fscale)).max())
    return cfl / (((ctx.n_order + 1) ** 2) * 0.5 * fs * c)


def timeit(fn, *args):
    out = jax.block_until_ready(fn(*args))
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N_MEAS * 1e6


def main():
    mesh2 = box_triangles(32, 32)
    ctx = build_triangle_context(3, mesh2, filter_cutoff=2.7,
                                 filter_order=4, dtype=jnp.float32)
    phys = SWPhysics(g=9.81)
    dt = cfl_dt(ctx, 9.81, 11.0, cfl=0.7)
    h0 = 10.0 + jnp.exp(-10.0 * (ctx.x ** 2 + ctx.y ** 2))
    st = (h0, jnp.zeros_like(h0), jnp.zeros_like(h0))

    # A: in-kernel rollout, B=1
    ops, meta = build_blocked_step_ops(ctx, phys, dtype=jnp.float32,
                                       precision="high")
    packed1 = [pack_state(meta, f[None]) for f in st]
    us_a = timeit(lambda: sw2d_rollout_blocked(
        ops, meta, *packed1, None, dt, n_steps=N_MEAS))
    print(f"A in-kernel rollout (B=1): {us_a:8.2f} us/step", flush=True)

    # sharded setup (n_shards=1)
    sb = build_sharded_blocked(ctx, phys, 1, dtype=jnp.float32,
                               precision="high")
    pk = tuple(pack_local(sb.meta, jnp.asarray(f, jnp.float32)) for f in st)
    m = sb.meta
    o1 = jax.tree.map(lambda a: a[0], sb.ops)
    ext0 = tuple(jnp.zeros((1, m.p, m.NT, m.M), jnp.float32)
                 for _ in range(3))

    # B: one stage launch per scan iter, no traces
    def roll_b(*p):
        def body(c, _):
            s = sw2d_stage_blocked(o1, m, c, c, ext0, 0.5 * dt)
            return tuple(s), None
        out, _ = jax.lax.scan(body, tuple(p), None, length=N_MEAS)
        return out

    us_b = timeit(jax.jit(roll_b), *pk)
    print(f"B 1 launch/iter, no traces: {us_b:8.2f} us/step", flush=True)

    # C: one stage launch per iter, emit_traces
    def roll_c(*p):
        tr0 = initial_packed_traces(sb, sb.ops, tuple(p))

        def body(c, _):
            pkd, _tr = c
            *s, tr = sw2d_stage_blocked(o1, m, pkd, pkd, ext0, 0.5 * dt,
                                        emit_traces=True)
            return (tuple(s), tr), None
        (out, _), _ = jax.lax.scan(body, (tuple(p), tr0), None,
                                   length=N_MEAS)
        return out

    us_c = timeit(jax.jit(roll_c), *pk)
    print(f"C 1 launch/iter, +traces:   {us_c:8.2f} us/step", flush=True)

    # D: two stage launches per iter (full step), zero ext, no glue
    def roll_d(*p):
        def body(c, _):
            s1 = sw2d_stage_blocked(o1, m, c, c, ext0, 0.5 * dt)
            s2 = sw2d_stage_blocked(o1, m, c, tuple(s1), ext0, dt)
            return tuple(s2), None
        out, _ = jax.lax.scan(body, tuple(p), None, length=N_MEAS)
        return out

    us_d = timeit(jax.jit(roll_d), *pk)
    print(f"D 2 launches/iter, no glue: {us_d:8.2f} us/step", flush=True)

    # E: the shipping fused sharded step under shard_map(1 device)
    # (round-5 kernel-I/O exchange; the round-4 trace-emitting variant it
    # replaced measured 34.7 us in this probe's original run)
    from blitzdg_tpu.parallel.blocked_shard import (
        initial_send_buffer, make_sharded_blocked_step_fused)

    sbstep = make_sharded_blocked_step_fused(sb, dt)
    smesh = Mesh(np.array(jax.devices()[:1]), ("element",))
    ospec = jax.tree.map(lambda a: P("element", *([None] * (a.ndim - 1))),
                         sb.ops)
    sspec = P("element", None, None, None)

    def roll_e(ops_l, *p):
        sb0 = initial_send_buffer(sb, ops_l, tuple(p))

        def body(carry, _):
            return sbstep(ops_l, carry, 0.0), None
        (out, _), _ = jax.lax.scan(body, (tuple(p), sb0), None,
                                   length=N_MEAS)
        return out

    fn_e = jax.jit(jax.shard_map(
        roll_e, mesh=smesh, in_specs=(ospec,) + (sspec,) * 3,
        out_specs=(sspec,) * 3, check_vma=False))
    us_e = timeit(fn_e, sb.ops, *pk)
    print(f"E fused sharded step:       {us_e:8.2f} us/step", flush=True)

    print(f"\nbreakdown: launch+loop={us_b - us_a / 2:.2f} (vs half-A "
          f"{us_a / 2:.2f}/stage), traces={us_c - us_b:.2f}, "
          f"2nd-launch={us_d - us_c:.2f}, glue={us_e - us_d:.2f}")


if __name__ == "__main__":
    main()
