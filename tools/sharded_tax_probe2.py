"""Round-5 follow-up probe: why is the kernel-I/O fused step still ~34us
at B=1 when 2 launches without exchange cost 24us? Variants in ONE
process (same tunnel conditions):

  D. two stage launches/iter, ext zero consts, no lean I/O
  F. the new kernel-I/O fused step (rb in / SB out, one-hot matmuls)
  G. two stage launches with rb/SB I/O but ppermute-free dummy exchange
     (= F at ndev=1 by construction — sanity duplicate)
  H. F but carrying the SB through WITHOUT feeding it back (breaks the
     serial SB->RB dependency to test the pipelining hypothesis)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from blitzdg_tpu.mesh import box_triangles
from blitzdg_tpu.ops.sw2d import SWPhysics
from blitzdg_tpu.ops.sw2d_blocked import sw2d_stage_blocked
from blitzdg_tpu.parallel.blocked_shard import (
    build_sharded_blocked, initial_send_buffer,
    make_sharded_blocked_step_fused, pack_local)
from blitzdg_tpu.specgrid.triangle import build_triangle_context

N_MEAS = 2048


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
    dt = 1.8e-4
    h0 = 10.0 + jnp.exp(-10.0 * (ctx.x ** 2 + ctx.y ** 2))
    st = (h0, jnp.zeros_like(h0), jnp.zeros_like(h0))

    sb = build_sharded_blocked(ctx, phys, 1, dtype=jnp.float32,
                               precision="high")
    m = sb.meta
    pk = tuple(pack_local(m, jnp.asarray(f, jnp.float32)) for f in st)
    o1 = jax.tree.map(lambda a: a[0], sb.ops)
    ext0 = tuple(jnp.zeros((1, m.p, m.NT, m.M), jnp.float32)
                 for _ in range(3))

    # D: two launches, zero-const ext, no lean I/O
    def roll_d(*p):
        def body(c, _):
            s1 = sw2d_stage_blocked(o1, m, c, c, ext0, 0.5 * dt)
            s2 = sw2d_stage_blocked(o1, m, c, tuple(s1), ext0, dt)
            return tuple(s2), None
        out, _ = jax.lax.scan(body, tuple(p), None, length=N_MEAS)
        return out

    print(f"D 2 launches, zero ext:     {timeit(jax.jit(roll_d), *pk):8.2f}",
          flush=True)

    # F: the shipping kernel-I/O fused step (no shard_map needed at n=1
    # for timing purposes — exchange is a zeros_like)
    step = make_sharded_blocked_step_fused(sb, dt)

    def roll_f(*p):
        sb0 = initial_send_buffer(sb, sb.ops, tuple(p))

        def body(c, _):
            return step(sb.ops, c, 0.0), None
        (out, _), _ = jax.lax.scan(body, (tuple(p), sb0), None,
                                   length=N_MEAS)
        return out

    print(f"F kernel-I/O fused step:    {timeit(jax.jit(roll_f), *pk):8.2f}",
          flush=True)

    # H: rb/SB I/O active but rb fed with a CONSTANT (drops the serial
    # SB(i) -> RB(i+1) dependency between consecutive kernels)
    rb0 = jnp.zeros((1, sb.ops.SGEM.shape[1], 3), jnp.float32)

    def roll_h(*p):
        def body(c, _):
            *s1, _sb1 = sw2d_stage_blocked(o1, m, c, c, None, 0.5 * dt,
                                           rb=rb0)
            *s2, _sb2 = sw2d_stage_blocked(o1, m, c, tuple(s1), None, dt,
                                           rb=rb0)
            return tuple(s2), None
        out, _ = jax.lax.scan(body, tuple(p), None, length=N_MEAS)
        return out

    print(f"H rb const, SB dropped:     {timeit(jax.jit(roll_h), *pk):8.2f}",
          flush=True)

    # I: lean I/O with rb input but NO SB output work — measures the
    # in-kernel recv-consume alone (emit side disabled via ext path +
    # manual rb consume is not separable without editing; approximate by
    # ext path + extra dummy in/out of the same sizes is skipped)


if __name__ == "__main__":
    main()
