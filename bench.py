#!/usr/bin/env python
"""Headline benchmark: sw2d MPC solves/s per chip (north-star metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

One "MPC solve" = a full shooting optimization (Adam, fixed iterations) of a
control sequence over the shallow-water DG dynamics on the reference
coarse_box workload (N=1, K=40 triangles — src/sw2d/main.cpp:56-66), batched
over independent scenarios on one chip.

The reference publishes no numbers (BASELINE.md) and has no MPC layer, so
the baseline is a single-threaded numpy model of the same solve: the
measured cost of one numpy forward rollout times the rollouts an adjoint
gradient method needs (iters * (1 forward + ~2x-forward adjoint)). This is
charitable to the CPU (assumes a perfect hand-written adjoint).
"""
import json
import os
import time

import numpy as np

HORIZON = 8  # control steps
STEPS_PER_CONTROL = 4  # SSP-RK2 steps per control step
ITERS = 20  # Adam iterations per MPC solve
BATCH = 512  # scenarios per chip
DT = 2e-3


def numpy_forward_rollout_time(ctx, reps=3):
    """Single-threaded numpy SSP-RK2 sw2d rollout (the CPU reference model).
    Mirrors the reference computeRHS data flow (gathers + flux algebra +
    BLAS GEMMs) in plain numpy, f64, one scenario."""
    K, n_p = ctx.k_elem, ctx.n_p
    n_tr = ctx.n_faces * ctx.n_fp
    Dr, Ds = np.asarray(ctx.Dr), np.asarray(ctx.Ds)
    lift = np.asarray(ctx.lift)
    rx, sx = np.asarray(ctx.rx), np.asarray(ctx.sx)
    ry, sy = np.asarray(ctx.ry), np.asarray(ctx.sy)
    nx, ny = np.asarray(ctx.nx).reshape(-1), np.asarray(ctx.ny).reshape(-1)
    fscale = np.asarray(ctx.fscale)
    filt = np.asarray(ctx.filter)
    vmapM = np.asarray(ctx.vmapM).reshape(-1)
    vmapP = np.asarray(ctx.vmapP).reshape(-1)
    wall = np.asarray(ctx.mapB)[np.asarray(ctx.maskB)]
    g = 9.81

    x = np.asarray(ctx.x)
    h = 10.0 + np.exp(-10.0 * (x**2))
    hu = np.zeros_like(h)
    hv = np.zeros_like(h)

    def rhs(h, hu, hv):
        out = []
        hf, huf, hvf = h.reshape(-1), hu.reshape(-1), hv.reshape(-1)
        hM, hP = hf[vmapM], hf[vmapP].copy()
        huM, huP = huf[vmapM], huf[vmapP].copy()
        hvM, hvP = hvf[vmapM], hvf[vmapP].copy()
        un2 = 2.0 * (huM[wall] * nx[wall] + hvM[wall] * ny[wall])
        huP[wall] = huM[wall] - un2 * nx[wall]
        hvP[wall] = hvM[wall] - un2 * ny[wall]
        dh, dhu, dhv = hM - hP, huM - huP, hvM - hvP

        def flux(hh, hhu, hhv):
            inv = 1.0 / hh
            return (hhu, hhu * hhu * inv + 0.5 * g * hh * hh, hhu * hhv * inv,
                    hhv, hhu * hhv * inv, hhv * hhv * inv + 0.5 * g * hh * hh)

        F1M, F2M, F3M, G1M, G2M, G3M = flux(hM, huM, hvM)
        F1P, F2P, F3P, G1P, G2P, G3P = flux(hP, huP, hvP)
        spdM = np.sqrt((huM / hM) ** 2 + (hvM / hM) ** 2) + np.sqrt(g * hM)
        spdP = np.sqrt((huP / hP) ** 2 + (hvP / hP) ** 2) + np.sqrt(g * hP)
        lam = np.maximum(spdM, spdP).reshape(-1, ctx.n_fp).max(axis=1, keepdims=True)
        lam = np.broadcast_to(lam, (lam.shape[0], ctx.n_fp)).reshape(-1)
        d1 = 0.5 * ((F1M - F1P) * nx + (G1M - G1P) * ny - lam * dh)
        d2 = 0.5 * ((F2M - F2P) * nx + (G2M - G2P) * ny - lam * dhu)
        d3 = 0.5 * ((F3M - F3P) * nx + (G3M - G3P) * ny - lam * dhv)
        F1, F2, F3, G1, G2, G3 = flux(h, hu, hv)
        div = lambda F, G: (rx * (F @ Dr.T) + sx * (F @ Ds.T)
                            + ry * (G @ Dr.T) + sy * (G @ Ds.T))
        surf = lambda d: (fscale * d.reshape(K, n_tr)) @ lift.T
        out.append(-div(F1, G1) + surf(d1))
        out.append(-div(F2, G2) + surf(d2))
        out.append(-div(F3, G3) + surf(d3))
        return [o @ filt.T for o in out]

    n_steps = HORIZON * STEPS_PER_CONTROL

    def one_rollout():
        t0 = time.perf_counter()
        hh, huu, hvv = h.copy(), hu.copy(), hv.copy()
        for _ in range(n_steps):
            r1, r2, r3 = rhs(hh, huu, hvv)
            h1, hu1, hv1 = hh + 0.5 * DT * r1, huu + 0.5 * DT * r2, hvv + 0.5 * DT * r3
            r1, r2, r3 = rhs(h1, hu1, hv1)
            hh, huu, hvv = hh + DT * r1, huu + DT * r2, hvv + DT * r3
        return time.perf_counter() - t0

    one_rollout()  # warm caches
    # best-of-N: the baseline is a lower bound on the CPU cost, so take the
    # minimum — the mean is noisy on a shared host and was swinging the
    # reported vs_baseline by ~2x between runs
    return min(one_rollout() for _ in range(max(reps, 5)))


def main():
    import jax
    import jax.numpy as jnp

    import numpy as _np

    from blitzdg_tpu.mesh import box_triangles, read_gmsh
    from blitzdg_tpu.mpc import MPCProblem, build_pallas_mpc, solve_mpc_pallas
    from blitzdg_tpu.ops.sw2d import SWPhysics, SWState
    from blitzdg_tpu.specgrid.triangle import build_triangle_context

    ref = "/root/reference/input/coarse_box.msh"
    mesh = read_gmsh(ref) if os.path.exists(ref) else box_triangles(4, 5)
    N = 1

    ctx = build_triangle_context(N, mesh, filter_cutoff=0.9 * N, filter_order=N,
                                 dtype=jnp.float32)
    ctx_host = build_triangle_context(N, mesh, filter_cutoff=0.9 * N,
                                      filter_order=N, dtype=None)
    phys = SWPhysics(g=9.81)
    from blitzdg_tpu.ops.sw2d_dense import build_dense_trace_ops

    prob = MPCProblem(ctx=ctx, phys=phys, dt=DT, horizon=HORIZON,
                      steps_per_control=STEPS_PER_CONTROL,
                      q_eta=0.0, q_terminal=1.0, r_control=1e-10,
                      dense_ops=build_dense_trace_ops(ctx))

    # Gaussian momentum-source forcing, linear in the 2 controls —
    # the fused Pallas MPC path (kernelized rollout + hand-written adjoint)
    bump = _np.exp(-8.0 * (_np.asarray(ctx.x) ** 2 + _np.asarray(ctx.y) ** 2))
    pm = build_pallas_mpc(prob, _np.stack([bump, 0 * bump]),
                          _np.stack([0 * bump, bump]), tile_b=128)

    # scenario batch: shifted target bumps
    h0 = jnp.full((ctx.k_elem, ctx.n_p), 10.0, dtype=jnp.float32)
    state0 = SWState(h=h0, hu=jnp.zeros_like(h0), hv=jnp.zeros_like(h0))
    states = jax.tree.map(lambda a: jnp.broadcast_to(a, (BATCH,) + a.shape), state0)
    offs = jnp.linspace(-0.3, 0.3, BATCH, dtype=jnp.float32)
    targets = jax.vmap(
        lambda o: 1e-3 * jnp.exp(-5.0 * ((ctx.x - o) ** 2 + ctx.y**2))
    )(offs).astype(jnp.float32)

    solve = jax.jit(
        lambda s, tg: solve_mpc_pallas(prob, pm, s, tg, 2, iters=ITERS,
                                       learning_rate=0.05).cost
    )
    solve(states, targets).block_until_ready()  # compile
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = solve(states, targets)
    out.block_until_ready()
    tpu_time = (time.perf_counter() - t0) / reps
    tpu_solves_per_s = BATCH / tpu_time

    # CPU baseline: iters * (forward + adjoint ~ 2x forward) rollouts
    fwd = numpy_forward_rollout_time(ctx_host)
    cpu_solve_time = ITERS * 3.0 * fwd
    cpu_solves_per_s = 1.0 / cpu_solve_time

    # ---- north-star sub-metric: DG rollouts/s at scale (K=2048, N=3) ----
    # One "DG rollout" = HORIZON*STEPS_PER_CONTROL SSP-RK2 steps of the
    # shallow-water system on a 2048-triangle mesh at order 3, via the
    # element-blocked fused Pallas kernel (ops/sw2d_blocked.py). Baseline:
    # the same numpy single-thread rollout model at the same shape.
    from blitzdg_tpu.ops.sw2d_blocked import (
        build_blocked_step_ops,
        pack_state,
        sw2d_rollout_blocked,
    )

    N2, B2 = 3, 8
    n_steps = HORIZON * STEPS_PER_CONTROL
    mesh2 = box_triangles(32, 32)
    ctx2 = build_triangle_context(N2, mesh2, filter_cutoff=0.9 * N2,
                                  filter_order=4, dtype=jnp.float32)
    ops2, meta2 = build_blocked_step_ops(ctx2, phys, dtype=jnp.float32)
    h2 = 10.0 + jnp.exp(-10.0 * (ctx2.x**2 + ctx2.y**2))
    packed = [
        pack_state(meta2, jnp.broadcast_to(f, (B2,) + f.shape))
        for f in (h2, jnp.zeros_like(h2), jnp.zeros_like(h2))
    ]

    def roll():
        return sw2d_rollout_blocked(ops2, meta2, *packed, None, DT,
                                    n_steps=n_steps)

    jax.block_until_ready(roll())  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out2 = roll()
    jax.block_until_ready(out2)
    tpu_rollouts_per_s = B2 * reps / (time.perf_counter() - t0)

    ctx2_host = build_triangle_context(N2, mesh2, filter_cutoff=0.9 * N2,
                                       filter_order=4, dtype=None)
    cpu_rollout_time = numpy_forward_rollout_time(ctx2_host, reps=3)
    rollouts_vs_baseline = tpu_rollouts_per_s * cpu_rollout_time

    print(
        json.dumps(
            {
                "metric": "sw2d_mpc_solves_per_s_per_chip",
                "value": round(tpu_solves_per_s, 2),
                "unit": "solves/s",
                "vs_baseline": round(tpu_solves_per_s / cpu_solves_per_s, 2),
                "extra": {
                    "dg_rollouts_per_s_K2048_N3": round(tpu_rollouts_per_s, 2),
                    "dg_rollouts_vs_baseline": round(rollouts_vs_baseline, 2),
                    "dg_step_us_K2048_N3": round(
                        1e6 / (tpu_rollouts_per_s * n_steps), 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
