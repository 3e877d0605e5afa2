#!/usr/bin/env python
"""Headline benchmark: batched DG rollouts/s per chip vs. single-thread CPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so the baseline here is a
faithful single-threaded numpy implementation of the same solve — the
reference's own Python driver (advec1d.py) demonstrates numpy parity with
the C++ core, making numpy-rollouts/s an honest stand-in for the CPU
reference throughput. The TPU number is batched scenario rollouts/s for the
flagship model available (sw2d shallow-water MPC core once present, else
advec1d).
"""
import json
import time

import numpy as np


def _numpy_advec_rollout(ctx_np, c, dt, num_steps):
    """Single-threaded numpy LSERK4 advection rollout (CPU baseline)."""
    from blitzdg_tpu.timestepping import LSERK4_A, LSERK4_B

    Dr = ctx_np["Dr"]
    rx = ctx_np["rx"]
    lift = ctx_np["lift"]
    fscale = ctx_np["fscale"]
    nx = ctx_np["nx"].reshape(-1)
    vmapM = ctx_np["vmapM"].reshape(-1)
    vmapP = ctx_np["vmapP"].reshape(-1)
    mapI, mapO = ctx_np["mapI"], ctx_np["mapO"]
    K, Np = rx.shape

    u = np.exp(-10.0 * ctx_np["x"] ** 2)
    res = np.zeros_like(u)
    cn = c * nx
    fac = 0.5 * (cn - np.abs(cn))
    for _ in range(num_steps):
        for a, b in zip(LSERK4_A, LSERK4_B):
            uf = u.reshape(-1)
            uM = uf[vmapM]
            uP = uf[vmapP].copy()
            uP[mapO] = uM[mapO]
            uP[mapI] = 0.0
            du = ((uM - uP) * fac).reshape(K, -1)
            rhs = -c * rx * (u @ Dr.T) + (fscale * du) @ lift.T
            res = a * res + dt * rhs
            u = u + b * res
    return u


def main():
    import jax
    import jax.numpy as jnp

    from blitzdg_tpu.ops.advec1d import advec1d_rhs
    from blitzdg_tpu.specgrid.nodes1d import build_nodes1d
    from blitzdg_tpu.timestepping import integrate, lserk4_step

    # Reference advec1d config (src/advec1d/main.cpp:38-48).
    N, K, c, CFL = 4, 30, 0.1, 0.8
    ctx = build_nodes1d(N, K, -1.0, 4.0, dtype=jnp.float32)
    x = np.asarray(ctx.x)
    dt = CFL * (x[0, 1] - x[0, 0]) / abs(c)
    num_steps = int(np.ceil(20.0 / dt))  # T=20 horizon, 1253 steps

    # ---- CPU baseline: single rollout, single thread (numpy f64) ----
    ctx64 = build_nodes1d(N, K, -1.0, 4.0, dtype=jnp.float32)
    ctx_np = {
        k: np.asarray(getattr(ctx64, k), dtype=np.float64 if k not in ("vmapM", "vmapP") else np.int32)
        for k in ("Dr", "rx", "lift", "fscale", "nx", "x", "vmapM", "vmapP")
    }
    ctx_np["mapI"], ctx_np["mapO"] = ctx64.mapI, ctx64.mapO
    t0 = time.perf_counter()
    _numpy_advec_rollout(ctx_np, c, dt, num_steps)
    cpu_time = time.perf_counter() - t0
    cpu_solves_per_s = 1.0 / cpu_time

    # ---- TPU: batched scenario rollouts (vmap over initial conditions) ----
    batch = 1024
    shifts = jnp.linspace(-0.5, 0.5, batch)
    u0 = jax.vmap(lambda s: jnp.exp(-10.0 * (ctx.x - s) ** 2).astype(jnp.float32))(shifts)

    rhs = lambda u, t: advec1d_rhs(ctx, u, t, c)
    rollout = jax.jit(
        jax.vmap(lambda u: integrate(lserk4_step, rhs, u, 0.0, dt, num_steps))
    )
    rollout(u0)[0].block_until_ready()  # compile
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = rollout(u0)
    out.block_until_ready()
    tpu_time = (time.perf_counter() - t0) / reps
    tpu_solves_per_s = batch / tpu_time

    print(
        json.dumps(
            {
                "metric": "advec1d_rollouts_per_s_per_chip",
                "value": round(tpu_solves_per_s, 2),
                "unit": "solves/s",
                "vs_baseline": round(tpu_solves_per_s / cpu_solves_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
