"""Element-blocked fused Pallas path (ops/sw2d_blocked.py): the large-mesh
kernel. Verified in interpret mode (CPU) against the XLA reference path
(ops.sw2d.sw2d_rhs + timestepping.ssprk2_step) in f64 — same flux math, so
agreement is to roundoff."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blitzdg_tpu.mesh import box_triangles
from blitzdg_tpu.mesh.gmsh import read_gmsh
from blitzdg_tpu.ops.sw2d import SWPhysics, SWState, sw2d_rhs, apply_filter
from blitzdg_tpu.ops.sw2d_blocked import (
    build_blocked_step_ops,
    pack_state,
    sw2d_rollout_blocked,
    sw2d_step_blocked,
    unpack_state,
)
from blitzdg_tpu.specgrid.triangle import build_triangle_context
from blitzdg_tpu.timestepping import ssprk2_step


def _xla_step(ctx, state, phys, dt, use_filter=True):
    rhs = lambda s, t: sw2d_rhs(ctx, s, t, phys)
    if use_filter:
        rhs_f = lambda s, t: SWState(*(apply_filter(ctx, f)
                                       for f in rhs(s, t)))
    else:
        rhs_f = rhs
    return ssprk2_step(rhs_f, state, 0.0, dt)


def _initial(ctx, moving=True):
    h = 10.0 + jnp.exp(-10.0 * (ctx.x**2 + ctx.y**2))
    hu = 0.2 * h if moving else jnp.zeros_like(h)
    hv = -0.1 * h if moving else jnp.zeros_like(h)
    return SWState(h=h, hu=hu, hv=hv)


@pytest.mark.parametrize("cells,n_order", [((4, 4), 1), ((3, 5), 3)])
def test_blocked_step_matches_xla(cells, n_order):
    """One fused SSP-RK2 step == the XLA path to f64 roundoff, with
    nonzero momentum so the wall reflection is exercised."""
    ctx = build_triangle_context(n_order, box_triangles(*cells))
    phys = SWPhysics(g=9.81)
    ops, meta = build_blocked_step_ops(ctx, phys, dtype=jnp.float64)

    state = _initial(ctx)
    dt = 1e-3
    ref = _xla_step(ctx, state, phys, dt)

    packed = [pack_state(meta, f[None]) for f in state]
    out = sw2d_step_blocked(ops, meta, *packed, None, dt, interpret=True)
    for got, want in zip(out, ref):
        np.testing.assert_allclose(
            np.asarray(unpack_state(meta, got)[0]), np.asarray(want),
            atol=1e-12)


@pytest.mark.parametrize("cells,n_order", [((4, 4), 1), ((3, 5), 3)])
def test_blocked_step_rolls_v2_matches_xla(cells, n_order):
    """The 'rolls_v2' trace path (flip-baked EM2 rows + field-stacked
    combo loop — the round-5 VPU-census experiment, kept as A/B evidence)
    must agree with the XLA path to f64 roundoff too."""
    ctx = build_triangle_context(n_order, box_triangles(*cells))
    phys = SWPhysics(g=9.81)
    ops, meta = build_blocked_step_ops(ctx, phys, dtype=jnp.float64,
                                       trace_mode="rolls_v2")
    assert meta.trace_mode == "rolls_v2"

    state = _initial(ctx)
    dt = 1e-3
    ref = _xla_step(ctx, state, phys, dt)

    packed = [pack_state(meta, f[None]) for f in state]
    out = sw2d_step_blocked(ops, meta, *packed, None, dt, interpret=True)
    for got, want in zip(out, ref):
        np.testing.assert_allclose(
            np.asarray(unpack_state(meta, got)[0]), np.asarray(want),
            atol=1e-12)


def test_blocked_step_unstructured_rcm():
    """box.msh (K=1046, unstructured) after RCM reordering: the roll-combo
    trace exchange must stay exact on an arbitrary conforming mesh."""
    from blitzdg_tpu.parallel.partition import rcm_order

    mesh, _ = rcm_order(read_gmsh("/root/reference/input/box.msh"))
    ctx = build_triangle_context(1, mesh)
    phys = SWPhysics(g=9.81)
    ops, meta = build_blocked_step_ops(ctx, phys, dtype=jnp.float64,
                                       trace_mode="rolls")
    assert meta.trace_mode == "rolls"
    # RCM bounds the lane bandwidth to ~sqrt(K); sublane packing splits
    # each base combo into <=2 (group, lane) combos, so the bound doubles
    assert 0 < len(meta.combos) < 1300

    state = _initial(ctx)
    ref = sw2d_rhs(ctx, state, 0.0, phys)
    # step with dt=0 filter-off isolates nothing; compare one full step
    dt = 1e-4
    want = _xla_step(ctx, state, phys, dt)
    packed = [pack_state(meta, f[None]) for f in state]
    out = sw2d_step_blocked(ops, meta, *packed, None, dt, interpret=True)
    for got, w in zip(out, want):
        np.testing.assert_allclose(
            np.asarray(unpack_state(meta, got)[0]), np.asarray(w),
            atol=1e-12)


def test_blocked_rollout_matches_xla_steps():
    """Multi-step fused rollout (state resident in VMEM scratch) == repeated
    XLA steps; batch of 2 scenarios; trajectory storage on."""
    ctx = build_triangle_context(2, box_triangles(4, 4))
    phys = SWPhysics(g=9.81)
    ops, meta = build_blocked_step_ops(ctx, phys, dtype=jnp.float64)

    s0 = _initial(ctx)
    s1 = SWState(h=s0.h + 0.05, hu=s0.hu * 0.5, hv=s0.hv)
    dt, n_steps = 5e-4, 4

    packed = [
        pack_state(meta, jnp.stack([a, b]))
        for a, b in zip(s0, s1)
    ]
    th, thu, thv, fh, fhu, fhv = sw2d_rollout_blocked(
        ops, meta, *packed, None, dt, n_steps=n_steps, store_traj=True,
        interpret=True)

    for b, st in enumerate((s0, s1)):
        cur = st
        for t in range(n_steps + 1):
            for name, traj, f in (("h", th, fh), ("hu", thu, fhu),
                                  ("hv", thv, fhv)):
                got = unpack_state(meta, traj[b, t][None])[0]
                want = getattr(cur, name)
                np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                           atol=1e-12, err_msg=f"{name} t={t}")
            if t < n_steps:
                cur = _xla_step(ctx, cur, phys, dt)
        # final-state outputs match the last trajectory entry
        for traj, f in ((th, fh), (thu, fhu), (thv, fhv)):
            np.testing.assert_allclose(np.asarray(f[b]),
                                       np.asarray(traj[b, -1]), atol=0)


def test_blocked_rollout_control_forcing():
    """Linear control forcing (SMEM scalars) matches the XLA path with the
    same per-control-step injection."""
    ctx = build_triangle_context(1, box_triangles(4, 4))
    phys = SWPhysics(g=9.81)
    bump = np.exp(-8.0 * (np.asarray(ctx.x) ** 2 + np.asarray(ctx.y) ** 2))
    bu = np.stack([bump, 0.0 * bump])
    bv = np.stack([0.0 * bump, bump])
    ops, meta = build_blocked_step_ops(ctx, phys, bu, bv, dtype=jnp.float64)

    state = _initial(ctx, moving=False)
    dt, spc = 1e-3, 2
    ctrls = jnp.asarray([[[0.3, -0.2], [0.1, 0.4]]], dtype=jnp.float64)

    def xla_rhs(c):
        def rhs(s, t):
            r = sw2d_rhs(ctx, s, t, phys)
            r = SWState(
                h=r.h,
                hu=r.hu + c[0] * jnp.asarray(bu[0]) + c[1] * jnp.asarray(bu[1]),
                hv=r.hv + c[0] * jnp.asarray(bv[0]) + c[1] * jnp.asarray(bv[1]),
            )
            return SWState(*(apply_filter(ctx, f) for f in r))
        return rhs

    cur = state
    for j in range(ctrls.shape[1]):
        for _ in range(spc):
            cur = ssprk2_step(xla_rhs(ctrls[0, j]), cur, 0.0, dt)

    packed = [pack_state(meta, f[None]) for f in state]
    fh, fhu, fhv = sw2d_rollout_blocked(
        ops, meta, *packed, ctrls, dt, spc=spc, interpret=True)
    for got, want in zip((fh, fhu, fhv), cur):
        np.testing.assert_allclose(
            np.asarray(unpack_state(meta, got)[0]), np.asarray(want),
            atol=1e-12)


def test_blocked_full_coastal_matches_xla():
    """The FULL coastal configuration in the blocked kernel — variable
    bathymetry with hydrostatic-reconstruction well-balancing (precomputed
    H traces), tidal BC_OUT forcing (in-kernel cos(omega t) with ramp),
    quadratic drag, Coriolis, sponge relaxation — against the XLA path
    (sw2d_rhs + sponge_relax) over 3 SSP-RK2 steps, f64 interpret mode."""
    from blitzdg_tpu.context import BC_OUT
    from blitzdg_tpu.ops.sw2d import sponge_relax
    from blitzdg_tpu.utils import build_sponge_coefficient

    mesh = box_triangles(4, 4, xlim=(0.0, 1.0), ylim=(0.0, 1.0))
    # tag the east boundary open (tidal)
    bc = np.asarray(mesh.bc_type).copy()
    mids = mesh.verts[mesh.etov].mean(axis=1)
    for k in range(mesh.num_elements):
        for f in range(3):
            a, b = mesh.etov[k, f], mesh.etov[k, (f + 1) % 3]
            mx = 0.5 * (mesh.verts[a, 0] + mesh.verts[b, 0])
            if bc[k, f] > 0 and abs(mx - 1.0) < 1e-12:
                bc[k, f] = BC_OUT
    mesh.set_bc_type(bc)
    ctx = build_triangle_context(2, mesh)

    # sloping discontinuous-ish bathymetry + sponge near the open boundary
    H = 10.0 + 5.0 * ctx.x + 2.0 * jnp.sin(3.0 * ctx.y)
    Hx = 5.0 * jnp.ones_like(H)
    Hy = 6.0 * jnp.cos(3.0 * ctx.y)
    ob_mask = np.asarray(ctx.bc_table)[:, :, None].repeat(
        ctx.n_fp, 2).reshape(ctx.k_elem, -1) == BC_OUT
    sponge = build_sponge_coefficient(ctx, ob_mask, width=0.3, strength=0.5)
    phys = SWPhysics(g=9.81, cd=2.5e-3, f_cor=1e-4, H=H, Hx=Hx, Hy=Hy,
                     sponge=sponge)

    h0_tide, amp, omega, ramp_tau = 12.0, 0.5, 2.0, 10.0

    def tidal_forcing(t):
        return h0_tide + amp * jnp.cos(omega * t) * jnp.minimum(
            t / ramp_tau, 1.0)

    # initial state: at rest + a bump (so drag/Coriolis/walls all fire)
    h = H + 0.3 * jnp.exp(-20.0 * ((ctx.x - 0.5) ** 2 + (ctx.y - 0.5) ** 2))
    state = SWState(h=h, hu=0.1 * h, hv=-0.05 * h)

    dt, n_steps, t0 = 2e-3, 3, 1.0
    rhs = lambda s, t: sw2d_rhs(ctx, s, t, phys, tidal_forcing=tidal_forcing)
    post = lambda f: apply_filter(ctx, f)
    cur, t = state, t0
    for _ in range(n_steps):
        cur = ssprk2_step(rhs, cur, t, dt, post_stage=post)
        cur = sponge_relax(cur, phys, dt)
        t += dt

    ops, meta = build_blocked_step_ops(
        ctx, phys, dtype=jnp.float64,
        tidal=(h0_tide, amp, omega, ramp_tau))
    assert meta.wb and meta.has_bathy and meta.has_sponge
    packed = [pack_state(meta, f[None]) for f in state]
    out = sw2d_rollout_blocked(ops, meta, *packed, None, dt,
                               n_steps=n_steps, t0=t0, interpret=True)
    for got, want in zip(out, cur):
        np.testing.assert_allclose(
            np.asarray(unpack_state(meta, got)[0]), np.asarray(want),
            atol=1e-12)


def test_blocked_lake_at_rest_well_balanced():
    """Machine-zero RHS at a lake at rest over a steep LINEAR shelf — the
    well-balancing property must survive the blocked-kernel formulation.
    (Linear H: at order N>=2 the hydrostatic pressure g/2 h^2 is exactly
    representable, so the flux divergence cancels the bed-slope source
    discretely; the same restriction applies to the XLA path.)"""
    ctx = build_triangle_context(2, box_triangles(3, 3))
    H = 10.0 + 4.0 * ctx.x + 2.0 * ctx.y
    Hx = 4.0 * jnp.ones_like(H)
    Hy = 2.0 * jnp.ones_like(H)
    phys = SWPhysics(g=9.81, H=H, Hx=Hx, Hy=Hy)
    ops, meta = build_blocked_step_ops(ctx, phys, dtype=jnp.float64)

    state = SWState(h=H, hu=jnp.zeros_like(H), hv=jnp.zeros_like(H))
    packed = [pack_state(meta, f[None]) for f in state]
    dt = 1e-3
    out = sw2d_step_blocked(ops, meta, *packed, None, dt, interpret=True)
    # after one step the state is unchanged to machine precision
    for got, want in zip(out, state):
        diff = np.abs(np.asarray(unpack_state(meta, got)[0])
                      - np.asarray(want)).max()
        assert diff < 1e-11, diff


def test_blocked_rollout_adjoint_matches_xla_grad():
    """Gradients through the fused blocked rollout (jax.vjp-in-kernel
    backward pass) == jax.grad through the XLA scan rollout, for a cost
    mixing stage and terminal terms, w.r.t. BOTH the initial state and the
    control sequence. f64 interpret mode."""
    from blitzdg_tpu.ops.sw2d_blocked import make_rollout_blocked

    ctx = build_triangle_context(1, box_triangles(4, 4))
    phys = SWPhysics(g=9.81)
    bump = np.exp(-8.0 * (np.asarray(ctx.x) ** 2 + np.asarray(ctx.y) ** 2))
    bu = np.stack([bump, 0.0 * bump])
    bv = np.stack([0.0 * bump, bump])
    ops, meta = build_blocked_step_ops(ctx, phys, bu, bv, dtype=jnp.float64)

    dt, spc, n_ctrl_steps = 1e-3, 2, 2
    n_steps = spc * n_ctrl_steps
    state = _initial(ctx)
    ctrls = jnp.asarray([[[0.3, -0.2], [0.1, 0.4]]], dtype=jnp.float64)
    target = jnp.asarray(10.0 + 0.01 * bump)

    # ---- XLA reference loss ----
    def xla_rhs(c):
        def rhs(s, t):
            r = sw2d_rhs(ctx, s, t, phys)
            r = SWState(
                h=r.h,
                hu=r.hu + c[0] * jnp.asarray(bu[0]) + c[1] * jnp.asarray(bu[1]),
                hv=r.hv + c[0] * jnp.asarray(bv[0]) + c[1] * jnp.asarray(bv[1]),
            )
            return SWState(*(apply_filter(ctx, f) for f in r))
        return rhs

    def xla_loss(h0, hu0, hv0, cs):
        s = SWState(h=h0, hu=hu0, hv=hv0)
        cost = 0.0
        for t in range(n_steps):
            cost = cost + 1e-3 * jnp.sum((s.h - target) ** 2)  # stage cost
            s = ssprk2_step(xla_rhs(cs[0, t // spc]), s, 0.0, dt)
        return cost + jnp.sum((s.h - target) ** 2) + jnp.sum(s.hu**2)

    ref_val, ref_grads = jax.value_and_grad(xla_loss, argnums=(0, 1, 2, 3))(
        state.h, state.hu, state.hv, ctrls)

    # ---- blocked loss through the custom-VJP rollout ----
    rollout = make_rollout_blocked(ops, meta, dt, spc, interpret=True)
    tgt_p = pack_state(meta, target[None])

    def blk_loss(h0, hu0, hv0, cs):
        packed = [pack_state(meta, f[None]) for f in (h0, hu0, hv0)]
        th, thu, thv = rollout(*packed, cs)
        cost = 0.0
        for t in range(n_steps):
            cost = cost + 1e-3 * jnp.sum((th[:, t] - tgt_p) ** 2)
        return (cost + jnp.sum((th[:, -1] - tgt_p) ** 2)
                + jnp.sum(thu[:, -1] ** 2))

    val, grads = jax.value_and_grad(blk_loss, argnums=(0, 1, 2, 3))(
        state.h, state.hu, state.hv, ctrls)

    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-12)
    for g, gr, name in zip(grads, ref_grads, ("h0", "hu0", "hv0", "ctrls")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(gr), atol=1e-10,
            err_msg=f"grad mismatch: {name}")


def test_blocked_onehot_trace_mode_unstructured():
    """'onehot' trace-exchange mode (banded one-hot MXU gathers) on the
    RCM-ordered unstructured box.msh: a fused step matches the XLA path to
    f64 roundoff, same as rolls mode — and 'auto' picks it here (613 roll
    combos is past the rolls threshold)."""
    from blitzdg_tpu.parallel.partition import rcm_order

    mesh, _ = rcm_order(read_gmsh("/root/reference/input/box.msh"))
    ctx = build_triangle_context(1, mesh)
    phys = SWPhysics(g=9.81)
    ops, meta = build_blocked_step_ops(ctx, phys, dtype=jnp.float64)
    assert meta.trace_mode == "onehot"  # auto-selected
    assert meta.win <= 512  # RCM keeps the band ~sqrt(K)

    state = _initial(ctx)
    dt = 1e-4
    want = _xla_step(ctx, state, phys, dt)
    packed = [pack_state(meta, f[None]) for f in state]
    out = sw2d_step_blocked(ops, meta, *packed, None, dt, interpret=True)
    for got, w in zip(out, want):
        np.testing.assert_allclose(
            np.asarray(unpack_state(meta, got)[0]), np.asarray(w),
            atol=1e-12)


def test_blocked_onehot_adjoint():
    """jax.vjp-in-kernel adjoint works in onehot mode too (the gathers are
    plain matmuls — nothing needs a custom transpose)."""
    from blitzdg_tpu.ops.sw2d_blocked import make_rollout_blocked

    ctx = build_triangle_context(1, box_triangles(4, 4))
    phys = SWPhysics(g=9.81)
    bump = np.exp(-8.0 * (np.asarray(ctx.x) ** 2 + np.asarray(ctx.y) ** 2))
    ops, meta = build_blocked_step_ops(
        ctx, phys, np.stack([bump]), np.stack([0 * bump]),
        dtype=jnp.float64, trace_mode="onehot")
    assert meta.trace_mode == "onehot"

    dt, spc = 1e-3, 2
    state = _initial(ctx)
    ctrls = jnp.asarray([[[0.25]]], dtype=jnp.float64)  # (1, 1, 1)

    def xla_rhs(c):
        def rhs(s, t):
            r = sw2d_rhs(ctx, s, t, phys)
            r = SWState(h=r.h, hu=r.hu + c[0] * jnp.asarray(bump), hv=r.hv)
            return SWState(*(apply_filter(ctx, f) for f in r))
        return rhs

    def xla_loss(h0, cs):
        s = SWState(h=h0, hu=state.hu, hv=state.hv)
        for _ in range(spc):
            s = ssprk2_step(xla_rhs(cs[0, 0]), s, 0.0, dt)
        return jnp.sum(s.h**2)

    ref_gh, ref_gc = jax.grad(xla_loss, argnums=(0, 1))(state.h, ctrls)

    rollout = make_rollout_blocked(ops, meta, dt, spc, interpret=True)

    def blk_loss(h0, cs):
        packed = [pack_state(meta, f[None])
                  for f in (h0, state.hu, state.hv)]
        th, _, _ = rollout(*packed, cs)
        return jnp.sum(th[:, -1] ** 2)

    gh, gc = jax.grad(blk_loss, argnums=(0, 1))(state.h, ctrls)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(ref_gh), atol=1e-10)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(ref_gc), atol=1e-10)


def test_blocked_step_quads():
    """The blocked kernel is element-shape agnostic: a quad context
    (4 faces, tensor-product nodes) runs through the same roll-combo trace
    exchange and matches the XLA path to f64 roundoff."""
    from blitzdg_tpu.mesh import box_quads
    from blitzdg_tpu.specgrid.quad import build_quad_context

    ctx = build_quad_context(2, box_quads(4, 3))
    phys = SWPhysics(g=9.81)
    ops, meta = build_blocked_step_ops(ctx, phys, dtype=jnp.float64)

    h = 10.0 + jnp.exp(-10.0 * (ctx.x**2 + ctx.y**2))
    state = SWState(h=h, hu=0.2 * h, hv=-0.1 * h)
    dt = 1e-3
    want = _xla_step(ctx, state, phys, dt)
    packed = [pack_state(meta, f[None]) for f in state]
    out = sw2d_step_blocked(ops, meta, *packed, None, dt, interpret=True)
    for got, w in zip(out, want):
        np.testing.assert_allclose(
            np.asarray(unpack_state(meta, got)[0]), np.asarray(w),
            atol=1e-12)


def test_blocked_wetdry_matches_xla():
    """Wetting/drying IN the blocked kernel (minmod surface reconstruction
    + per-stage positivity limiter + momentum taper) == the XLA wet/dry
    stepper (ops.sw2d_wetdry.ssprk2_step_wetdry) over 5 steps on the
    sloping-beach problem with a genuinely dry region, f64 interpret."""
    from blitzdg_tpu.ops.sw2d_wetdry import ssprk2_step_wetdry

    H_FLOOR = 1e-3
    mesh = box_triangles(6, 6, xlim=(0.0, 1.0), ylim=(0.0, 1.0))
    ctx = build_triangle_context(2, mesh)
    H = 1.0 - 1.5 * ctx.x
    Hx = -1.5 * jnp.ones_like(H)
    Hy = jnp.zeros_like(H)
    phys = SWPhysics(g=9.81, cd=1e-3, H=H, Hx=Hx, Hy=Hy,
                     well_balanced=False)
    h0 = jnp.maximum(H, H_FLOOR)
    state = SWState(h=h0, hu=jnp.zeros_like(h0), hv=jnp.zeros_like(h0))
    dt, n_steps = 2e-4, 5

    cur = state
    for _ in range(n_steps):
        cur = ssprk2_step_wetdry(ctx, cur, 0.0, dt, phys, H_FLOOR)

    ops, meta = build_blocked_step_ops(ctx, phys, dtype=jnp.float64,
                                       wetdry=True, h_floor=H_FLOOR)
    assert meta.wetdry and meta.has_bathy and not meta.wb
    packed = [pack_state(meta, f[None]) for f in state]
    out = sw2d_rollout_blocked(ops, meta, *packed, None, dt,
                               n_steps=n_steps, interpret=True)
    for got, want in zip(out, cur):
        np.testing.assert_allclose(
            np.asarray(unpack_state(meta, got)[0]), np.asarray(want),
            atol=1e-12)


def test_blocked_precision_high_bf16_3x():
    """The 'high' speed path (manual bf16_3x dots, ops/_mxu.py — Mosaic has
    no HIGH lowering) tracks the 'highest' full-f32 path to ~1e-3 absolute
    over a multi-step f32 rollout, and is exactly the 'highest' path when
    operands are f64 (interpret-mode parity fallback)."""
    ctx = build_triangle_context(2, box_triangles(4, 4),
                                 dtype=jnp.float32)
    phys = SWPhysics(g=9.81)
    state = _initial(ctx)
    dt, n_steps = 5e-4, 8

    outs = {}
    for prec in ("highest", "high"):
        ops, meta = build_blocked_step_ops(ctx, phys, dtype=jnp.float32,
                                           precision=prec)
        packed = [pack_state(meta, f[None].astype(jnp.float32))
                  for f in state]
        out = sw2d_rollout_blocked(ops, meta, *packed, None, dt,
                                   n_steps=n_steps, interpret=True)
        outs[prec] = np.asarray(unpack_state(meta, out[0])[0])
    err = np.abs(outs["high"] - outs["highest"]).max()
    assert err < 2e-3, err
    assert err > 0.0  # the bf16_3x path must actually engage for f32

    # f64 operands: 'high' falls back to the exact path
    from blitzdg_tpu.ops._mxu import precision_dot

    a = jnp.asarray(np.random.default_rng(0).normal(size=(8, 8)))
    b = jnp.asarray(np.random.default_rng(1).normal(size=(8, 8)))
    np.testing.assert_array_equal(np.asarray(precision_dot(a, b, "high")),
                                  np.asarray(precision_dot(a, b, "highest")))
