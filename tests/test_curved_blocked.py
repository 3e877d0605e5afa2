"""Curved blocked Pallas kernel (ops/sw2d_curved_blocked.py) vs the XLA
weak-form path (ops.sw2d_curved.sw2d_curved_rhs + ssprk2_step) in f64
interpret mode — same math, agreement to roundoff. Covers both mass
modes: 'affine' (straight box mesh) and 'general' (Gordon-Hall deformed
disk: per-element MMinv)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blitzdg_tpu.mesh import box_triangles, disk_triangles
from blitzdg_tpu.mesh.curved import (circle_projection, gordon_hall_deform,
                                     snap_boundary_vertices)
from blitzdg_tpu.ops.sw2d import SWPhysics
from blitzdg_tpu.ops.sw2d_curved import SWStateTracer, sw2d_curved_rhs
from blitzdg_tpu.ops.sw2d_curved_blocked import (
    build_curved_blocked_ops,
    make_curved_rollout_blocked,
    pack_curved,
    sw2d_curved_rollout_blocked,
    sw2d_curved_step_blocked,
    unpack_curved,
)
from blitzdg_tpu.specgrid.cubature import (build_cubature_context,
                                           build_gauss_face_context)
from blitzdg_tpu.specgrid.triangle import build_triangle_context
from blitzdg_tpu.timestepping import ssprk2_step


def _curved_disk(NC=2):
    mesh = disk_triangles(2, radius=1.0)
    proj = circle_projection(0.0, 0.0, 1.0)
    cf = snap_boundary_vertices(mesh, proj, tol=0.3)
    c0 = build_triangle_context(NC, mesh, dtype=None)
    x2, y2, _ = gordon_hall_deform(NC, mesh, c0.x, c0.y, cf, proj)
    ctx = build_triangle_context(NC, mesh, coords=(x2, y2),
                                 filter_cutoff=0.9 * NC, filter_order=4)
    cub = build_cubature_context(NC, mesh, x2, y2, c0.V)
    gauss = build_gauss_face_context(NC, mesh, x2, y2, c0.V)
    return ctx, cub, gauss


def _straight_box(NC=2):
    mesh = box_triangles(3, 4)
    ctx = build_triangle_context(NC, mesh, filter_cutoff=0.9 * NC,
                                 filter_order=4)
    x, y = np.asarray(ctx.x), np.asarray(ctx.y)
    V = np.asarray(ctx.V)
    cub = build_cubature_context(NC, mesh, x, y, V)
    gauss = build_gauss_face_context(NC, mesh, x, y, V)
    return ctx, cub, gauss


def _ref_steps(ctx, cub, gauss, state, phys, dt, nstep, use_filter,
               forcing=None, controls=None):
    post = (lambda f: f @ ctx.filter.T) if use_filter else None
    out, t = state, 0.0
    for i in range(nstep):
        c = None if controls is None else controls[i]

        def rhs(s, tt):
            r = sw2d_curved_rhs(ctx, cub, gauss, s, tt, phys)
            if forcing is not None and c is not None:
                fh, fhu, fhv = forcing(c)
                r = r._replace(hu=r.hu + fhu, hv=r.hv + fhv)
            return r

        out = ssprk2_step(rhs, out, t, dt, post_stage=post)
        t += dt
    return out


def _initial(ctx, scale=1.0):
    eta = 0.05 * jnp.exp(-4.0 * (ctx.x ** 2 + ctx.y ** 2))
    return SWStateTracer(h=scale + eta, hu=0.02 * eta, hv=-0.01 * eta,
                         hN=0.5 + 0.3 * eta)


@pytest.mark.parametrize("geom,mass_mode", [
    ("box", "affine"), ("disk", "general")])
@pytest.mark.parametrize("use_filter", [True, False])
def test_curved_blocked_step_matches_xla(geom, mass_mode, use_filter):
    ctx, cub, gauss = _straight_box() if geom == "box" else _curved_disk()
    phys = SWPhysics(g=9.81, cd=2e-3, f_cor=1e-4)
    ops, meta = build_curved_blocked_ops(
        ctx, cub, gauss, phys, dtype=jnp.float64, mass_mode=mass_mode,
        use_filter=use_filter)
    assert meta.mass_mode == mass_mode

    state = _initial(ctx)
    dt = 2e-4
    NSTEP = 3
    ref = _ref_steps(ctx, cub, gauss, state, phys, dt, NSTEP, use_filter)

    pk = [pack_curved(meta, f[None]) for f in state]
    out = pk
    for _ in range(NSTEP):
        out = sw2d_curved_step_blocked(ops, meta, *out, None, dt,
                                       use_filter=use_filter,
                                       interpret=True)
    for got, want in zip(out, ref):
        np.testing.assert_allclose(
            np.asarray(unpack_curved(meta, got)[0]), np.asarray(want),
            atol=1e-12)


def test_curved_blocked_rollout_and_adjoint():
    """Fused rollout (store_traj) equals step-by-step, and jax.grad of a
    terminal cost through the in-kernel adjoint matches the XLA-path
    gradient w.r.t. the control sequence (the curved-MPC contract)."""
    ctx, cub, gauss = _curved_disk()
    phys = SWPhysics(g=9.81)
    bump = np.asarray(jnp.exp(-8.0 * (ctx.x ** 2 + ctx.y ** 2)))
    bu = np.stack([bump, 0 * bump])
    bv = np.stack([0 * bump, bump])
    ops, meta = build_curved_blocked_ops(
        ctx, cub, gauss, phys, forcing_bu=bu, forcing_bv=bv,
        dtype=jnp.float64, use_filter=True)
    assert meta.mass_mode == "general"

    state = _initial(ctx)
    dt, H, SPC = 2e-4, 3, 2
    ctrls = jnp.asarray(
        np.random.default_rng(0).normal(size=(H, 2)) * 0.05)
    rollout = make_curved_rollout_blocked(ops, meta, dt, SPC,
                                          use_filter=True, interpret=True)
    pk = [pack_curved(meta, f[None]) for f in state]

    # forward parity vs the XLA reference over the full horizon,
    # with per-control-block forcing
    forcing = lambda c: (None, c[0] * jnp.asarray(bump),
                         c[1] * jnp.asarray(bump))
    ctrl_steps = jnp.repeat(ctrls, SPC, axis=0)
    ref = _ref_steps(ctx, cub, gauss, state, phys, dt, H * SPC, True,
                     forcing=forcing, controls=ctrl_steps)
    traj = rollout(*pk, ctrls[None])
    for got, want in zip(traj, ref):
        np.testing.assert_allclose(
            np.asarray(unpack_curved(meta, got[:, -1])[0]),
            np.asarray(want), atol=1e-12)

    # adjoint parity: terminal h-tracking cost gradient w.r.t. controls
    tgt = 1e-3 * jnp.exp(-5.0 * (ctx.x ** 2 + ctx.y ** 2))
    tp = pack_curved(meta, tgt[None])
    vm = ops.vmask

    def cost_blocked(c):
        th, *_ = rollout(*pk, c[None])
        err = (th[:, -1] - 1.0) * vm[None] - tp
        return jnp.sum(err * err)

    def cost_xla(c):
        post = lambda f: f @ ctx.filter.T
        out, t = state, 0.0
        for j in range(H):
            for _ in range(SPC):
                def rhs(s, tt, cj=c[j]):
                    r = sw2d_curved_rhs(ctx, cub, gauss, s, tt, phys)
                    return r._replace(hu=r.hu + cj[0] * jnp.asarray(bump),
                                      hv=r.hv + cj[1] * jnp.asarray(bump))
                out = ssprk2_step(rhs, out, t, dt, post_stage=post)
                t += dt
        err = (out.h - 1.0) - tgt
        return jnp.sum(err * err)

    c0, g0 = jax.value_and_grad(cost_xla)(ctrls)
    c1, g1 = jax.value_and_grad(cost_blocked)(ctrls)
    np.testing.assert_allclose(float(c1), float(c0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-9,
                               atol=1e-14)


def test_curved_blocked_mpc_matches_xla_cost_and_optimizes():
    """mpc/curved_blocked.py: the blocked curved-MPC cost equals the XLA
    mpc_cost on the same curved problem (bench semantics: rhs_fn =
    sw2d_curved_rhs, terminal-only, H_rest=1), and the Adam solve reduces
    it, reporting gradient norms."""
    from blitzdg_tpu.mpc import (MPCProblem, build_curved_blocked_mpc,
                                 mpc_cost, mpc_cost_curved_blocked,
                                 solve_mpc_curved_blocked)

    ctx, cub, gauss = _curved_disk()
    phys = SWPhysics(g=9.81)

    def curved_rhs(s, t):
        return sw2d_curved_rhs(ctx, cub, gauss, s, t, phys)

    prob = MPCProblem(ctx=ctx, phys=phys, dt=2e-4, horizon=3,
                      steps_per_control=2, q_eta=0.0, q_terminal=1.0,
                      r_control=1e-10, rhs_fn=curved_rhs)
    bump = np.asarray(jnp.exp(-8.0 * (ctx.x ** 2 + ctx.y ** 2)))
    bu = np.stack([bump, 0 * bump])
    bv = np.stack([0 * bump, bump])
    bm = build_curved_blocked_mpc(prob, cub, gauss, bu, bv,
                                  interpret=True)

    B = 2
    h0 = jnp.ones((ctx.k_elem, ctx.n_p))
    s0 = SWStateTracer(h=h0, hu=0 * h0, hv=0 * h0, hN=0 * h0)
    sB = jax.tree.map(lambda a: jnp.broadcast_to(
        a.astype(jnp.float32), (B,) + a.shape), s0)
    tgt = jnp.stack([1e-3 * jnp.exp(-5.0 * ((ctx.x - o) ** 2 + ctx.y ** 2))
                     for o in (-0.1, 0.2)]).astype(jnp.float32)
    ctrls = jnp.asarray(np.random.default_rng(1).normal(
        size=(B, prob.horizon, 2)) * 0.05, dtype=jnp.float32)

    def forcing(c, control, s, t):
        z = jnp.zeros_like(s.h)
        return z, control[0] * jnp.asarray(bump), \
            control[1] * jnp.asarray(bump)

    ref = jnp.stack([
        mpc_cost(prob, jax.tree.map(lambda a: a[b].astype(jnp.float64), sB),
                 ctrls[b].astype(jnp.float64),
                 tgt[b].astype(jnp.float64), forcing, H_rest=1.0)
        for b in range(B)])
    got = mpc_cost_curved_blocked(prob, bm, sB, ctrls, tgt, H_rest=1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4)

    sol = solve_mpc_curved_blocked(prob, bm, sB, tgt, 2, iters=15,
                                   learning_rate=0.05,
                                   init_controls=ctrls, H_rest=1.0)
    assert np.all(np.isfinite(np.asarray(sol.controls)))
    assert np.all(np.isfinite(np.asarray(sol.grad_norm)))
    assert float(jnp.sum(sol.cost)) < float(jnp.sum(got))


def test_curved_blocked_gn_matches_cost_and_converges():
    """solve_mpc_curved_blocked_gn: residual formulation reproduces
    mpc_cost_curved_blocked, and GN beats equal-rollout Adam on the
    curved shooting problem."""
    from blitzdg_tpu.mpc import (MPCProblem, build_curved_blocked_mpc,
                                 mpc_cost_curved_blocked,
                                 solve_mpc_curved_blocked,
                                 solve_mpc_curved_blocked_gn)
    from blitzdg_tpu.mpc.curved_blocked import _residuals_curved_blocked

    ctx, cub, gauss = _curved_disk()
    phys = SWPhysics(g=9.81)
    prob = MPCProblem(ctx=ctx, phys=phys, dt=2e-4, horizon=3,
                      steps_per_control=2, q_eta=0.1, q_terminal=1.0,
                      r_control=1e-10)
    bump = np.asarray(jnp.exp(-8.0 * (ctx.x ** 2 + ctx.y ** 2)))
    bm = build_curved_blocked_mpc(prob, cub, gauss,
                                  np.stack([bump, 0 * bump]),
                                  np.stack([0 * bump, bump]),
                                  interpret=True)
    B = 2
    h0 = jnp.ones((ctx.k_elem, ctx.n_p), jnp.float32)
    s0 = SWStateTracer(h=h0, hu=0 * h0, hv=0 * h0, hN=0 * h0)
    sB = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), s0)
    tgt = jnp.stack([1e-3 * jnp.exp(-5.0 * ((ctx.x - o) ** 2 + ctx.y ** 2))
                     for o in (-0.1, 0.2)]).astype(jnp.float32)
    ctrls = jnp.asarray(np.random.default_rng(2).normal(
        size=(B, prob.horizon, 2)) * 0.05, dtype=jnp.float32)

    R = _residuals_curved_blocked(prob, bm, sB, tgt, 1.0)
    r = R(ctrls)
    c_ref = mpc_cost_curved_blocked(prob, bm, sB, ctrls, tgt, 1.0)
    np.testing.assert_allclose(np.asarray(jnp.sum(r * r, axis=1)),
                               np.asarray(c_ref), rtol=2e-5)

    GN_ITERS, CG_ITERS = 3, 4
    sol = solve_mpc_curved_blocked_gn(prob, bm, sB, tgt, 2,
                                      gn_iters=GN_ITERS,
                                      cg_iters=CG_ITERS,
                                      init_controls=ctrls, H_rest=1.0)
    assert np.all(np.isfinite(np.asarray(sol.controls)))
    assert float(jnp.sum(sol.cost)) < float(jnp.sum(c_ref))
    adam_iters = GN_ITERS * (2 + CG_ITERS)
    sol_a = solve_mpc_curved_blocked(prob, bm, sB, tgt, 2,
                                     iters=adam_iters, learning_rate=0.05,
                                     init_controls=ctrls, H_rest=1.0)
    assert float(jnp.sum(sol.cost)) < float(jnp.sum(sol_a.cost)), (
        float(jnp.sum(sol.cost)), float(jnp.sum(sol_a.cost)))
