"""Pallas fused-kernel tests (interpret mode on CPU).

Parity targets: the XLA dense-trace path (ops/sw2d_dense.py), including
reverse-mode gradients — the backward kernel is a hand-written adjoint and
must match jax.grad of the XLA program to f32 roundoff.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blitzdg_tpu.mesh import box_triangles
from blitzdg_tpu.mpc import (
    MPCProblem,
    build_pallas_mpc,
    mpc_cost,
    mpc_cost_pallas,
    solve_mpc_pallas,
)
from blitzdg_tpu.ops.sw2d import SWPhysics, SWState, apply_filter
from blitzdg_tpu.ops.sw2d_dense import build_dense_trace_ops, sw2d_rhs_dense
from blitzdg_tpu.ops.sw2d_pallas import (
    build_pallas_step_ops,
    make_rollout,
    pad_state,
    sw2d_step_pallas,
    unpad_state,
)
from blitzdg_tpu.specgrid.triangle import build_triangle_context
from blitzdg_tpu.timestepping import ssprk2_step

DT = 2e-3


@pytest.fixture(scope="module")
def setup():
    mesh = box_triangles(3, 3)
    ctx = build_triangle_context(1, mesh, filter_cutoff=0.9, filter_order=1,
                                 dtype=jnp.float32)
    phys = SWPhysics(g=9.81)
    dense = build_dense_trace_ops(ctx)
    bump = np.exp(-8.0 * (np.asarray(ctx.x) ** 2 + np.asarray(ctx.y) ** 2))
    BU = np.stack([bump, 0 * bump])
    BV = np.stack([0 * bump, bump])
    ops, meta = build_pallas_step_ops(ctx, dense, phys, BU, BV)
    return ctx, phys, dense, bump, ops, meta


def random_state(ctx, B, scale=0.1):
    h = 10.0 + scale * jax.random.normal(
        jax.random.PRNGKey(0), (B, ctx.k_elem, ctx.n_p), jnp.float32)
    hu = scale * jax.random.normal(jax.random.PRNGKey(1), h.shape, jnp.float32)
    hv = scale * jax.random.normal(jax.random.PRNGKey(2), h.shape, jnp.float32)
    return SWState(h=h, hu=hu, hv=hv)


def xla_step(ctx, phys, dense, bump, s, ctrl, dt):
    post = lambda f: apply_filter(ctx, f)

    def rhs(ss, tt):
        r = sw2d_rhs_dense(ctx, dense, ss, tt, phys)
        return SWState(
            h=r.h,
            hu=r.hu + ctrl[:, 0, None, None] * bump[None],
            hv=r.hv + ctrl[:, 1, None, None] * bump[None],
        )

    return ssprk2_step(rhs, s, 0.0, dt, post_stage=post)


def test_step_kernel_matches_xla(setup):
    ctx, phys, dense, bump, ops, meta = setup
    B = 8
    s = random_state(ctx, B)
    ctrl = jax.random.normal(jax.random.PRNGKey(3), (B, 2), jnp.float32)

    ref = xla_step(ctx, phys, dense, bump, s, ctrl, DT)

    hp = pad_state(meta, s.h, 1.0)
    hup = pad_state(meta, s.hu, 0.0)
    hvp = pad_state(meta, s.hv, 0.0)
    cpd = jnp.pad(ctrl, ((0, 0), (0, meta.cp - 2)))
    oh, ohu, ohv = sw2d_step_pallas(ops, meta, hp, hup, hvp, cpd, DT,
                                    interpret=True, tile_b=8)
    for a, b in ((oh, ref.h), (ohu, ref.hu), (ohv, ref.hv)):
        np.testing.assert_allclose(
            np.asarray(unpad_state(meta, a, ctx.k_elem)), np.asarray(b),
            atol=5e-6)


def test_rollout_trajectory_matches_xla(setup):
    ctx, phys, dense, bump, ops, meta = setup
    B, H, SPC = 4, 3, 2
    s = random_state(ctx, B)
    ctrls = jax.random.normal(jax.random.PRNGKey(3), (B, H, 2), jnp.float32)

    rollout = make_rollout(ops, meta, DT, SPC, interpret=True, tile_b=4)
    hp = pad_state(meta, s.h, 1.0)
    hup = pad_state(meta, s.hu, 0.0)
    hvp = pad_state(meta, s.hv, 0.0)
    cpd = jnp.pad(ctrls, ((0, 0), (0, 0), (0, meta.cp - 2)))
    th, thu, thv = rollout(hp, hup, hvp, cpd)

    t = 0
    for j in range(H):
        for _ in range(SPC):
            for a, b in ((th, s.h), (thu, s.hu), (thv, s.hv)):
                np.testing.assert_allclose(
                    np.asarray(unpad_state(meta, a[:, t], ctx.k_elem)),
                    np.asarray(b), atol=5e-6)
            s = xla_step(ctx, phys, dense, bump, s, ctrls[:, j], DT)
            t += 1
    np.testing.assert_allclose(
        np.asarray(unpad_state(meta, th[:, t], ctx.k_elem)),
        np.asarray(s.h), atol=5e-6)


def test_rollout_custom_vjp_matches_xla_grad(setup):
    ctx, phys, dense, bump, ops, meta = setup
    B, H, SPC = 4, 3, 2
    s = random_state(ctx, B, scale=0.05)
    ctrls = 0.5 * jax.random.normal(jax.random.PRNGKey(3), (B, H, 2),
                                    jnp.float32)
    tgt = 0.01 * jax.random.normal(jax.random.PRNGKey(4), s.h.shape,
                                   jnp.float32)

    def xla_loss(h0, hu0, hv0, cs):
        st = SWState(h=h0, hu=hu0, hv=hv0)
        tot = 0.0
        for j in range(H):
            for _ in range(SPC):
                st = xla_step(ctx, phys, dense, bump, st, cs[:, j], DT)
            tot = tot + jnp.sum((st.h - 10.0 - tgt) ** 2) \
                + 0.1 * jnp.sum(st.hu ** 2)
        return tot

    rollout = make_rollout(ops, meta, DT, SPC, interpret=True, tile_b=4)
    vm = (jnp.arange(meta.n_vp) < meta.n_v).astype(jnp.float32)

    def pl_loss(h0, hu0, hv0, cs):
        hp = pad_state(meta, h0, 1.0)
        hup = pad_state(meta, hu0, 0.0)
        hvp = pad_state(meta, hv0, 0.0)
        cpd = jnp.pad(cs, ((0, 0), (0, 0), (0, meta.cp - 2)))
        th, thu, thv = rollout(hp, hup, hvp, cpd)
        tgtp = pad_state(meta, tgt, 0.0)
        tot = 0.0
        for j in range(1, H + 1):
            t = j * SPC
            tot = tot + jnp.sum(vm * (th[:, t] - 10.0 * vm - tgtp) ** 2) \
                + 0.1 * jnp.sum(vm * thu[:, t] ** 2)
        return tot

    v0 = float(xla_loss(s.h, s.hu, s.hv, ctrls))
    v1 = float(pl_loss(s.h, s.hu, s.hv, ctrls))
    np.testing.assert_allclose(v1, v0, rtol=1e-5)

    g0 = jax.grad(xla_loss, argnums=(0, 1, 2, 3))(s.h, s.hu, s.hv, ctrls)
    g1 = jax.grad(pl_loss, argnums=(0, 1, 2, 3))(s.h, s.hu, s.hv, ctrls)
    for a, b in zip(g1, g0):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.max(np.abs(b)) + 1e-30
        assert np.max(np.abs(a - b)) / scale < 1e-4


def test_mpc_cost_and_solve_pallas(setup):
    ctx, phys, dense, bump, ops, meta = setup
    H, SPC, B = 4, 2, 4
    prob = MPCProblem(ctx=ctx, phys=phys, dt=DT, horizon=H,
                      steps_per_control=SPC, q_eta=0.3, q_terminal=1.0,
                      r_control=1e-8)
    BU = np.stack([bump, 0 * bump])
    BV = np.stack([0 * bump, bump])
    pm = build_pallas_mpc(prob, BU, BV, tile_b=B, interpret=True)

    h0 = jnp.full((B, ctx.k_elem, ctx.n_p), 10.0, jnp.float32)
    states = SWState(h=h0, hu=jnp.zeros_like(h0), hv=jnp.zeros_like(h0))
    targets = jax.vmap(
        lambda o: 0.01 * jnp.exp(-5.0 * ((ctx.x - o) ** 2 + ctx.y ** 2))
    )(jnp.linspace(-0.2, 0.2, B)).astype(jnp.float32)
    ctrls = 0.3 * jax.random.normal(jax.random.PRNGKey(5), (B, H, 2),
                                    jnp.float32)

    # cost parity vs the XLA mpc_cost (vmapped over scenarios)
    def forcing(c, control, state, t):
        bmp = jnp.asarray(bump, dtype=state.h.dtype)
        return jnp.zeros_like(state.h), control[0] * bmp, control[1] * bmp

    ref_cost = jax.vmap(
        lambda s, c, tg: mpc_cost(prob, s, c, tg, forcing)
    )(states, ctrls, targets)
    cpd = jnp.pad(ctrls, ((0, 0), (0, 0), (0, meta.cp - 2)))
    pl_cost = mpc_cost_pallas(prob, pm, states, cpd, targets)
    np.testing.assert_allclose(np.asarray(pl_cost), np.asarray(ref_cost),
                               rtol=2e-5)

    # the batched pallas solve reduces cost
    sol = solve_mpc_pallas(prob, pm, states, targets, 2, iters=25,
                           learning_rate=0.05)
    hist = np.asarray(sol.cost_history)  # (iters, B)
    assert np.all(np.isfinite(hist))
    assert np.all(hist[-1] < hist[0])
    assert sol.controls.shape == (B, H, 2)


class TestCoastalPallas:
    """Round-4: FULL coastal physics in the dense Pallas kernel (the r3
    NotImplementedError guard is gone) — well-balanced star fluxes over
    bathymetry, tidal BC_OUT forcing (in-kernel cos(omega t) ramp),
    quadratic drag, Coriolis — against the XLA sw2d_rhs path, including
    the jax.vjp-in-kernel adjoint."""

    TIDE = (12.0, 0.5, 2.0, 10.0)  # h0, amp, omega, ramp_tau

    @pytest.fixture(scope="class")
    def coastal(self):
        from blitzdg_tpu.context import BC_OUT

        mesh = box_triangles(3, 3, xlim=(0.0, 1.0), ylim=(0.0, 1.0))
        bc = np.asarray(mesh.bc_type).copy()
        for k in range(mesh.num_elements):
            for f in range(3):
                a, b = mesh.etov[k, f], mesh.etov[k, (f + 1) % 3]
                mx = 0.5 * (mesh.verts[a, 0] + mesh.verts[b, 0])
                if bc[k, f] > 0 and abs(mx - 1.0) < 1e-12:
                    bc[k, f] = BC_OUT
        mesh.set_bc_type(bc)
        ctx = build_triangle_context(1, mesh, filter_cutoff=0.9,
                                     filter_order=1, dtype=jnp.float32)
        H = 10.0 + 3.0 * ctx.x + 1.0 * jnp.sin(2.0 * ctx.y)
        Hx = 3.0 * jnp.ones_like(H)
        Hy = 2.0 * jnp.cos(2.0 * ctx.y)
        phys = SWPhysics(g=9.81, cd=2.5e-3, f_cor=1e-4, H=H, Hx=Hx, Hy=Hy)
        dense = build_dense_trace_ops(ctx)
        bump = np.exp(-8.0 * (np.asarray(ctx.x) ** 2 + np.asarray(ctx.y) ** 2))
        BU = np.stack([bump, 0 * bump])
        BV = np.stack([0 * bump, bump])
        ops, meta = build_pallas_step_ops(ctx, dense, phys, BU, BV,
                                          tidal=self.TIDE)
        assert meta.coastal and meta.wb and meta.has_bathy
        return ctx, phys, bump, ops, meta

    def _tidal(self, t):
        h0, amp, omega, tau = self.TIDE
        return h0 + amp * jnp.cos(omega * t) * jnp.minimum(t / tau, 1.0)

    def _xla_step(self, ctx, phys, bump, s, ctrl, t, dt):
        from blitzdg_tpu.ops.sw2d import sw2d_rhs

        post = lambda f: apply_filter(ctx, f)

        def rhs(ss, tt):
            # sw2d_rhs is unbatched — vmap over the scenario axis
            r = jax.vmap(lambda one: sw2d_rhs(ctx, one, tt, phys,
                                              tidal_forcing=self._tidal))(ss)
            return SWState(
                h=r.h,
                hu=r.hu + ctrl[:, 0, None, None] * bump[None],
                hv=r.hv + ctrl[:, 1, None, None] * bump[None],
            )

        return ssprk2_step(rhs, s, t, dt, post_stage=post)

    def _coastal_state(self, ctx, phys, B):
        h = phys.H + 0.2 * jnp.exp(
            -10.0 * ((ctx.x - 0.5) ** 2 + (ctx.y - 0.5) ** 2))
        s = SWState(h=jnp.broadcast_to(h, (B,) + h.shape),
                    hu=jnp.broadcast_to(0.1 * h, (B,) + h.shape),
                    hv=jnp.broadcast_to(-0.05 * h, (B,) + h.shape))
        return jax.tree.map(lambda a: a.astype(jnp.float32), s)

    def test_coastal_step_matches_xla(self, coastal):
        ctx, phys, bump, ops, meta = coastal
        B, T0 = 4, 1.0
        s = self._coastal_state(ctx, phys, B)
        ctrl = 0.3 * jax.random.normal(jax.random.PRNGKey(3), (B, 2),
                                       jnp.float32)
        ref = self._xla_step(ctx, phys, bump, s, ctrl, T0, DT)
        hp = pad_state(meta, s.h, 1.0)
        hup = pad_state(meta, s.hu, 0.0)
        hvp = pad_state(meta, s.hv, 0.0)
        cpd = jnp.pad(ctrl, ((0, 0), (0, meta.cp - 2)))
        oh, ohu, ohv = sw2d_step_pallas(ops, meta, hp, hup, hvp, cpd, DT,
                                        interpret=True, tile_b=4, t0=T0)
        for a, b in ((oh, ref.h), (ohu, ref.hu), (ohv, ref.hv)):
            np.testing.assert_allclose(
                np.asarray(unpad_state(meta, a, ctx.k_elem)), np.asarray(b),
                atol=2e-5)

    def test_coastal_rollout_and_vjp_match_xla(self, coastal):
        ctx, phys, bump, ops, meta = coastal
        B, H, SPC, T0 = 2, 2, 2, 1.0
        s = self._coastal_state(ctx, phys, B)
        ctrls = 0.3 * jax.random.normal(jax.random.PRNGKey(5), (B, H, 2),
                                        jnp.float32)

        rollout = make_rollout(ops, meta, DT, SPC, interpret=True, tile_b=2,
                               t0=T0)
        vm = (jnp.arange(meta.n_vp) < meta.n_v).astype(jnp.float32)
        Hp = pad_state(meta, phys.H[None], 0.0)[0]

        def pl_loss(h0, hu0, hv0, cs):
            hp = pad_state(meta, h0, 1.0)
            hup = pad_state(meta, hu0, 0.0)
            hvp = pad_state(meta, hv0, 0.0)
            cpd = jnp.pad(cs, ((0, 0), (0, 0), (0, meta.cp - 2)))
            th, thu, thv = rollout(hp, hup, hvp, cpd)
            t = H * SPC
            return (jnp.sum(vm * (th[:, t] - Hp) ** 2)
                    + 0.1 * jnp.sum(vm * thu[:, t] ** 2))

        def xla_loss(h0, hu0, hv0, cs):
            st = SWState(h=h0, hu=hu0, hv=hv0)
            t = T0
            for j in range(H):
                for _ in range(SPC):
                    st = self._xla_step(ctx, phys, bump, st, cs[:, j], t, DT)
                    t += DT
            return (jnp.sum((st.h - phys.H) ** 2)
                    + 0.1 * jnp.sum(st.hu ** 2))

        v0 = float(xla_loss(s.h, s.hu, s.hv, ctrls))
        v1 = float(pl_loss(s.h, s.hu, s.hv, ctrls))
        np.testing.assert_allclose(v1, v0, rtol=1e-4)

        g0 = jax.grad(xla_loss, argnums=(0, 1, 2, 3))(s.h, s.hu, s.hv, ctrls)
        g1 = jax.grad(pl_loss, argnums=(0, 1, 2, 3))(s.h, s.hu, s.hv, ctrls)
        for a, b in zip(g1, g0):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.max(np.abs(b)) + 1e-30
            assert np.max(np.abs(a - b)) / scale < 5e-4, scale
