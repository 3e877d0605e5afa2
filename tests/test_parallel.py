"""Multi-device tests on the 8-device virtual CPU mesh: partitioning,
pjit auto-sharding, and shard_map halo exchange vs. single-device truth."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from blitzdg_tpu.mesh import box_triangles
from blitzdg_tpu.ops.sw2d import SWPhysics, SWState, sw2d_rhs
from blitzdg_tpu.parallel import (
    make_device_mesh,
    partition_mesh,
    rcb_partition,
    shard_context,
)
from blitzdg_tpu.specgrid.triangle import build_triangle_context

NDEV = 8


@pytest.fixture(scope="module")
def problem():
    mesh0 = box_triangles(4, 8)  # K = 64, divisible by 8
    mesh, perm, kp = partition_mesh(mesh0, NDEV)
    assert kp == 64 // NDEV
    ctx = build_triangle_context(2, mesh)
    eta = jnp.exp(-5.0 * (ctx.x**2 + ctx.y**2))
    state = SWState(h=10.0 + eta, hu=0.1 * eta, hv=jnp.zeros_like(eta))
    return ctx, state


def test_rcb_balanced():
    rng = np.random.default_rng(0)
    c = rng.uniform(size=(64, 2))
    part = rcb_partition(c, 8)
    counts = np.bincount(part, minlength=8)
    assert counts.min() == counts.max() == 8


def test_graph_partition_cut_quality():
    """VERDICT r3 item 5: the cut-minimizing partitioner must produce
    balanced parts and a smaller face cut than RCB on at least one
    irregular mesh; 'auto' is never worse than RCB on any mesh."""
    import os

    from blitzdg_tpu.parallel import compute_partition, partition_cut

    paths = ["/root/reference/input/R_8km_circle.msh",
             "/root/reference/input/box.msh"]
    if not all(os.path.exists(p) for p in paths):
        pytest.skip("reference meshes unavailable")
    from blitzdg_tpu.mesh import read_gmsh

    beat_rcb_somewhere = False
    for path in paths:
        mesh = read_gmsh(path)
        for n in (4, 8):
            pg = compute_partition(mesh, n, method="graph")
            pr = compute_partition(mesh, n, method="rcb")
            pa = compute_partition(mesh, n, method="auto")
            # exact balance (same proportional split as RCB)
            counts = np.bincount(pg, minlength=n)
            assert counts.max() - counts.min() <= 1, counts
            cg = partition_cut(mesh.etoe, pg)
            cr = partition_cut(mesh.etoe, pr)
            ca = partition_cut(mesh.etoe, pa)
            assert ca <= min(cg, cr)
            if "R_8km" in path and cg < cr:
                beat_rcb_somewhere = True
    assert beat_rcb_somewhere, "graph partitioner never beat RCB on the irregular coastal mesh"


def test_partition_preserves_mesh():
    mesh0 = box_triangles(4, 4)
    mesh, perm, kp = partition_mesh(mesh0, 4)
    assert mesh.num_elements == mesh0.num_elements
    # same multiset of element vertex triples
    a = {tuple(sorted(r)) for r in mesh0.etov.tolist()}
    b = {tuple(sorted(r)) for r in mesh.etov.tolist()}
    assert a == b
    # boundary face count preserved
    assert (mesh.bc_type > 0).sum() == (mesh0.bc_type > 0).sum()


def test_pjit_auto_sharding_matches_single(problem):
    ctx, state = problem
    phys = SWPhysics(g=9.81)
    ref = sw2d_rhs(ctx, state, 0.0, phys)

    mesh = make_device_mesh(1, NDEV)
    ctx_sh = shard_context(ctx, mesh)
    el = NamedSharding(mesh, P("element", None))  # fields are (K, Np)
    state_sh = jax.tree.map(lambda a: jax.device_put(a, el), state)

    out = jax.jit(lambda s: sw2d_rhs(ctx_sh, s, 0.0, phys))(state_sh)
    np.testing.assert_allclose(np.asarray(out.h), np.asarray(ref.h), atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.hu), np.asarray(ref.hu), atol=1e-12)


def test_shard_map_halo_exchange_matches_single(problem):
    """ppermute-halo RHS inside shard_map vs single-device truth (the
    retired all_gather demonstrator's parity test, retargeted at the
    deployable halo path; coastal physics is covered separately below)."""
    from blitzdg_tpu.parallel import build_halo_plan, halo_sw2d_rhs, halo_tables

    ctx, state = problem
    phys = SWPhysics(g=9.81)
    ref = sw2d_rhs(ctx, state, 0.0, phys)

    mesh = make_device_mesh(1, NDEV)
    el2 = P("element", None)
    plan = build_halo_plan(ctx, NDEV)
    tables = halo_tables(plan)

    ctx_specs = _context_specs(ctx)
    state_specs = jax.tree.map(lambda a: el2, state)
    tb_specs = tuple(P("element", *([None] * (a.ndim - 1))) for a in tables)

    fn = jax.shard_map(
        lambda c, s, tb: halo_sw2d_rhs(c, s, 0.0, phys, tb, plan),
        mesh=mesh,
        in_specs=(ctx_specs, state_specs, tb_specs),
        out_specs=state_specs,
    )
    out = jax.jit(fn)(ctx, state, tables)
    np.testing.assert_allclose(np.asarray(out.h), np.asarray(ref.h), atol=1e-11)
    np.testing.assert_allclose(np.asarray(out.hu), np.asarray(ref.hu), atol=1e-11)
    np.testing.assert_allclose(np.asarray(out.hv), np.asarray(ref.hv), atol=1e-11)


def _context_specs(ctx):
    from blitzdg_tpu.parallel import context_shard_specs

    return context_shard_specs(ctx)


def test_halo_coastal_rollout_matches_single():
    """Full coastal physics (discontinuous bathymetry + well-balancing +
    tidal BC_OUT forcing + drag + Coriolis) with ppermute halo exchange and
    `lax.pmax` adaptive dt INSIDE shard_map, rolled out for 10 SSP-RK2
    steps, must match the single-device rollout to roundoff."""
    from blitzdg_tpu.context import BC_OUT
    from blitzdg_tpu.ops.sw2d import sw2d_timestep
    from blitzdg_tpu.parallel import (
        build_halo_plan,
        halo_sw2d_rhs,
        halo_sw2d_timestep,
        halo_tables,
    )
    from blitzdg_tpu.timestepping import ssprk2_step

    mesh0 = box_triangles(4, 8)  # K = 64
    # open (tidal) boundary on the east edge
    mids_x = 0.5 * (
        mesh0.verts[mesh0.etov][:, :, 0]
        + mesh0.verts[mesh0.etov[:, [1, 2, 0]]][:, :, 0]
    )
    bc = mesh0.bc_type.copy()
    bc[(bc > 0) & (np.abs(mids_x - 1.0) < 1e-6)] = BC_OUT
    mesh0.set_bc_type(bc)

    mesh2d, perm, kp = partition_mesh(mesh0, NDEV)
    ctx = build_triangle_context(2, mesh2d)

    rng = np.random.default_rng(3)
    H = 10.0 + 2.0 * ctx.x + jnp.asarray(
        rng.uniform(0.0, 1.0, size=(ctx.k_elem, 1)))
    Hx, Hy = ctx.grad(H)
    phys = SWPhysics(g=9.81, cd=2.5e-3, f_cor=1e-4, H=H, Hx=Hx, Hy=Hy)

    forcing = lambda t: 12.0 + 0.5 * jnp.cos(0.3 * t)
    eta = 0.1 * jnp.exp(-5.0 * (ctx.x**2 + ctx.y**2))
    state0 = SWState(h=H + eta, hu=0.05 * eta, hv=jnp.zeros_like(eta))
    cfl = 0.3

    # --- single-device truth
    def ref_step(s, t):
        dt = sw2d_timestep(ctx, s, phys.g, cfl)
        rhs = lambda ss, tt: sw2d_rhs(ctx, ss, tt, phys, tidal_forcing=forcing)
        return ssprk2_step(rhs, s, t, dt), t + dt

    @jax.jit
    def ref_run(s):
        def body(carry, _):
            return ref_step(*carry), None
        (s, t), _ = jax.lax.scan(body, (s, 0.0), None, length=10)
        return s, t

    ref, t_ref = ref_run(state0)

    # --- sharded rollout
    plan = build_halo_plan(ctx, NDEV)
    tables = halo_tables(plan)
    devmesh = make_device_mesh(1, NDEV)
    el2 = P("element", None)
    ctx_specs = _context_specs(ctx)
    state_specs = jax.tree.map(lambda a: el2, state0)
    phys_specs = jax.tree.map(lambda a: el2, phys)
    table_specs = tuple(P("element", *([None] * (a.ndim - 1))) for a in tables)

    def shard_body(c, s, t, ph, tb):
        dt = halo_sw2d_timestep(c, s, ph.g, cfl)
        rhs = lambda ss, tt: halo_sw2d_rhs(
            c, ss, tt, ph, tb, plan, tidal_forcing=forcing)
        return ssprk2_step(rhs, s, t, dt), t + dt

    fn = jax.shard_map(
        shard_body,
        mesh=devmesh,
        in_specs=(ctx_specs, state_specs, P(), phys_specs, table_specs),
        out_specs=(state_specs, P()),
    )

    @jax.jit
    def shard_run(s):
        def body(carry, _):
            ss, t = carry
            return fn(ctx, ss, t, phys, tables), None
        (s, t), _ = jax.lax.scan(body, (s, 0.0), None, length=10)
        return s, t

    out, t_out = shard_run(state0)
    np.testing.assert_allclose(float(t_out), float(t_ref), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(out.h), np.asarray(ref.h), atol=1e-11)
    np.testing.assert_allclose(np.asarray(out.hu), np.asarray(ref.hu), atol=1e-11)
    np.testing.assert_allclose(np.asarray(out.hv), np.asarray(ref.hv), atol=1e-11)


def test_ppermute_halo_exchange_matches_single(problem):
    """The precomputed-table ppermute halo exchange (communication = the
    cut, not the domain) must reproduce the single-device RHS exactly."""
    from blitzdg_tpu.parallel import build_halo_plan, halo_sw2d_rhs, halo_tables

    ctx, state = problem
    phys = SWPhysics(g=9.81)
    ref = sw2d_rhs(ctx, state, 0.0, phys)

    plan = build_halo_plan(ctx, NDEV)
    # sanity: traffic exists and is much smaller than the domain
    f_loc = (ctx.k_elem // NDEV) * ctx.n_faces
    assert plan.max_send >= 1
    assert plan.max_send < f_loc  # halo < all local faces
    tables = halo_tables(plan)

    mesh = make_device_mesh(1, NDEV)
    el2 = P("element", None)

    ctx_specs = _context_specs(ctx)
    state_specs = jax.tree.map(lambda a: el2, state)
    table_specs = tuple(
        P("element", *([None] * (a.ndim - 1))) for a in tables)

    fn = jax.shard_map(
        lambda c, s, tb: halo_sw2d_rhs(c, s, 0.0, phys, tb, plan),
        mesh=mesh,
        in_specs=(ctx_specs, state_specs, table_specs),
        out_specs=state_specs,
    )
    out = jax.jit(fn)(ctx, state, tables)
    np.testing.assert_allclose(np.asarray(out.h), np.asarray(ref.h), atol=1e-11)
    np.testing.assert_allclose(np.asarray(out.hu), np.asarray(ref.hu), atol=1e-11)
    np.testing.assert_allclose(np.asarray(out.hv), np.asarray(ref.hv), atol=1e-11)


def test_bc_maps_replicated_when_count_equals_k():
    """Regression: on box(4,4) at N=1 there are exactly 32 wall trace nodes
    AND 32 elements — a shape-based sharding heuristic (leading dim == K)
    would scatter the replicated-global BC index list across shards and
    silently drop 7/8 of the boundary conditions. context_shard_specs must
    replicate bc_maps, and both sharded ops must stay exact on this mesh
    with data that actually exercises the BCs (nonzero momentum at walls /
    Dirichlet u)."""
    from blitzdg_tpu.ops.poisson import poisson2d_op
    from blitzdg_tpu.parallel import (
        build_halo_plan,
        context_shard_specs,
        halo_poisson2d_op,
        halo_sw2d_rhs,
        halo_tables,
    )

    ctx = build_triangle_context(1, box_triangles(4, 4))
    assert int(np.asarray(ctx.bc_maps.mask[3]).sum()) == ctx.k_elem  # trigger

    specs = context_shard_specs(ctx)
    # the BC maps must be replicated
    assert all(s == P() for s in jax.tree.leaves(
        jax.tree.map(lambda s: s, specs.bc_maps)))

    plan = build_halo_plan(ctx, NDEV)
    tables = halo_tables(plan)
    mesh = make_device_mesh(1, NDEV)
    el_mesh = Mesh(np.asarray(mesh.devices).reshape(-1), ("element",))
    table_specs = tuple(
        P("element", *([None] * (a.ndim - 1))) for a in tables)

    # --- IP Laplacian (Dirichlet walls touched by any nonzero u) ---
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(ctx.k_elem, ctx.n_p)))
    tau = float((ctx.n_order + 1) ** 2 * jnp.max(ctx.fscale))
    ref = poisson2d_op(ctx, u, tau=tau, symmetrize=True)
    fn = jax.shard_map(
        lambda c, uu, tb: halo_poisson2d_op(c, uu, tau, tb, plan,
                                            symmetrize=True),
        mesh=el_mesh,
        in_specs=(specs, P("element", None), table_specs),
        out_specs=P("element", None),
    )
    out = jax.jit(fn)(ctx, u, tables)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-11)

    # --- sw2d RHS with NONZERO momentum (wall reflection is a no-op on a
    # fluid at rest, which would mask dropped wall BCs) ---
    h = 10.0 + jnp.exp(-10.0 * (ctx.x**2 + ctx.y**2))
    state = SWState(h=h, hu=0.3 * h, hv=-0.2 * h)
    phys = SWPhysics(g=9.81)
    ref2 = sw2d_rhs(ctx, state, 0.0, phys)
    st_specs = jax.tree.map(lambda a: P("element", None), state)
    fn2 = jax.shard_map(
        lambda c, s, tb: halo_sw2d_rhs(c, s, 0.0, phys, tb, plan),
        mesh=el_mesh,
        in_specs=(specs, st_specs, table_specs),
        out_specs=st_specs,
    )
    out2 = jax.jit(fn2)(ctx, state, tables)
    for a, b in zip(out2, ref2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)


def test_distributed_init_single_host_degenerate():
    """distributed_init() on a single host is a safe no-op that reports the
    local topology; make_global_mesh over all (virtual) devices equals the
    single-process mesh, and a pjit matmul over it runs (VERDICT r1 item 9:
    the >=2-host scaling study is one coordinator address away)."""
    from blitzdg_tpu.parallel import distributed_init, make_global_mesh

    info = distributed_init()
    assert info["n_processes"] == 1
    assert info["process_id"] == 0
    assert info["n_devices_global"] == info["n_devices_local"] == NDEV

    mesh = make_global_mesh(n_scenario=2, n_element=NDEV // 2)
    assert mesh.axis_names == ("scenario", "element")
    assert mesh.devices.shape == (2, NDEV // 2)

    # the mesh is usable for real sharded computation
    x = jnp.arange(float(NDEV * 16)).reshape(NDEV, 16)
    sh = NamedSharding(mesh, P(("scenario", "element"), None))
    y = jax.jit(lambda a: (a * 2).sum(), in_shardings=sh)(
        jax.device_put(x, sh))
    np.testing.assert_allclose(float(y), float((x * 2).sum()))


class TestGhostPadding:
    """Arbitrary-K element sharding via ghost-element padding (VERDICT r1
    item 4; reference METIS handles any K, MeshManager.cpp:491-544)."""

    def _padded_problem(self, n_shards):
        from blitzdg_tpu.mesh import read_gmsh
        from blitzdg_tpu.parallel import pad_context, partition_block_sizes

        mesh0 = read_gmsh("/root/reference/input/box.msh")
        assert mesh0.num_elements % n_shards != 0  # padding is exercised
        sizes = partition_block_sizes(mesh0, n_shards)
        mesh, _, kp = partition_mesh(mesh0, n_shards)
        ctx = build_triangle_context(1, mesh)
        ctx_p, real = pad_context(ctx, sizes)
        assert ctx_p.k_elem == n_shards * kp
        assert real.sum() == ctx.k_elem
        assert float(jnp.abs(ctx_p.fscale[~real]).max()) == 0.0
        return ctx, ctx_p, real

    def test_padded_rhs_and_dt_match_unpadded(self):
        """Sharded halo RHS + pmax dt on the ghost-padded context equal the
        unsharded, unpadded results bitwise on the real elements."""
        from blitzdg_tpu.ops.sw2d import sw2d_timestep
        from blitzdg_tpu.parallel import (
            build_halo_plan,
            context_shard_specs,
            halo_sw2d_rhs,
            halo_sw2d_timestep,
            halo_tables,
        )

        ctx, ctx_p, real = self._padded_problem(NDEV)
        phys = SWPhysics(g=9.81)

        h = 10.0 + jnp.exp(-3.0 * (ctx.x**2 + ctx.y**2))
        state = SWState(h=h, hu=0.3 * h, hv=-0.2 * h)
        ref = sw2d_rhs(ctx, state, 0.0, phys)
        dt_ref = sw2d_timestep(ctx, state, phys.g, 0.4)

        # ghost state: benign constants (isolated -> cannot affect real)
        def padf(f, fill):
            out = jnp.full((ctx_p.k_elem, ctx.n_p), fill, dtype=f.dtype)
            return out.at[jnp.asarray(np.where(real)[0])].set(f)

        state_p = SWState(h=padf(state.h, 1.0), hu=padf(state.hu, 0.0),
                          hv=padf(state.hv, 0.0))

        plan = build_halo_plan(ctx_p, NDEV)
        tables = halo_tables(plan)
        mesh = make_device_mesh(1, NDEV)
        el_mesh = Mesh(np.asarray(mesh.devices).reshape(-1), ("element",))
        specs = context_shard_specs(ctx_p)
        st_specs = jax.tree.map(lambda a: P("element", None), state_p)
        tb_specs = tuple(P("element", *([None] * (a.ndim - 1)))
                         for a in tables)

        def fn(c, s, tb):
            rhs = halo_sw2d_rhs(c, s, 0.0, phys, tb, plan)
            dt = halo_sw2d_timestep(c, s, phys.g, 0.4)
            return rhs, dt

        out, dt = jax.jit(jax.shard_map(
            fn, mesh=el_mesh, in_specs=(specs, st_specs, tb_specs),
            out_specs=(st_specs, P()),
        ))(ctx_p, state_p, tables)

        ridx = np.where(real)[0]
        for got, want in zip(out, ref):
            np.testing.assert_allclose(np.asarray(got)[ridx],
                                       np.asarray(want), atol=0)
        np.testing.assert_allclose(float(dt), float(dt_ref), atol=0)

    def test_padded_sharded_cg_matches_unpadded(self):
        """Element-sharded CG on the ghost-padded context: zero ghost
        rhs/x0 keeps ghost residuals exactly zero, so inner products and
        iterates match the unpadded single-device solve."""
        from blitzdg_tpu.ops.poisson import apply_mass, poisson2d_op
        from blitzdg_tpu.parallel import (
            build_halo_plan,
            context_shard_specs,
            halo_poisson2d_op,
            halo_tables,
        )
        from blitzdg_tpu.solvers import cg
        from blitzdg_tpu.solvers.krylov import CONV_SUCCESS

        ctx, ctx_p, real = self._padded_problem(NDEV)
        tau = float((ctx.n_order + 1) ** 2 * jnp.max(ctx.fscale))
        uex = jnp.sin(np.pi * ctx.x) * jnp.sin(np.pi * ctx.y)
        b = -apply_mass(ctx, -2.0 * np.pi**2 * uex)

        def matvec(v):
            return -poisson2d_op(ctx, v.reshape(ctx.k_elem, ctx.n_p),
                                 tau=tau, symmetrize=True).reshape(-1)

        ref = cg(matvec, b.reshape(-1), tol=1e-10, maxiter=4000)
        assert int(ref.flag) == CONV_SUCCESS

        ridx = jnp.asarray(np.where(real)[0])
        b_p = jnp.zeros((ctx_p.k_elem, ctx.n_p), b.dtype).at[ridx].set(b)
        plan = build_halo_plan(ctx_p, NDEV)
        tables = halo_tables(plan)
        mesh = make_device_mesh(1, NDEV)
        el_mesh = Mesh(np.asarray(mesh.devices).reshape(-1), ("element",))

        def solve(c, bb, tb):
            def mv(v):
                u2 = v.reshape(-1, c.n_p)
                return -halo_poisson2d_op(c, u2, tau, tb, plan,
                                          symmetrize=True).reshape(-1)

            res = cg(mv, bb.reshape(-1), tol=1e-10, maxiter=4000,
                     axis_name="element")
            return res.x.reshape(-1, c.n_p), res.iters, res.flag

        x, iters, flag = jax.jit(jax.shard_map(
            solve, mesh=el_mesh,
            in_specs=(context_shard_specs(ctx_p), P("element", None),
                      tuple(P("element", *([None] * (a.ndim - 1)))
                            for a in tables)),
            out_specs=(P("element", None), P(), P()),
        ))(ctx_p, b_p, tables)
        assert int(flag) == CONV_SUCCESS
        assert int(iters) == int(ref.iters)
        np.testing.assert_allclose(
            np.asarray(x)[np.where(real)[0]].reshape(-1),
            np.asarray(ref.x), atol=1e-9)

    def test_coarse_box_on_16_devices_subprocess(self):
        """The VERDICT acceptance case verbatim: coarse_box (K=40) sharded
        over 16 virtual devices, real-element RHS bitwise-matching the
        unsharded run. Runs in a subprocess (device count is fixed at
        process start)."""
        import subprocess
        import sys

        code = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from blitzdg_tpu.mesh import read_gmsh
from blitzdg_tpu.ops.sw2d import SWPhysics, SWState, sw2d_rhs
from blitzdg_tpu.parallel import (build_halo_plan, context_shard_specs,
    halo_sw2d_rhs, halo_tables, pad_context, partition_mesh, partition_block_sizes)
from blitzdg_tpu.specgrid.triangle import build_triangle_context

NDEV = 16
mesh0 = read_gmsh("/root/reference/input/coarse_box.msh")
assert mesh0.num_elements == 40
sizes = partition_block_sizes(mesh0, NDEV)
mesh, _, kp = partition_mesh(mesh0, NDEV)
ctx = build_triangle_context(1, mesh)
ctx_p, real = pad_context(ctx, sizes)
assert ctx_p.k_elem == NDEV * kp and ctx_p.k_elem % NDEV == 0

phys = SWPhysics(g=9.81)
h = 10.0 + jnp.exp(-3.0 * (ctx.x**2 + ctx.y**2))
state = SWState(h=h, hu=0.3 * h, hv=-0.2 * h)
ref = sw2d_rhs(ctx, state, 0.0, phys)

ridx = jnp.asarray(np.where(real)[0])
padf = lambda f, fill: jnp.full((ctx_p.k_elem, ctx.n_p), fill,
                                dtype=f.dtype).at[ridx].set(f)
state_p = SWState(h=padf(state.h, 1.0), hu=padf(state.hu, 0.0),
                  hv=padf(state.hv, 0.0))
plan = build_halo_plan(ctx_p, NDEV)
tables = halo_tables(plan)
el_mesh = Mesh(np.array(jax.devices()[:NDEV]), ("element",))
st_specs = jax.tree.map(lambda a: P("element", None), state_p)
out = jax.jit(jax.shard_map(
    lambda c, s, tb: halo_sw2d_rhs(c, s, 0.0, phys, tb, plan),
    mesh=el_mesh,
    in_specs=(context_shard_specs(ctx_p), st_specs,
              tuple(P("element", *([None] * (a.ndim - 1))) for a in tables)),
    out_specs=st_specs,
))(ctx_p, state_p, tables)
r = np.where(real)[0]
for got, want in zip(out, ref):
    np.testing.assert_allclose(np.asarray(got)[r], np.asarray(want), atol=0)
print("PAD16 OK")
"""
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
        res = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=300,
                             cwd="/root/repo")
        assert res.returncode == 0, res.stderr[-2000:]
        assert "PAD16 OK" in res.stdout


def test_halo_curved_rhs_matches_single():
    """Element-sharded CURVED weak-form RHS (cubature volume local, Gauss
    '+' trace via the ppermute halo over the Gauss plan) == the
    single-device sw2d_curved_rhs to roundoff, on a Gordon-Hall-deformed
    disk with wall + tidal BCs and drag/Coriolis (VERDICT r2 item 9)."""
    from blitzdg_tpu.context import BC_OUT
    from blitzdg_tpu.mesh import disk_triangles
    from blitzdg_tpu.mesh.curved import (
        circle_projection,
        gordon_hall_deform,
        snap_boundary_vertices,
    )
    from blitzdg_tpu.ops.sw2d_curved import SWStateTracer, sw2d_curved_rhs
    from blitzdg_tpu.parallel import (
        build_gauss_halo_plan,
        cubature_shard_specs,
        gauss_shard_specs,
        halo_sw2d_curved_rhs,
        halo_tables,
    )
    from blitzdg_tpu.specgrid.cubature import (
        build_cubature_context,
        build_gauss_face_context,
    )

    N = 3
    mesh0 = disk_triangles(4, radius=1.0)
    # tag an eastern arc of the boundary as tidal open
    bc = np.asarray(mesh0.bc_type).copy()
    mids = 0.5 * (mesh0.verts[mesh0.etov]
                  + mesh0.verts[np.roll(mesh0.etov, -1, axis=1)])
    bc[(bc > 0) & (mids[:, :, 0] > 0.7)] = BC_OUT
    mesh0.set_bc_type(bc)

    mesh2d, perm, kp = partition_mesh(mesh0, NDEV)
    assert mesh2d.num_elements % NDEV == 0

    proj = circle_projection(0.0, 0.0, 1.0)
    curved_faces = snap_boundary_vertices(mesh2d, proj, tol=0.3)
    ctx0 = build_triangle_context(N, mesh2d, dtype=None)
    x2, y2, _ = gordon_hall_deform(N, mesh2d, ctx0.x, ctx0.y,
                                   curved_faces, proj)
    ctx = build_triangle_context(N, mesh2d, coords=(x2, y2))
    cub = build_cubature_context(N, mesh2d, x2, y2, ctx0.V)
    gauss = build_gauss_face_context(N, mesh2d, x2, y2, ctx0.V)

    phys = SWPhysics(g=9.81, cd=2.5e-3, f_cor=1e-4)
    forcing = lambda t: 1.0 + 0.05 * jnp.cos(0.3 * t)
    eta = 0.05 * jnp.exp(-5.0 * ((ctx.x - 0.2) ** 2 + ctx.y**2))
    state = SWStateTracer(h=1.0 + eta, hu=0.02 * eta, hv=-0.01 * eta,
                          hN=eta)
    t0 = 0.37

    ref = sw2d_curved_rhs(ctx, cub, gauss, state, t0, phys,
                          tidal_forcing=forcing)

    plan = build_gauss_halo_plan(gauss, NDEV)
    tables = halo_tables(plan)
    devmesh = make_device_mesh(1, NDEV)
    el2 = P("element", None)
    fn = jax.shard_map(
        lambda c, cb, gs, s, tb: halo_sw2d_curved_rhs(
            c, cb, gs, s, t0, phys, tb, plan, tidal_forcing=forcing),
        mesh=devmesh,
        in_specs=(_context_specs(ctx), cubature_shard_specs(cub),
                  gauss_shard_specs(gauss),
                  jax.tree.map(lambda a: el2, state),
                  tuple(P("element", *([None] * (a.ndim - 1)))
                        for a in tables)),
        out_specs=jax.tree.map(lambda a: el2, state),
    )
    out = fn(ctx, cub, gauss, state, tables)
    for got, want, name in zip(out, ref, ("h", "hu", "hv", "hN")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-11, err_msg=name)


class TestShardedBlocked:
    """Blocked Pallas kernel INSIDE shard_map (parallel/blocked_shard.py):
    per-shard fused stage kernels + ppermute halo between RK stages must
    reproduce the single-device XLA path exactly (f64 interpret mode)."""

    def test_sharded_blocked_matches_single_device(self):
        from blitzdg_tpu.ops.sw2d import SWPhysics, SWState, sw2d_rhs, apply_filter
        from blitzdg_tpu.parallel.blocked_shard import (
            build_sharded_blocked, make_sharded_blocked_step, pack_local,
            unpack_local)
        from blitzdg_tpu.timestepping import ssprk2_step
        from jax.sharding import Mesh, PartitionSpec as P

        NDEV = 8
        mesh0 = box_triangles(8, 8)  # K = 128, 16 per shard
        mesh2d, _, _ = partition_mesh(mesh0, NDEV)
        ctx = build_triangle_context(1, mesh2d, filter_cutoff=0.9,
                                     filter_order=1)
        phys = SWPhysics(g=9.81)
        sb = build_sharded_blocked(ctx, phys, NDEV, dtype=jnp.float64,
                                   fold_filter=True)
        meta = sb.meta
        fm = np.asarray(ctx.fmask).reshape(-1)
        DT, NSTEP = 5e-4, 5

        # ---- single-device reference ----
        eta = jnp.exp(-8.0 * (ctx.x**2 + ctx.y**2))
        state = SWState(h=10.0 + eta, hu=0.1 * eta, hv=jnp.zeros_like(eta))
        ref = state
        post = lambda f: apply_filter(ctx, f)
        for i in range(NSTEP):
            ref = ssprk2_step(lambda s, t: sw2d_rhs(ctx, s, t, phys),
                              ref, i * DT, DT, post_stage=post)

        # ---- sharded blocked rollout ----
        step = make_sharded_blocked_step(sb, fm, DT, interpret=True)
        devices = np.array(jax.devices()[:NDEV])
        el_mesh = Mesh(devices, ("element",))

        k_loc = sb.k_loc
        # per-shard packed initial state riding the B axis: (NDEV, p, NP, M)
        # — inside shard_map each shard sees exactly the (1, p, NP, M)
        # packed form the kernel wants
        def packed_field(f):
            return jnp.concatenate([
                pack_local(meta, f[s * k_loc:(s + 1) * k_loc])
                for s in range(NDEV)], axis=0)

        packed = tuple(packed_field(f) for f in state)
        op_specs = jax.tree.map(
            lambda a: P("element", *([None] * (a.ndim - 1))), sb.ops)
        tb_specs = tuple(P("element", *([None] * (a.ndim - 1)))
                         for a in sb.tables)
        st_spec = P("element", None, None, None)

        def roll(ops_l, tb_l, *pk):
            def body(carry, _):
                return step(ops_l, tb_l, carry, 0.0), None

            out, _ = jax.lax.scan(body, tuple(pk), None, length=NSTEP)
            return out

        fn = jax.jit(jax.shard_map(
            roll, mesh=el_mesh,
            in_specs=(op_specs, tb_specs) + (st_spec,) * 3,
            out_specs=(st_spec,) * 3,
            check_vma=False))  # pallas_call out_shapes carry no vma info
        out = fn(sb.ops, sb.tables, *packed)

        for got_packed, want in zip(out, ref):
            got = jnp.concatenate([
                unpack_local(meta, got_packed[s:s + 1])
                for s in range(NDEV)], axis=0)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-12)

    def test_fused_sharded_blocked_matches_single_device(self):
        """The FAST path (kernel-emitted traces + static-index lean
        exchange) must match the single-device XLA rollout too."""
        from blitzdg_tpu.ops.sw2d import SWPhysics, SWState, sw2d_rhs, apply_filter
        from blitzdg_tpu.parallel.blocked_shard import (
            build_sharded_blocked, initial_send_buffer,
            make_sharded_blocked_step_fused, pack_local, unpack_local)
        from blitzdg_tpu.timestepping import ssprk2_step
        from jax.sharding import Mesh, PartitionSpec as P

        NDEV = 8
        mesh0 = box_triangles(8, 8)
        mesh2d, _, _ = partition_mesh(mesh0, NDEV)
        ctx = build_triangle_context(1, mesh2d, filter_cutoff=0.9,
                                     filter_order=1)
        phys = SWPhysics(g=9.81)
        sb = build_sharded_blocked(ctx, phys, NDEV, dtype=jnp.float64)
        meta = sb.meta
        DT, NSTEP = 5e-4, 5

        eta = jnp.exp(-8.0 * (ctx.x**2 + ctx.y**2))
        state = SWState(h=10.0 + eta, hu=0.1 * eta, hv=jnp.zeros_like(eta))
        ref = state
        post = lambda f: apply_filter(ctx, f)
        for i in range(NSTEP):
            ref = ssprk2_step(lambda s, t: sw2d_rhs(ctx, s, t, phys),
                              ref, i * DT, DT, post_stage=post)

        step = make_sharded_blocked_step_fused(sb, DT, interpret=True)
        el_mesh = Mesh(np.array(jax.devices()[:NDEV]), ("element",))
        k_loc = sb.k_loc
        packed = tuple(jnp.concatenate([
            pack_local(meta, f[s * k_loc:(s + 1) * k_loc])
            for s in range(NDEV)], axis=0) for f in state)
        op_specs = jax.tree.map(
            lambda a: P("element", *([None] * (a.ndim - 1))), sb.ops)
        st_spec = P("element", None, None, None)

        def roll(ops_l, *pk):
            sb0 = initial_send_buffer(sb, ops_l, tuple(pk))

            def body(carry, _):
                return step(ops_l, carry, 0.0), None

            (out, _), _ = jax.lax.scan(body, (tuple(pk), sb0), None,
                                       length=NSTEP)
            return out

        fn = jax.jit(jax.shard_map(
            roll, mesh=el_mesh,
            in_specs=(op_specs,) + (st_spec,) * 3,
            out_specs=(st_spec,) * 3,
            check_vma=False))
        out = fn(sb.ops, *packed)

        for got_packed, want in zip(out, ref):
            got = jnp.concatenate([
                unpack_local(meta, got_packed[s:s + 1])
                for s in range(NDEV)], axis=0)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-12)

    def test_fused_sharded_blocked_coastal_matches_single(self):
        """Coastal physics (bathymetry + well-balancing + drag + Coriolis
        + sponge) through the sharded blocked kernel: the coastal terms
        consume only static per-shard data (the bathymetry '+' traces are
        precomputed GLOBALLY, so cut faces see the remote element's bed),
        and the rollout must still match the single-device XLA path."""
        from blitzdg_tpu.ops.sw2d import (SWPhysics, SWState, sw2d_rhs,
                                          apply_filter, sponge_relax)
        from blitzdg_tpu.parallel.blocked_shard import (
            build_sharded_blocked, initial_send_buffer,
            make_sharded_blocked_step_fused, pack_local, unpack_local)
        from blitzdg_tpu.timestepping import ssprk2_step
        from jax.sharding import Mesh, PartitionSpec as P

        NDEV = 8
        mesh0 = box_triangles(8, 8)
        mesh2d, _, _ = partition_mesh(mesh0, NDEV)
        ctx = build_triangle_context(1, mesh2d, filter_cutoff=0.9,
                                     filter_order=1)
        rng = np.random.default_rng(5)
        H = 10.0 + 2.0 * ctx.x + jnp.asarray(
            rng.uniform(0.0, 1.0, size=(ctx.k_elem, 1)))
        Hx, Hy = ctx.grad(H)
        sponge = jnp.asarray(
            rng.uniform(0.0, 0.2, size=(ctx.k_elem, ctx.n_p)))
        phys = SWPhysics(g=9.81, cd=2.5e-3, f_cor=1e-4, H=H, Hx=Hx, Hy=Hy,
                         sponge=sponge)
        sb = build_sharded_blocked(ctx, phys, NDEV, dtype=jnp.float64)
        assert sb.meta.wb and sb.meta.has_bathy and sb.meta.has_sponge
        meta = sb.meta
        DT, NSTEP = 5e-4, 4

        eta = 0.2 * jnp.exp(-8.0 * (ctx.x**2 + ctx.y**2))
        state = SWState(h=H + eta, hu=0.05 * eta, hv=jnp.zeros_like(eta))
        ref = state
        post = lambda f: apply_filter(ctx, f)
        for i in range(NSTEP):
            ref = ssprk2_step(lambda s, t: sw2d_rhs(ctx, s, t, phys),
                              ref, i * DT, DT, post_stage=post)
            ref = sponge_relax(ref, phys, DT)

        step = make_sharded_blocked_step_fused(sb, DT, interpret=True)
        el_mesh = Mesh(np.array(jax.devices()[:NDEV]), ("element",))
        k_loc = sb.k_loc
        packed = tuple(jnp.concatenate([
            pack_local(meta, f[s * k_loc:(s + 1) * k_loc])
            for s in range(NDEV)], axis=0) for f in state)
        op_specs = jax.tree.map(
            lambda a: P("element", *([None] * (a.ndim - 1))), sb.ops)
        st_spec = P("element", None, None, None)

        def roll(ops_l, *pk):
            sb0 = initial_send_buffer(sb, ops_l, tuple(pk))

            def body(carry, _):
                return step(ops_l, carry, 0.0), None

            (out, _), _ = jax.lax.scan(body, (tuple(pk), sb0), None,
                                       length=NSTEP)
            return out

        fn = jax.jit(jax.shard_map(
            roll, mesh=el_mesh,
            in_specs=(op_specs,) + (st_spec,) * 3,
            out_specs=(st_spec,) * 3,
            check_vma=False))
        out = fn(sb.ops, *packed)
        for got_packed, want in zip(out, ref):
            got = jnp.concatenate([
                unpack_local(meta, got_packed[s:s + 1])
                for s in range(NDEV)], axis=0)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-12)

    def test_fused_sharded_blocked_tidal_matches_single(self):
        """Tidal BC_OUT forcing through the sharded blocked kernel: the
        stage time is delivered DYNAMICALLY via an SMEM scalar (the
        in-kernel cos(omega t) ramp needs it), and the rollout must match
        the single-device XLA path with the same forcing."""
        from blitzdg_tpu.context import BC_OUT
        from blitzdg_tpu.ops.sw2d import (SWPhysics, SWState, sw2d_rhs,
                                          apply_filter)
        from blitzdg_tpu.parallel.blocked_shard import (
            build_sharded_blocked, initial_send_buffer,
            make_sharded_blocked_step_fused, pack_local, unpack_local)
        from blitzdg_tpu.timestepping import ssprk2_step
        from jax.sharding import Mesh, PartitionSpec as P

        NDEV = 8
        mesh0 = box_triangles(8, 8, xlim=(0.0, 1.0), ylim=(0.0, 1.0))
        bc = np.asarray(mesh0.bc_type).copy()
        for k in range(mesh0.num_elements):
            for f in range(3):
                a, b = mesh0.etov[k, f], mesh0.etov[k, (f + 1) % 3]
                mx = 0.5 * (mesh0.verts[a, 0] + mesh0.verts[b, 0])
                if bc[k, f] > 0 and abs(mx - 1.0) < 1e-12:
                    bc[k, f] = BC_OUT
        mesh0.set_bc_type(bc)
        mesh2d, _, _ = partition_mesh(mesh0, NDEV)
        ctx = build_triangle_context(1, mesh2d, filter_cutoff=0.9,
                                     filter_order=1)
        phys = SWPhysics(g=9.81)
        TIDE = (10.4, 0.3, 2.0, 0.01)
        sb = build_sharded_blocked(ctx, phys, NDEV, dtype=jnp.float64,
                                   tidal=TIDE)
        assert sb.meta.tidal is not None
        meta = sb.meta
        DT, NSTEP, T0 = 5e-4, 4, 0.02

        def forcing(t):
            h0, amp, om, tau = TIDE
            return h0 + amp * jnp.cos(om * t) * jnp.minimum(t / tau, 1.0)

        eta = 0.2 * jnp.exp(-8.0 * ((ctx.x - 0.5) ** 2 + (ctx.y - 0.5) ** 2))
        state = SWState(h=10.0 + eta, hu=0.05 * eta, hv=jnp.zeros_like(eta))
        ref, t = state, T0
        post = lambda f: apply_filter(ctx, f)
        for _ in range(NSTEP):
            ref = ssprk2_step(
                lambda s, tt: sw2d_rhs(ctx, s, tt, phys,
                                       tidal_forcing=forcing),
                ref, t, DT, post_stage=post)
            t += DT

        step = make_sharded_blocked_step_fused(sb, DT, interpret=True)
        el_mesh = Mesh(np.array(jax.devices()[:NDEV]), ("element",))
        k_loc = sb.k_loc
        packed = tuple(jnp.concatenate([
            pack_local(meta, f[s * k_loc:(s + 1) * k_loc])
            for s in range(NDEV)], axis=0) for f in state)
        op_specs = jax.tree.map(
            lambda a: P("element", *([None] * (a.ndim - 1))), sb.ops)
        st_spec = P("element", None, None, None)

        def roll(ops_l, *pk):
            sb0 = initial_send_buffer(sb, ops_l, tuple(pk))

            def body(carry, _):
                st, tt = carry
                return (step(ops_l, st, tt), tt + DT), None

            ((out, _), _), _ = jax.lax.scan(
                body, ((tuple(pk), sb0), T0), None, length=NSTEP)
            return out

        fn = jax.jit(jax.shard_map(
            roll, mesh=el_mesh,
            in_specs=(op_specs,) + (st_spec,) * 3,
            out_specs=(st_spec,) * 3,
            check_vma=False))
        out = fn(sb.ops, *packed)
        for got_packed, want in zip(out, ref):
            got = jnp.concatenate([
                unpack_local(meta, got_packed[s:s + 1])
                for s in range(NDEV)], axis=0)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-12)

    def test_fused_sharded_blocked_wetdry_matches_single(self):
        """Wetting/drying through the sharded blocked kernel: per-stage
        Zhang-Shu limiting inside the stage kernel (emitted traces are
        post-limit) must reproduce the XLA midpoint wet/dry stepper."""
        from blitzdg_tpu.ops.sw2d import SWPhysics, SWState
        from blitzdg_tpu.ops.sw2d_wetdry import ssprk2_step_wetdry
        from blitzdg_tpu.parallel.blocked_shard import (
            build_sharded_blocked, initial_send_buffer,
            make_sharded_blocked_step_fused, pack_local, unpack_local)
        from jax.sharding import Mesh, PartitionSpec as P

        NDEV = 8
        H_FLOOR = 1e-3
        mesh0 = box_triangles(8, 8, xlim=(0.0, 1.0), ylim=(0.0, 1.0))
        mesh2d, _, _ = partition_mesh(mesh0, NDEV)
        ctx = build_triangle_context(1, mesh2d, filter_cutoff=0.9,
                                     filter_order=1)
        H = 1.0 - 1.5 * ctx.x  # beach: dry land for x > 2/3
        Hx = -1.5 * jnp.ones_like(H)
        phys = SWPhysics(g=9.81, cd=1e-3, H=H, Hx=Hx,
                         Hy=jnp.zeros_like(H), well_balanced=False)
        sb = build_sharded_blocked(ctx, phys, NDEV, dtype=jnp.float64,
                                   wetdry=True, h_floor=H_FLOOR)
        assert sb.meta.wetdry
        meta = sb.meta
        DT, NSTEP = 2e-4, 6

        h0 = jnp.maximum(H, H_FLOOR)
        h0 = h0 + 0.1 * jnp.exp(-8.0 * ((ctx.x - 0.3) ** 2
                                        + (ctx.y - 0.5) ** 2))
        state = SWState(h=h0, hu=jnp.zeros_like(h0), hv=jnp.zeros_like(h0))
        ref = state
        for _ in range(NSTEP):
            ref = ssprk2_step_wetdry(ctx, ref, 0.0, DT, phys, H_FLOOR,
                                     scheme="midpoint")

        step = make_sharded_blocked_step_fused(sb, DT, interpret=True)
        el_mesh = Mesh(np.array(jax.devices()[:NDEV]), ("element",))
        k_loc = sb.k_loc
        packed = tuple(jnp.concatenate([
            pack_local(meta, f[s * k_loc:(s + 1) * k_loc])
            for s in range(NDEV)], axis=0) for f in state)
        op_specs = jax.tree.map(
            lambda a: P("element", *([None] * (a.ndim - 1))), sb.ops)
        st_spec = P("element", None, None, None)

        def roll(ops_l, *pk):
            sb0 = initial_send_buffer(sb, ops_l, tuple(pk))

            def body(carry, _):
                return step(ops_l, carry, 0.0), None

            (out, _), _ = jax.lax.scan(body, (tuple(pk), sb0), None,
                                       length=NSTEP)
            return out

        fn = jax.jit(jax.shard_map(
            roll, mesh=el_mesh,
            in_specs=(op_specs,) + (st_spec,) * 3,
            out_specs=(st_spec,) * 3,
            check_vma=False))
        out = fn(sb.ops, *packed)
        for got_packed, want in zip(out, ref):
            got = jnp.concatenate([
                unpack_local(meta, got_packed[s:s + 1])
                for s in range(NDEV)], axis=0)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-12)

    def test_rdma_sharded_blocked_matches_single_device(self):
        """ENDGAME prototype (VERDICT r4 #2): one kernel per step with the
        inter-stage halo exchanged by IN-KERNEL remote DMA
        (pltpu.make_async_remote_copy + send/recv semaphores). The TPU
        interpret mode simulates the remote DMAs on the 8-device CPU
        mesh; the rollout must match the single-device XLA path — with
        the interpreter's RACE DETECTION on, so an unsynchronized
        remote write would fail the test, not just corrupt it."""
        from jax.experimental.pallas import tpu as pltpu

        from blitzdg_tpu.ops.sw2d import (SWPhysics, SWState, sw2d_rhs,
                                          apply_filter)
        from blitzdg_tpu.parallel.blocked_shard import (
            build_sharded_blocked, initial_send_buffer,
            make_sharded_blocked_step_rdma, pack_local, unpack_local)
        from blitzdg_tpu.timestepping import ssprk2_step
        from jax.sharding import Mesh, PartitionSpec as P

        NDEV = 8
        mesh0 = box_triangles(8, 8)
        mesh2d, _, _ = partition_mesh(mesh0, NDEV)
        ctx = build_triangle_context(1, mesh2d, filter_cutoff=0.9,
                                     filter_order=1)
        phys = SWPhysics(g=9.81)
        sb = build_sharded_blocked(ctx, phys, NDEV, dtype=jnp.float64)
        meta = sb.meta
        DT, NSTEP = 5e-4, 3

        eta = jnp.exp(-8.0 * (ctx.x**2 + ctx.y**2))
        state = SWState(h=10.0 + eta, hu=0.1 * eta, hv=jnp.zeros_like(eta))
        ref = state
        post = lambda f: apply_filter(ctx, f)
        for i in range(NSTEP):
            ref = ssprk2_step(lambda s, t: sw2d_rhs(ctx, s, t, phys),
                              ref, i * DT, DT, post_stage=post)

        step = make_sharded_blocked_step_rdma(
            sb, DT,
            interpret=pltpu.InterpretParams(detect_races=True))
        el_mesh = Mesh(np.array(jax.devices()[:NDEV]), ("element",))
        k_loc = sb.k_loc
        packed = tuple(jnp.concatenate([
            pack_local(meta, f[s * k_loc:(s + 1) * k_loc])
            for s in range(NDEV)], axis=0) for f in state)
        op_specs = jax.tree.map(
            lambda a: P("element", *([None] * (a.ndim - 1))), sb.ops)
        st_spec = P("element", None, None, None)

        def roll(ops_l, *pk):
            sb0 = initial_send_buffer(sb, ops_l, tuple(pk))

            def body(carry, _):
                return step(ops_l, carry, 0.0), None

            (out, _), _ = jax.lax.scan(body, (tuple(pk), sb0), None,
                                       length=NSTEP)
            return out

        fn = jax.jit(jax.shard_map(
            roll, mesh=el_mesh,
            in_specs=(op_specs,) + (st_spec,) * 3,
            out_specs=(st_spec,) * 3,
            check_vma=False))
        out = fn(sb.ops, *packed)
        for got_packed, want in zip(out, ref):
            got = jnp.concatenate([
                unpack_local(meta, got_packed[s:s + 1])
                for s in range(NDEV)], axis=0)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-12)

    def test_diff_sharded_blocked_grad_matches_xla(self):
        """Multi-chip MPC adjoint: jax.grad through the SHARDED blocked
        rollout (custom-VJP stage kernels with in-kernel jax.vjp backward
        + natively-transposed lean exchange) must match jax.grad of the
        single-device XLA rollout w.r.t. the initial state."""
        from blitzdg_tpu.ops.sw2d import SWPhysics, SWState, sw2d_rhs, apply_filter
        from blitzdg_tpu.parallel.blocked_shard import (
            build_sharded_blocked, initial_send_buffer,
            make_sharded_blocked_step_diff, pack_local, unpack_local)
        from blitzdg_tpu.timestepping import ssprk2_step
        from jax.sharding import Mesh, PartitionSpec as P

        NDEV = 8
        mesh0 = box_triangles(8, 8)
        mesh2d, _, _ = partition_mesh(mesh0, NDEV)
        ctx = build_triangle_context(1, mesh2d, filter_cutoff=0.9,
                                     filter_order=1)
        phys = SWPhysics(g=9.81)
        sb = build_sharded_blocked(ctx, phys, NDEV, dtype=jnp.float64)
        meta = sb.meta
        DT, NSTEP = 5e-4, 3
        k_loc = sb.k_loc

        eta = jnp.exp(-8.0 * (ctx.x**2 + ctx.y**2))
        h0 = 10.0 + eta
        tgt = 10.0 + 0.5 * eta

        # --- XLA single-device gradient ---
        def xla_loss(h_init):
            s = SWState(h=h_init, hu=0.1 * eta, hv=jnp.zeros_like(eta))
            post = lambda f: apply_filter(ctx, f)
            for i in range(NSTEP):
                s = ssprk2_step(lambda ss, t: sw2d_rhs(ctx, ss, t, phys),
                                s, i * DT, DT, post_stage=post)
            return jnp.sum((s.h - tgt) ** 2) + 0.1 * jnp.sum(s.hu**2)

        g_ref = jax.grad(xla_loss)(h0)

        # --- sharded gradient ---
        step = make_sharded_blocked_step_diff(sb, DT, interpret=True)
        el_mesh = Mesh(np.array(jax.devices()[:NDEV]), ("element",))
        op_specs = jax.tree.map(
            lambda a: P("element", *([None] * (a.ndim - 1))), sb.ops)
        st_spec = P("element", None, None, None)
        vm = sb.ops.vmask[0][None]  # (1, p, NP, M)

        hu0 = 0.1 * eta
        hv0 = jnp.zeros_like(eta)
        packed_fix = tuple(jnp.concatenate([
            pack_local(meta, f[s * k_loc:(s + 1) * k_loc])
            for s in range(NDEV)], axis=0) for f in (hu0, hv0))
        tgt_pk = jnp.concatenate([
            pack_local(meta, tgt[s * k_loc:(s + 1) * k_loc])
            for s in range(NDEV)], axis=0)

        def sh_loss_local(ops_l, hpk, hupk, hvpk, tgt_l):
            pk = (hpk, hupk, hvpk)
            sb0 = initial_send_buffer(sb, ops_l, pk)

            def body(carry, _):
                return step(ops_l, carry, 0.0), None

            ((out, _), _) = jax.lax.scan(body, (pk, sb0), None,
                                         length=NSTEP)[0], None
            h_end, hu_end, _ = out
            loc = (jnp.sum(vm * (h_end - tgt_l) ** 2)
                   + 0.1 * jnp.sum(vm * hu_end**2))
            return jax.lax.psum(loc, "element")

        def total(hpk):
            fn = jax.shard_map(
                sh_loss_local, mesh=el_mesh,
                in_specs=(op_specs,) + (st_spec,) * 3
                + (st_spec,),
                out_specs=P(),
                check_vma=False)
            return fn(sb.ops, hpk, packed_fix[0], packed_fix[1],
                      tgt_pk)

        h_pk = jnp.concatenate([
            pack_local(meta, h0[s * k_loc:(s + 1) * k_loc])
            for s in range(NDEV)], axis=0)
        v0 = float(total(h_pk))
        v_ref = float(xla_loss(h0))
        np.testing.assert_allclose(v0, v_ref, rtol=1e-12)

        g_pk = jax.grad(total)(h_pk)
        g_sh = jnp.concatenate([
            unpack_local(meta, g_pk[s:s + 1]) for s in range(NDEV)], axis=0)
        np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                                   atol=1e-10)

    def test_diff_sharded_blocked_control_grad_matches_xla(self):
        """Multi-chip MPC over CONTROLS: gradients w.r.t. a per-step
        control sequence (linear forcing injectors in the sharded stage
        kernels, control cotangents from the in-kernel pullback) must
        match the single-device XLA gradient."""
        from blitzdg_tpu.ops.sw2d import SWPhysics, SWState, sw2d_rhs, apply_filter
        from blitzdg_tpu.parallel.blocked_shard import (
            build_sharded_blocked, initial_send_buffer,
            make_sharded_blocked_step_diff, pack_local)
        from blitzdg_tpu.timestepping import ssprk2_step
        from jax.sharding import Mesh, PartitionSpec as P

        NDEV = 8
        mesh0 = box_triangles(8, 8)
        mesh2d, _, _ = partition_mesh(mesh0, NDEV)
        ctx = build_triangle_context(1, mesh2d, filter_cutoff=0.9,
                                     filter_order=1)
        phys = SWPhysics(g=9.81)
        bump = np.exp(-8.0 * (np.asarray(ctx.x) ** 2
                              + np.asarray(ctx.y) ** 2))
        BU = np.stack([bump, 0 * bump])
        BV = np.stack([0 * bump, bump])
        sb = build_sharded_blocked(ctx, phys, NDEV, dtype=jnp.float64,
                                   forcing_bu=BU, forcing_bv=BV)
        assert sb.meta.n_ctrl == 2
        meta = sb.meta
        DT, NSTEP = 5e-4, 3
        k_loc = sb.k_loc

        eta = jnp.exp(-8.0 * (ctx.x**2 + ctx.y**2))
        h0 = 10.0 + eta
        state0 = SWState(h=h0, hu=jnp.zeros_like(h0), hv=jnp.zeros_like(h0))
        tgt = 10.0 + 0.5 * eta
        ctrls0 = 0.3 * jnp.asarray(
            np.random.default_rng(7).standard_normal((NSTEP, 2)))
        bmp = jnp.asarray(bump)

        def xla_loss(cs):
            s = state0
            post = lambda f: apply_filter(ctx, f)
            for i in range(NSTEP):
                def rhs(ss, tt, c=cs[i]):
                    r = sw2d_rhs(ctx, ss, tt, phys)
                    return SWState(h=r.h, hu=r.hu + c[0] * bmp,
                                   hv=r.hv + c[1] * bmp)

                s = ssprk2_step(rhs, s, i * DT, DT, post_stage=post)
            return jnp.sum((s.h - tgt) ** 2)

        g_ref = jax.grad(xla_loss)(ctrls0)

        step = make_sharded_blocked_step_diff(sb, DT, interpret=True)
        el_mesh = Mesh(np.array(jax.devices()[:NDEV]), ("element",))
        packed = tuple(jnp.concatenate([
            pack_local(meta, f[s * k_loc:(s + 1) * k_loc])
            for s in range(NDEV)], axis=0) for f in state0)
        tgt_pk = jnp.concatenate([
            pack_local(meta, tgt[s * k_loc:(s + 1) * k_loc])
            for s in range(NDEV)], axis=0)
        vm = sb.ops.vmask[0][None]
        op_specs = jax.tree.map(
            lambda a: P("element", *([None] * (a.ndim - 1))), sb.ops)
        st_spec = P("element", None, None, None)

        def loss_local(ops_l, cs, h_l, hu_l, hv_l, tgt_l):
            pk = (h_l, hu_l, hv_l)
            sb0 = initial_send_buffer(sb, ops_l, pk)

            def body(carry, c):
                return step(ops_l, carry, 0.0, ctrl=c), None

            ((out, _), _) = jax.lax.scan(body, (pk, sb0), cs)[0], None
            return jax.lax.psum(jnp.sum(vm * (out[0] - tgt_l) ** 2),
                                "element")

        def total(cs):
            fn = jax.shard_map(
                loss_local, mesh=el_mesh,
                in_specs=(op_specs, P()) + (st_spec,) * 4,
                out_specs=P(), check_vma=False)
            return fn(sb.ops, cs, *packed, tgt_pk)

        v_sh = float(total(ctrls0))
        v_ref = float(xla_loss(ctrls0))
        np.testing.assert_allclose(v_sh, v_ref, rtol=1e-12)

        g_sh = jax.grad(total)(ctrls0)
        np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                                   rtol=1e-9, atol=1e-12)
