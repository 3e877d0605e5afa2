"""Multi-device tests on the 8-device virtual CPU mesh: partitioning,
pjit auto-sharding, and shard_map halo exchange vs. single-device truth."""
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
    sharded_sw2d_rhs,
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
    ctx, state = problem
    phys = SWPhysics(g=9.81)
    ref = sw2d_rhs(ctx, state, 0.0, phys)

    mesh = make_device_mesh(1, NDEV)
    el2 = P("element", None)

    ctx_specs = _context_specs(ctx)

    state_specs = jax.tree.map(lambda a: el2, state)

    fn = jax.shard_map(
        lambda c, s: sharded_sw2d_rhs(c, s, 0.0, phys),
        mesh=mesh,
        in_specs=(ctx_specs, state_specs),
        out_specs=state_specs,
    )
    out = jax.jit(fn)(ctx, state)
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
