"""Incompressible Boussinesq (ins2d analog) tests: projection reduces
divergence, stratified gravity-wave run stays stable and bounded, namelist
config parsing."""
import jax
import jax.numpy as jnp
import numpy as np

from blitzdg_tpu.config import namelist_get, read_namelist
from blitzdg_tpu.mesh import box_quads, box_triangles
from blitzdg_tpu.ops.ins2d import (
    INSState,
    divergence,
    ins2d_step,
    pressure_project,
)
from blitzdg_tpu.specgrid.quad import build_quad_context
from blitzdg_tpu.specgrid.triangle import build_triangle_context


def test_projection_reduces_divergence():
    ctx = build_triangle_context(3, box_triangles(4, 4))
    # a divergent velocity field
    u = ctx.x**2
    v = ctx.y**2 * 0.5
    div0 = float(jnp.max(jnp.abs(divergence(ctx, u, v))))
    u2, v2, p, relres = pressure_project(ctx, u, v, dt=1e-2)
    div1 = float(jnp.max(jnp.abs(divergence(ctx, u2, v2))))
    assert div1 < 0.2 * div0, (div0, div1)


def test_boussinesq_gravity_waves_stable_quads():
    """Stable stratification + perturbation on quads (the reference ins2d
    runs on quads): energy stays bounded over a short run."""
    ctx = build_quad_context(2, box_quads(4, 4), filter_cutoff=1.5, filter_order=4)
    rho = 0.01 * jnp.exp(-8.0 * (ctx.x**2 + ctx.y**2))
    state = INSState(rho=rho, u=jnp.zeros_like(rho), v=jnp.zeros_like(rho))

    dt = 2e-3
    e0 = float(jnp.sum(state.u**2 + state.v**2 + state.rho**2))
    for i in range(10):
        state, p = ins2d_step(ctx, state, i * dt, dt)
    for f in state:
        assert np.all(np.isfinite(np.asarray(f)))
    # buoyancy converts density perturbation into motion; no blow-up
    assert float(jnp.max(jnp.abs(state.u))) < 1.0
    div = float(jnp.max(jnp.abs(divergence(ctx, state.u, state.v))))
    assert div < 1.0


def test_long_run_stable_f32():
    """Regression: 100 projection steps in f32 previously diverged — the
    quadrature-weighted nullspace deflation made the CG operator
    nonsymmetric, and f32 roundoff triggered catastrophic blow-up around
    step ~10 (p jumped ~7 orders of magnitude in one step)."""
    ctx = build_quad_context(2, box_quads(4, 4), filter_cutoff=1.5,
                             filter_order=4, dtype=jnp.float32)
    rho = 0.01 * jnp.exp(-8.0 * (ctx.x**2 + ctx.y**2))
    state = INSState(rho=rho, u=jnp.zeros_like(rho), v=jnp.zeros_like(rho))
    dt = 2e-3
    step = jax.jit(lambda s, t: ins2d_step(ctx, s, t, dt))
    for i in range(100):
        state, p = step(state, i * dt)
    assert np.all(np.isfinite(np.asarray(state.rho)))
    assert float(jnp.max(jnp.abs(state.u))) < 1e-3
    assert float(jnp.max(jnp.abs(p))) < 1e-2


def test_namelist_roundtrip(tmp_path):
    p = tmp_path / "run.nml"
    p.write_text(
        """# test namelist
gravitationalAcceleration = 9.81
finalTime = 100.0
initialTime = 0
polynomialOrder = 3

CFL = 0.5
meshFile = input/box.msh
"""
    )
    cfg = read_namelist(str(p))
    assert namelist_get(cfg, "polynomialOrder", int) == 3
    assert namelist_get(cfg, "CFL", float) == 0.5
    assert namelist_get(cfg, "MESHFILE") == "input/box.msh"
    assert namelist_get(cfg, "missing", int, default=7) == 7
