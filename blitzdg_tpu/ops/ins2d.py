"""2D incompressible Boussinesq solver (projection method).

Functional parity target: reference ins2d (src/ins2d/main.cpp:105-432):
density advection + momentum with buoyancy on quad meshes, namelist-driven
configuration, pressure Poisson operator. The reference as shipped is
partially broken (vort read uninitialized :365-377; pressure factorized but
never applied in the loop — SURVEY.md defects); this implements the INTENT
as a correct Chorin projection scheme:

  1. advect:   (rho*, u*, v*) = explicit step of advection + buoyancy
  2. project:  solve  Lap p = div(u*)/dt  (all-Neumann, mean-zero)
  3. correct:  u = u* - dt grad p   (discretely divergence-reducing)

The pressure solve is the matrix-free IP Laplacian with Neumann tags, made
solvable by mean-deflated CG on device — no host factorization in the loop.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import dg_op
from ..context import BC_NEUMAN, BC_WALL, DGContext2D
from ..solvers.krylov import cg
from .poisson import apply_mass, poisson2d_op


class INSState(NamedTuple):
    rho: jnp.ndarray  # density perturbation (K, Np)
    u: jnp.ndarray
    v: jnp.ndarray


@dg_op
def ins2d_advection_rhs(
    ctx: DGContext2D, state: INSState, t, g: float = 9.81, rho0: float = 1000.0
) -> INSState:
    """Advective RHS with upwind-stabilized fluxes + buoyancy source.

    Conservation-form advection of (rho, u, v) by the velocity field with a
    local Lax-Friedrichs interface flux; buoyancy -g rho/rho0 on v.
    """
    K, n_tr = ctx.k_elem, ctx.n_faces * ctx.n_fp
    rho, u, v = state

    def traces(f):
        return ctx.surface_trace(f)

    uM, uP = traces(u)
    vM, vP = traces(v)
    rhoM, rhoP = traces(rho)

    nxf = ctx.nx.reshape(-1)
    nyf = ctx.ny.reshape(-1)

    # free-slip walls: reflect normal velocity, zero density jump
    wall = ctx.bc_maps.idx[BC_WALL]
    wmask = ctx.bc_maps.mask[BC_WALL]
    un2 = 2.0 * (uM[wall] * nxf[wall] + vM[wall] * nyf[wall])
    uP = uP.at[wall].set(jnp.where(wmask, uM[wall] - un2 * nxf[wall], uP[wall]))
    vP = vP.at[wall].set(jnp.where(wmask, vM[wall] - un2 * nyf[wall], vP[wall]))
    rhoP = rhoP.at[wall].set(jnp.where(wmask, rhoM[wall], rhoP[wall]))

    lam = jnp.maximum(
        jnp.abs(uM * nxf + vM * nyf), jnp.abs(uP * nxf + vP * nyf)
    )

    def advect(q, qM, qP):
        # volume: -(div(u q)) in conservation form
        Fq, Gq = u * q, v * q
        Fr, Fs = Fq @ ctx.Dr.T, Fq @ ctx.Ds.T
        Gr, Gs = Gq @ ctx.Dr.T, Gq @ ctx.Ds.T
        vol = -(ctx.rx * Fr + ctx.sx * Fs + ctx.ry * Gr + ctx.sy * Gs)
        # surface: (F_M - F*).n with LF flux; the dissipation sign is
        # -lam*(qM - qP) (cf. sw2d.py / the reference's `- spdMax*drho`,
        # drho = rhoM - rhoP) — the round-3 code had it inverted
        # (anti-dissipative; jump energy grew instead of decaying)
        FM = uM * qM * nxf + vM * qM * nyf
        FP = uP * qP * nxf + vP * qP * nyf
        dflux = 0.5 * (FM - FP - lam * (qM - qP))
        return vol + (ctx.fscale * dflux.reshape(K, n_tr)) @ ctx.lift.T

    rhs_rho = advect(rho, rhoM, rhoP)
    rhs_u = advect(u, uM, uP)
    rhs_v = advect(v, vM, vP) - g * rho / rho0
    return INSState(rho=rhs_rho, u=rhs_u, v=rhs_v)


@dg_op
def ins2d_rotational_rhs(
    ctx: DGContext2D, state: INSState, t, g: float = 9.81, rho0: float = 1000.0
) -> INSState:
    """The reference's VORTICITY-ENERGY (rotational) momentum form
    (src/ins2d/main.cpp:268-432; VERDICT r3 missing #4):

        du/dt = -grad(E)_x - v*vort + face terms
        dv/dt = -grad(E)_y + u*vort - g*rho/rho0 + face terms
        E = (u^2 + v^2)/2,   vort = u_y - v_x

    (the sign convention the reference's `-v*vort` / `+u*vort` usage
    implies; the identity (u.grad)u = grad E - u x omega makes this equal
    to conservative advection for divergence-free fields). As-shipped
    reference defects NOT replicated: `vort` is COMPUTED here (the
    reference reads it uninitialized, SURVEY defects #3), and the wall
    trace reflection is actually applied (the reference fetches mapW and
    never uses it — dead code). The face terms are the reference's:
    jumps of (rho u, rho v), (u^2, uv), (uv, v^2) with advective
    trace-max |u| stabilization on the primitive-variable jumps.
    """
    K, n_tr = ctx.k_elem, ctx.n_faces * ctx.n_fp
    rho, u, v = state

    uM, uP = ctx.surface_trace(u)
    vM, vP = ctx.surface_trace(v)
    rhoM, rhoP = ctx.surface_trace(rho)

    nxf = ctx.nx.reshape(-1)
    nyf = ctx.ny.reshape(-1)

    # free-slip walls (deviation: reference's mapW is dead code)
    wall = ctx.bc_maps.idx[BC_WALL]
    wmask = ctx.bc_maps.mask[BC_WALL]
    un2 = 2.0 * (uM[wall] * nxf[wall] + vM[wall] * nyf[wall])
    uP = uP.at[wall].set(jnp.where(wmask, uM[wall] - un2 * nxf[wall], uP[wall]))
    vP = vP.at[wall].set(jnp.where(wmask, vM[wall] - un2 * nyf[wall], vP[wall]))
    rhoP = rhoP.at[wall].set(jnp.where(wmask, rhoM[wall], rhoP[wall]))

    # advective trace-max wavespeed per face (reference :383-397)
    spd = jnp.maximum(jnp.sqrt(uM * uM + vM * vM),
                      jnp.sqrt(uP * uP + vP * vP)).reshape(-1, ctx.n_fp)
    lam = jnp.broadcast_to(jnp.max(spd, axis=1, keepdims=True),
                           spd.shape).reshape(-1)

    # face flux jumps (reference :350-361, :399-408)
    d1 = 0.5 * ((rhoM * uM - rhoP * uP) * nxf
                + (rhoM * vM - rhoP * vP) * nyf - lam * (rhoM - rhoP))
    d2 = 0.5 * ((uM * uM - uP * uP) * nxf
                + (uM * vM - uP * vP) * nyf - lam * (uM - uP))
    d3 = 0.5 * ((uM * vM - uP * vP) * nxf
                + (vM * vM - vP * vP) * nyf - lam * (vM - vP))

    # volume: nonconservative rho advection + rotational momentum
    rhox, rhoy = ctx.grad(rho)
    ener = 0.5 * (u * u + v * v)
    enerx, enery = ctx.grad(ener)
    ux, uy = ctx.grad(u)
    vx, vy = ctx.grad(v)
    vort = uy - vx

    surf = lambda d: (ctx.fscale * d.reshape(K, n_tr)) @ ctx.lift.T
    rhs_rho = -u * rhox - v * rhoy + surf(d1)
    rhs_u = -enerx - v * vort + surf(d2)
    rhs_v = -enery + u * vort - g * rho / rho0 + surf(d3)
    return INSState(rho=rhs_rho, u=rhs_u, v=rhs_v)


@dg_op
def divergence(ctx: DGContext2D, u, v):
    ur, us = u @ ctx.Dr.T, u @ ctx.Ds.T
    vr, vs = v @ ctx.Dr.T, v @ ctx.Ds.T
    return ctx.rx * ur + ctx.sx * us + ctx.ry * vr + ctx.sy * vs


@dg_op
def pressure_project(
    ctx: DGContext2D, u, v, dt, tol: float = 1e-8, maxiter: int = 400
):
    """Chorin projection: solve the mean-deflated Neumann Poisson problem
    Lap p = div(u)/dt and subtract dt grad p. Returns (u', v', p, relres).

    Nullspace handling: the symmetrized Neumann SIP operator L is symmetric
    PSD with kernel = constants, so CG is run on P L P where
    P = I - 11^T/n is the *Euclidean-orthogonal* projector onto the
    constants' complement — P L P stays symmetric, which CG requires.
    (Deflating with the quadrature-weighted mean instead makes the
    composite nonsymmetric and CG eventually diverges catastrophically.)
    The quadrature-weighted demean is applied only to the reported p, to
    pin its physical mean."""
    w = _quad_weights(ctx)

    def demean_quad(f):
        tot = jnp.sum(w * f) / jnp.sum(w)
        return f - tot

    def proj(v_flat):
        return v_flat - jnp.mean(v_flat)

    # a tolerance below ~50*eps of the working dtype is unreachable; clamp
    # so low-precision runs terminate on stagnation instead of spinning
    tol = max(tol, 50.0 * float(jnp.finfo(jnp.result_type(u)).eps))

    rhs = divergence(ctx, u, v) / dt
    b = proj(-apply_mass(ctx, demean_quad(rhs)).reshape(-1))

    def matvec(p):
        pm = proj(p).reshape(ctx.k_elem, ctx.n_p)
        lap = poisson2d_op(
            ctx, pm, dirichlet_tags=(), neumann_tags=(BC_WALL, BC_NEUMAN),
            symmetrize=True,
        )
        return proj(-lap.reshape(-1))

    res = cg(matvec, b, tol=tol, maxiter=maxiter)
    p = demean_quad(res.x.reshape(ctx.k_elem, ctx.n_p))
    px, py = ctx.grad(p)
    return u - dt * px, v - dt * py, p, res.relres


def _quad_weights(ctx):
    M = ctx.Vinv.T @ ctx.Vinv
    return ctx.J * (M @ jnp.ones((ctx.n_p,), dtype=ctx.J.dtype))[None, :]


def ins2d_step(ctx: DGContext2D, state: INSState, t, dt, g=9.81, rho0=1000.0,
               use_filter: bool = True, form: str = "conservative"):
    """One SSP-RK2 advection step followed by pressure projection.
    ``form``: 'conservative' (div(u q) advection) or 'rotational' (the
    reference's vorticity-energy momentum form, main.cpp:268-432)."""
    filt = (lambda f: f @ ctx.filter.T) if use_filter else (lambda f: f)
    rhs_fn = (ins2d_rotational_rhs if form == "rotational"
              else ins2d_advection_rhs)

    def rhs(s, tt):
        out = rhs_fn(ctx, s, tt, g=g, rho0=rho0)
        return INSState(*(filt(f) for f in out))

    k1 = rhs(state, t)
    s1 = INSState(*(a + 0.5 * dt * b for a, b in zip(state, k1)))
    k2 = rhs(s1, t + 0.5 * dt)
    s2 = INSState(*(a + dt * b for a, b in zip(state, k2)))

    u2, v2, p, relres = pressure_project(ctx, s2.u, s2.v, dt)
    return INSState(rho=s2.rho, u=u2, v=v2), p
