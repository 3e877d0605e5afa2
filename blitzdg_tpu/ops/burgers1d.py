"""1D viscous Burgers equation: LDG right-hand side.

Functional parity target: reference burgers1d::computeRHS
(/root/reference/src/burgers1d/main.cpp:127-229): auxiliary gradient variable
q = sqrt(nu) (rx Dr u - Lift(0.5 Fscale n du)), nonlinear Lax-Friedrichs-type
flux with global max wavespeed, and exact traveling-wave Dirichlet data at
both ends (Burgers2 solution, main.cpp:119-125).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import dg_op
from ..context import DGContext1D


def burgers_exact(x, t, alpha: float, nu: float, c: float):
    """Traveling-wave solution u = c/a - (c/a) tanh((c/2nu)(x - c t))."""
    return (c / alpha) - (c / alpha) * jnp.tanh(0.5 * (c / nu) * (x - c * t))


@dg_op
def burgers1d_rhs(
    ctx: DGContext1D,
    u: jnp.ndarray,
    t,
    c: float = 0.5,
    alpha: float = 1.0,
    nu: float = 0.1,
) -> jnp.ndarray:
    """du/dt for the viscous Burgers equation, u: (K, Np)."""
    K, n_tr = ctx.k_elem, ctx.n_faces * ctx.n_fp
    uf = u.reshape(-1)
    uM, uP = ctx.surface_trace(u)
    nxf = ctx.nx.reshape(-1)
    sqrt_nu = jnp.sqrt(jnp.asarray(nu, dtype=u.dtype))

    maxvel = jnp.max(jnp.abs(u))

    # Dirichlet data from the exact solution at the domain ends.
    xf = ctx.x.reshape(-1)
    uL = burgers_exact(xf[ctx.vmapI], t, alpha, nu, c)
    uR = burgers_exact(xf[ctx.vmapO], t, alpha, nu, c)

    du = uM - uP
    du = du.at[ctx.mapI].set(2.0 * (uf[ctx.vmapI] - uL))
    du = du.at[ctx.mapO].set(2.0 * (uf[ctx.vmapO] - uR))

    # Auxiliary variable q ~ sqrt(nu) u_x (LDG with central gradient flux).
    surf_q = (0.5 * ctx.fscale * ctx.nx * du.reshape(K, n_tr)) @ ctx.lift.T
    q = sqrt_nu * (ctx.rx * (u @ ctx.Dr.T) - surf_q)

    qM, qP = ctx.surface_trace(q)
    dq = 0.5 * (qM - qP)
    dq = dq.at[ctx.mapI].set(0.0)
    dq = dq.at[ctx.mapO].set(0.0)

    # Nonlinear flux jump 0.5 (uM^2 - uP^2), with exact-data boundary jumps.
    du2 = 0.5 * (uM * uM - uP * uP)
    du2 = du2.at[ctx.mapI].set(uf[ctx.vmapI] ** 2 - uL * uL)
    du2 = du2.at[ctx.mapO].set(uf[ctx.vmapO] ** 2 - uR * uR)

    flux = nxf * (0.5 * du2 - sqrt_nu * dq) - 0.5 * maxvel * du

    vol = -(ctx.rx * ((0.5 * u * u - sqrt_nu * q) @ ctx.Dr.T))
    surf = (ctx.fscale * flux.reshape(K, n_tr)) @ ctx.lift.T
    return vol + surf
