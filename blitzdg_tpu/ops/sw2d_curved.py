"""Curved/over-integrated shallow water: weak-form cubature volume integrals
+ Gauss-node surface integrals + per-element mass inverses.

Functional parity target: swhelpers/rhs.py sw2dComputeRHS_curved (:6-176):
fields interpolated to cubature nodes, weak derivatives Dr^T W (rx F + ry G),
Gauss-node traces with central+LF flux 0.5((FM+FP).n + spd dh), per-element
mass solves, source terms (Coriolis, drag, bed slope). Includes a passive
tracer field hN like the reference's 4th equation. The reference's
v-momentum drag sign defect (rhs.py:172, SURVEY.md defects) is corrected.

TPU redesign: per-element mass inverses are precomputed (K, Np, Np) at
setup and applied as ONE batched matmul (MXU) instead of per-element
Cholesky triangular solves in the hot loop; all stages are element-major
einsums XLA fuses around the gathers.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import dg_op
from ..context import BC_WALL, DGContext2D
from ..specgrid.cubature import CubatureContext2D, GaussFaceContext2D
from .sw2d import SWPhysics, _safe_norm


class SWStateTracer(NamedTuple):
    h: jnp.ndarray
    hu: jnp.ndarray
    hv: jnp.ndarray
    hN: jnp.ndarray  # passive tracer (reference sw2d.py hN field)


def _fluxes(h, hu, hv, hN, g):
    inv_h = 1.0 / h
    u, v = hu * inv_h, hv * inv_h
    F1, G1 = hu, hv
    F2 = hu * u + 0.5 * g * h * h
    G2 = hu * v
    F3 = G2
    G3 = hv * v + 0.5 * g * h * h
    F4, G4 = hN * u, hN * v
    return (F1, F2, F3, F4), (G1, G2, G3, G4)


@dg_op
def sw2d_curved_rhs(
    ctx: DGContext2D,
    cub: CubatureContext2D,
    gauss: GaussFaceContext2D,
    state: SWStateTracer,
    t,
    phys: SWPhysics,
    zx: jnp.ndarray | None = None,  # bed slope d(z)/dx at nodal points
    zy: jnp.ndarray | None = None,
    tidal_forcing=None,  # callable t -> prescribed total depth on BC_OUT
) -> SWStateTracer:
    """Weak-form RHS; state fields are (K, Np)."""
    K = ctx.k_elem
    g = phys.g
    h, hu, hv, hN = state

    # --- volume: interpolate to cubature, weak derivatives ---
    at_cub = lambda f: f @ cub.V.T  # (K, Ncub)
    ch, chu, chv, chN = at_cub(h), at_cub(hu), at_cub(hv), at_cub(hN)
    (F1, F2, F3, F4), (G1, G2, G3, G4) = _fluxes(ch, chu, chv, chN, g)

    def weak_div(F, G):
        tr = cub.W * (cub.rx * F + cub.ry * G)
        ts = cub.W * (cub.sx * F + cub.sy * G)
        return tr @ cub.Dr + ts @ cub.Ds  # (K, Np): Dr^T applied from right

    MMRHS1 = weak_div(F1, G1)
    MMRHS2 = weak_div(F2, G2)
    MMRHS3 = weak_div(F3, G3)
    MMRHS4 = weak_div(F4, G4)

    # --- surface: Gauss traces ---
    at_g = lambda f: (f @ gauss.interp.T).reshape(-1)  # flat (K*3NG,)
    gh, ghu, ghv, ghN = at_g(h), at_g(hu), at_g(hv), at_g(hN)
    mM = gauss.mapM.reshape(-1)
    mP = gauss.mapP.reshape(-1)
    hM, hP = gh[mM], gh[mP]
    huM, huP = ghu[mM], ghu[mP]
    hvM, hvP = ghv[mM], ghv[mP]
    hNM, hNP = ghN[mM], ghN[mP]

    nxf = gauss.nx.reshape(-1)
    nyf = gauss.ny.reshape(-1)

    wall = gauss.bc_idx[BC_WALL]
    wmask = gauss.bc_mask[BC_WALL]
    un2 = 2.0 * (huM[wall] * nxf[wall] + hvM[wall] * nyf[wall])
    huP = huP.at[wall].set(jnp.where(wmask, huM[wall] - un2 * nxf[wall], huP[wall]))
    hvP = hvP.at[wall].set(jnp.where(wmask, hvM[wall] - un2 * nyf[wall], hvP[wall]))

    # tidal open boundary on Gauss trace nodes (mirror of the nodal path,
    # reference sw2d/main.cpp:347-353): prescribe total depth on BC_OUT
    if tidal_forcing is not None:
        from ..context import BC_OUT

        ob = gauss.bc_idx[BC_OUT]
        omask = gauss.bc_mask[BC_OUT]
        h_bc = jnp.broadcast_to(
            jnp.asarray(tidal_forcing(t), dtype=hP.dtype), ob.shape)
        hP = hP.at[ob].set(jnp.where(omask, h_bc, hP[ob]))

    (F1M, F2M, F3M, F4M), (G1M, G2M, G3M, G4M) = _fluxes(hM, huM, hvM, hNM, g)
    (F1P, F2P, F3P, F4P), (G1P, G2P, G3P, G4P) = _fluxes(hP, huP, hvP, hNP, g)

    spdM = _safe_norm(huM / hM, hvM / hM) + jnp.sqrt(g * hM)
    spdP = _safe_norm(huP / hP, hvP / hP) + jnp.sqrt(g * hP)
    NG = gauss.n_gauss
    spd = jnp.maximum(spdM, spdP).reshape(K * 3, NG)
    lam = jnp.broadcast_to(jnp.max(spd, axis=1, keepdims=True), spd.shape).reshape(-1)

    shape = (K, 3 * NG)
    flux1 = (0.5 * ((F1M + F1P) * nxf + (G1M + G1P) * nyf + lam * (hM - hP))).reshape(shape)
    flux2 = (0.5 * ((F2M + F2P) * nxf + (G2M + G2P) * nyf + lam * (huM - huP))).reshape(shape)
    flux3 = (0.5 * ((F3M + F3P) * nxf + (G3M + G3P) * nyf + lam * (hvM - hvP))).reshape(shape)
    flux4 = (0.5 * ((F4M + F4P) * nxf + (G4M + G4P) * nyf + lam * (hNM - hNP))).reshape(shape)

    MMRHS1 = MMRHS1 - (gauss.W * flux1) @ gauss.interp
    MMRHS2 = MMRHS2 - (gauss.W * flux2) @ gauss.interp
    MMRHS3 = MMRHS3 - (gauss.W * flux3) @ gauss.interp
    MMRHS4 = MMRHS4 - (gauss.W * flux4) @ gauss.interp

    # --- per-element mass inverse: one batched matmul over K ---
    inv = lambda mm: jnp.einsum("kij,kj->ki", cub.MMinv, mm)
    RHS1 = inv(MMRHS1)
    RHS2 = inv(MMRHS2)
    RHS3 = inv(MMRHS3)
    RHS4 = inv(MMRHS4)

    # --- sources (drag sign corrected on v-momentum vs rhs.py:172) ---
    u, v = hu / h, hv / h
    cd_norm = phys.cd * _safe_norm(u, v)
    RHS2 = RHS2 + phys.f_cor * hv - cd_norm * u
    RHS3 = RHS3 - phys.f_cor * hu - cd_norm * v
    if zx is not None:
        RHS2 = RHS2 - g * h * zx
        RHS3 = RHS3 - g * h * zy

    return SWStateTracer(h=RHS1, hu=RHS2, hv=RHS3, hN=RHS4)
