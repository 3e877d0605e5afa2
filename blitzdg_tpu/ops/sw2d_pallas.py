"""Fused Pallas TPU kernels for the shallow-water MPC hot path.

The dense-trace RHS (sw2d_rhs_dense) is ~15 small matmuls + flux algebra
per evaluation; as XLA HLO each matmul round-trips HBM between fusions and
the whole SSP-RK2 step runs at ~10% MXU utilization. Here the ENTIRE step
(2 RHS evaluations + modal filter + axpy updates) is one Pallas kernel:
every operator and every intermediate lives in VMEM, the MXU does back-to-
back matmuls, and HBM sees only the state in and the state out.

Scope (the MPC regime, reference workload sw2d coarse_box — BASELINE.md):
 - wall BCs (reflection folded into the dense '+'-trace operators,
   see sw2d_dense.build_dense_trace_ops) plus tidal BC_OUT open-boundary
   forcing hP = h0 + amp*cos(omega t)*ramp (reference sw2d/main.cpp:347-353;
   the scalar is computed in-kernel from the step time);
 - FULL coastal physics (round-4): bathymetry with hydrostatic-
   reconstruction well-balanced star-variable fluxes (reference intent
   sw2d/main.cpp:356-368, 419-421 — same derivation as ops.sw2d),
   bed-slope sources, quadratic bottom drag, Coriolis. The adjoint of the
   coastal RHS is obtained by `jax.vjp` of the SAME values function traced
   inside the backward kernel (the blocked kernel's proven pattern); the
   flat-bottom regime keeps the hand-derived VJP fast path;
 - control forcing LINEAR in the controls and t-independent:
   rhs_{hu,hv} += control @ BU/BV (covers the Gaussian-source MPC forcing);
 - K*Np and K*Nfaces*Nfp padded to the 128-lane boundary; padding lanes are
   masked inside the kernel so 1/h never sees a zero.

Data layout: states are (B, nVp) with nVp = pad(K*Np); the metric factors
(rx, sx, ry, sy) are folded into block-diagonal derivative operators
    DxT = blockdiag(Dr.T)*rx + blockdiag(Ds.T)*sx      (nVp, nVp)
so one matmul computes a full metric-corrected x-derivative, and fscale is
folded into the lift the same way. The per-face Lax-Friedrichs wavespeed
max is computed with lane rolls (group-cyclic shifts of width n_fp), not
gathers.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..context import DGContext2D
from ._mxu import precision_dot
from .sw2d import SWPhysics
from .sw2d_blocked import _roll  # pltpu.roll with an AD (transpose) rule
from .sw2d_dense import DenseTraceOps

LANE = 128


def _pad_to(n: int, m: int = LANE) -> int:
    return ((n + m - 1) // m) * m


class PallasStepOps(NamedTuple):
    """Padded VMEM-resident operators for the fused SSP-RK2 step kernel."""

    # trace extraction (nVp, nTp): '-' trace, '+' trace (h), momentum block
    TRM: jnp.ndarray
    TRP: jnp.ndarray
    TPuu: jnp.ndarray
    TPuv: jnp.ndarray
    TPvu: jnp.ndarray
    TPvv: jnp.ndarray
    # metric-folded block-diagonal volume operators (nVp, nVp)
    DxT: jnp.ndarray
    DyT: jnp.ndarray
    FILT: jnp.ndarray
    # fscale-folded lift (nTp, nVp)
    LFT: jnp.ndarray
    # trace-node normals (1, nTp)
    nx: jnp.ndarray
    ny: jnp.ndarray
    # control forcing injectors (CP, nVp): rhs_hu += c @ BU, rhs_hv += c @ BV
    BU: jnp.ndarray
    BV: jnp.ndarray
    # coastal physics ((1,1) placeholders when off): bed slopes (1, nVp),
    # still-water-depth traces (1, nTp; 1.0 pad), BC_OUT mask (1, nTp)
    Hx: jnp.ndarray
    Hy: jnp.ndarray
    HMt: jnp.ndarray
    HPt: jnp.ndarray
    OBC: jnp.ndarray


class PallasStepMeta(NamedTuple):
    n_v: int  # K * Np (unpadded volume size)
    n_t: int  # K * Nfaces * Nfp (unpadded trace size)
    n_vp: int
    n_tp: int
    n_fp: int
    n_ctrl: int
    cp: int  # padded control width
    g: float
    precision: str = "highest"  # MXU pass count, see ops/_mxu.py
    cd: float = 0.0  # quadratic bottom drag
    f_cor: float = 0.0  # Coriolis parameter
    wb: bool = False  # hydrostatic-reconstruction well-balancing
    has_bathy: bool = False  # bed-slope sources
    # tidal BC_OUT params (h0, amp, omega, ramp_tau) or None
    tidal: tuple | None = None

    @property
    def coastal(self) -> bool:
        """Any physics beyond the flat-bottom wall-only regime (selects the
        jax.vjp backward path over the hand-derived flat VJP)."""
        return (self.wb or self.has_bathy or self.cd != 0.0
                or self.f_cor != 0.0 or self.tidal is not None)


def build_pallas_step_ops(
    ctx: DGContext2D,
    dense: DenseTraceOps,
    phys: SWPhysics,
    forcing_bu: np.ndarray | None = None,  # (n_ctrl, K, Np) hu injector
    forcing_bv: np.ndarray | None = None,
    dtype=jnp.float32,
    precision: str = "highest",
    tidal: tuple | None = None,  # (h0, amp, omega, ramp_tau) BC_OUT forcing
) -> tuple[PallasStepOps, PallasStepMeta]:
    """Freeze the padded operator set. Host-side, runs once at setup.

    Coastal physics (bathymetry/WB/drag/Coriolis from ``phys``, tidal
    BC_OUT forcing from ``tidal``) is compiled into the kernel when
    present — the round-3 NotImplementedError guard is gone."""
    K, n_p = ctx.k_elem, ctx.n_p
    n_fp, n_faces = ctx.n_fp, ctx.n_faces
    n_v, n_t = K * n_p, K * n_faces * n_fp
    n_vp, n_tp = _pad_to(n_v), _pad_to(n_t)

    def padm(a, rows, cols):  # pad a 2-D matrix with zeros
        out = np.zeros((rows, cols), dtype=np.float64)
        out[: a.shape[0], : a.shape[1]] = np.asarray(a)
        return out

    # trace ops stored transposed: (B, nVp) @ (nVp, nTp)
    TRM = padm(np.asarray(dense.SM).T, n_vp, n_tp)
    TRP = padm(np.asarray(dense.SP).T, n_vp, n_tp)
    # huP = hu@PPuu.T + hv@PPuv.T ; hvP = hu@PPvu.T + hv@PPvv.T
    TPuu = padm(np.asarray(dense.PPuu).T, n_vp, n_tp)
    TPuv = padm(np.asarray(dense.PPuv).T, n_vp, n_tp)
    TPvu = padm(np.asarray(dense.PPvu).T, n_vp, n_tp)
    TPvv = padm(np.asarray(dense.PPvv).T, n_vp, n_tp)

    # block-diagonal volume derivative with metric folded into columns
    Dr, Ds = np.asarray(ctx.Dr), np.asarray(ctx.Ds)
    rx = np.asarray(ctx.rx).reshape(-1)
    sx = np.asarray(ctx.sx).reshape(-1)
    ry = np.asarray(ctx.ry).reshape(-1)
    sy = np.asarray(ctx.sy).reshape(-1)
    DxT = np.zeros((n_vp, n_vp))
    DyT = np.zeros((n_vp, n_vp))
    FILT = np.zeros((n_vp, n_vp))
    filt = np.asarray(ctx.filter)
    for k in range(K):
        sl = slice(k * n_p, (k + 1) * n_p)
        # (F @ Dr.T)[i] * rx[i] -> fold rx into columns of Dr.T
        DxT[sl, sl] = Dr.T * rx[sl][None, :] + Ds.T * sx[sl][None, :]
        DyT[sl, sl] = Dr.T * ry[sl][None, :] + Ds.T * sy[sl][None, :]
        FILT[sl, sl] = filt.T

    # lift with fscale folded into rows: surf(d) = (fscale*d) @ lift_big.T
    n_tr = n_faces * n_fp
    fscale = np.asarray(ctx.fscale)  # (K, n_tr)
    lift = np.asarray(ctx.lift)  # (Np, n_tr)
    LFT = np.zeros((n_tp, n_vp))
    for k in range(K):
        rsl = slice(k * n_tr, (k + 1) * n_tr)
        csl = slice(k * n_p, (k + 1) * n_p)
        LFT[rsl, csl] = fscale[k][:, None] * lift.T

    nx = padm(np.asarray(ctx.nx).reshape(1, -1), 1, n_tp)
    ny = padm(np.asarray(ctx.ny).reshape(1, -1), 1, n_tp)

    if forcing_bu is None:
        forcing_bu = np.zeros((1, K, n_p))
        forcing_bv = np.zeros((1, K, n_p))
    n_ctrl = forcing_bu.shape[0]
    cp = _pad_to(n_ctrl, 8)
    BU = padm(np.asarray(forcing_bu).reshape(n_ctrl, -1), cp, n_vp)
    BV = padm(np.asarray(forcing_bv).reshape(n_ctrl, -1), cp, n_vp)

    # ---- coastal physics arrays ----
    from ..context import BC_OUT

    wb = phys.H is not None and phys.well_balanced
    has_bathy = phys.Hx is not None
    one11 = np.zeros((1, 1))
    Hx = Hy = HMt = HPt = OBC = one11
    if has_bathy:
        Hx = padm(np.asarray(phys.Hx).reshape(1, -1), 1, n_vp)
        Hy = padm(np.asarray(phys.Hy).reshape(1, -1), 1, n_vp)
    if wb:
        Hflat = np.asarray(phys.H).reshape(-1)
        HMt = padm((np.asarray(dense.SM) @ Hflat).reshape(1, -1), 1, n_tp)
        HPt = padm((np.asarray(dense.SP) @ Hflat).reshape(1, -1), 1, n_tp)
        HMt[0, n_t:] = 1.0  # pad lanes see benign depth
        HPt[0, n_t:] = 1.0
    if tidal is not None:
        obc = np.zeros(n_t)
        oidx = np.asarray(ctx.bc_maps.idx[BC_OUT])
        omsk = np.asarray(ctx.bc_maps.mask[BC_OUT])
        obc[oidx[omsk]] = 1.0
        OBC = padm(obc.reshape(1, -1), 1, n_tp)

    to = lambda a: jnp.asarray(a, dtype=dtype)
    ops = PallasStepOps(
        TRM=to(TRM), TRP=to(TRP), TPuu=to(TPuu), TPuv=to(TPuv),
        TPvu=to(TPvu), TPvv=to(TPvv), DxT=to(DxT), DyT=to(DyT),
        FILT=to(FILT), LFT=to(LFT), nx=to(nx), ny=to(ny),
        BU=to(BU), BV=to(BV),
        Hx=to(Hx), Hy=to(Hy), HMt=to(HMt), HPt=to(HPt), OBC=to(OBC),
    )
    meta = PallasStepMeta(
        n_v=n_v, n_t=n_t, n_vp=n_vp, n_tp=n_tp, n_fp=n_fp,
        n_ctrl=n_ctrl, cp=cp, g=float(phys.g), precision=precision,
        cd=float(phys.cd), f_cor=float(phys.f_cor), wb=wb,
        has_bathy=has_bathy,
        tidal=tuple(float(v) for v in tidal) if tidal is not None else None,
    )
    return ops, meta


def pad_state(meta: PallasStepMeta, f: jnp.ndarray, fill: float) -> jnp.ndarray:
    """(B, K, Np) field -> (B, nVp) padded flat layout."""
    flat = f.reshape(f.shape[0], -1)
    return jnp.pad(flat, ((0, 0), (0, meta.n_vp - meta.n_v)),
                   constant_values=fill)


def unpad_state(meta: PallasStepMeta, f: jnp.ndarray, k_elem: int) -> jnp.ndarray:
    return f[:, : meta.n_v].reshape(f.shape[0], k_elem, -1)


def _mm(a, b, prec="highest"):
    # 'highest' = full-f32 MXU passes; 'high' = manual bf16_3x (see
    # ops/_mxu.py). The raw single-bf16 default pass rounds the inputs to
    # 8 mantissa bits, which wipes out O(1e-3) surface perturbations
    # riding on h ~ 10 (the same reason the XLA DG ops are pinned to
    # 'highest' — see config.dg_op).
    return precision_dot(a, b, prec)


def _group_max(spd, n_fp):
    """Per-face max over contiguous groups of n_fp lanes via cyclic rolls.

    group-cyclic shift by j:  out[p] = spd[group(p)*n_fp + (p%n_fp - j)%n_fp]
      = roll(spd, j)   where p%n_fp >= j   (stays in group)
      = roll(spd, j-n_fp) otherwise        (wraps within group)
    """
    if n_fp == 1:
        return spd
    lane = jax.lax.broadcasted_iota(jnp.int32, spd.shape, 1)
    n_lanes = spd.shape[-1]
    m = spd
    for j in range(1, n_fp):
        a = _roll(spd, j, 1)
        # shift by (j - n_fp) < 0 expressed as the equivalent positive roll
        b = _roll(spd, n_lanes + j - n_fp, 1)
        m = jnp.maximum(m, jnp.where(lane % n_fp >= j, a, b))
    return m


def _safe_norm_p(u, v):
    """sqrt(u^2+v^2) with a zero (not NaN) gradient at the origin —
    required for the jax.vjp-in-kernel coastal adjoint (ops.sw2d analog)."""
    r2 = u * u + v * v
    r = jnp.sqrt(jnp.where(r2 > 0.0, r2, 1.0))
    return jnp.where(r2 > 0.0, r, 0.0)


def _rhs(h, hu, hv, t, ctrl, o, meta: PallasStepMeta):
    """One dense-trace shallow-water RHS on padded (B, nVp) values.

    Pure jnp on values (not refs) — shared by the step and rollout kernels
    (and by `jax.vjp` inside the coastal backward kernel). Physics matches
    ops.sw2d.sw2d_rhs: wall reflection (in the trace operators), tidal
    BC_OUT forcing, hydrostatic-reconstruction well-balanced star fluxes,
    bed-slope/drag/Coriolis sources.
    """
    _mm = functools.partial(precision_dot, prec=meta.precision)
    g = meta.g
    vlane = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
    vmask = vlane < meta.n_v
    h = jnp.where(vmask, h, 1.0)
    hu = jnp.where(vmask, hu, 0.0)
    hv = jnp.where(vmask, hv, 0.0)

    hM = _mm(h, o.TRM)
    hP = _mm(h, o.TRP)
    huM = _mm(hu, o.TRM)
    hvM = _mm(hv, o.TRM)
    huP = _mm(hu, o.TPuu) + _mm(hv, o.TPuv)
    hvP = _mm(hu, o.TPvu) + _mm(hv, o.TPvv)

    tlane = jax.lax.broadcasted_iota(jnp.int32, hM.shape, 1)
    tmask = tlane < meta.n_t
    hM = jnp.where(tmask, hM, 1.0)
    hP = jnp.where(tmask, hP, 1.0)

    # tidal open boundary: prescribe total depth on BC_OUT trace nodes
    # (reference sw2d/main.cpp:347-353; scalar computed in-kernel)
    if meta.tidal is not None:
        h0, amp, omega, ramp_tau = meta.tidal
        ramp = jnp.minimum(t / ramp_tau, 1.0) if ramp_tau > 0 else 1.0
        h_bc = h0 + amp * jnp.cos(omega * t) * ramp
        hP = hP + o.OBC * (h_bc - hP)

    nx, ny = o.nx, o.ny
    if meta.wb:
        # hydrostatic-reconstruction star variables (ops.sw2d._lf_flux_jumps;
        # reference sw2d/main.cpp:356-368, 419-421 intent)
        uM, vM = huM / hM, hvM / hM
        uP, vP = huP / hP, hvP / hP
        bstar = jnp.maximum(-o.HMt, -o.HPt)
        hMs = jnp.maximum(0.0, hM - o.HMt - bstar)
        hPs = jnp.maximum(0.0, hP - o.HPt - bstar)
        corr = (hM - hMs) * (uM * nx + vM * ny)

        def flux_uv(hh, uu, vv):
            pr = 0.5 * g * hh * hh
            return (hh * uu, hh * uu * uu + pr, hh * uu * vv,
                    hh * vv, hh * uu * vv, hh * vv * vv + pr)

        F1M, F2M, F3M, G1M, G2M, G3M = flux_uv(hMs, uM, vM)
        F1P, F2P, F3P, G1P, G2P, G3P = flux_uv(hPs, uP, vP)
        spdM = _safe_norm_p(uM, vM) + jnp.sqrt(g * hMs)
        spdP = _safe_norm_p(uP, vP) + jnp.sqrt(g * hPs)
        dq1, dq2, dq3 = hMs - hPs, F1M - F1P, G1M - G1P
    else:
        def flux_c(hh, hhu, hhv):
            inv_h = 1.0 / hh
            p = 0.5 * g * hh * hh
            F2 = hhu * hhu * inv_h + p
            G2 = hhu * hhv * inv_h
            G3 = hhv * hhv * inv_h + p
            return hhu, F2, G2, hhv, G2, G3

        F1M, F2M, F3M, G1M, G2M, G3M = flux_c(hM, huM, hvM)
        F1P, F2P, F3P, G1P, G2P, G3P = flux_c(hP, huP, hvP)
        spdM = jnp.sqrt((huM / hM) ** 2 + (hvM / hM) ** 2) + jnp.sqrt(g * hM)
        spdP = jnp.sqrt((huP / hP) ** 2 + (hvP / hP) ** 2) + jnp.sqrt(g * hP)
        dq1, dq2, dq3 = hM - hP, huM - huP, hvM - hvP
        corr = None

    lam = _group_max(jnp.maximum(spdM, spdP), meta.n_fp)

    dflux1 = 0.5 * ((F1M - F1P) * nx + (G1M - G1P) * ny - lam * dq1)
    dflux2 = 0.5 * ((F2M - F2P) * nx + (G2M - G2P) * ny - lam * dq2)
    dflux3 = 0.5 * ((F3M - F3P) * nx + (G3M - G3P) * ny - lam * dq3)
    if corr is not None:
        dflux1 = dflux1 + corr
        dflux2 = dflux2 + corr * uM
        dflux3 = dflux3 + corr * vM

    def flux(hh, hhu, hhv):
        inv_h = 1.0 / hh
        p = 0.5 * g * hh * hh
        F2 = hhu * hhu * inv_h + p
        G2 = hhu * hhv * inv_h
        G3 = hhv * hhv * inv_h + p
        return hhu, F2, G2, hhv, G2, G3

    F1, F2, F3, G1, G2, G3 = flux(h, hu, hv)
    rhs1 = _mm(dflux1, o.LFT) - _mm(F1, o.DxT) - _mm(G1, o.DyT)
    rhs2 = _mm(dflux2, o.LFT) - _mm(F2, o.DxT) - _mm(G2, o.DyT)
    rhs3 = _mm(dflux3, o.LFT) - _mm(F3, o.DxT) - _mm(G3, o.DyT)

    # sources (reference sw2d main.cpp:460-483; v-drag sign corrected)
    if meta.has_bathy:
        rhs2 = rhs2 + g * h * o.Hx
        rhs3 = rhs3 + g * h * o.Hy
    if meta.cd != 0.0:
        u, v = hu / h, hv / h
        nrm = _safe_norm_p(u, v)
        rhs2 = rhs2 - meta.cd * nrm * u
        rhs3 = rhs3 - meta.cd * nrm * v
    if meta.f_cor != 0.0:
        rhs2 = rhs2 + meta.f_cor * hv
        rhs3 = rhs3 - meta.f_cor * hu

    if ctrl is not None:
        rhs2 = rhs2 + _mm(ctrl, o.BU)
        rhs3 = rhs3 + _mm(ctrl, o.BV)
    return rhs1, rhs2, rhs3


def _eval_rhs(h, hu, hv, t, ctrl, o, meta, use_filter):
    _mm = functools.partial(precision_dot, prec=meta.precision)
    r1, r2, r3 = _rhs(h, hu, hv, t, ctrl, o, meta)
    if use_filter:
        r1, r2, r3 = _mm(r1, o.FILT), _mm(r2, o.FILT), _mm(r3, o.FILT)
    return r1, r2, r3


def _step_values(h, hu, hv, t, ctrl, o, meta, dt, use_filter):
    """One SSP-RK2 step on padded values (kernel-internal)."""

    def eval_rhs(a, b, c, tt):
        return _eval_rhs(a, b, c, tt, ctrl, o, meta, use_filter)

    k1 = eval_rhs(h, hu, hv, t)
    h1 = h + 0.5 * dt * k1[0]
    hu1 = hu + 0.5 * dt * k1[1]
    hv1 = hv + 0.5 * dt * k1[2]
    k2 = eval_rhs(h1, hu1, hv1, t + 0.5 * dt)
    return h + dt * k2[0], hu + dt * k2[1], hv + dt * k2[2]


_OP_FIELDS = len(PallasStepOps._fields)


def _step_kernel(meta, dt, t0, use_filter,
                 h_ref, hu_ref, hv_ref, ctrl_ref, *op_refs):
    *ops_list, oh_ref, ohu_ref, ohv_ref = op_refs
    o = PallasStepOps(*(r[:] for r in ops_list))
    ctrl = ctrl_ref[:] if meta.n_ctrl > 0 else None
    h2, hu2, hv2 = _step_values(
        h_ref[:], hu_ref[:], hv_ref[:], t0, ctrl, o, meta, dt, use_filter
    )
    oh_ref[:] = h2
    ohu_ref[:] = hu2
    ohv_ref[:] = hv2


class PallasStepOpsT(NamedTuple):
    """Transposed operator set for the backward (adjoint) kernel."""

    TRMt: jnp.ndarray  # (nTp, nVp)
    TRPt: jnp.ndarray
    TPuut: jnp.ndarray
    TPuvt: jnp.ndarray
    TPvut: jnp.ndarray
    TPvvt: jnp.ndarray
    DxTt: jnp.ndarray  # (nVp, nVp)
    DyTt: jnp.ndarray
    FILTt: jnp.ndarray
    LFTt: jnp.ndarray  # (nVp, nTp)
    BUt: jnp.ndarray  # (nVp, CP)
    BVt: jnp.ndarray


def transpose_step_ops(ops: PallasStepOps) -> PallasStepOpsT:
    return PallasStepOpsT(
        TRMt=ops.TRM.T, TRPt=ops.TRP.T, TPuut=ops.TPuu.T, TPuvt=ops.TPuv.T,
        TPvut=ops.TPvu.T, TPvvt=ops.TPvv.T, DxTt=ops.DxT.T, DyTt=ops.DyT.T,
        FILTt=ops.FILT.T, LFTt=ops.LFT.T, BUt=ops.BU.T, BVt=ops.BV.T,
    )


def _group_sum(x, n_fp):
    """Sum over contiguous lane groups of width n_fp (see _group_max)."""
    if n_fp == 1:
        return x
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    n_lanes = x.shape[-1]
    acc = x
    for j in range(1, n_fp):
        a = _roll(x, j, 1)
        b = _roll(x, n_lanes + j - n_fp, 1)
        acc = acc + jnp.where(lane % n_fp >= j, a, b)
    return acc


def _rhs_vjp(h, hu, hv, w1, w2, w3, o, oT, meta: PallasStepMeta):
    """Hand-derived VJP of the unfiltered `_rhs` core w.r.t. (h, hu, hv).

    Recomputes the forward internals from the (stored) step state — all in
    VMEM — then runs the chain rule in reverse. Verified against jax.grad
    of the XLA dense path (tests/test_pallas.py).
    """
    _mm = functools.partial(precision_dot, prec=meta.precision)
    g = meta.g
    vlane = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
    vmask = vlane < meta.n_v
    h = jnp.where(vmask, h, 1.0)
    hu = jnp.where(vmask, hu, 0.0)
    hv = jnp.where(vmask, hv, 0.0)

    # ---- forward recompute (same ops as _rhs) ----
    hM = _mm(h, o.TRM)
    hP = _mm(h, o.TRP)
    huM = _mm(hu, o.TRM)
    hvM = _mm(hv, o.TRM)
    huP = _mm(hu, o.TPuu) + _mm(hv, o.TPuv)
    hvP = _mm(hu, o.TPvu) + _mm(hv, o.TPvv)
    tlane = jax.lax.broadcasted_iota(jnp.int32, hM.shape, 1)
    tmask = tlane < meta.n_t
    hM = jnp.where(tmask, hM, 1.0)
    hP = jnp.where(tmask, hP, 1.0)

    invM, invP, invV = 1.0 / hM, 1.0 / hP, 1.0 / h
    uM, vM = huM * invM, hvM * invM
    uP, vP = huP * invP, hvP * invP
    nrmM = jnp.sqrt(uM * uM + vM * vM)
    nrmP = jnp.sqrt(uP * uP + vP * vP)
    spdM = nrmM + jnp.sqrt(g * hM)
    spdP = nrmP + jnp.sqrt(g * hP)
    spd = jnp.maximum(spdM, spdP)
    lam = _group_max(spd, meta.n_fp)
    nx, ny = o.nx, o.ny

    # ---- reverse ----
    # rhs_i = dflux_i@LFT - F_i@DxT - G_i@DyT
    dfb1 = _mm(w1, oT.LFTt)
    dfb2 = _mm(w2, oT.LFTt)
    dfb3 = _mm(w3, oT.LFTt)
    Fb1 = -_mm(w1, oT.DxTt)
    Fb2 = -_mm(w2, oT.DxTt)
    Fb3 = -_mm(w3, oT.DxTt)
    Gb1 = -_mm(w1, oT.DyTt)
    Gb2 = -_mm(w2, oT.DyTt)
    Gb3 = -_mm(w3, oT.DyTt)

    # volume flux adjoint: F1=hu, F2=hu^2/h+p, F3=G2=hu*hv/h, G1=hv,
    # G3=hv^2/h+p, p=g/2 h^2
    w23 = Fb3 + Gb2
    hub = Fb1 + 2.0 * hu * invV * Fb2 + hv * invV * w23
    hvb = Gb1 + 2.0 * hv * invV * Gb3 + hu * invV * w23
    hb = (
        (-(hu * invV) ** 2 + g * h) * Fb2
        + (-(hv * invV) ** 2 + g * h) * Gb3
        - hu * hv * invV * invV * w23
    )

    # dflux_i = 0.5*(dF_i*nx + dG_i*ny - lam*dq_i)
    FMb1, FPb1 = 0.5 * nx * dfb1, -0.5 * nx * dfb1
    FMb2, FPb2 = 0.5 * nx * dfb2, -0.5 * nx * dfb2
    FMb3, FPb3 = 0.5 * nx * dfb3, -0.5 * nx * dfb3
    GMb1, GPb1 = 0.5 * ny * dfb1, -0.5 * ny * dfb1
    GMb2, GPb2 = 0.5 * ny * dfb2, -0.5 * ny * dfb2
    GMb3, GPb3 = 0.5 * ny * dfb3, -0.5 * ny * dfb3
    lamb = -0.5 * (
        (hM - hP) * dfb1 + (huM - huP) * dfb2 + (hvM - hvP) * dfb3
    )
    qb1 = -0.5 * lam * dfb1  # -> dq_i adjoint: +M, -P
    qb2 = -0.5 * lam * dfb2
    qb3 = -0.5 * lam * dfb3

    # lam = group_max(max(spdM, spdP)): split the group-summed cotangent
    # evenly over the argmax lanes (mirrors XLA's reduce_max gradient)
    is_max = (spd == lam).astype(spd.dtype)
    cnt = _group_sum(is_max, meta.n_fp)
    sb = _group_sum(lamb, meta.n_fp) * is_max / cnt
    spdMb = jnp.where(spdM >= spdP, sb, 0.0)
    spdPb = jnp.where(spdM >= spdP, 0.0, sb)

    # spd = ||(hu,hv)/h|| + sqrt(g h):  d nrm/d hu = u/(nrm h),
    # d nrm/d h = -nrm/h, d sqrt(gh)/dh = 0.5 sqrt(g/h)
    safeM = jnp.where(nrmM > 0.0, nrmM, 1.0)
    gradM = jnp.where(nrmM > 0.0, spdMb / (safeM * hM), 0.0)
    huMb = gradM * uM
    hvMb = gradM * vM
    hMb = spdMb * (0.5 * jnp.sqrt(g * invM)) - jnp.where(
        nrmM > 0.0, spdMb * nrmM * invM, 0.0
    )
    safeP = jnp.where(nrmP > 0.0, nrmP, 1.0)
    gradP = jnp.where(nrmP > 0.0, spdPb / (safeP * hP), 0.0)
    huPb = gradP * uP
    hvPb = gradP * vP
    hPb = spdPb * (0.5 * jnp.sqrt(g * invP)) - jnp.where(
        nrmP > 0.0, spdPb * nrmP * invP, 0.0
    )

    # trace flux adjoints (same algebra as the volume flux, on both traces)
    w23M = FMb3 + GMb2
    huMb += FMb1 + 2.0 * huM * invM * FMb2 + hvM * invM * w23M
    hvMb += GMb1 + 2.0 * hvM * invM * GMb3 + huM * invM * w23M
    hMb += (
        (-(huM * invM) ** 2 + g * hM) * FMb2
        + (-(hvM * invM) ** 2 + g * hM) * GMb3
        - huM * hvM * invM * invM * w23M
    )
    w23P = FPb3 + GPb2
    huPb += FPb1 + 2.0 * huP * invP * FPb2 + hvP * invP * w23P
    hvPb += GPb1 + 2.0 * hvP * invP * GPb3 + huP * invP * w23P
    hPb += (
        (-(huP * invP) ** 2 + g * hP) * FPb2
        + (-(hvP * invP) ** 2 + g * hP) * GPb3
        - huP * hvP * invP * invP * w23P
    )

    # dq adjoints: dq1 = hM-hP etc.
    hMb += qb1
    hPb -= qb1
    huMb += qb2
    huPb -= qb2
    hvMb += qb3
    hvPb -= qb3

    # padded trace lanes were overwritten with constants in the forward
    hMb = jnp.where(tmask, hMb, 0.0)
    hPb = jnp.where(tmask, hPb, 0.0)

    # back through the trace matmuls
    hb = hb + _mm(hMb, oT.TRMt) + _mm(hPb, oT.TRPt)
    hub = hub + _mm(huMb, oT.TRMt) + _mm(huPb, oT.TPuut) + _mm(hvPb, oT.TPvut)
    hvb = hvb + _mm(hvMb, oT.TRMt) + _mm(huPb, oT.TPuvt) + _mm(hvPb, oT.TPvvt)

    # padded volume lanes were overwritten with constants in the forward
    hb = jnp.where(vmask, hb, 0.0)
    hub = jnp.where(vmask, hub, 0.0)
    hvb = jnp.where(vmask, hvb, 0.0)
    return hb, hub, hvb


def _eval_rhs_vjp(h, hu, hv, w1, w2, w3, o, oT, meta, use_filter):
    """VJP of the filtered, control-forced RHS. Returns state cotangents
    and the control cotangent contribution."""
    _mm = functools.partial(precision_dot, prec=meta.precision)
    if use_filter:
        w1, w2, w3 = _mm(w1, oT.FILTt), _mm(w2, oT.FILTt), _mm(w3, oT.FILTt)
    cb = _mm(w2, oT.BUt) + _mm(w3, oT.BVt)
    hb, hub, hvb = _rhs_vjp(h, hu, hv, w1, w2, w3, o, oT, meta)
    return hb, hub, hvb, cb


def _rollout_kernel(meta, dt, t0, spc, n_steps, use_filter,
                    h_ref, hu_ref, hv_ref, ctrl_ref, *refs):
    """Full rollout in one kernel invocation: the state lives in VMEM
    scratch across all steps; each step-start state is DMA'd to the HBM
    trajectory buffer (consumed by the MPC cost and the backward kernel)."""
    ops_list = refs[:_OP_FIELDS]
    traj_h, traj_hu, traj_hv = refs[_OP_FIELDS:_OP_FIELDS + 3]
    h_s, hu_s, hv_s, sem = refs[_OP_FIELDS + 3:]
    o = PallasStepOps(*(r[:] for r in ops_list))

    h_s[:] = h_ref[:]
    hu_s[:] = hu_ref[:]
    hv_s[:] = hv_ref[:]

    tile_b = h_ref.shape[0]
    row0 = pl.program_id(0) * tile_b  # traj refs are full-array (ANY space)

    def dmas(t):
        return [
            pltpu.make_async_copy(
                src, dst.at[pl.ds(row0, tile_b), t, :], sem.at[i]
            )
            for i, (src, dst) in enumerate(
                ((h_s, traj_h), (hu_s, traj_hu), (hv_s, traj_hv))
            )
        ]

    def body(t, _):
        # overlap: start storing state t, step on the same (read-only)
        # scratch, wait only before overwriting the scratch
        for d in dmas(t):
            d.start()
        j = t // spc
        ctrl = ctrl_ref[:, j, :]
        tt = t0 + t.astype(h_s.dtype) * dt
        h2, hu2, hv2 = _step_values(
            h_s[:], hu_s[:], hv_s[:], tt, ctrl, o, meta, dt, use_filter
        )
        for d in dmas(t):
            d.wait()
        h_s[:] = h2
        hu_s[:] = hu2
        hv_s[:] = hv2
        return 0

    jax.lax.fori_loop(0, n_steps, body, 0)
    for d in dmas(n_steps):
        d.start()
    for d in dmas(n_steps):
        d.wait()


@functools.partial(
    jax.jit,
    static_argnames=("meta", "dt", "spc", "use_filter", "tile_b", "interpret",
                     "t0"),
)
def sw2d_rollout_pallas(
    ops: PallasStepOps,
    meta: PallasStepMeta,
    h: jnp.ndarray,  # (B, nVp) padded initial state
    hu: jnp.ndarray,
    hv: jnp.ndarray,
    ctrls: jnp.ndarray,  # (B, n_ctrl_steps, CP) padded controls
    dt: float,
    spc: int,  # RK steps per control step
    use_filter: bool = True,
    tile_b: int = 256,
    interpret: bool = False,
    t0: float = 0.0,
):
    """Fused SSP-RK2 rollout over n_ctrl_steps*spc steps.

    Returns the step-start state trajectory (B, n_steps+1, nVp) per field;
    [:, -1] is the final state. Operators are fetched into VMEM once per
    batch tile instead of once per step — the rollout is compute-bound.
    """
    B, n_vp = h.shape
    n_ctrl_steps = ctrls.shape[1]
    n_steps = n_ctrl_steps * spc
    tile_b = min(tile_b, B)
    assert B % tile_b == 0, (B, tile_b)

    state_spec = pl.BlockSpec((tile_b, n_vp), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    ctrl_spec = pl.BlockSpec((tile_b, n_ctrl_steps, meta.cp),
                             lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    op_specs = [
        pl.BlockSpec(op.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for op in ops
    ]
    traj_spec = pl.BlockSpec(memory_space=pl.ANY)  # full array, DMA'd
    traj_shape = jax.ShapeDtypeStruct((B, n_steps + 1, n_vp), h.dtype)

    kernel = functools.partial(
        _rollout_kernel, meta, float(dt), float(t0), spc, n_steps, use_filter
    )
    return pl.pallas_call(
        kernel,
        grid=(B // tile_b,),
        in_specs=[state_spec, state_spec, state_spec, ctrl_spec, *op_specs],
        out_specs=(traj_spec, traj_spec, traj_spec),
        out_shape=(traj_shape, traj_shape, traj_shape),
        scratch_shapes=[
            pltpu.VMEM((tile_b, n_vp), jnp.float32),
            pltpu.VMEM((tile_b, n_vp), jnp.float32),
            pltpu.VMEM((tile_b, n_vp), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
        # the coastal jax.vjp backward (and big-batch rollouts) exceed the
        # conservative 16M scoped-vmem default (measured 16.9M at
        # coarse_box B=512); v5e has 128M VMEM per core
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(h, hu, hv, ctrls, *ops)


_OPT_FIELDS = len(PallasStepOpsT._fields)


def _rollout_bwd_kernel(meta, dt, t0, spc, n_steps, use_filter,
                        ctrl_ref, *refs):
    """Reverse sweep: adjoint of the SSP-RK2 rollout.

    For each step t (T-1 .. 0), the stored step-start state is DMA'd back
    in, the first RK stage is recomputed (rematerialization in VMEM), and
    the adjoint state lambda is propagated through the RHS VJP:
      s_{t+1} = s_t + dt*R(s_t + dt/2*R(s_t))  gives
      a      = VJP_R(s_half)[dt*lambda]
      lambda = lambda + a + VJP_R(s_t)[(dt/2)*a].
    Stored-state cotangents (from the cost) are injected as they appear.

    Flat-bottom regime: the hand-derived `_eval_rhs_vjp` fast path.
    Coastal regime (meta.coastal): `jax.vjp` of the SAME `_eval_rhs`
    values function, traced inside the kernel — the blocked kernel's
    proven pattern (every primitive is differentiable in Mosaic).
    """
    p = 0
    o = PallasStepOps(*(r[:] for r in refs[p:p + _OP_FIELDS]))
    p += _OP_FIELDS
    oT = PallasStepOpsT(*(r[:] for r in refs[p:p + _OPT_FIELDS]))
    p += _OPT_FIELDS
    traj_h, traj_hu, traj_hv, tb_h, tb_hu, tb_hv = refs[p:p + 6]
    p += 6
    xb_h, xb_hu, xb_hv, cb_ref = refs[p:p + 4]
    p += 4
    (l_h, l_hu, l_hv, s_h, s_hu, s_hv, g_h, g_hu, g_hv, sem) = refs[p:]

    tile_b = xb_h.shape[0]
    row0 = pl.program_id(0) * tile_b

    for r in (l_h, l_hu, l_hv):
        r[:] = jnp.zeros_like(r)
    cb_ref[:] = jnp.zeros_like(cb_ref)

    def load(t):
        pairs = (
            (traj_h, s_h), (traj_hu, s_hu), (traj_hv, s_hv),
        )
        gpairs = ((tb_h, g_h), (tb_hu, g_hu), (tb_hv, g_hv))
        copies = [
            pltpu.make_async_copy(src.at[pl.ds(row0, tile_b), t, :], dst,
                                  sem.at[i])
            for i, (src, dst) in enumerate(pairs)
        ] + [
            pltpu.make_async_copy(src.at[pl.ds(row0, tile_b), t + 1, :], dst,
                                  sem.at[3 + i])
            for i, (src, dst) in enumerate(gpairs)
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

    def body(i, _):
        t = n_steps - 1 - i
        load(t)
        j = t // spc
        ctrl = ctrl_ref[:, j, :]

        # inject the stored-state cotangent for s_{t+1}
        lh = l_h[:] + g_h[:]
        lhu = l_hu[:] + g_hu[:]
        lhv = l_hv[:] + g_hv[:]

        h, hu, hv = s_h[:], s_hu[:], s_hv[:]
        tt = t0 + t.astype(h.dtype) * dt
        k1, k2, k3 = _eval_rhs(h, hu, hv, tt, ctrl, o, meta, use_filter)
        hh = h + 0.5 * dt * k1
        hhu = hu + 0.5 * dt * k2
        hhv = hv + 0.5 * dt * k3

        if meta.coastal:
            _, vjpB = jax.vjp(
                lambda a, b, c3, cc: _eval_rhs(
                    a, b, c3, tt + 0.5 * dt, cc, o, meta, use_filter),
                hh, hhu, hhv, ctrl)
            ah, ahu, ahv, cba = vjpB((dt * lh, dt * lhu, dt * lhv))
            _, vjpA = jax.vjp(
                lambda a, b, c3, cc: _eval_rhs(
                    a, b, c3, tt, cc, o, meta, use_filter),
                h, hu, hv, ctrl)
            bh, bhu, bhv, cbb = vjpA(
                (0.5 * dt * ah, 0.5 * dt * ahu, 0.5 * dt * ahv))
        else:
            ah, ahu, ahv, cba = _eval_rhs_vjp(
                hh, hhu, hhv, dt * lh, dt * lhu, dt * lhv, o, oT, meta,
                use_filter
            )
            bh, bhu, bhv, cbb = _eval_rhs_vjp(
                h, hu, hv, 0.5 * dt * ah, 0.5 * dt * ahu, 0.5 * dt * ahv,
                o, oT, meta, use_filter,
            )
        l_h[:] = lh + ah + bh
        l_hu[:] = lhu + ahu + bhu
        l_hv[:] = lhv + ahv + bhv
        cb_ref[:, j, :] = cb_ref[:, j, :] + cba + cbb
        return 0

    jax.lax.fori_loop(0, n_steps, body, 0)

    # initial-state adjoint: lambda + cotangent of the stored initial state
    # (load(t) fetches tbar[t+1]; tbar[0] is fetched explicitly here)
    c = pltpu.make_async_copy(tb_h.at[pl.ds(row0, tile_b), 0, :], g_h, sem.at[0])
    c.start()
    c2 = pltpu.make_async_copy(tb_hu.at[pl.ds(row0, tile_b), 0, :], g_hu, sem.at[1])
    c2.start()
    c3 = pltpu.make_async_copy(tb_hv.at[pl.ds(row0, tile_b), 0, :], g_hv, sem.at[2])
    c3.start()
    c.wait()
    c2.wait()
    c3.wait()
    xb_h[:] = l_h[:] + g_h[:]
    xb_hu[:] = l_hu[:] + g_hu[:]
    xb_hv[:] = l_hv[:] + g_hv[:]


@functools.partial(
    jax.jit,
    static_argnames=("meta", "dt", "spc", "use_filter", "tile_b", "interpret",
                     "t0"),
)
def sw2d_rollout_bwd_pallas(
    ops: PallasStepOps,
    opsT: PallasStepOpsT,
    meta: PallasStepMeta,
    traj_h: jnp.ndarray,  # (B, n_steps+1, nVp) stored forward trajectory
    traj_hu: jnp.ndarray,
    traj_hv: jnp.ndarray,
    tb_h: jnp.ndarray,  # cotangents of the stored trajectory
    tb_hu: jnp.ndarray,
    tb_hv: jnp.ndarray,
    ctrls: jnp.ndarray,  # (B, n_ctrl_steps, CP)
    dt: float,
    spc: int,
    use_filter: bool = True,
    tile_b: int = 256,
    interpret: bool = False,
    t0: float = 0.0,
):
    B, n_steps_p1, n_vp = traj_h.shape
    n_steps = n_steps_p1 - 1
    n_ctrl_steps = ctrls.shape[1]
    tile_b = min(tile_b, B)
    assert B % tile_b == 0, (B, tile_b)

    state_spec = pl.BlockSpec((tile_b, n_vp), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    ctrl_spec = pl.BlockSpec((tile_b, n_ctrl_steps, meta.cp),
                             lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    op_specs = [
        pl.BlockSpec(op.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for op in (*ops, *opsT)
    ]

    kernel = functools.partial(
        _rollout_bwd_kernel, meta, float(dt), float(t0), spc, n_steps,
        use_filter
    )
    return pl.pallas_call(
        kernel,
        grid=(B // tile_b,),
        in_specs=[ctrl_spec, *op_specs] + [any_spec] * 6,
        out_specs=(state_spec, state_spec, state_spec, ctrl_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, n_vp), traj_h.dtype),
            jax.ShapeDtypeStruct((B, n_vp), traj_h.dtype),
            jax.ShapeDtypeStruct((B, n_vp), traj_h.dtype),
            jax.ShapeDtypeStruct((B, n_ctrl_steps, meta.cp), ctrls.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((tile_b, n_vp), jnp.float32)] * 9
        + [pltpu.SemaphoreType.DMA((6,))],
        interpret=interpret,
        # the coastal jax.vjp backward (and big-batch rollouts) exceed the
        # conservative 16M scoped-vmem default (measured 16.9M at
        # coarse_box B=512); v5e has 128M VMEM per core
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(ctrls, *ops, *opsT, traj_h, traj_hu, traj_hv, tb_h, tb_hu, tb_hv)


def make_rollout(
    ops: PallasStepOps,
    meta: PallasStepMeta,
    dt: float,
    spc: int,
    use_filter: bool = True,
    tile_b: int = 256,
    interpret: bool = False,
    t0: float = 0.0,
):
    """Differentiable fused rollout: returns rollout(h, hu, hv, ctrls) ->
    (traj_h, traj_hu, traj_hv) with a custom VJP whose backward pass is the
    Pallas adjoint kernel (hand-derived VJP in the flat regime, in-kernel
    jax.vjp in the coastal regime)."""
    opsT = transpose_step_ops(ops)

    @jax.custom_vjp
    def rollout(h, hu, hv, ctrls):
        return sw2d_rollout_pallas(
            ops, meta, h, hu, hv, ctrls, dt, spc, use_filter, tile_b,
            interpret, t0
        )

    def fwd(h, hu, hv, ctrls):
        traj = rollout(h, hu, hv, ctrls)
        return traj, (traj, ctrls)

    def bwd(res, tbar):
        (th, thu, thv), ctrls = res
        tbh, tbhu, tbhv = tbar
        return sw2d_rollout_bwd_pallas(
            ops, opsT, meta, th, thu, thv, tbh, tbhu, tbhv, ctrls,
            dt, spc, use_filter, tile_b, interpret, t0,
        )

    rollout.defvjp(fwd, bwd)
    return rollout


@functools.partial(
    jax.jit,
    static_argnames=("meta", "dt", "use_filter", "tile_b", "interpret", "t0"),
)
def sw2d_step_pallas(
    ops: PallasStepOps,
    meta: PallasStepMeta,
    h: jnp.ndarray,  # (B, nVp) padded
    hu: jnp.ndarray,
    hv: jnp.ndarray,
    ctrl: jnp.ndarray,  # (B, CP) padded controls
    dt: float,
    use_filter: bool = True,
    tile_b: int = 128,
    interpret: bool = False,
    t0: float = 0.0,
):
    """One fused SSP-RK2 shallow-water step. States stay in padded layout."""
    B, n_vp = h.shape
    tile_b = min(tile_b, B)
    assert B % tile_b == 0, (B, tile_b)
    n_tp, cp = meta.n_tp, meta.cp

    state_spec = pl.BlockSpec((tile_b, n_vp), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    ctrl_spec = pl.BlockSpec((tile_b, cp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    op_specs = [
        pl.BlockSpec(op.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for op in ops
    ]

    kernel = functools.partial(_step_kernel, meta, float(dt), float(t0),
                               use_filter)
    out = pl.pallas_call(
        kernel,
        grid=(B // tile_b,),
        in_specs=[state_spec, state_spec, state_spec, ctrl_spec, *op_specs],
        out_specs=(state_spec, state_spec, state_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, n_vp), h.dtype),
            jax.ShapeDtypeStruct((B, n_vp), h.dtype),
            jax.ShapeDtypeStruct((B, n_vp), h.dtype),
        ),
        interpret=interpret,
        # the coastal jax.vjp backward (and big-batch rollouts) exceed the
        # conservative 16M scoped-vmem default (measured 16.9M at
        # coarse_box B=512); v5e has 128M VMEM per core
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(h, hu, hv, ctrl, *ops)
    return out
