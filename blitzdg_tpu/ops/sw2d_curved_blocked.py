"""Element-blocked fused Pallas kernels for the CURVED weak-form shallow
water path (VERDICT r4 #8: the last solver family without a fused twin).

Same math as ops.sw2d_curved.sw2d_curved_rhs (functional parity target:
reference swhelpers/rhs.py sw2dComputeRHS_curved, sw2d_curved.py driver):
fields interpolated to cubature nodes, weak derivatives Drᵀ W (rx F + ry G),
Gauss-node traces with central+LF flux, per-element mass inverses, sources —
but in the packed (p, rows, M) layout of ops/sw2d_blocked.py so every
dense stage is a full-height kron(I_p, Op) MXU matmul and the Gauss-trace
'+' exchange is the static roll-combo machinery (reused directly).

Four fields (h, hu, hv and the passive tracer hN) ride the lane axis as
(p, rows, 4M) stacks. Two mass modes:
 - 'affine'  — MM_k = J_k · Mref, so MMinv = (1/J_k)·(V Vᵀ): ONE kron
   matmul + a per-element scalar (straight-sided elements);
 - 'general' — per-element MMinv as Np fused row MACs
   out[i] += MMinv[k, i, j] · in[j] with MINV4[j] packed (p, NP, 4M) at
   setup — exact for curved (Gordon-Hall deformed) elements where MMinv
   differs per element; Np tensor ops instead of a K-batched einsum.

Scope v1: wall BCs, Coriolis/drag/bed-slope sources, linear control
forcing, modal filter applied to the WHOLE forced RHS (matching
rollout_controls' post_stage semantics); no wetdry/tidal (the XLA curved
path keeps those). Verified in f64 interpret mode against
sw2d_curved_rhs + ssprk2_step on the curved disk mesh
(tests/test_curved_blocked.py).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..context import BC_WALL, DGContext2D, face_trace_structure
from ._mxu import precision_dot
from .sw2d import SWPhysics
from .sw2d_blocked import LANE, SUB, _face_max, _pad, _plus_trace, _roll  # noqa: F401
from .sw2d_curved import SWStateTracer

N_FIELDS = 4  # h, hu, hv, hN


class CurvedBlockedOps(NamedTuple):
    CV: jnp.ndarray    # (p*NCUB, p*NP) nodal -> cubature interp
    DRT: jnp.ndarray   # (p*NP, p*NCUB) weak Drᵀ
    DST: jnp.ndarray
    GI: jnp.ndarray    # (p*NT, p*NP) nodal -> gauss-face interp
    GIT: jnp.ndarray   # (p*NP, p*NT) its transpose (surface lift)
    FILT: jnp.ndarray  # (p*NP, p*NP)
    VVT: jnp.ndarray   # (p*NP, p*NP) Mref⁻¹ = V Vᵀ ('affine' mass)
    WRX: jnp.ndarray   # (p, NCUB, M) cubature W*rx (0 on pads)
    WRY: jnp.ndarray
    WSX: jnp.ndarray
    WSY: jnp.ndarray
    GNX: jnp.ndarray   # (p, NT, M) gauss normals / weights
    GNY: jnp.ndarray
    GW: jnp.ndarray
    WALL: jnp.ndarray  # (p, NT, M) wall mask on gauss nodes
    cmask: jnp.ndarray  # (C_pad, p, M) combo target masks (gauss faces)
    vmask: jnp.ndarray  # (p, NP, M)
    cvm: jnp.ndarray   # (p, NCUB, M) valid cubature rows/lanes
    gtm: jnp.ndarray   # (p, NT, M) valid gauss rows/lanes
    INVJ4: jnp.ndarray  # (p, 1, 4M) 1/J per element ('affine'; ones else)
    MINV4: jnp.ndarray  # (n_p, p, NP, 4M) per-element MMinv columns
                        # ('general'; (1,1,1,1) otherwise)
    ZX: jnp.ndarray    # (p, NP, M) bed slopes (0 when absent)
    ZY: jnp.ndarray
    BU: jnp.ndarray    # (n_ctrl, p, NP, M) control injectors — already
    BV: jnp.ndarray    # filter-folded when the step uses the filter


class CurvedBlockedMeta(NamedTuple):
    n_p: int
    n_fp: int      # gauss points per face (NG)
    n_faces: int
    k_elem: int
    NP: int
    NCUB: int
    NT: int        # padded n_faces*NG
    Kp: int
    p: int
    M: int
    n_ctrl: int
    g: float
    cd: float
    f_cor: float
    has_bed: bool
    mass_mode: str          # 'affine' | 'general'
    combos: tuple
    trace_mode: str = "rolls"  # _plus_trace/_face_max compatibility
    precision: str = "highest"


def build_curved_blocked_ops(
    ctx: DGContext2D,
    cub,
    gauss,
    phys: SWPhysics,
    forcing_bu: np.ndarray | None = None,  # (n_ctrl, K, Np)
    forcing_bv: np.ndarray | None = None,
    zx: np.ndarray | None = None,
    zy: np.ndarray | None = None,
    dtype=jnp.float32,
    mass_mode: str = "auto",
    use_filter: bool = True,
    precision: str = "highest",
    max_combos: int = 2048,
) -> tuple[CurvedBlockedOps, CurvedBlockedMeta]:
    """Freeze the packed curved operator set (host-side, once).

    ``mass_mode='auto'``: 'affine' when every element's cubature Jacobian
    is constant (straight-sided mesh), else 'general' (per-element MMinv
    — the curved case)."""
    K, n_p = ctx.k_elem, ctx.n_p
    NG = gauss.n_gauss
    n_faces = 3
    n_tr = n_faces * NG
    n_cub = cub.n_cub
    NP, NCUB, NT = _pad(n_p, SUB), _pad(n_cub, SUB), _pad(n_tr, SUB)

    p = max(1, min(LANE // NP, -(-K // LANE)))
    M = _pad(-(-K // p), LANE)
    Kp = p * M

    Jc = np.asarray(cub.J)
    affine = float(np.ptp(Jc, axis=1).max(initial=0.0)) < 1e-10 * float(
        np.abs(Jc).max())
    if mass_mode == "auto":
        mass_mode = "affine" if affine else "general"
    if mass_mode == "affine" and not affine:
        raise ValueError("mass_mode='affine' needs constant per-element J")

    # ---- gauss-face combo decomposition (reuses the nodal machinery) ----
    fts = face_trace_structure(gauss.mapP, NG)
    if fts is None:
        raise ValueError("gauss.mapP lacks face-granular structure")
    face_nbr, face_flip = fts
    nbr_elem = np.asarray(face_nbr).reshape(K, n_faces) // n_faces
    nbr_face = np.asarray(face_nbr).reshape(K, n_faces) % n_faces
    flips = np.asarray(face_flip).reshape(K, n_faces)
    combo_ids: dict[tuple, int] = {}
    masks: list[np.ndarray] = []
    for k in range(K):
        s, l = divmod(k, M)
        for f in range(n_faces):
            k2 = int(nbr_elem[k, f])
            s2, l2 = divmod(k2, M)
            key = (f, (s - s2) % p, (l - l2) % M,
                   int(nbr_face[k, f]), bool(flips[k, f]))
            ci = combo_ids.setdefault(key, len(combo_ids))
            if ci == len(masks):
                masks.append(np.zeros((p, M)))
            masks[ci][s, l] = 1.0
    n_combos = len(combo_ids)
    if n_combos > max_combos:
        raise ValueError(f"{n_combos} gauss roll combos (> {max_combos}); "
                         "reorder elements (rcm_order) first")
    C_pad = _pad(max(n_combos, 1), SUB)
    cmask = np.zeros((C_pad, p, M))
    if masks:
        cmask[:n_combos] = np.stack(masks)

    # ---- reference-element operators ----
    def padm(a, rows, cols):
        out = np.zeros((rows, cols))
        out[: a.shape[0], : a.shape[1]] = np.asarray(a)
        return out

    kron = lambda a: np.kron(np.eye(p), a)
    Vc = np.asarray(cub.V)
    CV = kron(padm(Vc, NCUB, NP))
    DRT = kron(padm(np.asarray(cub.Dr).T, NP, NCUB))
    DST = kron(padm(np.asarray(cub.Ds).T, NP, NCUB))
    GI = kron(padm(np.asarray(gauss.interp), NT, NP))
    GIT = kron(padm(np.asarray(gauss.interp).T, NP, NT))
    FILT = kron(padm(np.asarray(ctx.filter), NP, NP))
    Vn = np.asarray(ctx.V)
    VVT = kron(padm(Vn @ Vn.T, NP, NP))

    def padT3(a, rows, fill=0.0):
        arr = np.asarray(a)
        out = np.full((p, rows, M), fill)
        n = arr.shape[1]
        for s in range(p):
            lo, hi = s * M, min((s + 1) * M, K)
            if lo >= K:
                break
            out[s, :n, : hi - lo] = arr[lo:hi].T
        return out

    Wc = np.asarray(cub.W)
    WRX = padT3(Wc * np.asarray(cub.rx), NCUB)
    WRY = padT3(Wc * np.asarray(cub.ry), NCUB)
    WSX = padT3(Wc * np.asarray(cub.sx), NCUB)
    WSY = padT3(Wc * np.asarray(cub.sy), NCUB)
    GNX = padT3(np.asarray(gauss.nx), NT)
    GNY = padT3(np.asarray(gauss.ny), NT)
    GW = padT3(np.asarray(gauss.W), NT)

    wall_g = np.zeros((K, n_tr))
    w_idx = np.asarray(gauss.bc_idx[BC_WALL])
    w_msk = np.asarray(gauss.bc_mask[BC_WALL])
    wall_g.reshape(-1)[w_idx[w_msk]] = 1.0
    WALL = padT3(wall_g, NT)

    vmask = padT3(np.ones((K, n_p)), NP)
    cvm = padT3(np.ones((K, n_cub)), NCUB)
    gtm = padT3(np.ones((K, n_tr)), NT)

    if mass_mode == "affine":
        invj = padT3(1.0 / Jc[:, :1], 1)  # (p, 1, M)
        INVJ4 = np.tile(invj, (1, 1, N_FIELDS))
        MINV4 = np.zeros((1, 1, 1, 1))
    else:
        INVJ4 = np.ones((p, 1, N_FIELDS * M))
        MMinv = np.asarray(cub.MMinv)  # (K, n_p, n_p)
        MINV4 = np.zeros((n_p, p, NP, N_FIELDS * M))
        for j in range(n_p):
            col = padT3(MMinv[:, :, j], NP)  # (p, NP, M)
            MINV4[j] = np.tile(col, (1, 1, N_FIELDS))

    has_bed = zx is not None
    ZX = padT3(zx, NP) if has_bed else np.zeros((p, NP, M))
    ZY = padT3(zy, NP) if has_bed else np.zeros((p, NP, M))

    if forcing_bu is None:
        forcing_bu = np.zeros((1, K, n_p))
        forcing_bv = np.zeros((1, K, n_p))
    n_ctrl = forcing_bu.shape[0]
    filt_np = np.asarray(ctx.filter)
    fold = (lambda a: a @ filt_np.T) if use_filter else (lambda a: a)
    BU = np.stack([padT3(fold(np.asarray(forcing_bu[c])), NP)
                   for c in range(n_ctrl)])
    BV = np.stack([padT3(fold(np.asarray(forcing_bv[c])), NP)
                   for c in range(n_ctrl)])

    to = lambda a: jnp.asarray(a, dtype=dtype)
    ops = CurvedBlockedOps(
        CV=to(CV), DRT=to(DRT), DST=to(DST), GI=to(GI), GIT=to(GIT),
        FILT=to(FILT), VVT=to(VVT),
        WRX=to(WRX), WRY=to(WRY), WSX=to(WSX), WSY=to(WSY),
        GNX=to(GNX), GNY=to(GNY), GW=to(GW), WALL=to(WALL),
        cmask=to(cmask), vmask=to(vmask), cvm=to(cvm), gtm=to(gtm),
        INVJ4=to(INVJ4), MINV4=to(MINV4), ZX=to(ZX), ZY=to(ZY),
        BU=to(BU), BV=to(BV),
    )
    meta = CurvedBlockedMeta(
        n_p=n_p, n_fp=NG, n_faces=n_faces, k_elem=K,
        NP=NP, NCUB=NCUB, NT=NT, Kp=Kp, p=p, M=M, n_ctrl=n_ctrl,
        g=float(phys.g), cd=float(phys.cd), f_cor=float(phys.f_cor),
        has_bed=has_bed, mass_mode=mass_mode,
        combos=tuple(combo_ids.keys()), precision=precision,
    )
    return ops, meta


def pack_curved(meta: CurvedBlockedMeta, f: jnp.ndarray) -> jnp.ndarray:
    """(..., K, Np) -> packed (..., p, NP, M)."""
    lead = f.shape[:-2]
    ft = jnp.pad(f, tuple((0, 0) for _ in lead)
                 + ((0, meta.Kp - meta.k_elem), (0, meta.NP - meta.n_p)))
    ft = ft.reshape(*lead, meta.p, meta.M, meta.NP)
    return jnp.swapaxes(ft, -1, -2)


def unpack_curved(meta: CurvedBlockedMeta, f: jnp.ndarray) -> jnp.ndarray:
    lead = f.shape[:-3]
    ft = jnp.swapaxes(f, -1, -2).reshape(*lead, meta.Kp, meta.NP)
    return ft[..., : meta.k_elem, : meta.n_p]


def _vmm(OP, x, meta):
    p = meta.p
    xf = x.reshape(p * x.shape[1], x.shape[2])
    y = precision_dot(OP, xf, meta.precision)
    return y.reshape(p, y.shape[0] // p, x.shape[2])


def _safe_norm(u, v):
    r2 = u * u + v * v
    r = jnp.sqrt(jnp.where(r2 > 0.0, r2, 1.0))
    return jnp.where(r2 > 0.0, r, 0.0)


def _curved_rhs_values(h, hu, hv, hN, ctrl, o: CurvedBlockedOps,
                       meta: CurvedBlockedMeta, use_filter: bool):
    """One weak-form RHS on packed values — pure jnp, shared by the step
    and rollout kernels (and jax.vjp'd in the backward kernel)."""
    g, M = meta.g, meta.M
    h = jnp.where(o.vmask > 0, h, 1.0)
    hu = hu * o.vmask
    hv = hv * o.vmask
    hN = hN * o.vmask
    xs = jnp.concatenate([h, hu, hv, hN], axis=2)  # (p, NP, 4M)

    # ---- volume: cubature interpolation + weak divergence ----
    C = _vmm(o.CV, xs, meta)  # (p, NCUB, 4M)
    cut = lambda a, i: a[:, :, i * M:(i + 1) * M]
    ch = jnp.where(o.cvm > 0, cut(C, 0), 1.0)
    chu, chv, chN = cut(C, 1) * o.cvm, cut(C, 2) * o.cvm, cut(C, 3) * o.cvm
    inv_c = 1.0 / ch
    cu, cv = chu * inv_c, chv * inv_c
    pr = 0.5 * g * ch * ch
    F = (chu, chu * cu + pr, chu * cv, chN * cu)
    G = (chv, chu * cv, chv * cv + pr, chN * cv)
    TR = jnp.concatenate([o.WRX * F[i] + o.WRY * G[i] for i in range(4)],
                         axis=2)
    TS = jnp.concatenate([o.WSX * F[i] + o.WSY * G[i] for i in range(4)],
                         axis=2)
    MMRHS = _vmm(o.DRT, TR, meta) + _vmm(o.DST, TS, meta)  # (p, NP, 4M)

    # ---- surface: gauss traces, central + LF flux ----
    Gt = _vmm(o.GI, xs, meta)  # (p, NT, 4M)
    hM = jnp.where(o.gtm > 0, cut(Gt, 0), 1.0)
    huM, hvM, hNM = (cut(Gt, 1) * o.gtm, cut(Gt, 2) * o.gtm,
                     cut(Gt, 3) * o.gtm)
    hP = _plus_trace(hM, o, meta)
    huP = _plus_trace(huM, o, meta)
    hvP = _plus_trace(hvM, o, meta)
    hNP = _plus_trace(hNM, o, meta)

    # wall reflection on gauss nodes
    un2 = 2.0 * (huM * o.GNX + hvM * o.GNY)
    huP = huP + o.WALL * (huM - un2 * o.GNX - huP)
    hvP = hvP + o.WALL * (hvM - un2 * o.GNY - hvP)
    hP = jnp.where(o.gtm > 0, hP, 1.0)

    invM, invP = 1.0 / hM, 1.0 / hP
    uM, vM = huM * invM, hvM * invM
    uP, vP = huP * invP, hvP * invP
    prM, prP = 0.5 * g * hM * hM, 0.5 * g * hP * hP
    FM = (huM, huM * uM + prM, huM * vM, hNM * uM)
    GM = (hvM, huM * vM, hvM * vM + prM, hNM * vM)
    FP = (huP, huP * uP + prP, huP * vP, hNP * uP)
    GP = (hvP, huP * vP, hvP * vP + prP, hNP * vP)
    spdM = _safe_norm(uM, vM) + jnp.sqrt(g * hM)
    spdP = _safe_norm(uP, vP) + jnp.sqrt(g * hP)
    lam = _face_max(jnp.maximum(spdM, spdP), meta)
    qM = (hM, huM, hvM, hNM)
    qP = (hP, huP, hvP, hNP)
    FLX = jnp.concatenate(
        [o.GW * (0.5 * ((FM[i] + FP[i]) * o.GNX + (GM[i] + GP[i]) * o.GNY
                        + lam * (qM[i] - qP[i])))
         for i in range(4)], axis=2)
    MMRHS = MMRHS - _vmm(o.GIT, FLX, meta)

    # ---- per-element mass inverse ----
    if meta.mass_mode == "affine":
        R4 = _vmm(o.VVT, MMRHS, meta) * o.INVJ4
    else:
        R4 = o.MINV4[0] * MMRHS[:, 0:1, :]
        for j in range(1, meta.n_p):
            R4 = R4 + o.MINV4[j] * MMRHS[:, j:j + 1, :]
    R1, R2, R3, R4f = (cut(R4, 0), cut(R4, 1), cut(R4, 2), cut(R4, 3))

    # ---- sources (nodal; drag sign corrected vs reference rhs.py:172) ----
    if meta.cd != 0.0 or meta.f_cor != 0.0:
        inv_h = 1.0 / h
        u, v = hu * inv_h, hv * inv_h
        cdn = meta.cd * _safe_norm(u, v)
        R2 = R2 + meta.f_cor * hv - cdn * u
        R3 = R3 - meta.f_cor * hu - cdn * v
    if meta.has_bed:
        R2 = R2 - g * h * o.ZX
        R3 = R3 - g * h * o.ZY

    if use_filter:
        RF = _vmm(o.FILT, jnp.concatenate([R1, R2, R3, R4f], axis=2), meta)
        R1, R2, R3, R4f = (cut(RF, 0), cut(RF, 1), cut(RF, 2), cut(RF, 3))

    # control forcing (injectors pre-filter-folded at setup when the
    # step filters — matches rollout_controls' post_stage on R + forcing)
    if ctrl is not None:
        for c in range(meta.n_ctrl):
            R2 = R2 + ctrl[c] * o.BU[c]
            R3 = R3 + ctrl[c] * o.BV[c]
    return R1, R2, R3, R4f


def _curved_step_values(h, hu, hv, hN, ctrl, o, meta, dt, use_filter):
    """One SSP-RK2 (midpoint) step, matching timestepping.ssprk2_step."""
    k1 = _curved_rhs_values(h, hu, hv, hN, ctrl, o, meta, use_filter)
    s1 = (h + 0.5 * dt * k1[0], hu + 0.5 * dt * k1[1],
          hv + 0.5 * dt * k1[2], hN + 0.5 * dt * k1[3])
    k2 = _curved_rhs_values(*s1, ctrl, o, meta, use_filter)
    return (h + dt * k2[0], hu + dt * k2[1], hv + dt * k2[2],
            hN + dt * k2[3])


_COP_FIELDS = len(CurvedBlockedOps._fields)


def _step_kernel(meta, dt, use_filter, has_ctrl, h_ref, hu_ref, hv_ref,
                 hN_ref, *refs):
    if has_ctrl:
        ctrl_ref, *refs = refs
        ctrl = [ctrl_ref[0, c] for c in range(meta.n_ctrl)]
    else:
        ctrl = None
    *ops_list, oh, ohu, ohv, ohN = refs
    o = CurvedBlockedOps(*(r[:] for r in ops_list))
    out = _curved_step_values(h_ref[0], hu_ref[0], hv_ref[0], hN_ref[0],
                              ctrl, o, meta, dt, use_filter)
    oh[0], ohu[0], ohv[0], ohN[0] = out


@functools.partial(
    jax.jit, static_argnames=("meta", "dt", "use_filter", "interpret"))
def sw2d_curved_step_blocked(
    ops: CurvedBlockedOps,
    meta: CurvedBlockedMeta,
    h, hu, hv, hN,  # (B, p, NP, M)
    ctrl,  # (B, n_ctrl) or None
    dt: float,
    use_filter: bool = True,
    interpret: bool = False,
):
    """One fused curved SSP-RK2 step, grid over scenarios."""
    B, p, NP, M = h.shape
    vspec = pl.BlockSpec((1, p, NP, M), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    op_specs = [
        pl.BlockSpec(op.shape, lambda i, nd=op.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for op in ops
    ]
    has_ctrl = ctrl is not None
    inputs = [h, hu, hv, hN]
    in_specs = [vspec] * 4
    if has_ctrl:
        inputs.append(ctrl)
        in_specs.append(pl.BlockSpec((1, meta.n_ctrl), lambda i: (i, 0),
                                     memory_space=pltpu.SMEM))
    kernel = functools.partial(_step_kernel, meta, float(dt), use_filter,
                               has_ctrl)
    shp = jax.ShapeDtypeStruct((B, p, NP, M), h.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs + op_specs,
        out_specs=(vspec,) * 4,
        out_shape=(shp,) * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*inputs, *ops)


def _rollout_kernel(meta, dt, spc, n_steps, use_filter, has_ctrl,
                    store_traj, h_ref, hu_ref, hv_ref, hN_ref, *refs):
    if has_ctrl:
        ctrl_ref, *refs = refs
    ops_list = refs[:_COP_FIELDS]
    refs = refs[_COP_FIELDS:]
    if store_traj:
        traj = refs[:4]
        outs = refs[4:8]
        *scr, sem = refs[8:]
    else:
        outs = refs[:4]
        scr = refs[4:]
    o = CurvedBlockedOps(*(r[:] for r in ops_list))
    for s, r in zip(scr, (h_ref, hu_ref, hv_ref, hN_ref)):
        s[:] = r[0]
    b = pl.program_id(0)

    def dmas(t):
        return [pltpu.make_async_copy(scr[i], traj[i].at[b, t], sem.at[i])
                for i in range(4)]

    def body(t, _):
        if store_traj:
            for d in dmas(t):
                d.start()
        if has_ctrl:
            j = t // spc
            ctrl = [ctrl_ref[0, j, c] for c in range(meta.n_ctrl)]
        else:
            ctrl = None
        out = _curved_step_values(scr[0][:], scr[1][:], scr[2][:],
                                  scr[3][:], ctrl, o, meta, dt, use_filter)
        if store_traj:
            for d in dmas(t):
                d.wait()
        for s, v in zip(scr, out):
            s[:] = v
        return 0

    jax.lax.fori_loop(0, n_steps, body, 0)
    if store_traj:
        for d in dmas(n_steps):
            d.start()
        for d in dmas(n_steps):
            d.wait()
    for i in range(4):
        outs[i][0] = scr[i][:]


@functools.partial(
    jax.jit,
    static_argnames=("meta", "dt", "spc", "n_steps", "use_filter",
                     "store_traj", "interpret"))
def sw2d_curved_rollout_blocked(
    ops: CurvedBlockedOps,
    meta: CurvedBlockedMeta,
    h, hu, hv, hN,  # (B, p, NP, M)
    ctrls,  # (B, n_ctrl_steps, n_ctrl) or None
    dt: float,
    spc: int = 1,
    n_steps: int | None = None,
    use_filter: bool = True,
    store_traj: bool = False,
    interpret: bool = False,
):
    """Fused curved SSP-RK2 rollout; whole trajectory in VMEM, optional
    HBM-DMA'd step-start states for the MPC adjoint."""
    B, p, NP, M = h.shape
    has_ctrl = ctrls is not None
    if has_ctrl:
        n_steps = ctrls.shape[1] * spc
    assert n_steps is not None
    vspec = pl.BlockSpec((1, p, NP, M), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    op_specs = [
        pl.BlockSpec(op.shape, lambda i, nd=op.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for op in ops
    ]
    inputs = [h, hu, hv, hN]
    in_specs = [vspec] * 4
    if has_ctrl:
        inputs.append(ctrls)
        in_specs.append(pl.BlockSpec((1, ctrls.shape[1], meta.n_ctrl),
                                     lambda i: (i, 0, 0),
                                     memory_space=pltpu.SMEM))
    shp = jax.ShapeDtypeStruct((B, p, NP, M), h.dtype)
    out_shape = [shp] * 4
    out_specs = [vspec] * 4
    scratch = [pltpu.VMEM((p, NP, M), h.dtype)] * 4
    if store_traj:
        tshp = jax.ShapeDtypeStruct((B, n_steps + 1, p, NP, M), h.dtype)
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        out_shape = [tshp] * 4 + out_shape
        out_specs = [any_spec] * 4 + out_specs
        scratch = scratch + [pltpu.SemaphoreType.DMA((4,))]
    kernel = functools.partial(_rollout_kernel, meta, float(dt), spc,
                               n_steps, use_filter, has_ctrl, store_traj)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs + op_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*inputs, *ops)


def _rollout_bwd_kernel(meta, dt, spc, n_steps, use_filter, ctrl_ref,
                        *refs):
    """Reverse sweep: stored step-start states DMA'd back, pullback via
    jax.vjp of the SAME step values function traced in-kernel — the
    proven blocked-adjoint pattern, stage-split to bound the residual
    stack (ops/sw2d_blocked.py:_rollout_bwd_kernel rationale)."""
    ops_list = refs[:_COP_FIELDS]
    traj = refs[_COP_FIELDS:_COP_FIELDS + 4]
    tb = refs[_COP_FIELDS + 4:_COP_FIELDS + 8]
    xb = refs[_COP_FIELDS + 8:_COP_FIELDS + 12]
    cb_ref = refs[_COP_FIELDS + 12]
    lam = refs[_COP_FIELDS + 13:_COP_FIELDS + 17]
    scur = refs[_COP_FIELDS + 17:_COP_FIELDS + 21]
    gco = refs[_COP_FIELDS + 21:_COP_FIELDS + 25]
    sem = refs[_COP_FIELDS + 25]
    o = CurvedBlockedOps(*(r[:] for r in ops_list))
    b = pl.program_id(0)

    for r in lam:
        r[:] = jnp.zeros_like(r)
    for j in range(cb_ref.shape[1]):
        for c in range(cb_ref.shape[2]):
            cb_ref[0, j, c] = jnp.zeros((), cb_ref.dtype)

    def load(t):
        copies = [pltpu.make_async_copy(traj[i].at[b, t], scur[i],
                                        sem.at[i]) for i in range(4)] + \
                 [pltpu.make_async_copy(tb[i].at[b, t + 1], gco[i],
                                        sem.at[4 + i]) for i in range(4)]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

    def body(i, _):
        t = n_steps - 1 - i
        load(t)
        j = t // spc
        ctrl = tuple(ctrl_ref[0, j, c] for c in range(meta.n_ctrl))
        lam_t = [lam[i2][:] + gco[i2][:] for i2 in range(4)]
        s0 = tuple(s[:] for s in scur)

        def rhs_fn(st, cc):
            return _curved_rhs_values(*st, list(cc), o, meta, use_filter)

        k1 = rhs_fn(s0, ctrl)
        s1 = tuple(u + 0.5 * dt * k for u, k in zip(s0, k1))
        # s2 = s + dt k2(s1): lambda_k2 = dt * lambda
        _, vjpB = jax.vjp(rhs_fn, s1, ctrl)
        g1, cbB = vjpB(tuple(dt * l for l in lam_t))
        # s1 = s + dt/2 k1(s): lambda_k1 = dt/2 * lambda_s1
        _, vjpA = jax.vjp(rhs_fn, s0, ctrl)
        g0, cbA = vjpA(tuple(0.5 * dt * g for g in g1))
        for i2 in range(4):
            lam[i2][:] = lam_t[i2] + g1[i2] + g0[i2]
        for c in range(meta.n_ctrl):
            cb_ref[0, j, c] = cb_ref[0, j, c] + cbB[c] + cbA[c]
        return 0

    jax.lax.fori_loop(0, n_steps, body, 0)
    copies = [pltpu.make_async_copy(tb[i].at[b, 0], gco[i], sem.at[i])
              for i in range(4)]
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()
    for i in range(4):
        xb[i][0] = lam[i][:] + gco[i][:]


@functools.partial(
    jax.jit,
    static_argnames=("meta", "dt", "spc", "use_filter", "interpret"))
def sw2d_curved_rollout_bwd_blocked(
    ops, meta, traj, tb, ctrls, dt, spc, use_filter=True, interpret=False
):
    """traj/tb: 4-tuples of (B, n_steps+1, p, NP, M)."""
    B, n_steps_p1, p, NP, M = traj[0].shape
    n_steps = n_steps_p1 - 1
    n_ctrl_steps = ctrls.shape[1]
    vspec = pl.BlockSpec((1, p, NP, M), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    ctrl_spec = pl.BlockSpec((1, n_ctrl_steps, meta.n_ctrl),
                             lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    op_specs = [
        pl.BlockSpec(op.shape, lambda i, nd=op.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for op in ops
    ]
    kernel = functools.partial(_rollout_bwd_kernel, meta, float(dt), spc,
                               n_steps, use_filter)
    shp = jax.ShapeDtypeStruct((B, p, NP, M), traj[0].dtype)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[ctrl_spec, *op_specs] + [any_spec] * 8,
        out_specs=(vspec,) * 4 + (
            pl.BlockSpec((1, n_ctrl_steps, meta.n_ctrl),
                         lambda i: (i, 0, 0), memory_space=pltpu.SMEM),),
        out_shape=(shp,) * 4 + (
            jax.ShapeDtypeStruct((B, n_ctrl_steps, meta.n_ctrl),
                                 ctrls.dtype),),
        scratch_shapes=[pltpu.VMEM((p, NP, M), traj[0].dtype)] * 12
        + [pltpu.SemaphoreType.DMA((8,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(ctrls, *ops, *traj, *tb)


def make_curved_rollout_blocked(ops, meta, dt, spc, use_filter=True,
                                interpret=False):
    """Differentiable fused curved rollout with the jax.vjp-in-kernel
    adjoint — the curved twin of make_rollout_blocked."""

    @jax.custom_vjp
    def rollout(h, hu, hv, hN, ctrls):
        out = sw2d_curved_rollout_blocked(
            ops, meta, h, hu, hv, hN, ctrls, dt, spc=spc,
            use_filter=use_filter, store_traj=True, interpret=interpret)
        return out[0], out[1], out[2], out[3]

    def fwd(h, hu, hv, hN, ctrls):
        traj = rollout(h, hu, hv, hN, ctrls)
        return traj, (traj, ctrls)

    def bwd(res, tbar):
        traj, ctrls = res
        outs = sw2d_curved_rollout_bwd_blocked(
            ops, meta, tuple(traj), tuple(tbar), ctrls, dt, spc,
            use_filter, interpret)
        return (*outs[:4], outs[4])

    rollout.defvjp(fwd, bwd)
    return rollout
