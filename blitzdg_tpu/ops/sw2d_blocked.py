"""Element-blocked fused Pallas kernels: the LARGE-mesh shallow-water path.

The dense-operator kernel (sw2d_pallas.py) materializes (K*Np, K*Np)
block-diagonal operators — perfect for the K<=200 MPC regime, O((K*Np)^2)
memory beyond it. This module is the scalable twin: states live TRANSPOSED
and PACKED as (p, NP, M) tiles — `p` element groups stacked along sublanes,
`M = Kp/p` elements per group on lanes, nodes within an element on the
remaining sublane rows — so that

 - every volume operation is ONE (p*NP, p*NP) @ (p*NP, n*M) MXU matmul with
   block-diagonal `kron(I_p, Op)` operators: with p = 128 // NP the full
   128-row height of the systolic array is busy (an unpacked (Np, Np)
   operator uses Np of 128 rows and caps MXU utilization at Np/128 — the
   round-2 kernel measured ~1% MFU for exactly this reason),
 - flux algebra is (p, NT, M) VPU work,
 - the per-face Lax-Friedrichs max is a max over n_fp STATIC sublane rows,
 - the '+' trace exchange is a set of static (group-roll, lane-roll)
   combos: at setup the face-neighbor table is decomposed into the distinct
   (local face, group shift, lane shift, neighbor face, flip) combinations
   that occur under the strided element order k = s*M + l; each combo is a
   leading-axis slice-rotate plus one `pltpu.roll` of a (p, n_fp, M) block
   and a masked accumulate. On structured meshes there are O(10) combos; on
   unstructured meshes reorder elements with `parallel.partition.rcm_order`
   first (reverse Cuthill-McKee bounds the lane bandwidth to ~sqrt(K)), or
   use the banded one-hot MXU gather mode ('onehot', unpacked p=1).

When the mesh is affine and the physics source-free (the MPC bench regime),
the modal filter is FOLDED into the operators at setup (FILT@Dr, FILT@Ds,
FILT@LIFT, FILT@BU — exact because rx..sy are per-element constants on
affine elements), removing one matmul pass per RHS.

The whole SSP-RK2 step (2 RHS + filter + axpy) — and the whole ROLLOUT —
runs in VMEM; HBM sees the state once per rollout (plus the optional stored
trajectory for the MPC adjoint).

Physics scope matches ops.sw2d.sw2d_rhs IN FULL: wall reflection, tidal
BC_OUT open-boundary forcing (h0 + amp*cos(omega*t)*ramp, reference
sw2d/main.cpp:347-353 — the time-dependent scalar is computed in-kernel),
bathymetry with hydrostatic-reconstruction well-balancing (star variables,
main.cpp:356-368,419-421; the static bathymetry TRACES are precomputed at
setup so no extra exchange happens in the kernel), bed-slope/quadratic-
drag/Coriolis sources, sponge relaxation after each step, modal filter, and
linear control forcing. Verified against the XLA path in f64 interpret mode
(tests/test_blocked.py), including the full coastal configuration, and
hardware-proven (forward + jax.vjp-in-kernel adjoint) by bench.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..context import BC_WALL, DGContext2D
from ._mxu import precision_dot
from .sw2d import SWPhysics

LANE = 128
SUB = 8  # f32 sublane tile

def _pad(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class BlockedOps(NamedTuple):
    """Setup-time operator/geometry set in the packed (p, rows, M) layout."""

    DR: jnp.ndarray  # (p*NP, p*NP) kron(I_p, Dr)
    DS: jnp.ndarray
    FILT: jnp.ndarray  # (p*NP, p*NP)
    LIFT: jnp.ndarray  # (p*NP, p*NT)
    EM: jnp.ndarray  # (p*NT, p*NP) one-hot '-'-trace extraction
    FDR: jnp.ndarray  # filter-folded variants ((1,1) placeholders when
    FDS: jnp.ndarray  # meta.fold is False)
    FLIFT: jnp.ndarray
    rx: jnp.ndarray  # (p, NP, M) volume metric (zero on pad rows/lanes)
    sx: jnp.ndarray
    ry: jnp.ndarray
    sy: jnp.ndarray
    nx: jnp.ndarray  # (p, NT, M) face-node geometry
    ny: jnp.ndarray
    fscale: jnp.ndarray
    wall: jnp.ndarray  # (p, NT, M) wall-BC mask (1.0 at wall trace nodes)
    vmask: jnp.ndarray  # (p, NP, M) 1.0 at valid volume nodes
    tmask: jnp.ndarray  # (p, NT, M) 1.0 at valid trace nodes
    cmask: jnp.ndarray  # (C_pad, p, M) per-combo target masks
    # one-hot trace-exchange mode (meta.trace_mode == 'onehot', p=1):
    PH: jnp.ndarray  # (n_blocks, WIN, n_faces*128) banded one-hot gathers
    fsel: jnp.ndarray  # (n_faces*n_faces*2, M) neighbor-face/flip masks
    obc: jnp.ndarray  # (p, NT, M) BC_OUT mask (tidal open boundary)
    H: jnp.ndarray  # (p, NP, M) still-water depth (1.0 when absent/pad)
    Hx: jnp.ndarray  # (p, NP, M) bed slopes (0 when absent)
    Hy: jnp.ndarray
    SPNG: jnp.ndarray  # (p, NP, M) sponge coefficient (0 when absent)
    HMt: jnp.ndarray  # (p, NT, M) precomputed '-' trace of H (1.0 pad)
    HPt: jnp.ndarray  # (p, NT, M) precomputed '+' trace of H (1.0 pad)
    BU: jnp.ndarray  # (n_ctrl, p, NP, M) control forcing injectors
    BV: jnp.ndarray
    FBU: jnp.ndarray  # filter-folded injectors ((1,1,1,1) when not fold)
    FBV: jnp.ndarray
    # element-sharding: mask of '+'-trace slots whose values come from a
    # REMOTE shard (delivered per stage as `ext` tensors); (1,1,1) when
    # the kernel runs unsharded (parallel/blocked_shard.py)
    EXTM: jnp.ndarray
    # kernel-I/O lean exchange (round-5: the send gather and recv scatter
    # live IN the kernel as one-hot matmuls, so the only XLA glue between
    # stage launches is slice+ppermute+concat of a tiny (L, 3) buffer):
    #  SGEM (L_s, p*NP): one-hot rows picking the VOLUME node (via fmask)
    #        of each send slot — SG @ kron(EM) folded at setup
    #  SL   (L_s, M): one-hot lane of each send slot
    #  RG   (p*NT, L_r): one-hot target trace row per recv slot
    #  RL   (L_r, M): one-hot target lane per recv slot (flip baked in)
    # all (1, 1)-shaped placeholders when the kernel runs without lean I/O
    SGEM: jnp.ndarray
    SL: jnp.ndarray
    RG: jnp.ndarray
    RL: jnp.ndarray
    # round-5 VPU-census optimizations ('rolls' trace mode):
    #  EM2 (p*2NT, p*NP): [EM; EM-with-reversed-within-face-rows] — the
    #      flip is BAKED into extra matmul rows, deleting every per-combo
    #      flip slice/concat chain from the VPU combo loop
    #  FSNX/FSNY (p, NT, M): fscale*nx / fscale*ny prefolded
    EM2: jnp.ndarray
    FSNX: jnp.ndarray
    FSNY: jnp.ndarray


class BlockedMeta(NamedTuple):
    n_p: int
    n_fp: int
    n_faces: int
    k_elem: int
    NP: int  # padded Np (sublane multiple)
    NT: int  # padded n_faces*n_fp
    Kp: int  # p * M (total padded element slots)
    p: int  # element groups stacked on sublanes (1 = unpacked)
    M: int  # lanes per group (lane multiple)
    n_ctrl: int
    g: float
    cd: float  # quadratic bottom drag (0 = off)
    f_cor: float  # Coriolis parameter (0 = off)
    wb: bool  # hydrostatic-reconstruction well-balancing active
    has_bathy: bool  # bed-slope sources active
    has_sponge: bool
    fold: bool  # filter folded into DR/DS/LIFT/BU (affine, source-free)
    # tidal BC_OUT params (h0, amp, omega, ramp_tau) or None:
    # hP(obc) = h0 + amp*cos(omega*t)*ramp
    tidal: tuple | None
    # static combo table: ((face, group_shift, lane_shift, src_face, flip),…)
    combos: tuple
    # trace-exchange strategy: 'rolls' (static group/lane rolls per combo —
    # O(10) combos on structured meshes), 'rolls_v2' (round-5 experiment:
    # flip-baked EM2 rows + field-stacked combo loop — HALVES the op count
    # but measured 2-8% SLOWER on hardware; kept as the census A/B
    # evidence that the kernel is element-throughput bound, not
    # op-dispatch bound) or 'onehot' (banded one-hot MXU matmuls per
    # 128-lane block — O(K/128) matmuls regardless of combo count; the
    # unstructured-mesh mode, pair with rcm_order; forces p=1)
    trace_mode: str = "rolls"
    win: int = 0  # one-hot source-window width (lanes)
    block_starts: tuple = ()  # per-block static window starts
    precision: str = "highest"  # MXU pass count: highest=f32, high=bf16x3
    # wetting/drying (ops.sw2d_wetdry in-kernel): minmod surface
    # reconstruction of the traces + per-stage positivity limiter + taper
    wetdry: bool = False
    h_floor: float = 1e-3


def matmul_flops_per_step(meta: BlockedMeta) -> float:
    """USEFUL (unpadded) MXU FLOPs of one SSP-RK2 step — for MFU/roofline
    reporting. Counts 2 RHS evals: trace extraction (3 fields), Dr+Ds on
    the 5 unique flux fields, LIFT (3), FILT (3, when not folded)."""
    K, n_p, n_tr = meta.k_elem, meta.n_p, meta.n_faces * meta.n_fp
    per_rhs = (2 * n_tr * n_p * K * 3         # EM trace extraction
               + 2 * 2 * n_p * n_p * K * 5    # Dr, Ds on 5 flux fields
               + 2 * n_p * n_tr * K * 3)      # LIFT
    if not meta.fold:
        per_rhs += 2 * n_p * n_p * K * 3      # separate filter pass
    return 2.0 * per_rhs


def padded_matmul_flops_per_step(meta: BlockedMeta) -> float:
    """EXECUTED MXU FLOPs of one SSP-RK2 step per precision pass — the
    full padded kron(I_p, Op) matmuls the hardware actually runs ('rolls'
    trace mode). useful/executed = p*Np^2/(p*NP)^2-style density: the kron
    block-diagonal zeros and the Np->NP row padding are structural waste
    the systolic array still clocks through. Multiply by the pass count
    (bf16_3x = 3, f32 'highest' = 6) for total executed work."""
    pNP, pNT, M = meta.p * meta.NP, meta.p * meta.NT, meta.M
    per_rhs = (pNT * pNP * 3 * M        # EM trace extraction
               + 2 * pNP * pNP * 5 * M  # DR, DS on the stacked flux block
               + pNP * pNT * 3 * M)     # LIFT
    if not meta.fold:
        per_rhs += pNP * pNP * 3 * M
    return 2.0 * 2.0 * per_rhs  # 2 FLOPs/MAC, 2 RHS evals


def build_blocked_step_ops(
    ctx: DGContext2D,
    phys: SWPhysics,
    forcing_bu: np.ndarray | None = None,  # (n_ctrl, K, Np) hu injector
    forcing_bv: np.ndarray | None = None,
    dtype=jnp.float32,
    max_combos: int = 2048,
    tidal: tuple | None = None,  # (h0, amp, omega, ramp_tau) BC_OUT forcing
    trace_mode: str = "auto",  # 'rolls' | 'onehot' | 'auto'
    pack: int | str = "auto",  # element groups per sublane stack
    fold_filter: bool | str = "auto",
    precision: str = "highest",
    wetdry: bool = False,
    h_floor: float = 1e-3,
) -> tuple[BlockedOps, BlockedMeta]:
    """Freeze the blocked operator set (host-side, once at setup).

    ``trace_mode='auto'`` picks lane rolls when the mesh needs few distinct
    roll combos (structured meshes) and the banded one-hot MXU gather
    otherwise (unstructured meshes — reorder with `rcm_order` first to
    bound the band). ``pack='auto'`` stacks p = 128 // NP element groups on
    sublanes in rolls mode (1 in onehot mode). ``fold_filter='auto'`` folds
    the modal filter into the operators when the mesh is affine and the
    physics has no nonlinear sources.
    """
    K, n_p = ctx.k_elem, ctx.n_p
    n_fp, n_faces = ctx.n_fp, ctx.n_faces
    n_tr = n_faces * n_fp
    NP, NT = _pad(n_p, SUB), _pad(n_tr, SUB)

    if ctx.face_nbr is None:
        raise ValueError("context lacks face-granular trace structure")
    face_nbr = np.asarray(ctx.face_nbr).reshape(K, n_faces)
    face_flip = np.asarray(ctx.face_flip).reshape(K, n_faces)
    nbr_elem = face_nbr // n_faces  # (K, n_faces)
    nbr_face = face_nbr % n_faces

    # ---- pick the trace mode from the UNPACKED combo count (cheap) ----
    base_keys = set()
    Kp0 = _pad(K, LANE)
    for k in range(K):
        for f in range(n_faces):
            base_keys.add((f, (k - int(nbr_elem[k, f])) % Kp0,
                           int(nbr_face[k, f]), bool(face_flip[k, f])))
    if trace_mode == "auto":
        trace_mode = "rolls" if len(base_keys) <= 48 else "onehot"

    # ---- choose the sublane packing factor ----
    if trace_mode == "onehot":
        p = 1  # banded gathers index raw lanes; keep the flat layout
    elif pack == "auto":
        p = max(1, min(LANE // NP, -(-K // LANE)))
    else:
        p = max(1, int(pack))
    M = _pad(-(-K // p), LANE)
    Kp = p * M

    # ---- decompose the '+'-trace map into (face, group shift, lane shift,
    # src_face, flip) combos with per-combo target masks ----
    combo_ids: dict[tuple, int] = {}
    masks: list[np.ndarray] = []
    if trace_mode in ("rolls", "rolls_v2"):
        for k in range(K):
            s, l = divmod(k, M)
            for f in range(n_faces):
                k2 = int(nbr_elem[k, f])
                s2, l2 = divmod(k2, M)
                key = (f, (s - s2) % p, (l - l2) % M,
                       int(nbr_face[k, f]), bool(face_flip[k, f]))
                ci = combo_ids.setdefault(key, len(combo_ids))
                if ci == len(masks):
                    masks.append(np.zeros((p, M)))
                masks[ci][s, l] = 1.0
        n_combos = len(combo_ids)
        if n_combos > max_combos:
            raise ValueError(
                f"trace exchange needs {n_combos} roll combos "
                f"(> {max_combos}); reorder elements with "
                "parallel.partition.rcm_order first, or use "
                "trace_mode='onehot'"
            )
        C_pad = _pad(max(n_combos, 1), SUB)
        cmask = np.zeros((C_pad, p, M))
        if masks:
            cmask[:n_combos] = np.stack(masks)
        combos = tuple(combo_ids.keys())
        PH = np.zeros((1, 1, 1))
        fsel = np.zeros((1, 1))
        win = 0
        block_starts: tuple = ()
    else:
        combos = ()
        cmask = np.zeros((SUB, p, M))
        # per-128-lane-block source windows (aligned to 128)
        n_blocks = M // LANE
        starts, ends = [], []
        for b in range(n_blocks):
            lanes = np.arange(b * LANE, min((b + 1) * LANE, K))
            if lanes.size == 0:
                starts.append(0)
                ends.append(LANE)
                continue
            src = nbr_elem[lanes, :]
            starts.append((int(src.min()) // LANE) * LANE)
            ends.append(int(src.max()) + 1)
        win = max(_pad(e - s0, LANE) for s0, e in zip(starts, ends))
        block_starts = tuple(min(s0, max(M - win, 0)) for s0 in starts)
        PH = np.zeros((n_blocks, win, n_faces * LANE))
        for b, s0 in enumerate(block_starts):
            for f in range(n_faces):
                lanes = np.arange(b * LANE, min((b + 1) * LANE, K))
                j = nbr_elem[lanes, f] - s0
                assert (j >= 0).all() and (j < win).all()
                PH[b, j, f * LANE + (lanes - b * LANE)] = 1.0
        fsel = np.zeros((n_faces * n_faces * 2, M))
        for f in range(n_faces):
            for k in range(K):
                f2 = int(nbr_face[k, f])
                fl = int(bool(face_flip[k, f]))
                fsel[(f * n_faces + f2) * 2 + fl, k] = 1.0

    def padm(a, rows, cols):
        out = np.zeros((rows, cols))
        out[: a.shape[0], : a.shape[1]] = np.asarray(a)
        return out

    def padT3(a, rows, fill=0.0):
        """(K, n) field -> packed transposed (p, rows, M)."""
        arr = np.asarray(a)
        out = np.full((p, rows, M), fill)
        n = arr.shape[1]
        for s in range(p):
            lo, hi = s * M, min((s + 1) * M, K)
            if lo >= K:
                break
            out[s, :n, : hi - lo] = arr[lo:hi].T
        return out

    kron = lambda a: np.kron(np.eye(p), a)

    EM = np.zeros((NT, NP))
    EM[np.arange(n_tr), np.asarray(ctx.fmask).reshape(-1)] = 1.0
    # flip-baked twin: within-face node order reversed (round-5 census
    # optimization — flipped combos read these rows instead of slicing)
    EMR = np.zeros((NT, NP))
    for f in range(n_faces):
        EMR[f * n_fp:(f + 1) * n_fp] = EM[f * n_fp:(f + 1) * n_fp][::-1]
    EM2 = np.concatenate([EM, EMR], axis=0)  # (2NT, NP)
    Dr_p = padm(ctx.Dr, NP, NP)
    Ds_p = padm(ctx.Ds, NP, NP)
    filt_p = padm(ctx.filter, NP, NP)
    lift_p = padm(ctx.lift, NP, NT)

    wall = np.zeros((K, n_tr))
    w_idx = np.asarray(ctx.bc_maps.idx[BC_WALL])
    w_msk = np.asarray(ctx.bc_maps.mask[BC_WALL])
    wall.reshape(-1)[w_idx[w_msk]] = 1.0

    vmask = np.zeros((p, NP, M))
    tmask = np.zeros((p, NT, M))
    for s in range(p):
        lo, hi = s * M, min((s + 1) * M, K)
        if lo >= K:
            break
        vmask[s, :n_p, : hi - lo] = 1.0
        tmask[s, :n_tr, : hi - lo] = 1.0

    if forcing_bu is None:
        forcing_bu = np.zeros((1, K, n_p))
        forcing_bv = np.zeros((1, K, n_p))
    n_ctrl = forcing_bu.shape[0]
    BU = np.stack([padT3(forcing_bu[c], NP) for c in range(n_ctrl)])
    BV = np.stack([padT3(forcing_bv[c], NP) for c in range(n_ctrl)])

    obc = np.zeros((K, n_tr))
    if tidal is not None:
        from ..context import BC_OUT

        o_idx = np.asarray(ctx.bc_maps.idx[BC_OUT])
        o_msk = np.asarray(ctx.bc_maps.mask[BC_OUT])
        obc.reshape(-1)[o_idx[o_msk]] = 1.0

    has_bathy = phys.H is not None
    wb = has_bathy and phys.well_balanced
    if has_bathy:
        Hpk = padT3(np.asarray(phys.H), NP, fill=1.0)
        Hxp = padT3(np.asarray(phys.Hx), NP)
        Hyp = padT3(np.asarray(phys.Hy), NP)
        HMf, HPf = ctx.surface_trace(phys.H)
        HMt = padT3(np.asarray(HMf).reshape(K, n_tr), NT, fill=1.0)
        HPt = padT3(np.asarray(HPf).reshape(K, n_tr), NT, fill=1.0)
    else:
        Hpk = np.ones((p, NP, M))
        Hxp = np.zeros((p, NP, M))
        Hyp = np.zeros((p, NP, M))
        HMt = np.ones((p, NT, M))
        HPt = np.ones((p, NT, M))
    has_sponge = phys.sponge is not None
    SPNG = (padT3(phys.sponge, NP) if has_sponge else np.zeros((p, NP, M)))

    # ---- filter folding: FILT @ (rx*(Dr@F)+…) == rx*((FILT@Dr)@F)+… holds
    # iff the metric is constant within each element (affine elements); the
    # remaining RHS terms must all be linear images of filtered quantities,
    # i.e. no bathymetry/drag/Coriolis sources (control is folded too) ----
    affine = all(
        float(np.ptp(np.asarray(m)[:, :n_p], axis=1).max(initial=0.0)) < 1e-10
        for m in (ctx.rx, ctx.sx, ctx.ry, ctx.sy)
    )
    can_fold = affine and not has_bathy and phys.cd == 0.0 and phys.f_cor == 0.0
    if fold_filter == "auto":
        fold = can_fold
    else:
        fold = bool(fold_filter)
        if fold and not can_fold:
            raise ValueError(
                "fold_filter=True needs affine elements and source-free "
                "physics (bathymetry/drag/Coriolis interact nonlinearly "
                "with the modal filter)"
            )
    filt_np = np.asarray(ctx.filter)
    if fold:
        FDR = kron(padm(filt_np @ np.asarray(ctx.Dr), NP, NP))
        FDS = kron(padm(filt_np @ np.asarray(ctx.Ds), NP, NP))
        FLIFT = kron(padm(filt_np @ np.asarray(ctx.lift), NP, NT))
        FBU = np.stack([padT3(forcing_bu[c] @ filt_np.T, NP)
                        for c in range(n_ctrl)])
        FBV = np.stack([padT3(forcing_bv[c] @ filt_np.T, NP)
                        for c in range(n_ctrl)])
    else:
        FDR = FDS = FLIFT = np.zeros((1, 1))
        FBU = FBV = np.zeros((1, 1, 1, 1))

    to = lambda a: jnp.asarray(a, dtype=dtype)
    ops = BlockedOps(
        DR=to(kron(Dr_p)), DS=to(kron(Ds_p)), FILT=to(kron(filt_p)),
        LIFT=to(kron(lift_p)), EM=to(kron(EM)),
        FDR=to(FDR), FDS=to(FDS), FLIFT=to(FLIFT),
        rx=to(padT3(ctx.rx, NP)), sx=to(padT3(ctx.sx, NP)),
        ry=to(padT3(ctx.ry, NP)), sy=to(padT3(ctx.sy, NP)),
        nx=to(padT3(ctx.nx, NT)), ny=to(padT3(ctx.ny, NT)),
        fscale=to(padT3(ctx.fscale, NT)),
        wall=to(padT3(wall, NT)),
        vmask=to(vmask), tmask=to(tmask), cmask=to(cmask),
        PH=to(PH), fsel=to(fsel),
        obc=to(padT3(obc, NT)),
        H=to(Hpk), Hx=to(Hxp), Hy=to(Hyp), SPNG=to(SPNG),
        HMt=to(HMt), HPt=to(HPt),
        BU=to(BU), BV=to(BV), FBU=to(FBU), FBV=to(FBV),
        EXTM=to(np.zeros((1, 1, 1))),
        SGEM=to(np.zeros((1, 1))), SL=to(np.zeros((1, 1))),
        RG=to(np.zeros((1, 1))), RL=to(np.zeros((1, 1))),
        # EM2 only rides into VMEM when the v2 trace path will read it
        EM2=to(kron(EM2) if trace_mode == "rolls_v2"
               else np.zeros((1, 1))),
        FSNX=to(padT3(np.asarray(ctx.fscale) * np.asarray(ctx.nx), NT)),
        FSNY=to(padT3(np.asarray(ctx.fscale) * np.asarray(ctx.ny), NT)),
    )
    meta = BlockedMeta(
        n_p=n_p, n_fp=n_fp, n_faces=n_faces, k_elem=K,
        NP=NP, NT=NT, Kp=Kp, p=p, M=M, n_ctrl=n_ctrl, g=float(phys.g),
        cd=float(phys.cd), f_cor=float(phys.f_cor), wb=wb,
        has_bathy=has_bathy, has_sponge=has_sponge, fold=fold,
        tidal=tuple(float(v) for v in tidal) if tidal is not None else None,
        combos=combos,
        trace_mode=trace_mode, win=win, block_starts=block_starts,
        precision=precision, wetdry=wetdry, h_floor=float(h_floor),
    )
    if wetdry and not has_bathy:
        raise ValueError("wetdry needs bathymetry (phys.H)")
    return ops, meta


def pack_state(meta: BlockedMeta, f: jnp.ndarray) -> jnp.ndarray:
    """(..., K, Np) -> packed (..., p, NP, M): element k at group k // M,
    lane k % M; nodes on sublanes."""
    lead = f.shape[:-2]
    ft = jnp.pad(f, tuple((0, 0) for _ in lead)
                 + ((0, meta.Kp - meta.k_elem), (0, meta.NP - meta.n_p)))
    ft = ft.reshape(*lead, meta.p, meta.M, meta.NP)
    return jnp.swapaxes(ft, -1, -2)


def unpack_state(meta: BlockedMeta, f: jnp.ndarray) -> jnp.ndarray:
    lead = f.shape[:-3]
    ft = jnp.swapaxes(f, -1, -2)  # (..., p, M, NP)
    ft = ft.reshape(*lead, meta.Kp, meta.NP)
    return ft[..., : meta.k_elem, : meta.n_p]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _roll(x, shift, axis):
    """pltpu.roll with an AD rule (the TPU primitive has none): roll is
    linear, its transpose is the inverse roll — this is what lets
    `jax.vjp` trace straight through the kernel's values functions in the
    backward rollout kernel."""
    return pltpu.roll(x, shift, axis=axis)


def _roll_fwd(x, shift, axis):
    return _roll(x, shift, axis), None


def _roll_bwd(shift, axis, _, g):
    return (_roll(g, (-shift) % g.shape[axis], axis),)


_roll.defvjp(_roll_fwd, _roll_bwd)


def _group_roll(x, shift):
    """Leading-axis roll via static slices (differentiable, Mosaic-safe):
    out[s] = x[(s - shift) % p]."""
    p = x.shape[0]
    shift = shift % p
    if shift == 0:
        return x
    return jnp.concatenate([x[p - shift:], x[:p - shift]], axis=0)


def _mm(a, b, precision):
    # accumulate in the operand dtype (f32 on hardware, f64 in the
    # interpret-mode parity tests); pass count set by meta.precision
    # ('high' = manual bf16_3x, see ops/_mxu.py)
    return precision_dot(a, b, precision)


def _vmm(OP, x, meta: BlockedMeta):
    """Packed matmul: OP (R, p*rows) @ x (p, rows, nM) -> (p, R//p, nM).
    The (p, rows, nM) -> (p*rows, nM) reshape is a pure view (rows is a
    sublane-tile multiple), so this is ONE full-height MXU call."""
    p = meta.p
    xf = x.reshape(p * x.shape[1], x.shape[2])
    y = _mm(OP, xf, meta.precision)
    return y.reshape(p, y.shape[0] // p, x.shape[2])


def _plus_trace(tM, o, meta: BlockedMeta):
    """'+' trace from the '-' trace: static (group, lane) rolls + masked
    adds ('rolls' mode) or banded one-hot MXU gathers ('onehot', p=1)."""
    if meta.trace_mode == "onehot":
        return _plus_trace_onehot(tM[0], o, meta)[None]
    n_fp, p, M = meta.n_fp, meta.p, meta.M
    acc = [jnp.zeros((p, n_fp, M), tM.dtype) for _ in range(meta.n_faces)]
    for ci, (f, ds, dl, f2, flip) in enumerate(meta.combos):
        base = f2 * n_fp
        if flip:
            # static row reversal via slices (lax.rev has no Mosaic lowering)
            block = jnp.concatenate(
                [tM[:, base + i:base + i + 1, :]
                 for i in range(n_fp - 1, -1, -1)], axis=1)
        else:
            block = tM[:, base:base + n_fp, :]
        if ds:
            block = _group_roll(block, ds)
        if dl:
            block = _roll(block, dl, 2)
        acc[f] = acc[f] + o.cmask[ci][:, None, :] * block
    pad_rows = meta.NT - meta.n_faces * n_fp
    if pad_rows:
        acc.append(jnp.zeros((p, pad_rows, M), tM.dtype))
    return jnp.concatenate(acc, axis=1)


def _plus_trace3(tM2, o, meta: BlockedMeta):
    """ALL-FIELDS '+' traces from the flip-extended '-' trace tensor
    (round-5 VPU-census optimization): tM2 = EM2 @ [h|hu|hv] carries
    normal AND within-face-reversed rows, so flipped combos are plain row
    reads, and the combo loop runs ONCE on a field-stacked (p, 3*n_fp, M)
    block instead of three times per field — the census measured the old
    loop at ~300 tiny slice/roll/mask ops per RHS at 17 combos; this
    path does ~(19 + 5*n_combos). Returns (hP, huP, hvP)."""
    n_fp, n_faces = meta.n_fp, meta.n_faces
    p, M, NT = meta.p, meta.M, meta.NT
    W = 3 * n_fp
    # one-time relayout: rows [(flip, f2) -> h | hu | hv, n_fp each]
    S = jnp.concatenate([
        tM2[:, flip * NT + f2 * n_fp: flip * NT + f2 * n_fp + n_fp,
            c * M:(c + 1) * M]
        for flip in (0, 1) for f2 in range(n_faces) for c in range(3)
    ], axis=1)  # (p, 2*n_faces*W, M)
    accs = [jnp.zeros((p, W, M), tM2.dtype) for _ in range(n_faces)]
    for ci, (f, ds, dl, f2, flip) in enumerate(meta.combos):
        base = ((n_faces if flip else 0) + f2) * W
        block = S[:, base:base + W, :]
        if ds:
            block = _group_roll(block, ds)
        if dl:
            block = _roll(block, dl, 2)
        accs[f] = accs[f] + o.cmask[ci][:, None, :] * block
    pad_rows = NT - n_faces * n_fp
    outs = []
    for c in range(3):
        parts = [accs[f][:, c * n_fp:(c + 1) * n_fp, :]
                 for f in range(n_faces)]
        if pad_rows:
            parts.append(jnp.zeros((p, pad_rows, M), tM2.dtype))
        outs.append(jnp.concatenate(parts, axis=1))
    return tuple(outs)


def _plus_trace_onehot(fM, o, meta: BlockedMeta):
    """'+' trace via banded one-hot matmuls: per 128-lane block b, ONE MXU
    matmul (NT, WIN) @ (WIN, n_faces*128) gathers, for every local face f,
    the neighbor-element columns of all trace rows; per-lane neighbor-face
    and flip selection then picks the right rows. O(K/128) matmuls total,
    independent of how irregular the neighbor offsets are — the
    unstructured-mesh mode (elements should be RCM-ordered so the band,
    and with it WIN, stays ~sqrt(K))."""
    n_fp, n_faces = meta.n_fp, meta.n_faces
    NT, M, win = meta.NT, meta.M, meta.win

    gathered = [
        _mm(fM[:, s0:s0 + win], o.PH[b], meta.precision)
        for b, s0 in enumerate(meta.block_starts)
    ]
    acc = []
    for f in range(n_faces):
        A = jnp.concatenate(
            [g[:, f * LANE:(f + 1) * LANE] for g in gathered], axis=1)
        accf = jnp.zeros((n_fp, M), fM.dtype)
        for f2 in range(n_faces):
            base = f2 * n_fp
            rows_f = A[base:base + n_fp, :]
            rows_r = jnp.concatenate(
                [A[base + i:base + i + 1, :]
                 for i in range(n_fp - 1, -1, -1)], axis=0)
            idx = (f * n_faces + f2) * 2
            accf = accf + o.fsel[idx:idx + 1, :] * rows_f
            accf = accf + o.fsel[idx + 1:idx + 2, :] * rows_r
        acc.append(accf)
    pad_rows = NT - n_faces * n_fp
    if pad_rows:
        acc.append(jnp.zeros((pad_rows, M), fM.dtype))
    return jnp.concatenate(acc, axis=0)


def _face_max(spd, meta: BlockedMeta):
    """Per-face max over the n_fp sublane rows of each face group."""
    n_fp = meta.n_fp
    rows = []
    for f in range(meta.n_faces):
        blk = spd[:, f * n_fp:(f + 1) * n_fp, :]
        m = jnp.max(blk, axis=1, keepdims=True)
        rows.append(jnp.broadcast_to(m, blk.shape))
    pad_rows = meta.NT - meta.n_faces * n_fp
    if pad_rows:
        rows.append(spd[:, meta.n_faces * n_fp:, :])
    return jnp.concatenate(rows, axis=1)


def _safe_norm(u, v):
    """sqrt(u^2+v^2) with a zero (not NaN) gradient at the origin — mirrors
    ops.sw2d._safe_norm so lake-at-rest states are differentiable."""
    r2 = u * u + v * v
    r = jnp.sqrt(jnp.where(r2 > 0.0, r2, 1.0))
    return jnp.where(r2 > 0.0, r, 0.0)


def _rhs_blocked(h, hu, hv, t, ctrl, o: BlockedOps, meta: BlockedMeta,
                 folded: bool, ext=None):
    """One shallow-water RHS on packed (p, NP, M) values.

    Same math as ops.sw2d.sw2d_rhs — wall reflection, tidal BC_OUT forcing,
    per-face trace-max LF flux with hydrostatic-reconstruction well-
    balancing when bathymetry is present, bed-slope/drag/Coriolis sources;
    pure jnp on values — shared by step and rollout kernels. When
    ``folded``, the filter is already baked into DR/DS/LIFT/BU.
    """
    g = meta.g
    M = meta.M
    h = jnp.where(o.vmask > 0, h, 1.0)
    hu = hu * o.vmask
    hv = hv * o.vmask

    DRa = o.FDR if folded else o.DR
    DSa = o.FDS if folded else o.DS
    LIFTa = o.FLIFT if folded else o.LIFT
    BUa = o.FBU if folded else o.BU
    BVa = o.FBV if folded else o.BV

    # one stacked full-height MXU call instead of three (fields along
    # lanes); 'rolls_v2' uses the flip-extended EM2 so the combo loop
    # needs no per-combo reversal and runs once across all 3 fields —
    # fewer ops but measured slower (see BlockedMeta.trace_mode)
    xs = jnp.concatenate([h, hu, hv], axis=2)
    if meta.trace_mode == "rolls_v2":
        NT = meta.NT
        tM2 = _vmm(o.EM2, xs, meta)  # (p, 2NT, 3M)
        hM = tM2[:, :NT, :M]
        huM = tM2[:, :NT, M:2 * M]
        hvM = tM2[:, :NT, 2 * M:]
        hP, huP, hvP = _plus_trace3(tM2, o, meta)
    else:
        tM = _vmm(o.EM, xs, meta)
        hM, huM, hvM = tM[:, :, :M], tM[:, :, M:2 * M], tM[:, :, 2 * M:]
        hP = _plus_trace(hM, o, meta)
        huP = _plus_trace(huM, o, meta)
        hvP = _plus_trace(hvM, o, meta)

    # element-sharded mode: cut-face '+' traces come from the neighboring
    # shard (exchanged OUTSIDE the kernel, parallel/blocked_shard.py);
    # EXTM selects exactly those slots
    if ext is not None:
        eh, ehu, ehv = ext
        hP = hP + o.EXTM * (eh - hP)
        huP = huP + o.EXTM * (ehu - huP)
        hvP = hvP + o.EXTM * (ehv - hvP)

    # wall reflection: huP = huM - 2 (u.n) nx etc. (masked overwrite)
    un2 = 2.0 * (huM * o.nx + hvM * o.ny)
    huP = huP + o.wall * (huM - un2 * o.nx - huP)
    hvP = hvP + o.wall * (hvM - un2 * o.ny - hvP)

    # tidal open boundary: prescribe total depth on BC_OUT trace nodes
    # (reference sw2d/main.cpp:347-353; scalar computed in-kernel)
    if meta.tidal is not None:
        h0, amp, omega, ramp_tau = meta.tidal
        ramp = jnp.minimum(t / ramp_tau, 1.0) if ramp_tau > 0 else 1.0
        h_bc = h0 + amp * jnp.cos(omega * t) * ramp
        hP = hP + o.obc * (h_bc - hP)

    hM = jnp.where(o.tmask > 0, hM, 1.0)
    hP = jnp.where(o.tmask > 0, hP, 1.0)

    if meta.wetdry:
        # hydrostatic minmod surface reconstruction + desingularized
        # velocities (ops.sw2d_wetdry.sw2d_rhs_wetdry in-kernel; reference
        # intent swhelpers/limiters.py:36-81) — all (p, NT, M) VPU algebra
        from .limiters import surface_reconstruction

        etaM, etaP = hM - o.HMt, hP - o.HPt
        hMs, hPs = surface_reconstruction(etaM, hM, etaP, hP, meta.h_floor)
        eps2 = (4.0 * meta.h_floor) ** 2

        def vel(hh, hhu, hhv):
            inv = hh / (hh * hh + jnp.maximum(hh * hh, eps2)) * 2.0
            return hhu * inv, hhv * inv

        uM, vM = vel(hM, huM, hvM)
        uP, vP = vel(hP, huP, hvP)
        corr = (hM - hMs) * (uM * o.nx + vM * o.ny)

        def flux_uv(hh, uu, vv):
            pr = 0.5 * g * hh * hh
            return (hh * uu, hh * uu * uu + pr, hh * uu * vv,
                    hh * vv, hh * uu * vv, hh * vv * vv + pr)

        F1M, F2M, F3M, G1M, G2M, G3M = flux_uv(hMs, uM, vM)
        F1P, F2P, F3P, G1P, G2P, G3P = flux_uv(hPs, uP, vP)
        spdM = _safe_norm(uM, vM) + jnp.sqrt(g * hMs)
        spdP = _safe_norm(uP, vP) + jnp.sqrt(g * hPs)
        dh, dhu, dhv = hMs - hPs, F1M - F1P, G1M - G1P
    elif meta.wb:
        # hydrostatic-reconstruction star variables (ops.sw2d._lf_flux_jumps;
        # reference sw2d/main.cpp:356-368, 419-421 intent); one reciprocal
        # per side feeds both velocity components
        invM, invP = 1.0 / hM, 1.0 / hP
        uM, vM = huM * invM, hvM * invM
        uP, vP = huP * invP, hvP * invP
        bstar = jnp.maximum(-o.HMt, -o.HPt)
        hMs = jnp.maximum(0.0, hM - o.HMt - bstar)
        hPs = jnp.maximum(0.0, hP - o.HPt - bstar)
        corr = (hM - hMs) * (uM * o.nx + vM * o.ny)

        def flux_uv(hh, uu, vv):
            pr = 0.5 * g * hh * hh
            return (hh * uu, hh * uu * uu + pr, hh * uu * vv,
                    hh * vv, hh * uu * vv, hh * vv * vv + pr)

        F1M, F2M, F3M, G1M, G2M, G3M = flux_uv(hMs, uM, vM)
        F1P, F2P, F3P, G1P, G2P, G3P = flux_uv(hPs, uP, vP)
        spdM = _safe_norm(uM, vM) + jnp.sqrt(g * hMs)
        spdP = _safe_norm(uP, vP) + jnp.sqrt(g * hPs)
        dh, dhu, dhv = hMs - hPs, F1M - F1P, G1M - G1P
    else:
        def flux_c(hh, hhu, hhv):
            # the reciprocal is shared with the wavespeed below — the
            # census counted 4 redundant trace divisions per RHS here
            inv_h = 1.0 / hh
            pr = 0.5 * g * hh * hh
            F2 = hhu * hhu * inv_h + pr
            G2 = hhu * hhv * inv_h
            G3 = hhv * hhv * inv_h + pr
            return (hhu, F2, G2, hhv, G2, G3), inv_h

        (F1M, F2M, F3M, G1M, G2M, G3M), invM = flux_c(hM, huM, hvM)
        (F1P, F2P, F3P, G1P, G2P, G3P), invP = flux_c(hP, huP, hvP)
        spdM = _safe_norm(huM * invM, hvM * invM) + jnp.sqrt(g * hM)
        spdP = _safe_norm(huP * invP, hvP * invP) + jnp.sqrt(g * hP)
        dh, dhu, dhv = hM - hP, huM - huP, hvM - hvP
        corr = None

    # fscale is prefolded into the normals (FSNX/FSNY) and folded into
    # lam once — the LIFT input below needs no per-field fscale multiply
    lamfs = _face_max(jnp.maximum(spdM, spdP), meta) * o.fscale

    dflux1 = 0.5 * ((F1M - F1P) * o.FSNX + (G1M - G1P) * o.FSNY
                    - lamfs * dh)
    dflux2 = 0.5 * ((F2M - F2P) * o.FSNX + (G2M - G2P) * o.FSNY
                    - lamfs * dhu)
    dflux3 = 0.5 * ((F3M - F3P) * o.FSNX + (G3M - G3P) * o.FSNY
                    - lamfs * dhv)
    if corr is not None:
        corrfs = corr * o.fscale
        dflux1 = dflux1 + corrfs
        dflux2 = dflux2 + corrfs * uM
        dflux3 = dflux3 + corrfs * vM

    # volume fluxes: only 5 distinct fields (F1=hu, G1=hv, G2 shared):
    # [hu, F2, G2, hv, G3] — derivatives in 2 stacked full-height matmuls
    if meta.wetdry:
        # desingularized volume velocities (Kurganov-Petrova style)
        eps2v = (4.0 * meta.h_floor) ** 2
        inv_h = 2.0 * h / (h * h + jnp.maximum(h * h, eps2v))
        uvol, vvol = hu * inv_h, hv * inv_h
        pr = 0.5 * g * h * h
        F2 = h * uvol * uvol + pr
        G2 = h * uvol * vvol
        G3 = h * vvol * vvol + pr
    else:
        inv_h = 1.0 / h
        pr = 0.5 * g * h * h
        F2 = hu * hu * inv_h + pr
        G2 = hu * hv * inv_h
        G3 = hv * hv * inv_h + pr
    FG = jnp.concatenate([hu, F2, G2, hv, G3], axis=2)
    FGr = _vmm(DRa, FG, meta)
    FGs = _vmm(DSa, FG, meta)
    cut = lambda a, i: a[:, :, i * M:(i + 1) * M]

    def div(ix, iy):
        return (o.rx * cut(FGr, ix) + o.sx * cut(FGs, ix)
                + o.ry * cut(FGr, iy) + o.sy * cut(FGs, iy))

    sf = _vmm(LIFTa, jnp.concatenate(
        [dflux1, dflux2, dflux3], axis=2), meta)
    rhs1 = cut(sf, 0) - div(0, 3)
    rhs2 = cut(sf, 1) - div(1, 2)
    rhs3 = cut(sf, 2) - div(2, 4)

    # sources (reference sw2d main.cpp:460-483; v-drag sign corrected)
    if meta.has_bathy:
        if meta.wetdry:
            # dry cells: no bed-slope forcing (sw2d_rhs_wetdry wet mask)
            wet = jnp.where(h > 5.0 * meta.h_floor, 1.0, 0.0)
            rhs2 = rhs2 + g * h * o.Hx * wet
            rhs3 = rhs3 + g * h * o.Hy * wet
        else:
            rhs2 = rhs2 + g * h * o.Hx
            rhs3 = rhs3 + g * h * o.Hy
    if meta.cd != 0.0:
        if meta.wetdry:
            u, v = uvol, vvol
        else:
            u, v = hu * inv_h, hv * inv_h  # reuse the volume reciprocal
        nrm = _safe_norm(u, v)
        rhs2 = rhs2 - meta.cd * nrm * u
        rhs3 = rhs3 - meta.cd * nrm * v
    if meta.f_cor != 0.0:
        rhs2 = rhs2 + meta.f_cor * hv
        rhs3 = rhs3 - meta.f_cor * hu

    if ctrl is not None:
        for c in range(meta.n_ctrl):
            rhs2 = rhs2 + ctrl[c] * BUa[c]
            rhs3 = rhs3 + ctrl[c] * BVa[c]
    return rhs1, rhs2, rhs3


def _eval_rhs(h, hu, hv, t, ctrl, o, meta, use_filter, ext=None):
    folded = meta.fold and use_filter
    r1, r2, r3 = _rhs_blocked(h, hu, hv, t, ctrl, o, meta, folded, ext=ext)
    if use_filter and not folded:
        M = meta.M
        rf = _vmm(o.FILT, jnp.concatenate([r1, r2, r3], axis=2), meta)
        r1, r2, r3 = rf[:, :, :M], rf[:, :, M:2 * M], rf[:, :, 2 * M:]
    return r1, r2, r3


def _limit_packed(h, hu, hv, o, meta: BlockedMeta):
    """Per-stage positivity limiter + near-dry momentum taper on packed
    values (ops.sw2d_wetdry.ssprk2_step_wetdry's `limit`, reference intent
    swhelpers/limiters.py:3-21): Zhang-Shu squash toward the arithmetic
    nodal mean, per element = per (group, lane) over the valid node rows."""
    n_p, h_floor = meta.n_p, meta.h_floor
    mean = lambda f: jnp.sum(f * o.vmask, axis=1, keepdims=True) / n_p
    hmin = jnp.min(jnp.where(o.vmask > 0, h, 1e30), axis=1, keepdims=True)
    hmean = mean(h)
    need = hmin < h_floor
    denom = jnp.where(need, hmean - hmin, 1.0)
    theta = jnp.where(
        need,
        jnp.clip((hmean - h_floor) / jnp.where(denom > 0, denom, 1.0),
                 0.0, 1.0),
        1.0,
    )
    humean, hvmean = mean(hu), mean(hv)
    h2 = hmean + theta * (h - hmean)
    hu2 = humean + theta * (hu - humean)
    hv2 = hvmean + theta * (hv - hvmean)
    taper = jnp.clip((h2 - h_floor) / (4.0 * h_floor), 0.0, 1.0)
    # keep the padding rows/lanes exactly as they were (zeros)
    return (jnp.where(o.vmask > 0, h2, h),
            jnp.where(o.vmask > 0, hu2 * taper, hu),
            jnp.where(o.vmask > 0, hv2 * taper, hv))


def _step_values(h, hu, hv, t, ctrl, o, meta, dt, use_filter):
    """One SSP-RK2 step (+ sponge relaxation) on packed values.
    Stage times (t, t+dt/2) match timestepping.ssprk2_step."""
    k1 = _eval_rhs(h, hu, hv, t, ctrl, o, meta, use_filter)
    h1 = h + 0.5 * dt * k1[0]
    hu1 = hu + 0.5 * dt * k1[1]
    hv1 = hv + 0.5 * dt * k1[2]
    if meta.wetdry:
        h1, hu1, hv1 = _limit_packed(h1, hu1, hv1, o, meta)
    k2 = _eval_rhs(h1, hu1, hv1, t + 0.5 * dt, ctrl, o, meta, use_filter)
    h, hu, hv = h + dt * k2[0], hu + dt * k2[1], hv + dt * k2[2]
    if meta.wetdry:
        h, hu, hv = _limit_packed(h, hu, hv, o, meta)
    if meta.has_sponge:
        # ops.sw2d.sponge_relax: relax toward rest (h=H, zero momentum)
        fac = 1.0 / (1.0 + dt * o.SPNG)
        h = o.H + (h - o.H) * fac
        hu = hu * fac
        hv = hv * fac
    return h, hu, hv


_OP_FIELDS = len(BlockedOps._fields)


def _recv_to_ext(rb, o: BlockedOps, meta: BlockedMeta):
    """(L_r, 3) received halo values -> 3 (p, NT, M) ext tensors via the
    one-hot recv tables: E = RG @ (rb_c ∘ RL), ONE exact (HIGHEST) MXU
    call for all 3 fields. One-hot matmuls at HIGHEST precision are exact
    (each output is a sum with a single nonzero term)."""
    M = meta.M
    tmp3 = jnp.concatenate(
        [rb[:, c:c + 1] * o.RL for c in range(3)], axis=1)  # (L_r, 3M)
    E = precision_dot(o.RG, tmp3, "highest")  # (p*NT, 3M)
    E = E.reshape(meta.p, meta.NT, 3 * M)
    return (E[:, :, :M], E[:, :, M:2 * M], E[:, :, 2 * M:])


def _send_from_values(h2, hu2, hv2, o: BlockedOps, meta: BlockedMeta):
    """Gather the cut-face send values straight from the packed OUTPUT
    volume values: sb[j, c] = field_c[row_j, lane_j] with SGEM = SG @
    kron(EM) folded at setup (the trace-extraction matmul for the send
    slots rides along for free — no full trace emission needed).
    Returns (L_s, 3)."""
    M = meta.M
    xs = jnp.concatenate([h2, hu2, hv2], axis=2)  # (p, NP, 3M)
    G = precision_dot(o.SGEM, xs.reshape(meta.p * meta.NP, 3 * M),
                      "highest")  # (L_s, 3M)
    return jnp.concatenate(
        [jnp.sum(G[:, c * M:(c + 1) * M] * o.SL, axis=1, keepdims=True)
         for c in range(3)], axis=1)


def _stage_kernel(meta, c_dt, t0, use_filter, emit_traces, apply_sponge,
                  has_t, has_ctrl, lean_io, *refs):
    """One RK STAGE with external '+'-trace override:
    out = base + c_dt * R(cur, ext). Used by the element-sharded driver
    (parallel/blocked_shard.py) where the halo exchange must happen
    between stages (each stage needs the traces of ITS input state).

    ``emit_traces``: also output the packed '-' traces of the OUTPUT state
    (one extra EM matmul) so the NEXT stage's halo exchange reads them
    directly — no XLA-level unpack/gather between kernels.

    ``lean_io``: kernel-I/O exchange mode — the ext inputs are replaced by
    ONE compact (L_r, 3) receive buffer consumed in-kernel via the RG/RL
    one-hot tables, and the kernel emits the (L_s, 3) SEND buffer for the
    next exchange via SGEM/SL (no full-size EXT scatter, no trace-tensor
    emission; the XLA glue between launches collapses to
    slice+ppermute+concat of the tiny buffers)."""
    if lean_io:
        (bh, bhu, bhv, ch, chu, chv, rb, *rest) = refs
    else:
        (bh, bhu, bhv, ch, chu, chv, eh, ehu, ehv, *rest) = refs
    if has_t:
        t_ref, *rest = rest
    if has_ctrl:
        ctrl_ref, *rest = rest
        ctrl = [ctrl_ref[0, c] for c in range(meta.n_ctrl)]
    else:
        ctrl = None
    if emit_traces and not lean_io:
        *ops_list, oh, ohu, ohv, otr = rest
    elif lean_io:
        *ops_list, oh, ohu, ohv, osb = rest
    else:
        *ops_list, oh, ohu, ohv = rest
    o = BlockedOps(*(r[:] for r in ops_list))
    if lean_io:
        ext = _recv_to_ext(rb[0], o, meta)
    else:
        ext = (eh[0], ehu[0], ehv[0])
    tt = t_ref[0, 0] if has_t else t0
    r1, r2, r3 = _eval_rhs(ch[0], chu[0], chv[0], tt, ctrl, o, meta,
                           use_filter, ext=ext)
    h2 = bh[0] + c_dt * r1
    hu2 = bhu[0] + c_dt * r2
    hv2 = bhv[0] + c_dt * r3
    if meta.wetdry:
        # per-stage positivity limiting (ops.sw2d_wetdry pattern); the
        # emitted traces below are post-limit, keeping the next exchange
        # consistent with the state the next stage actually sees
        h2, hu2, hv2 = _limit_packed(h2, hu2, hv2, o, meta)
    if apply_sponge and meta.has_sponge:
        # step-final sponge relaxation toward rest (ops.sw2d.sponge_relax)
        fac = 1.0 / (1.0 + c_dt * o.SPNG)
        h2 = o.H + (h2 - o.H) * fac
        hu2 = hu2 * fac
        hv2 = hv2 * fac
    oh[0] = h2
    ohu[0] = hu2
    ohv[0] = hv2
    if lean_io:
        osb[0] = _send_from_values(h2, hu2, hv2, o, meta)
    elif emit_traces:
        M = meta.M
        h2m = jnp.where(o.vmask > 0, h2, 1.0)
        otr[0] = _vmm(o.EM, jnp.concatenate(
            [h2m, hu2 * o.vmask, hv2 * o.vmask], axis=2), meta)


@functools.partial(
    jax.jit, static_argnames=("meta", "c_dt", "t0", "use_filter",
                              "emit_traces", "apply_sponge", "interpret")
)
def sw2d_stage_blocked(
    ops: BlockedOps,
    meta: BlockedMeta,
    base,  # tuple of 3 (B, p, NP, M) packed fields: the axpy base state
    cur,   # tuple of 3: the stage-input state the RHS is evaluated at
    ext,   # tuple of 3: remote '+'-trace values (B, p, NT, M), EXTM slots
           # — or None when `rb` carries the compact receive buffer
    c_dt: float,
    t0: float = 0.0,
    use_filter: bool = True,
    emit_traces: bool = False,
    apply_sponge: bool = False,
    interpret: bool = False,
    t=None,  # optional (1, 1) runtime stage time (tidal forcing); else t0
    ctrl=None,  # optional (1, n_ctrl) control vector (SMEM)
    rb=None,  # optional (B, L_r, 3) compact receive buffer: kernel-I/O
              # lean exchange (consumed via RG/RL; the kernel then emits
              # the (B, L_s, 3) send buffer as its 4th output)
):
    """out = base + c_dt * R(cur) with cut-face traces from `ext`;
    optionally also returns the packed (B, p, NT, 3M) '-' traces of out.
    ``apply_sponge``: apply the step-final sponge relaxation to out (set
    on the LAST stage of a step when meta.has_sponge). ``t``: optional
    DYNAMIC stage time delivered via SMEM (time-dependent tidal BC)."""
    B, p, NP, M = base[0].shape
    NT = meta.NT
    lean_io = rb is not None
    vspec = pl.BlockSpec((1, p, NP, M), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, p, NT, M), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    op_specs = [
        pl.BlockSpec(op.shape, lambda i, nd=op.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for op in ops
    ]
    has_t = t is not None
    has_ctrl = ctrl is not None
    kernel = functools.partial(_stage_kernel, meta, float(c_dt), float(t0),
                               use_filter, emit_traces, apply_sponge, has_t,
                               has_ctrl, lean_io)
    shp = jax.ShapeDtypeStruct((B, p, NP, M), base[0].dtype)
    out_specs = [vspec, vspec, vspec]
    out_shape = [shp, shp, shp]
    if lean_io:
        L_s = ops.SGEM.shape[0]
        out_specs.append(pl.BlockSpec((1, L_s, 3), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, L_s, 3), base[0].dtype))
        ext_in = [rb]
        ext_specs = [pl.BlockSpec((1, rb.shape[1], 3), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)]
    else:
        ext_in = list(ext)
        ext_specs = [tspec] * 3
        if emit_traces:
            out_specs.append(pl.BlockSpec((1, p, NT, 3 * M),
                                          lambda i: (i, 0, 0, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((B, p, NT, 3 * M),
                                                  base[0].dtype))
    t_in = []
    t_specs = []
    if has_t:
        t_in = [jnp.asarray(t, dtype=base[0].dtype).reshape(1, 1)]
        t_specs = [pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)]
    if has_ctrl:
        t_in.append(jnp.asarray(ctrl, dtype=base[0].dtype
                                ).reshape(1, meta.n_ctrl))
        t_specs.append(pl.BlockSpec((1, meta.n_ctrl), lambda i: (0, 0),
                                    memory_space=pltpu.SMEM))
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[vspec] * 6 + ext_specs + t_specs + op_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(*base, *cur, *ext_in, *t_in, *ops)


def _step_kernel_rdma(meta, dt, t0, use_filter, has_t, has_ctrl,
                      offs, chunk, n_shards, axis_name, apply_sponge,
                      *refs):
    """ONE kernel per SSP-RK2 STEP for the element-sharded path: the
    inter-stage halo exchange happens IN-KERNEL via remote DMA
    (`pltpu.make_async_remote_copy` ring sends per offset), so only the
    step-boundary exchange remains in XLA. The PARITY-identified endgame
    of the sharded formulation (VERDICT r4 #2); prototype — B=1, no
    wetdry."""
    (bh, bhu, bhv, rb, *rest) = refs
    if has_t:
        t_ref, *rest = rest
    if has_ctrl:
        ctrl_ref, *rest = rest
        ctrl = [ctrl_ref[0, c] for c in range(meta.n_ctrl)]
    else:
        ctrl = None
    (*ops_list, oh, ohu, ohv, osb,
     sb1_buf, comm_buf, send_sem, recv_sem) = rest
    o = BlockedOps(*(r[:] for r in ops_list))
    tt = t_ref[0, 0] if has_t else t0

    # receive-buffer init + READY handshake BEFORE any peer may send:
    # zeroing after an early arrival would wipe delivered halo data on
    # real hardware (devices run unsynchronized), so each device zeros
    # its buffer first, then signals READY to every peer that will send
    # to it; senders wait for all their destinations' READY below.
    comm_buf[:] = jnp.zeros_like(comm_buf)  # also keeps the n_off == 0
    # case NaN-free under interpret mode's uninitialized-memory fill
    if offs:
        my = jax.lax.axis_index(axis_name)
        bar = pltpu.get_barrier_semaphore()
        for d in offs:
            src = jax.lax.rem(my - jnp.int32(d) + jnp.int32(n_shards),
                              jnp.int32(n_shards))
            pltpu.semaphore_signal(
                bar, inc=1, device_id=src,
                device_id_type=pltpu.DeviceIdType.LOGICAL)

    # ---- stage 1: s1 = s + (dt/2) R(s, ext1) ----
    ext1 = _recv_to_ext(rb[0], o, meta)
    r1, r2, r3 = _eval_rhs(bh[0], bhu[0], bhv[0], tt, ctrl, o, meta,
                           use_filter, ext=ext1)
    h1 = bh[0] + 0.5 * dt * r1
    hu1 = bhu[0] + 0.5 * dt * r2
    hv1 = bhv[0] + 0.5 * dt * r3

    # ---- in-kernel halo exchange of s1's cut-face values ----
    sb1_buf[:] = _send_from_values(h1, hu1, hv1, o, meta)
    if offs:
        # all my destinations have zeroed their buffers (their READY
        # cannot precede their previous-step completion, which consumed
        # my previous-step message — no cross-step bleed)
        pltpu.semaphore_wait(bar, len(offs))
        rdmas = []
        for di, d in enumerate(offs):
            dst = jax.lax.rem(my + jnp.int32(d), jnp.int32(n_shards))
            rdmas.append(pltpu.make_async_remote_copy(
                src_ref=sb1_buf.at[pl.ds(di * chunk, chunk), :],
                dst_ref=comm_buf.at[pl.ds(di * chunk, chunk), :],
                send_sem=send_sem.at[di],
                recv_sem=recv_sem.at[di],
                device_id=dst,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            ))
        for r in rdmas:
            r.start()
        for r in rdmas:
            r.wait()

    # ---- stage 2: s2 = s + dt R(s1, ext2) ----
    ext2 = _recv_to_ext(comm_buf[:], o, meta)
    tt2 = tt + 0.5 * dt
    r1, r2, r3 = _eval_rhs(h1, hu1, hv1, tt2, ctrl, o, meta,
                           use_filter, ext=ext2)
    h2 = bh[0] + dt * r1
    hu2 = bhu[0] + dt * r2
    hv2 = bhv[0] + dt * r3
    if apply_sponge and meta.has_sponge:
        fac = 1.0 / (1.0 + dt * o.SPNG)
        h2 = o.H + (h2 - o.H) * fac
        hu2 = hu2 * fac
        hv2 = hv2 * fac
    oh[0] = h2
    ohu[0] = hu2
    ohv[0] = hv2
    osb[0] = _send_from_values(h2, hu2, hv2, o, meta)


@functools.partial(
    jax.jit, static_argnames=("meta", "dt", "t0", "use_filter", "offs",
                              "chunk", "n_shards", "axis_name",
                              "interpret"),
)
def sw2d_step_rdma_blocked(
    ops: BlockedOps,
    meta: BlockedMeta,
    state,  # tuple of 3 (1, p, NP, M) packed fields
    rb,     # (1, L_r, 3) receive buffer for stage 1 (XLA exchange)
    dt: float,
    offs: tuple,
    chunk: int,
    n_shards: int,
    axis_name: str = "element",
    t0: float = 0.0,
    use_filter: bool = True,
    t=None,
    ctrl=None,
    interpret=False,
):
    """One fused SSP-RK2 step with the INTER-STAGE halo exchanged by
    in-kernel remote DMA. Returns (h, hu, hv, send_buffer). Use inside
    shard_map over `axis_name`; `interpret` accepts a
    pltpu.InterpretParams to simulate the remote DMAs on CPU devices."""
    B, p, NP, M = state[0].shape
    assert B == 1, "rdma prototype: one scenario per kernel"
    if meta.wetdry:
        raise NotImplementedError("rdma prototype does not limit stages")
    NT = meta.NT
    L_s = ops.SGEM.shape[0]
    vspec = pl.BlockSpec((1, p, NP, M), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    op_specs = [
        pl.BlockSpec(op.shape, lambda i, nd=op.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for op in ops
    ]
    has_t = t is not None
    has_ctrl = ctrl is not None
    t_in, t_specs = [], []
    if has_t:
        t_in = [jnp.asarray(t, dtype=state[0].dtype).reshape(1, 1)]
        t_specs = [pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)]
    if has_ctrl:
        t_in.append(jnp.asarray(ctrl, dtype=state[0].dtype
                                ).reshape(1, meta.n_ctrl))
        t_specs.append(pl.BlockSpec((1, meta.n_ctrl), lambda i: (0, 0),
                                    memory_space=pltpu.SMEM))
    kernel = functools.partial(
        _step_kernel_rdma, meta, float(dt), float(t0), use_filter, has_t,
        has_ctrl, tuple(offs), int(chunk), int(n_shards), axis_name, True)
    shp = jax.ShapeDtypeStruct((B, p, NP, M), state[0].dtype)
    n_sem = max(len(offs), 1)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[vspec] * 3
        + [pl.BlockSpec((1, rb.shape[1], 3), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)]
        + t_specs + op_specs,
        out_specs=(vspec, vspec, vspec,
                   pl.BlockSpec((1, L_s, 3), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(shp, shp, shp,
                   jax.ShapeDtypeStruct((B, L_s, 3), state[0].dtype)),
        scratch_shapes=[
            pltpu.VMEM((L_s, 3), state[0].dtype),
            pltpu.VMEM((rb.shape[1], 3), state[0].dtype),
            pltpu.SemaphoreType.DMA((n_sem,)),
            pltpu.SemaphoreType.DMA((n_sem,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            has_side_effects=True,
            collective_id=0),
        interpret=interpret,
    )(*state, rb, *t_in, *ops)


def _step_kernel(meta, dt, t0, use_filter, has_ctrl,
                 h_ref, hu_ref, hv_ref, *refs):
    if has_ctrl:
        ctrl_ref, *op_refs = refs
        ctrl = [ctrl_ref[0, c] for c in range(meta.n_ctrl)]
    else:
        op_refs = refs
        ctrl = None
    *ops_list, oh, ohu, ohv = op_refs
    o = BlockedOps(*(r[:] for r in ops_list))
    h2, hu2, hv2 = _step_values(
        h_ref[0], hu_ref[0], hv_ref[0], t0, ctrl, o, meta, dt, use_filter
    )
    oh[0] = h2
    ohu[0] = hu2
    ohv[0] = hv2


@functools.partial(
    jax.jit, static_argnames=("meta", "dt", "t0", "use_filter", "interpret")
)
def sw2d_step_blocked(
    ops: BlockedOps,
    meta: BlockedMeta,
    h: jnp.ndarray,  # (B, p, NP, M) packed states
    hu: jnp.ndarray,
    hv: jnp.ndarray,
    ctrl: jnp.ndarray | None,  # (B, n_ctrl) or None
    dt: float,
    t0: float = 0.0,
    use_filter: bool = True,
    interpret: bool = False,
):
    """One fused SSP-RK2 step, grid over scenarios."""
    B, p, NP, M = h.shape
    state_spec = pl.BlockSpec((1, p, NP, M), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    op_specs = [
        pl.BlockSpec(op.shape, lambda i, nd=op.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for op in ops
    ]
    has_ctrl = ctrl is not None
    inputs = [h, hu, hv]
    in_specs = [state_spec] * 3
    if has_ctrl:
        inputs.append(ctrl)
        in_specs.append(pl.BlockSpec((1, meta.n_ctrl), lambda i: (i, 0),
                                     memory_space=pltpu.SMEM))
    kernel = functools.partial(_step_kernel, meta, float(dt), float(t0),
                               use_filter, has_ctrl)
    shp = jax.ShapeDtypeStruct((B, p, NP, M), h.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs + op_specs,
        out_specs=(state_spec, state_spec, state_spec),
        out_shape=(shp, shp, shp),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*inputs, *ops)


def _rollout_kernel(meta, dt, t0, spc, n_steps, use_filter, has_ctrl,
                    store_traj, h_ref, hu_ref, hv_ref, *refs):
    """Fused rollout: state lives in VMEM scratch across all steps; the
    step-start states are (optionally) DMA'd to an HBM trajectory buffer."""
    if has_ctrl:
        ctrl_ref, *refs = refs
    ops_list = refs[:_OP_FIELDS]
    refs = refs[_OP_FIELDS:]
    if store_traj:
        traj_h, traj_hu, traj_hv = refs[:3]
        oh, ohu, ohv = refs[3:6]
        h_s, hu_s, hv_s, sem = refs[6:]
    else:
        oh, ohu, ohv = refs[:3]
        h_s, hu_s, hv_s = refs[3:]
    o = BlockedOps(*(r[:] for r in ops_list))

    h_s[:] = h_ref[0]
    hu_s[:] = hu_ref[0]
    hv_s[:] = hv_ref[0]
    b = pl.program_id(0)

    def dmas(t):
        return [
            pltpu.make_async_copy(src, dst.at[b, t], sem.at[i])
            for i, (src, dst) in enumerate(
                ((h_s, traj_h), (hu_s, traj_hu), (hv_s, traj_hv))
            )
        ]

    def body(t, _):
        if store_traj:
            for d in dmas(t):
                d.start()
        if has_ctrl:
            j = t // spc
            ctrl = [ctrl_ref[0, j, c] for c in range(meta.n_ctrl)]
        else:
            ctrl = None
        tt = t0 + t.astype(h_s.dtype) * dt
        h2, hu2, hv2 = _step_values(
            h_s[:], hu_s[:], hv_s[:], tt, ctrl, o, meta, dt, use_filter
        )
        if store_traj:
            for d in dmas(t):
                d.wait()
        h_s[:] = h2
        hu_s[:] = hu2
        hv_s[:] = hv2
        return 0

    jax.lax.fori_loop(0, n_steps, body, 0)
    if store_traj:
        for d in dmas(n_steps):
            d.start()
        for d in dmas(n_steps):
            d.wait()
    oh[0] = h_s[:]
    ohu[0] = hu_s[:]
    ohv[0] = hv_s[:]


@functools.partial(
    jax.jit,
    static_argnames=("meta", "dt", "t0", "spc", "n_steps", "use_filter",
                     "store_traj", "interpret"),
)
def sw2d_rollout_blocked(
    ops: BlockedOps,
    meta: BlockedMeta,
    h: jnp.ndarray,  # (B, p, NP, M) packed initial states
    hu: jnp.ndarray,
    hv: jnp.ndarray,
    ctrls: jnp.ndarray | None,  # (B, n_ctrl_steps, n_ctrl) or None
    dt: float,
    spc: int = 1,  # RK steps per control step
    n_steps: int | None = None,  # required when ctrls is None
    t0: float = 0.0,
    use_filter: bool = True,
    store_traj: bool = False,
    interpret: bool = False,
):
    """Fused SSP-RK2 rollout. Returns the final packed state triple, plus
    the step-start trajectory (B, n_steps+1, p, NP, M) per field when
    ``store_traj`` (for the MPC cost/adjoint)."""
    B, p, NP, M = h.shape
    has_ctrl = ctrls is not None
    if has_ctrl:
        n_steps = ctrls.shape[1] * spc
    assert n_steps is not None

    state_spec = pl.BlockSpec((1, p, NP, M), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    op_specs = [
        pl.BlockSpec(op.shape, lambda i, nd=op.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for op in ops
    ]
    inputs = [h, hu, hv]
    in_specs = [state_spec] * 3
    if has_ctrl:
        inputs.append(ctrls)
        in_specs.append(
            pl.BlockSpec((1, ctrls.shape[1], meta.n_ctrl),
                         lambda i: (i, 0, 0), memory_space=pltpu.SMEM))

    shp = jax.ShapeDtypeStruct((B, p, NP, M), h.dtype)
    out_shape = [shp, shp, shp]
    out_specs = [state_spec, state_spec, state_spec]
    scratch = [pltpu.VMEM((p, NP, M), h.dtype)] * 3
    if store_traj:
        tshp = jax.ShapeDtypeStruct((B, n_steps + 1, p, NP, M), h.dtype)
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        out_shape = [tshp, tshp, tshp] + out_shape
        out_specs = [any_spec, any_spec, any_spec] + out_specs
        scratch = scratch + [pltpu.SemaphoreType.DMA((3,))]

    kernel = functools.partial(
        _rollout_kernel, meta, float(dt), float(t0), spc, n_steps,
        use_filter, has_ctrl, store_traj,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs + op_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        # the 'onehot' trace mode's banded one-hot gather operators push the
        # Mosaic scoped-vmem stack past the default 16M (measured 41.7M at
        # K=1046/N=2); v5e has 128M VMEM per core, so raise the budget like
        # the backward kernel does
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*inputs, *ops)
    return out


def _rollout_bwd_kernel(meta, dt, t0, spc, n_steps, use_filter,
                        ctrl_ref, *refs):
    """Reverse sweep for the blocked rollout: for each step t (T-1 .. 0)
    the stored step-start state is DMA'd back in and the adjoint state is
    propagated through `jax.vjp` of the SAME `_step_values` used forward —
    every primitive in the values function is differentiable (the lane
    rolls carry a custom transpose), so the pullback is traced right inside
    the kernel instead of being hand-derived. Rematerialization happens in
    VMEM; stored-trajectory cotangents are injected as they appear."""
    ops_list = refs[:_OP_FIELDS]
    traj_h, traj_hu, traj_hv, tb_h, tb_hu, tb_hv = refs[_OP_FIELDS:_OP_FIELDS + 6]
    xb_h, xb_hu, xb_hv, cb_ref = refs[_OP_FIELDS + 6:_OP_FIELDS + 10]
    (l_h, l_hu, l_hv, s_h, s_hu, s_hv, g_h, g_hu, g_hv, sem) = \
        refs[_OP_FIELDS + 10:]
    o = BlockedOps(*(r[:] for r in ops_list))
    b = pl.program_id(0)

    for r in (l_h, l_hu, l_hv):
        r[:] = jnp.zeros_like(r)
    # SMEM accepts only scalar stores on Mosaic — zero element-wise
    for j in range(cb_ref.shape[1]):
        for c in range(cb_ref.shape[2]):
            cb_ref[0, j, c] = jnp.zeros((), cb_ref.dtype)

    def load(t):
        copies = [
            pltpu.make_async_copy(src.at[b, t], dst, sem.at[i])
            for i, (src, dst) in enumerate(
                ((traj_h, s_h), (traj_hu, s_hu), (traj_hv, s_hv)))
        ] + [
            pltpu.make_async_copy(src.at[b, t + 1], dst, sem.at[3 + i])
            for i, (src, dst) in enumerate(
                ((tb_h, g_h), (tb_hu, g_hu), (tb_hv, g_hv)))
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

    def body(i, _):
        t = n_steps - 1 - i
        load(t)
        j = t // spc
        ctrl = tuple(ctrl_ref[0, j, c] for c in range(meta.n_ctrl))
        tt = t0 + t.astype(s_h.dtype) * dt

        lh = l_h[:] + g_h[:]
        lhu = l_hu[:] + g_hu[:]
        lhv = l_hv[:] + g_hv[:]

        # Reverse the SSP-RK2 step STAGE BY STAGE instead of jax.vjp-ing
        # _step_values whole: one pullback per RHS eval keeps only a single
        # stage's residuals live in the Mosaic value stack — the whole-step
        # vjp held both stages' and blew the 16M VMEM scoped limit at
        # K=2048 (hardware-verified failure mode, round 3).
        def rhs_fn(hh, hhu, hhv, cc, stage_t):
            return _eval_rhs(hh, hhu, hhv, stage_t, list(cc), o, meta,
                             use_filter)

        # forward recompute of stage A (state s -> s1)
        sh, shu, shv = s_h[:], s_hu[:], s_hv[:]
        k1 = rhs_fn(sh, shu, shv, ctrl, tt)
        s1 = (sh + 0.5 * dt * k1[0], shu + 0.5 * dt * k1[1],
              shv + 0.5 * dt * k1[2])

        if meta.has_sponge:
            fac = 1.0 / (1.0 + dt * o.SPNG)
            lh, lhu, lhv = lh * fac, lhu * fac, lhv * fac

        # s2 = s + dt*k2: lambda_k2 = dt*lambda_s2
        _, vjpB = jax.vjp(
            lambda a, b, c3, cc: rhs_fn(a, b, c3, cc, tt + 0.5 * dt),
            *s1, ctrl)
        g1h, g1hu, g1hv, cbB = vjpB((dt * lh, dt * lhu, dt * lhv))

        # s1 = s + (dt/2)*k1: lambda_k1 = (dt/2)*lambda_s1
        _, vjpA = jax.vjp(
            lambda a, b, c3, cc: rhs_fn(a, b, c3, cc, tt), sh, shu, shv,
            ctrl)
        g0h, g0hu, g0hv, cbA = vjpA(
            (0.5 * dt * g1h, 0.5 * dt * g1hu, 0.5 * dt * g1hv))

        l_h[:] = lh + g1h + g0h
        l_hu[:] = lhu + g1hu + g0hu
        l_hv[:] = lhv + g1hv + g0hv
        for c in range(meta.n_ctrl):
            cb_ref[0, j, c] = cb_ref[0, j, c] + cbB[c] + cbA[c]
        return 0

    jax.lax.fori_loop(0, n_steps, body, 0)

    # initial-state adjoint: lambda + cotangent of the stored initial state
    copies = [
        pltpu.make_async_copy(src.at[b, 0], dst, sem.at[i])
        for i, (src, dst) in enumerate(
            ((tb_h, g_h), (tb_hu, g_hu), (tb_hv, g_hv)))
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()
    xb_h[0] = l_h[:] + g_h[:]
    xb_hu[0] = l_hu[:] + g_hu[:]
    xb_hv[0] = l_hv[:] + g_hv[:]


@functools.partial(
    jax.jit,
    static_argnames=("meta", "dt", "t0", "spc", "use_filter", "interpret"),
)
def sw2d_rollout_bwd_blocked(
    ops: BlockedOps,
    meta: BlockedMeta,
    traj_h: jnp.ndarray,  # (B, n_steps+1, p, NP, M) stored fwd trajectory
    traj_hu: jnp.ndarray,
    traj_hv: jnp.ndarray,
    tb_h: jnp.ndarray,  # cotangents of the stored trajectory
    tb_hu: jnp.ndarray,
    tb_hv: jnp.ndarray,
    ctrls: jnp.ndarray,  # (B, n_ctrl_steps, n_ctrl)
    dt: float,
    spc: int,
    t0: float = 0.0,
    use_filter: bool = True,
    interpret: bool = False,
):
    B, n_steps_p1, p, NP, M = traj_h.shape
    n_steps = n_steps_p1 - 1
    n_ctrl_steps = ctrls.shape[1]

    state_spec = pl.BlockSpec((1, p, NP, M), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    ctrl_spec = pl.BlockSpec((1, n_ctrl_steps, meta.n_ctrl),
                             lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    op_specs = [
        pl.BlockSpec(op.shape, lambda i, nd=op.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for op in ops
    ]

    kernel = functools.partial(
        _rollout_bwd_kernel, meta, float(dt), float(t0), spc, n_steps,
        use_filter,
    )
    shp = jax.ShapeDtypeStruct((B, p, NP, M), traj_h.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[ctrl_spec, *op_specs] + [any_spec] * 6,
        out_specs=(state_spec, state_spec, state_spec,
                   pl.BlockSpec((1, n_ctrl_steps, meta.n_ctrl),
                                lambda i: (i, 0, 0),
                                memory_space=pltpu.SMEM)),
        out_shape=(shp, shp, shp,
                   jax.ShapeDtypeStruct((B, n_ctrl_steps, meta.n_ctrl),
                                        ctrls.dtype)),
        scratch_shapes=[pltpu.VMEM((p, NP, M), traj_h.dtype)] * 9
        + [pltpu.SemaphoreType.DMA((6,))],
        # the jax.vjp-traced pullbacks carry a deep residual stack at
        # K=2048; the default 16M scoped-vmem budget is too small even
        # with the stage-split backward (measured 21.9M) — raise it
        # (v5e has headroom above the conservative compiler default)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(ctrls, *ops, traj_h, traj_hu, traj_hv, tb_h, tb_hu, tb_hv)


def make_rollout_blocked(
    ops: BlockedOps,
    meta: BlockedMeta,
    dt: float,
    spc: int,
    t0: float = 0.0,
    use_filter: bool = True,
    interpret: bool = False,
):
    """Differentiable fused blocked rollout: rollout(h, hu, hv, ctrls) ->
    (traj_h, traj_hu, traj_hv) of step-start states (B, n_steps+1, p, NP,
    M), with a custom VJP whose backward pass is the jax.vjp-in-kernel
    adjoint (sw2d_rollout_bwd_blocked). The large-mesh twin of
    sw2d_pallas.make_rollout."""

    @jax.custom_vjp
    def rollout(h, hu, hv, ctrls):
        out = sw2d_rollout_blocked(
            ops, meta, h, hu, hv, ctrls, dt, spc=spc, t0=t0,
            use_filter=use_filter, store_traj=True, interpret=interpret)
        return out[0], out[1], out[2]

    def fwd(h, hu, hv, ctrls):
        traj = rollout(h, hu, hv, ctrls)
        return traj, (traj, ctrls)

    def bwd(res, tbar):
        (th, thu, thv), ctrls = res
        tbh, tbhu, tbhv = tbar
        return sw2d_rollout_bwd_blocked(
            ops, meta, th, thu, thv, tbh, tbhu, tbhv, ctrls, dt, spc,
            t0, use_filter, interpret)

    rollout.defvjp(fwd, bwd)
    return rollout


# ---------------------------------------------------------------------------
# Differentiable sharded stage: custom VJP with an in-kernel pullback
# ---------------------------------------------------------------------------

def _dotT(a, b, prec="highest"):
    """aᵀ @ b without materializing the transpose (one-hot exact at
    HIGHEST): contracting dim 0 of both operands."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=a.dtype)


def _stage_bwd_kernel_v2(meta, c_dt, t0, use_filter, has_t, has_ctrl,
                         apply_sponge, *refs):
    """Backward of the KERNEL-I/O sharded stage (round 5): cotangents of
    (out3, send_buffer) -> cotangents of (base3, cur3, recv_buffer
    [, ctrl]). The send-gather pullback is closed-form (SGEMᵀ / SL);
    the RHS pullback — INCLUDING the in-kernel recv consumption
    (_recv_to_ext) — is jax.vjp of the same values function, so the
    rb cotangent falls out of AD."""
    (ch, chu, chv, rb, loh, lohu, lohv, lsb, *rest) = refs
    if has_t:
        t_ref, *rest = rest
    if has_ctrl:
        ctrl_ref, *rest = rest
        ctrl = [ctrl_ref[0, c] for c in range(meta.n_ctrl)]
    else:
        ctrl = None
    if has_ctrl:
        (*ops_list, obh, obhu, obhv, och, ochu, ochv, orb, octl) = rest
    else:
        (*ops_list, obh, obhu, obhv, och, ochu, ochv, orb) = rest
    o = BlockedOps(*(r[:] for r in ops_list))
    M = meta.M
    tt = t_ref[0, 0] if has_t else t0

    # send-buffer emission sb = gather(out) via SGEM/SL: closed-form
    # pullback onto the (post-sponge) outputs
    lam_G = jnp.concatenate(
        [lsb[0][:, c:c + 1] * o.SL for c in range(3)], axis=1)  # (L_s, 3M)
    lam_xs = _dotT(o.SGEM, lam_G).reshape(meta.p, meta.NP, 3 * M)
    lo = [loh[0] + lam_xs[:, :, :M],
          lohu[0] + lam_xs[:, :, M:2 * M],
          lohv[0] + lam_xs[:, :, 2 * M:]]

    if apply_sponge and meta.has_sponge:
        fac = 1.0 / (1.0 + c_dt * o.SPNG)
        lam_base = [l * fac for l in lo]
        lam_R = [c_dt * l * fac for l in lo]
    else:
        lam_base = lo
        lam_R = [c_dt * l for l in lo]

    if has_ctrl:
        def rhs_fn(c3, rbv, cc):
            ext = _recv_to_ext(rbv, o, meta)
            return _eval_rhs(c3[0], c3[1], c3[2], tt, list(cc), o, meta,
                             use_filter, ext=ext)

        _, vjp = jax.vjp(rhs_fn, (ch[0], chu[0], chv[0]), rb[0],
                         tuple(ctrl))
        lc, lrb, lctl = vjp(tuple(lam_R))
        for c in range(meta.n_ctrl):
            octl[0, c] = lctl[c]
    else:
        def rhs_fn(c3, rbv):
            ext = _recv_to_ext(rbv, o, meta)
            return _eval_rhs(c3[0], c3[1], c3[2], tt, None, o, meta,
                             use_filter, ext=ext)

        _, vjp = jax.vjp(rhs_fn, (ch[0], chu[0], chv[0]), rb[0])
        lc, lrb = vjp(tuple(lam_R))

    obh[0], obhu[0], obhv[0] = lam_base
    och[0], ochu[0], ochv[0] = lc
    orb[0] = lrb


@functools.partial(
    jax.jit, static_argnames=("meta", "c_dt", "t0", "use_filter",
                              "apply_sponge", "interpret")
)
def sw2d_stage_bwd_blocked_v2(
    ops: BlockedOps,
    meta: BlockedMeta,
    cur,       # tuple of 3 (B, p, NP, M): the stage-input state
    rb,        # (B, L_r, 3): the stage's receive buffer
    lam_out,   # tuple of 3 (B, p, NP, M)
    lam_sb,    # (B, L_s, 3): cotangent of the emitted send buffer
    c_dt: float,
    t=None,
    t0: float = 0.0,
    use_filter: bool = True,
    apply_sponge: bool = False,
    interpret: bool = False,
    ctrl=None,
):
    B, p, NP, M = cur[0].shape
    L_s = ops.SGEM.shape[0]
    L_r = rb.shape[1]
    vspec = pl.BlockSpec((1, p, NP, M), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    rbspec = pl.BlockSpec((1, L_r, 3), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    sbspec = pl.BlockSpec((1, L_s, 3), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    op_specs = [
        pl.BlockSpec(op.shape, lambda i, nd=op.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for op in ops
    ]
    has_t = t is not None
    has_ctrl = ctrl is not None
    t_in, t_specs = [], []
    if has_t:
        t_in = [jnp.asarray(t, dtype=cur[0].dtype).reshape(1, 1)]
        t_specs = [pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)]
    if has_ctrl:
        t_in.append(jnp.asarray(ctrl, dtype=cur[0].dtype
                                ).reshape(1, meta.n_ctrl))
        t_specs.append(pl.BlockSpec((1, meta.n_ctrl), lambda i: (0, 0),
                                    memory_space=pltpu.SMEM))
    kernel = functools.partial(_stage_bwd_kernel_v2, meta, float(c_dt),
                               float(t0), use_filter, has_t, has_ctrl,
                               apply_sponge)
    vshp = jax.ShapeDtypeStruct((B, p, NP, M), cur[0].dtype)
    out_specs = [vspec] * 6 + [rbspec]
    out_shape = [vshp] * 6 + [jax.ShapeDtypeStruct((B, L_r, 3),
                                                   cur[0].dtype)]
    if has_ctrl:
        out_specs.append(pl.BlockSpec((1, meta.n_ctrl), lambda i: (i, 0),
                                      memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, meta.n_ctrl),
                                              cur[0].dtype))
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[vspec] * 3 + [rbspec] + [vspec] * 3 + [sbspec]
        + t_specs + op_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )(*cur, rb, *lam_out, lam_sb, *t_in, *ops)
