"""Element-sharded BLOCKED-kernel shallow water: per-shard fused Pallas
stage kernels + KERNEL-I/O lean halo exchange between RK stages.

Each shard runs the SAME packed (p, NP, M) Pallas stage kernel as the
single-device path (FULL coastal physics); only the cut-face '+' values
cross shards. Round-5 architecture (the round-3 XLA halo path measured
~575 us/step at K=2048/N=3; the round-4 trace-emitting lean exchange
~34 us; this design ~32 us at B=1 and ~12 us/step/scenario at B=8 vs the
in-kernel rollout's 21.7/8.5 — SCALING_r05.json):

  per SSP-RK2 stage (the exchange must happen per stage — each stage's
  RHS needs the traces of ITS OWN input state):
    1. the PREVIOUS stage kernel emitted a compact (B, L, 3) SEND buffer
       (cut-face values gathered in-kernel via the one-hot SGEM/SL
       matmuls, exact at HIGHEST precision),
    2. XLA glue = slice per ring offset + one `lax.ppermute` + concat,
    3. ONE Pallas stage kernel consumes the receive buffer in-kernel
       (RG/RL one-hot scatter into the EXTM-masked '+' slots):
       out = base + c*dt*R(cur, rb) — the in-kernel combo exchange
       resolves intra-shard faces.

Setup builds per-shard BlockedOps with a UNION combo list (every shard
runs the same SPMD program; a combo a shard doesn't have owns an
all-zero cmask row), cut faces self-connected locally (the override
replaces their traces). Variants: `make_sharded_blocked_step_fused`
(forward), `make_sharded_blocked_step_diff` (custom-VJP stages with the
jax.vjp-in-kernel backward — multi-chip MPC adjoints at 169 us/step
fwd+bwd), `make_sharded_blocked_step_rdma` (endgame prototype: ONE
kernel per step, inter-stage halo via in-kernel remote DMA), and the
non-fused `make_sharded_blocked_step` (XLA halo_face_rows exchange,
kept as the reference implementation).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..context import BC_WALL, DGContext2D
from ..ops.sw2d_blocked import (
    LANE,
    SUB,
    BlockedMeta,
    BlockedOps,
    _pad,
    sw2d_stage_blocked,
)
from .halo import HaloPlan, build_halo_plan, halo_face_rows, halo_tables


class ShardedBlocked(NamedTuple):
    ops: BlockedOps  # every field stacked with a leading (n_shards,) axis
    meta: BlockedMeta  # shared static meta (union combos)
    plan: HaloPlan
    tables: tuple  # halo_tables(plan)
    n_shards: int
    k_loc: int


def build_sharded_blocked(
    ctx: DGContext2D,
    phys,
    n_shards: int,
    dtype=jnp.float32,
    precision: str = "highest",
    fold_filter: bool | str = "auto",
    tidal: tuple | None = None,
    wetdry: bool = False,
    h_floor: float = 1e-3,
    forcing_bu: np.ndarray | None = None,  # (n_ctrl, K, Np) hu injector
    forcing_bv: np.ndarray | None = None,
) -> ShardedBlocked:
    """Freeze per-shard blocked operator sets + the halo plan.

    ctx must be built on a partitioned mesh (contiguous shard blocks,
    K % n_shards == 0 — partition.partition_mesh / pad_context).

    FULL coastal physics supported: the kernel's coastal terms consume
    only static per-shard data (bed slopes, precomputed GLOBAL bathymetry
    traces — correct across cuts — sponge, BC masks), so nothing coastal
    crosses shards at runtime; only the state's cut-face traces do."""
    K, n_p = ctx.k_elem, ctx.n_p
    n_fp, n_faces = ctx.n_fp, ctx.n_faces
    n_tr = n_faces * n_fp
    assert K % n_shards == 0, (K, n_shards)
    k_loc = K // n_shards
    NP, NT = _pad(n_p, SUB), _pad(n_tr, SUB)

    if ctx.face_nbr is None:
        raise ValueError("context lacks face-granular trace structure")
    face_nbr = np.asarray(ctx.face_nbr).reshape(K, n_faces)
    face_flip = np.asarray(ctx.face_flip).reshape(K, n_faces)
    nbr_elem = face_nbr // n_faces
    nbr_face = face_nbr % n_faces

    p = max(1, min(LANE // NP, -(-k_loc // LANE)))
    M = _pad(-(-k_loc // p), LANE)
    Kp = p * M

    # ---- per-shard localized face tables + UNION combo list ----
    owner = nbr_elem // k_loc
    combo_ids: dict[tuple, int] = {}
    shard_entries = []  # per shard: list of (combo_id, s_grp, lane) targets
    ext_rows = []       # per shard: (k_local, f) cut faces
    for s in range(n_shards):
        entries = []
        cuts = []
        base = s * k_loc
        for kl in range(k_loc):
            sg, l = divmod(kl, M)
            for f in range(n_faces):
                k2g = int(nbr_elem[base + kl, f])
                if owner[base + kl, f] != s:
                    # cut face: locally self-connected; override via EXTM
                    key = (f, 0, 0, f, False)
                    cuts.append((kl, f))
                else:
                    k2 = k2g - base
                    s2, l2 = divmod(k2, M)
                    key = (f, (sg - s2) % p, (l - l2) % M,
                           int(nbr_face[base + kl, f]),
                           bool(face_flip[base + kl, f]))
                ci = combo_ids.setdefault(key, len(combo_ids))
                entries.append((ci, sg, l))
        shard_entries.append(entries)
        ext_rows.append(cuts)
    n_combos = len(combo_ids)
    C_pad = _pad(max(n_combos, 1), SUB)
    combos = tuple(combo_ids.keys())

    # ---- shared reference-element operators ----
    def padm(a, rows, cols):
        out = np.zeros((rows, cols))
        out[: a.shape[0], : a.shape[1]] = np.asarray(a)
        return out

    kron = lambda a: np.kron(np.eye(p), a)
    EM = np.zeros((NT, NP))
    EM[np.arange(n_tr), np.asarray(ctx.fmask).reshape(-1)] = 1.0
    filt_np = np.asarray(ctx.filter)
    DR = kron(padm(ctx.Dr, NP, NP))
    DS = kron(padm(ctx.Ds, NP, NP))
    FILT = kron(padm(filt_np, NP, NP))
    LIFT = kron(padm(ctx.lift, NP, NT))
    EMk = kron(EM)
    if fold_filter:
        FDR = kron(padm(filt_np @ np.asarray(ctx.Dr), NP, NP))
        FDS = kron(padm(filt_np @ np.asarray(ctx.Ds), NP, NP))
        FLIFT = kron(padm(filt_np @ np.asarray(ctx.lift), NP, NT))
    else:
        FDR = FDS = FLIFT = np.zeros((1, 1))

    # global wall mask rows
    wall_g = np.zeros((K, n_tr))
    w_idx = np.asarray(ctx.bc_maps.idx[BC_WALL])
    w_msk = np.asarray(ctx.bc_maps.mask[BC_WALL])
    wall_g.reshape(-1)[w_idx[w_msk]] = 1.0

    def padT3(a, rows, lo, fill=0.0):
        """Shard slice of a (K, n) field -> packed (p, rows, M)."""
        arr = np.asarray(a)[lo:lo + k_loc]
        out = np.full((p, rows, M), fill)
        n = arr.shape[1]
        for sg in range(p):
            a0, a1 = sg * M, min((sg + 1) * M, k_loc)
            if a0 >= k_loc:
                break
            out[sg, :n, : a1 - a0] = arr[a0:a1].T
        return out

    # ---- per-shard stacked arrays ----
    def stack(fn):
        return np.stack([fn(s) for s in range(n_shards)])

    def cmask_for(s):
        cm = np.zeros((C_pad, p, M))
        for ci, sg, l in shard_entries[s]:
            cm[ci, sg, l] = 1.0
        return cm

    def extm_for(s):
        em = np.zeros((p, NT, M))
        for kl, f in ext_rows[s]:
            sg, l = divmod(kl, M)
            em[sg, f * n_fp:(f + 1) * n_fp, l] = 1.0
        return em

    def vmask_for(s):
        vm = np.zeros((p, NP, M))
        tm = np.zeros((p, NT, M))
        for sg in range(p):
            a0, a1 = sg * M, min((sg + 1) * M, k_loc)
            if a0 >= k_loc:
                break
            vm[sg, :n_p, : a1 - a0] = 1.0
            tm[sg, :n_tr, : a1 - a0] = 1.0
        return vm, tm

    vm0, tm0 = vmask_for(0)  # identical across shards (k_loc uniform)
    ones_v = np.ones((p, NP, M))
    zeros_v = np.zeros((p, NP, M))
    ones_t = np.ones((p, NT, M))

    # ---- coastal physics data (all static, shard-local at runtime) ----
    has_bathy = phys.H is not None
    wb = has_bathy and phys.well_balanced
    has_sponge = phys.sponge is not None
    obc_g = np.zeros((K, n_tr))
    if tidal is not None:
        from ..context import BC_OUT

        o_idx = np.asarray(ctx.bc_maps.idx[BC_OUT])
        o_msk = np.asarray(ctx.bc_maps.mask[BC_OUT])
        obc_g.reshape(-1)[o_idx[o_msk]] = 1.0
    if has_bathy:
        H_g, Hx_g = np.asarray(phys.H), np.asarray(phys.Hx)
        Hy_g = np.asarray(phys.Hy)
        # GLOBAL traces: the '+' trace of H at cut faces is the remote
        # element's value — baked here, so no runtime exchange needed
        HMf, HPf = ctx.surface_trace(phys.H)
        HM_g = np.asarray(HMf).reshape(K, n_tr)
        HP_g = np.asarray(HPf).reshape(K, n_tr)
    SP_g = np.asarray(phys.sponge) if has_sponge else None

    # filter folding legal only for affine source-free physics
    affine = all(
        float(np.ptp(np.asarray(m)[:, :n_p], axis=1).max(initial=0.0)) < 1e-10
        for m in (ctx.rx, ctx.sx, ctx.ry, ctx.sy))
    can_fold = (affine and not has_bathy and phys.cd == 0.0
                and phys.f_cor == 0.0)
    fold = can_fold if fold_filter == "auto" else bool(fold_filter)
    assert not (fold and not can_fold), "cannot fold filter with sources"
    if not fold:
        FDR = FDS = FLIFT = np.zeros((1, 1))

    to = lambda a: jnp.asarray(a, dtype=dtype)
    rep = lambda a: jnp.broadcast_to(to(a), (n_shards,) + np.shape(a))
    ops = BlockedOps(
        DR=rep(DR), DS=rep(DS), FILT=rep(FILT), LIFT=rep(LIFT), EM=rep(EMk),
        FDR=rep(FDR), FDS=rep(FDS), FLIFT=rep(FLIFT),
        rx=to(stack(lambda s: padT3(ctx.rx, NP, s * k_loc))),
        sx=to(stack(lambda s: padT3(ctx.sx, NP, s * k_loc))),
        ry=to(stack(lambda s: padT3(ctx.ry, NP, s * k_loc))),
        sy=to(stack(lambda s: padT3(ctx.sy, NP, s * k_loc))),
        nx=to(stack(lambda s: padT3(ctx.nx, NT, s * k_loc))),
        ny=to(stack(lambda s: padT3(ctx.ny, NT, s * k_loc))),
        fscale=to(stack(lambda s: padT3(ctx.fscale, NT, s * k_loc))),
        wall=to(stack(lambda s: padT3(wall_g, NT, s * k_loc))),
        vmask=rep(vm0), tmask=rep(tm0),
        cmask=to(stack(cmask_for)),
        PH=rep(np.zeros((1, 1, 1))), fsel=rep(np.zeros((1, 1))),
        obc=to(stack(lambda s: padT3(obc_g, NT, s * k_loc))),
        H=(to(stack(lambda s: padT3(H_g, NP, s * k_loc, fill=1.0)))
           if has_bathy else rep(ones_v)),
        Hx=(to(stack(lambda s: padT3(Hx_g, NP, s * k_loc)))
            if has_bathy else rep(zeros_v)),
        Hy=(to(stack(lambda s: padT3(Hy_g, NP, s * k_loc)))
            if has_bathy else rep(zeros_v)),
        SPNG=(to(stack(lambda s: padT3(SP_g, NP, s * k_loc)))
              if has_sponge else rep(zeros_v)),
        HMt=(to(stack(lambda s: padT3(HM_g, NT, s * k_loc, fill=1.0)))
             if has_bathy else rep(ones_t)),
        HPt=(to(stack(lambda s: padT3(HP_g, NT, s * k_loc, fill=1.0)))
             if has_bathy else rep(ones_t)),
        BU=(to(stack(lambda s: np.stack(
            [padT3(forcing_bu[c], NP, s * k_loc)
             for c in range(forcing_bu.shape[0])])))
            if forcing_bu is not None else rep(np.zeros((1, p, NP, M)))),
        BV=(to(stack(lambda s: np.stack(
            [padT3(forcing_bv[c], NP, s * k_loc)
             for c in range(forcing_bv.shape[0])])))
            if forcing_bv is not None else rep(np.zeros((1, p, NP, M)))),
        # filter-folded injectors (exact on affine meshes, like the
        # single-device builder's FBU/FBV)
        FBU=(to(stack(lambda s: np.stack(
            [padT3(forcing_bu[c] @ filt_np.T, NP, s * k_loc)
             for c in range(forcing_bu.shape[0])])))
            if (forcing_bu is not None and fold)
            else rep(np.zeros((1, 1, 1, 1)))),
        FBV=(to(stack(lambda s: np.stack(
            [padT3(forcing_bv[c] @ filt_np.T, NP, s * k_loc)
             for c in range(forcing_bv.shape[0])])))
            if (forcing_bv is not None and fold)
            else rep(np.zeros((1, 1, 1, 1)))),
        EXTM=to(stack(extm_for)),
        # kernel-I/O exchange tables: filled below once the halo plan's
        # send/cut lists exist (placeholders keep the ctor total)
        SGEM=rep(np.zeros((1, 1))), SL=rep(np.zeros((1, 1))),
        RG=rep(np.zeros((1, 1))), RL=rep(np.zeros((1, 1))),
        EM2=rep(np.zeros((1, 1))),  # sharded path uses the default rolls
        FSNX=to(stack(lambda s: padT3(
            np.asarray(ctx.fscale) * np.asarray(ctx.nx), NT, s * k_loc))),
        FSNY=to(stack(lambda s: padT3(
            np.asarray(ctx.fscale) * np.asarray(ctx.ny), NT, s * k_loc))),
    )
    meta = BlockedMeta(
        n_p=n_p, n_fp=n_fp, n_faces=n_faces, k_elem=k_loc,
        NP=NP, NT=NT, Kp=Kp, p=p, M=M,
        n_ctrl=0 if forcing_bu is None else int(forcing_bu.shape[0]),
        g=float(phys.g),
        cd=float(phys.cd), f_cor=float(phys.f_cor), wb=wb,
        has_bathy=has_bathy, has_sponge=has_sponge,
        fold=fold,
        tidal=tuple(float(v) for v in tidal) if tidal is not None else None,
        combos=combos,
        trace_mode="rolls", precision=precision,
        wetdry=wetdry, h_floor=h_floor,
    )
    plan = build_halo_plan(ctx, n_shards)

    # ---- cut-face lists for the kernel-I/O exchange tables ----
    n_off = max(len(plan.offs), 1)
    ms = plan.max_send
    f_loc = k_loc * n_faces
    psrc = np.asarray(plan.psrc)    # (n_shards, f_loc)
    pflip = np.asarray(plan.pflip)
    send_idx = np.asarray(plan.send_idx)  # (n_shards, n_off?, max_send)
    cut_lists = []
    for s in range(n_shards):
        cuts = [(r, int(psrc[s, r]) - f_loc, bool(pflip[s, r]))
                for r in range(f_loc) if psrc[s, r] >= f_loc]
        cut_lists.append(cuts)

    # ---- kernel-I/O exchange tables (round 5, VERDICT r4 #2): the send
    # gather and recv scatter move INTO the stage kernel as exact one-hot
    # matmuls; between launches only a (L, 3) buffer is sliced, ppermuted
    # and concatenated. Slot layout: j = di*chunk + slot*n_fp + node with
    # chunk = max_send*n_fp (recv buffer mirrors it, so RB position j is
    # the ring-offset-di sender's slot) ----
    fmask_flat = np.asarray(ctx.fmask).reshape(-1)
    chunk = ms * n_fp
    real_off = len(plan.offs)
    L = max(real_off * chunk, 1)
    SGEM_a = np.zeros((n_shards, L, p * NP))
    SL_a = np.zeros((n_shards, L, M))
    RG_a = np.zeros((n_shards, p * NT, L))
    RL_a = np.zeros((n_shards, L, M))
    for s in range(n_shards):
        for di in range(real_off):
            for slot in range(ms):
                r = int(send_idx[s, di, slot])
                kl, f = divmod(r, n_faces)
                sg, l = divmod(kl, M)
                for i in range(n_fp):
                    j = di * chunk + slot * n_fp + i
                    SGEM_a[s, j, sg * NP + fmask_flat[f * n_fp + i]] = 1.0
                    SL_a[s, j, l] = 1.0
        for (r, rslot, flip) in cut_lists[s]:
            kl, f = divmod(r, n_faces)
            sg, l = divmod(kl, M)
            di, slot = divmod(rslot, ms)
            for jn in range(n_fp):
                src_node = n_fp - 1 - jn if flip else jn
                jj = di * chunk + slot * n_fp + src_node
                RG_a[s, sg * NT + f * n_fp + jn, jj] = 1.0
                RL_a[s, jj, l] = 1.0
    ops = ops._replace(SGEM=to(SGEM_a), SL=to(SL_a),
                       RG=to(RG_a), RL=to(RL_a))

    return ShardedBlocked(ops=ops, meta=meta, plan=plan,
                          tables=halo_tables(plan), n_shards=n_shards,
                          k_loc=k_loc)


def pack_local(meta: BlockedMeta, f: jnp.ndarray) -> jnp.ndarray:
    """(K_loc, Np) shard field -> packed (1, p, NP, M) (B=1)."""
    p, M, NP = meta.p, meta.M, meta.NP
    arr = jnp.pad(f, ((0, meta.Kp - f.shape[0]), (0, NP - f.shape[1])))
    return arr.reshape(p, M, NP).transpose(0, 2, 1)[None]


def unpack_local(meta: BlockedMeta, f: jnp.ndarray) -> jnp.ndarray:
    """packed (1, p, NP, M) -> (K_loc, Np)."""
    out = f[0].transpose(0, 2, 1).reshape(meta.Kp, meta.NP)
    return out[: meta.k_elem, : meta.n_p]


def _pack_traces(meta: BlockedMeta, rows: jnp.ndarray) -> jnp.ndarray:
    """(K_loc, n_tr) '+'-trace rows -> packed (1, p, NT, M)."""
    p, M, NT = meta.p, meta.M, meta.NT
    n_tr = meta.n_faces * meta.n_fp
    arr = jnp.pad(rows, ((0, meta.Kp - rows.shape[0]), (0, NT - n_tr)))
    return arr.reshape(p, M, NT).transpose(0, 2, 1)[None]


def make_sharded_blocked_step(sb: ShardedBlocked, ctx_fmask, dt: float,
                              axis_name: str = "element",
                              use_filter: bool = True,
                              interpret: bool = False):
    """Returns step(local_ops, tables_row, packed_state) for use INSIDE
    shard_map over `axis_name`. packed_state = 3 (1, p, NP, M) fields.

    ctx_fmask: np.asarray(ctx.fmask).reshape(-1) (static)."""
    meta, plan = sb.meta, sb.plan
    n_fp = meta.n_fp
    fm = jnp.asarray(ctx_fmask)

    def exchange(local_ops, plan_row, packed):
        fields = tuple(unpack_local(meta, a) for a in packed)
        fMf = jnp.stack([f[:, fm] for f in fields]).reshape(
            len(fields), -1, n_fp)
        fP = halo_face_rows(fMf, plan_row, plan, axis_name)
        return tuple(
            _pack_traces(meta, fP[i].reshape(meta.k_elem, -1))
            for i in range(3))

    def step(local_ops: BlockedOps, tables_row, packed, t):
        plan_row = tuple(a[0] for a in tables_row)
        o = jax.tree.map(lambda a: a[0], local_ops)
        # dynamic stage times via SMEM when the physics needs them (tidal
        # BC_OUT) — mirrors the fused path; stage 2's RHS time is t + dt/2
        t1 = t if meta.tidal is not None else None
        t2 = (t + 0.5 * dt) if meta.tidal is not None else None
        ext1 = exchange(local_ops, plan_row, packed)
        s1 = sw2d_stage_blocked(o, meta, packed, packed, ext1, 0.5 * dt,
                                t0=0.0, use_filter=use_filter,
                                interpret=interpret, t=t1)
        ext2 = exchange(local_ops, plan_row, s1)
        s2 = sw2d_stage_blocked(o, meta, packed, s1, ext2, dt,
                                t0=0.0, use_filter=use_filter,
                                apply_sponge=True, interpret=interpret,
                                t=t2)
        return s2

    return step


def initial_packed_traces(sb: ShardedBlocked, local_ops: BlockedOps,
                          packed) -> jnp.ndarray:
    """(1, p, NT, 3M) packed '-' traces of the packed state — seeds the
    DIFF step's carry (subsequent traces come from the kernel itself)."""
    meta = sb.meta
    p, NP, NT, M = meta.p, meta.NP, meta.NT, meta.M
    EM = local_ops.EM[0]
    vm = local_ops.vmask[0]
    h = jnp.where(vm > 0, packed[0][0], 1.0)
    xs = jnp.concatenate([h, packed[1][0] * vm, packed[2][0] * vm],
                         axis=2).reshape(p * NP, 3 * M)
    return (EM @ xs).reshape(1, p, NT, 3 * M)


def initial_send_buffer(sb: ShardedBlocked, local_ops: BlockedOps,
                        packed) -> jnp.ndarray:
    """(B, L_s, 3) initial send buffer — gathers the cut-face values of
    the initial packed state with the SAME SGEM/SL tables the kernel uses
    (subsequent buffers come from the kernel itself). Seeds the fused
    step's carry."""
    meta = sb.meta
    M = meta.M
    SGEM = local_ops.SGEM[0]
    SL = local_ops.SL[0]
    xs = jnp.concatenate(list(packed), axis=3)  # (B, p, NP, 3M)
    xs = xs.reshape(xs.shape[0], meta.p * meta.NP, 3 * M)
    G = jnp.einsum("ls,bsm->blm", SGEM, xs,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate(
        [jnp.sum(G[:, :, c * M:(c + 1) * M] * SL[None], axis=2,
                 keepdims=True) for c in range(3)], axis=2)


def make_sharded_blocked_step_fused(sb: ShardedBlocked, dt: float,
                                    axis_name: str = "element",
                                    use_filter: bool = True,
                                    interpret: bool = False):
    """The FAST sharded step — kernel-I/O lean exchange (round 5): the
    stage kernel gathers its cut-face SEND values in-kernel (one-hot
    SGEM/SL matmuls on the freshly computed output) and consumes the
    compact RECEIVE buffer in-kernel (RG/RL matmul into the EXTM slots),
    so the only XLA work between the two stage launches of a step is
    slice + one ppermute per ring offset + concat of a (B, L, 3) buffer.
    Measured round 4 (trace-emission + XLA take/scatter glue): 34.7
    us/step at K=2048/N=3/B=1 on one chip, 10.7 us of it glue; this path
    deletes the glue and the full-size trace emission.

    Returns step(local_ops, carry, t, ctrl=None) -> carry with
    carry = (packed_state_tuple, send_buffer); seed the carry with
    `initial_send_buffer`. Scenario batching: every packed field may carry
    a leading B axis (the kernel grids over it) — the exchange ships all
    scenarios' halos in one buffer."""
    from . import halo as halo_mod

    meta, plan = sb.meta, sb.plan
    n = plan.n_shards
    n_off = len(plan.offs)
    chunk = plan.max_send * meta.n_fp

    def exchange(sbuf):
        if n_off == 0:
            return jnp.zeros_like(sbuf)
        outs = []
        for di, d in enumerate(plan.offs):
            buf = sbuf[:, di * chunk:(di + 1) * chunk, :]
            outs.append(halo_mod._ppermute(
                buf, axis_name, [(j, (j + d) % n) for j in range(n)]))
        return jnp.concatenate(outs, axis=1)

    def step(local_ops: BlockedOps, carry, t, ctrl=None):
        packed, sbuf = carry
        o = jax.tree.map(lambda a: a[0], local_ops)
        # dynamic stage time (SMEM) only when the physics needs it (tidal)
        t1 = t if meta.tidal is not None else None
        t2 = (t + 0.5 * dt) if meta.tidal is not None else None
        rb1 = exchange(sbuf)
        *s1, sb1 = sw2d_stage_blocked(
            o, meta, packed, packed, None, 0.5 * dt, t0=0.0,
            use_filter=use_filter, interpret=interpret,
            t=t1, ctrl=ctrl, rb=rb1)
        rb2 = exchange(sb1)
        *s2, sb2 = sw2d_stage_blocked(
            o, meta, packed, tuple(s1), None, dt, t0=0.0,
            use_filter=use_filter, apply_sponge=True,
            interpret=interpret, t=t2, ctrl=ctrl, rb=rb2)
        return (tuple(s2), sb2)

    return step


def make_sharded_blocked_step_rdma(sb: ShardedBlocked, dt: float,
                                   axis_name: str = "element",
                                   use_filter: bool = True,
                                   interpret=False):
    """ENDGAME prototype (VERDICT r4 #2): ONE kernel launch per SSP-RK2
    step — the inter-stage halo exchange rides in-kernel remote DMA
    (`pltpu.make_async_remote_copy` per ring offset, symmetric SPMD sends
    with send/recv semaphores), so only the step-boundary exchange stays
    in XLA (slice + ppermute + concat, as in the fused path). Halves both
    the launch count and the XLA exchange count per step.

    ``interpret``: pass `pltpu.InterpretParams()` to simulate the remote
    DMAs/semaphores on the virtual CPU mesh (plain True has no remote-DMA
    support) — that is how tests/test_parallel.py proves 1e-12 parity.
    Prototype scope: B=1, no wetdry. Same carry contract as the fused
    step."""
    from ..ops.sw2d_blocked import sw2d_step_rdma_blocked
    from . import halo as halo_mod

    meta, plan = sb.meta, sb.plan
    n = plan.n_shards
    n_off = len(plan.offs)
    chunk = plan.max_send * meta.n_fp

    def exchange(sbuf):
        if n_off == 0:
            return jnp.zeros_like(sbuf)
        outs = []
        for di, d in enumerate(plan.offs):
            buf = sbuf[:, di * chunk:(di + 1) * chunk, :]
            outs.append(halo_mod._ppermute(
                buf, axis_name, [(j, (j + d) % n) for j in range(n)]))
        return jnp.concatenate(outs, axis=1)

    def step(local_ops: BlockedOps, carry, t, ctrl=None):
        packed, sbuf = carry
        o = jax.tree.map(lambda a: a[0], local_ops)
        t1 = t if meta.tidal is not None else None
        rb1 = exchange(sbuf)
        *s2, sb2 = sw2d_step_rdma_blocked(
            o, meta, packed, rb1, dt, plan.offs, chunk, n,
            axis_name=axis_name, use_filter=use_filter, t=t1, ctrl=ctrl,
            interpret=interpret)
        return (tuple(s2), sb2)

    return step


def make_sharded_blocked_step_diff(sb: ShardedBlocked, dt: float,
                                   axis_name: str = "element",
                                   use_filter: bool = True,
                                   interpret: bool = False):
    """DIFFERENTIABLE fused sharded step: the stage kernels carry a custom
    VJP whose backward pass is a Pallas kernel running `jax.vjp` of the
    same values RHS in-kernel (sw2d_stage_bwd_blocked_v2); the exchange
    is plain jnp (take/ppermute/scatter) and transposes natively. The
    whole sharded rollout is then `jax.grad`-able — multi-chip MPC
    adjoints at blocked-kernel speed.

    Same carry contract as make_sharded_blocked_step_fused (round 5: the
    diff path rides the kernel-I/O lean exchange too — the forward stage
    consumes/emits the compact (B, L, 3) buffers, and the backward stage
    kernel jax.vjp's the SAME lean-I/O values function in-kernel, so the
    recv-buffer cotangent falls out of AD and the XLA glue between
    launches is slice+ppermute+concat in BOTH sweeps)."""
    from ..ops.sw2d_blocked import (sw2d_stage_blocked,
                                    sw2d_stage_bwd_blocked_v2)
    from . import halo as halo_mod

    if sb.meta.wetdry:
        # the backward stage kernel differentiates only
        # out = sponge(base + c_dt*R(cur)) — the forward kernel's wetdry
        # positivity limiter (_limit_packed) has no Jacobian in it, so
        # wetdry gradients would be silently biased
        raise NotImplementedError(
            "make_sharded_blocked_step_diff does not differentiate the "
            "wetdry positivity limiter; build with wetdry=False (or use "
            "the non-diff sharded step for wetdry rollouts)")

    meta, plan = sb.meta, sb.plan
    n = plan.n_shards
    n_off = len(plan.offs)
    chunk = plan.max_send * meta.n_fp

    def make_stage(c_dt, apply_sponge):
        @jax.custom_vjp
        def stage(ops, base, cur, rb, t, ctrl):
            out = sw2d_stage_blocked(
                ops, meta, base, cur, None, c_dt, t0=0.0,
                use_filter=use_filter, apply_sponge=apply_sponge,
                interpret=interpret, t=t, ctrl=ctrl, rb=rb)
            *o3, sbuf = out
            return (tuple(o3), sbuf)

        def fwd(ops, base, cur, rb, t, ctrl):
            res = stage(ops, base, cur, rb, t, ctrl)
            return res, (ops, cur, rb, t, ctrl)

        def bwd(saved, cot):
            ops, cur, rb, t, ctrl = saved
            lam_out, lam_sb = cot
            outs = sw2d_stage_bwd_blocked_v2(
                ops, meta, cur, rb, tuple(lam_out), lam_sb, c_dt, t=t,
                use_filter=use_filter, apply_sponge=apply_sponge,
                interpret=interpret, ctrl=ctrl)
            lb, lc = tuple(outs[0:3]), tuple(outs[3:6])
            lrb = outs[6]
            zops = jax.tree.map(jnp.zeros_like, ops)
            zt = None if t is None else jnp.zeros_like(t)
            lctl = (outs[7].reshape(jnp.shape(ctrl))
                    if ctrl is not None else None)
            return (zops, lb, lc, lrb, zt, lctl)

        stage.defvjp(fwd, bwd)
        return stage

    stage1 = make_stage(0.5 * dt, False)
    stage2 = make_stage(dt, True)

    def exchange(sbuf):
        # slice + ppermute + concat: every op transposes natively, so
        # jax.grad flows through the whole sharded scan
        if n_off == 0:
            return jnp.zeros_like(sbuf)
        outs = []
        for di, d in enumerate(plan.offs):
            buf = sbuf[:, di * chunk:(di + 1) * chunk, :]
            outs.append(halo_mod._ppermute(
                buf, axis_name, [(j, (j + d) % n) for j in range(n)]))
        return jnp.concatenate(outs, axis=1)

    def step(local_ops: BlockedOps, carry, t, ctrl=None):
        packed, sbuf = carry
        o = jax.tree.map(lambda a: a[0], local_ops)
        t1 = t if meta.tidal is not None else None
        t2 = (t + 0.5 * dt) if meta.tidal is not None else None
        rb1 = exchange(sbuf)
        s1, sb1 = stage1(o, packed, packed, rb1, t1, ctrl)
        rb2 = exchange(sb1)
        s2, sb2 = stage2(o, packed, s1, rb2, t2, ctrl)
        return (s2, sb2)

    return step
