"""Device meshes, sharded contexts, and the halo-exchange RHS.

TPU-native replacement for the reference's (unused) METIS partition maps and
the NCCL/MPI layer it never had (SURVEY.md §2.9). Two execution styles:

1. **pjit auto-sharding** — `shard_context` places every `(K, ...)` array
   with `PartitionSpec('element')`; the plain ops (`sw2d_rhs`, ...) run
   under jit and XLA inserts the collectives implied by the `vmapP` gather.
   Zero code changes to the physics; good baseline.

2. **shard_map explicit halo exchange** — `sharded_sw2d_rhs` runs the RHS
   inside `jax.shard_map` over the 'element' axis: each shard computes its
   local face traces, all-gathers the (small) trace arrays over ICI, and
   gathers the '+' side via the global `mapP` table. Volume data never
   crosses chips; only `(K, Nfaces*Nfp)` traces do. Global reductions
   (LF wavespeed, dt) become `lax.pmax` over the axis.

3. **ppermute halo exchange** (halo.py, preferred at scale) — precomputed
   per-shard send tables; each ring offset with traffic is ONE
   `lax.ppermute` of a fixed-size face buffer, so communication is
   proportional to the partition cut instead of the whole trace table.

The element axis must be pre-partitioned contiguously (partition.py) so a
plain `P('element')` sharding is also a good partition.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..context import DGContext2D
from ..ops.sw2d import SWPhysics, SWState, _safe_norm
from ..config import dg_op


def make_device_mesh(
    n_scenario: int = 1, n_element: int = 1, devices=None
) -> Mesh:
    """Build a (scenario, element) device mesh."""
    if devices is None:
        devices = jax.devices()
    n = n_scenario * n_element
    arr = np.array(devices[:n]).reshape(n_scenario, n_element)
    return Mesh(arr, axis_names=("scenario", "element"))


# Context fields that carry a leading element (K) axis and therefore shard
# over the element mesh axis. Everything else — reference-element operators,
# GLOBAL index lists (bc_maps, mapB/vmapB, gather/scatter ids,
# face_nbr/face_flip), static metadata — is replicated. An explicit
# allowlist, NOT a shape heuristic: a padded BC index list can accidentally
# have length == K (e.g. box 4x4 at N=1: 32 wall trace nodes, 32 elements),
# and a shape-based rule would silently scatter it across shards, dropping
# most boundary conditions (each shard would apply only 1/n of them).
ELEMENT_SHARDED_FIELDS = frozenset({
    "x", "J", "rx", "nx", "fscale",                  # 1D + 2D shared
    "y", "ry", "sx", "sy", "ny", "sJ",               # 2D volume/face geometry
    "vmapM", "vmapP", "mapP", "bc_table",            # per-element index maps
})


# per-element (K-leading) arrays of the cubature / Gauss-face contexts —
# the reference-element operators (V, Dr, Ds, interp, quadrature nodes)
# stay replicated; the maps/BC tables stay replicated GLOBAL and are
# localized inside halo_sw2d_curved_rhs
CUBATURE_SHARDED_FIELDS = frozenset({
    "x", "y", "J", "rx", "ry", "sx", "sy", "W", "MM", "MMchol", "MMinv",
})
GAUSS_SHARDED_FIELDS = frozenset({"x", "y", "nx", "ny", "sJ", "W"})


def _specs_by_name(tree, names, axis):
    def spec(path, a):
        name = path[0].name if hasattr(path[0], "name") else str(path[0])
        if name in names and hasattr(a, "ndim") and a.ndim >= 1:
            return P(axis, *([None] * (a.ndim - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(spec, tree)


def cubature_shard_specs(cub, axis: str = "element"):
    """shard_map in_specs for a CubatureContext2D (curved sharded path)."""
    return _specs_by_name(cub, CUBATURE_SHARDED_FIELDS, axis)


def gauss_shard_specs(gauss, axis: str = "element"):
    """shard_map in_specs for a GaussFaceContext2D: per-node geometry is
    element-sharded; interp and the GLOBAL maps/BC tables replicate."""
    return _specs_by_name(gauss, GAUSS_SHARDED_FIELDS, axis)


def context_shard_specs(ctx, axis: str = "element"):
    """PartitionSpec pytree for a DG context under shard_map: P(axis) on the
    leading dim of every ELEMENT_SHARDED_FIELDS array, P() elsewhere. Use
    as the context's in_spec for shard_map'd ops (halo_sw2d_rhs,
    halo_poisson2d_op, sharded_sw2d_rhs)."""

    def spec(path, a):
        name = path[0].name if hasattr(path[0], "name") else str(path[0])
        if (name in ELEMENT_SHARDED_FIELDS and hasattr(a, "ndim")
                and a.ndim >= 1):
            return P(axis, *([None] * (a.ndim - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(spec, ctx)


def shard_context(ctx: DGContext2D, mesh: Mesh, axis: str = "element") -> DGContext2D:
    """Place per-element arrays with P(axis); replicate reference-element
    operators. The element axis length must divide the mesh axis size."""
    el = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def place(name, a):
        if not hasattr(a, "shape") or a.ndim == 0:
            return a
        if name in ELEMENT_SHARDED_FIELDS and a.shape:
            return jax.device_put(a, NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1)))))
        return jax.device_put(a, rep)

    fields = {}
    for name in ctx.__dataclass_fields__:
        val = getattr(ctx, name)
        if name in ("bc_maps",):
            fields[name] = jax.tree.map(lambda a: jax.device_put(a, rep), val)
        elif isinstance(val, (int, float)):
            fields[name] = val
        else:
            fields[name] = place(name, val)
    return DGContext2D(**fields)


@dg_op
def sharded_sw2d_rhs(
    ctx: DGContext2D,
    state: SWState,
    t,
    phys: SWPhysics,
    axis_name: str = "element",
) -> SWState:
    """sw2d RHS body for use INSIDE `jax.shard_map` over the element axis.

    Inputs are the per-shard blocks: state fields (K_local, Np), and a
    context whose per-element arrays are the local blocks but whose *maps*
    (vmapM/vmapP/mapP) are the GLOBAL tables sliced per shard (still global
    indices). The '+' trace gather rides an `all_gather` of the trace
    arrays over ICI.
    """
    from ..context import BC_WALL

    if (phys.H is not None or phys.Hx is not None or phys.cd != 0.0
            or phys.f_cor != 0.0):
        # this all_gather demonstrator covers the flat-bottom wall-BC core
        # only; the full coastal physics (bathymetry, well-balancing, drag,
        # Coriolis, tidal BCs) lives in parallel/halo.halo_sw2d_rhs —
        # fail loudly instead of silently dropping sources (ADVICE r2)
        raise NotImplementedError(
            "sharded_sw2d_rhs covers flat-bottom wall-BC physics; use "
            "parallel.halo.halo_sw2d_rhs for the full coastal model"
        )
    K_loc = state.h.shape[0]
    n_tr = ctx.n_faces * ctx.n_fp
    g = phys.g

    my = jax.lax.axis_index(axis_name)

    def traces(f):
        # local '-' traces via fmask (local volume only)
        fm = ctx.fmask.reshape(-1)
        fM_loc = f[:, fm]  # (K_loc, n_tr)
        # global trace table via all_gather (tiled: (n_shards, K_loc, n_tr))
        allt = jax.lax.all_gather(fM_loc, axis_name)
        allt = allt.reshape(-1)  # flat global trace array (K_glob*n_tr)
        # '+' side: global mapP (per-shard slice of the global table)
        fP = allt[ctx.mapP.reshape(-1)]
        return fM_loc.reshape(-1), fP

    h, hu, hv = state
    hM, hP = traces(h)
    huM, huP = traces(hu)
    hvM, hvP = traces(hv)

    nxf = ctx.nx.reshape(-1)
    nyf = ctx.ny.reshape(-1)

    # Wall BC: bc_maps carry GLOBAL trace indices (replicated); localize to
    # this shard — an index belongs here iff its owner block is `my`.
    local_size = K_loc * n_tr
    g_idx = ctx.bc_maps.idx[BC_WALL]
    g_mask = ctx.bc_maps.mask[BC_WALL]
    mine = g_mask & (g_idx // local_size == my)
    # non-local entries get an out-of-range index and are dropped by the
    # scatter (mode='drop') — no clobbering of real updates at index 0
    wall_idx = jnp.where(mine, g_idx % local_size, local_size)
    safe = jnp.where(mine, wall_idx, 0)
    un2 = 2.0 * (huM[safe] * nxf[safe] + hvM[safe] * nyf[safe])
    huP = huP.at[wall_idx].set(huM[safe] - un2 * nxf[safe], mode="drop")
    hvP = hvP.at[wall_idx].set(hvM[safe] - un2 * nyf[safe], mode="drop")

    dh, dhu, dhv = hM - hP, huM - huP, hvM - hvP

    def flux(hh, hhu, hhv):
        inv_h = 1.0 / hh
        F1, G1 = hhu, hhv
        F2 = hhu * hhu * inv_h + 0.5 * g * hh * hh
        G2 = hhu * hhv * inv_h
        G3 = hhv * hhv * inv_h + 0.5 * g * hh * hh
        return F1, F2, G2, G1, G2, G3

    F1M, F2M, F3M, G1M, G2M, G3M = flux(hM, huM, hvM)
    F1P, F2P, F3P, G1P, G2P, G3P = flux(hP, huP, hvP)

    spdM = _safe_norm(huM / hM, hvM / hM) + jnp.sqrt(g * hM)
    spdP = _safe_norm(huP / hP, hvP / hP) + jnp.sqrt(g * hP)
    spd = jnp.maximum(spdM, spdP).reshape(K_loc * ctx.n_faces, ctx.n_fp)
    lam = jnp.max(spd, axis=1, keepdims=True)
    lam = jnp.broadcast_to(lam, spd.shape).reshape(-1)

    dflux1 = 0.5 * ((F1M - F1P) * nxf + (G1M - G1P) * nyf - lam * dh)
    dflux2 = 0.5 * ((F2M - F2P) * nxf + (G2M - G2P) * nyf - lam * dhu)
    dflux3 = 0.5 * ((F3M - F3P) * nxf + (G3M - G3P) * nyf - lam * dhv)

    F1, F2, F3, G1, G2, G3 = flux(h, hu, hv)

    def div(F, G):
        Fr, Fs = F @ ctx.Dr.T, F @ ctx.Ds.T
        Gr, Gs = G @ ctx.Dr.T, G @ ctx.Ds.T
        return ctx.rx * Fr + ctx.sx * Fs + ctx.ry * Gr + ctx.sy * Gs

    surf = lambda d: (ctx.fscale * d.reshape(K_loc, n_tr)) @ ctx.lift.T
    return SWState(
        h=-div(F1, G1) + surf(dflux1),
        hu=-div(F2, G2) + surf(dflux2),
        hv=-div(F3, G3) + surf(dflux3),
    )
