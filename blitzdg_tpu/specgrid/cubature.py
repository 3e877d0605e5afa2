"""Cubature volume and Gauss face contexts for curved/over-integrated DG.

Host-side setup. Functional parity targets:
 - CubatureContext2D (include/CubatureContext2D.hpp:12-97) built by
   buildCubatureVolumeMesh (src/TriangleNodesProvisioner.cpp:81-204):
   cubature nodes/weights, interpolation V, Dr/Ds at cubature, geometric
   factors, W = w*J, per-element mass MM and its Cholesky;
 - GaussFaceContext2D (include/GaussFaceContext2D.hpp:10-105) built by
   buildGaussFaceNodes (src/TriangleNodesProvisioner.cpp:207-381):
   per-face Gauss nodes, interpolation, face geometry/normals, W = w*sJ,
   gmapM/gmapP trace maps.

Differences by design (TPU-first):
 - cubature rules are GENERATED via the collapsed Gauss (Duffy) construction
   (Gauss-Legendre x Gauss-Jacobi(1,0)) instead of hardcoded tables — the
   reference's table has a data-entry defect at rule 3
   (include/TriangleCubatureRules.hpp:35-40, SURVEY.md defects);
 - per-element inverse mass matrices are precomputed (K, Np, Np) and applied
   as one batched matmul on the MXU, instead of per-element triangular
   solves in the hot loop (swhelpers/rhs.py:162-167);
 - gmapM/gmapP are built by physical-coordinate matching (no orientation
   reversal tricks).
"""
from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from .jacobi import gauss_quadrature
from .triangle import grad_vandermonde_2d, vandermonde_2d

NODE_TOL = 1e-7


def triangle_cubature(order: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Positive-weight cubature on the reference triangle exact to the given
    polynomial order, via the collapsed (Duffy) construction."""
    n = max(1, (order + 2) // 2)  # 1D points: order 2n-1 >= order
    ga, wa = gauss_quadrature(0.0, 0.0, n - 1)  # Legendre in 'a'
    gb, wb = gauss_quadrature(1.0, 0.0, n - 1)  # Jacobi(1,0) in 'b': (1-b) weight
    A, B = np.meshgrid(ga, gb, indexing="ij")
    r = (0.5 * (1.0 + A) * (1.0 - B) - 1.0).reshape(-1)
    s = B.reshape(-1)
    w = (np.outer(wa, wb) * 0.5).reshape(-1)
    # total weight = triangle area = 2
    return r, s, w


@flax.struct.dataclass
class CubatureContext2D:
    """Frozen cubature volume context (element-major)."""

    n_cub: int = flax.struct.field(pytree_node=False)
    r: jnp.ndarray  # (Ncub,)
    s: jnp.ndarray
    w: jnp.ndarray
    V: jnp.ndarray  # (Ncub, Np) interpolation
    Dr: jnp.ndarray  # (Ncub, Np) derivative interpolation
    Ds: jnp.ndarray
    # per-element at cubature nodes, (K, Ncub)
    x: jnp.ndarray
    y: jnp.ndarray
    J: jnp.ndarray
    rx: jnp.ndarray
    ry: jnp.ndarray
    sx: jnp.ndarray
    sy: jnp.ndarray
    W: jnp.ndarray  # w * J
    # per-element custom mass matrices, (K, Np, Np)
    MM: jnp.ndarray
    MMchol: jnp.ndarray
    MMinv: jnp.ndarray


@flax.struct.dataclass
class GaussFaceContext2D:
    """Frozen Gauss face context (element-major)."""

    n_gauss: int = flax.struct.field(pytree_node=False)  # points per face
    interp: jnp.ndarray  # (Nfaces*NG, Np) volume->face-gauss interpolation
    # per-face-gauss-node, (K, Nfaces*NG)
    x: jnp.ndarray
    y: jnp.ndarray
    nx: jnp.ndarray
    ny: jnp.ndarray
    sJ: jnp.ndarray
    W: jnp.ndarray  # w1d * sJ
    mapM: jnp.ndarray  # (K, Nfaces*NG) flat into (K*Nfaces*NG,)
    mapP: jnp.ndarray
    bc_idx: dict[int, jnp.ndarray]
    bc_mask: dict[int, jnp.ndarray]
    # derivative interpolation + per-element geometric factors at the face
    # Gauss nodes (curved SIP operator needs basis normal derivatives at the
    # faces; reference analog GaussFaceContext2D rx..sy,
    # src/TriangleNodesProvisioner.cpp:207-381)
    Dr: jnp.ndarray | None = None  # (Nfaces*NG, Np)
    Ds: jnp.ndarray | None = None
    rx: jnp.ndarray | None = None  # (K, Nfaces*NG)
    ry: jnp.ndarray | None = None
    sx: jnp.ndarray | None = None
    sy: jnp.ndarray | None = None
    J: jnp.ndarray | None = None


def build_cubature_context(n_order, mesh, x, y, V_nodal, order=None, dtype=jnp.float64):
    """Cubature context from nodal geometry (x, y are (K, Np) numpy)."""
    if order is None:
        order = 3 * (n_order + 1)
    rc, sc, wc = triangle_cubature(order)
    n_cub = rc.size
    K = x.shape[0]

    Vc = np.linalg.solve(V_nodal.T, vandermonde_2d(n_order, rc, sc).T).T
    Vrc, Vsc = grad_vandermonde_2d(n_order, rc, sc)
    Drc = np.linalg.solve(V_nodal.T, Vrc.T).T
    Dsc = np.linalg.solve(V_nodal.T, Vsc.T).T

    xr, yr = x @ Drc.T, y @ Drc.T
    xs, ys = x @ Dsc.T, y @ Dsc.T
    J = xr * ys - xs * yr
    rx, ry = ys / J, -xs / J
    sx, sy = -yr / J, xr / J
    W = wc[None, :] * J

    # per-element mass MM_k = Vc^T diag(W_k) Vc — batched
    MM = np.einsum("ci,kc,cj->kij", Vc, W, Vc)
    MMchol = np.linalg.cholesky(MM)
    MMinv = np.linalg.inv(MM)

    to = lambda a: (np.asarray(a, np.float64) if dtype is None else jnp.asarray(a, dtype=dtype))
    return CubatureContext2D(
        n_cub=n_cub,
        r=to(rc), s=to(sc), w=to(wc),
        V=to(Vc), Dr=to(Drc), Ds=to(Dsc),
        x=to(x @ Vc.T), y=to(y @ Vc.T),
        J=to(J), rx=to(rx), ry=to(ry), sx=to(sx), sy=to(sy), W=to(W),
        MM=to(MM), MMchol=to(MMchol), MMinv=to(MMinv),
    )


def build_gauss_face_context(
    n_order, mesh, x, y, V_nodal, n_gauss=None, dtype=jnp.float64
):
    """Gauss face context from nodal geometry; maps by coordinate matching."""
    from ..context import BC_TAGS

    if n_gauss is None:
        n_gauss = 2 * (n_order + 1)
    K, n_p = x.shape
    NG = n_gauss
    g1, w1 = gauss_quadrature(0.0, 0.0, NG - 1)

    # (r,s) of Gauss points on each reference face (v0->v1, v1->v2, v2->v0)
    face_ends = [((-1.0, -1.0), (1.0, -1.0)), ((1.0, -1.0), (-1.0, 1.0)),
                 ((-1.0, 1.0), (-1.0, -1.0))]
    interp_rows = []
    dr_rows, ds_rows = [], []
    for (r0, s0), (r1, s1) in face_ends:
        rf = 0.5 * (1 - g1) * r0 + 0.5 * (1 + g1) * r1
        sf = 0.5 * (1 - g1) * s0 + 0.5 * (1 + g1) * s1
        interp_rows.append(np.linalg.solve(V_nodal.T, vandermonde_2d(n_order, rf, sf).T).T)
        Vr, Vs = grad_vandermonde_2d(n_order, rf, sf)
        dr_rows.append(np.linalg.solve(V_nodal.T, Vr.T).T)
        ds_rows.append(np.linalg.solve(V_nodal.T, Vs.T).T)
    interp = np.concatenate(interp_rows, axis=0)  # (3NG, Np)
    Drg = np.concatenate(dr_rows, axis=0)
    Dsg = np.concatenate(ds_rows, axis=0)

    xg = x @ interp.T  # (K, 3NG)
    yg = y @ interp.T
    xr, yr = x @ Drg.T, y @ Drg.T
    xs, ys = x @ Dsg.T, y @ Dsg.T
    Jg = xr * ys - xs * yr

    nx = np.empty((K, 3 * NG))
    ny = np.empty((K, 3 * NG))
    sl = [slice(f * NG, (f + 1) * NG) for f in range(3)]
    nx[:, sl[0]], ny[:, sl[0]] = yr[:, sl[0]], -xr[:, sl[0]]
    nx[:, sl[1]], ny[:, sl[1]] = ys[:, sl[1]] - yr[:, sl[1]], -xs[:, sl[1]] + xr[:, sl[1]]
    nx[:, sl[2]], ny[:, sl[2]] = -ys[:, sl[2]], xs[:, sl[2]]
    sJ = np.hypot(nx, ny)
    nx /= sJ
    ny /= sJ
    W = np.tile(w1, 3)[None, :] * sJ

    # trace maps by coordinate matching (like the nodal builder)
    k2 = mesh.etoe
    f2 = mesh.etof
    xg3 = xg.reshape(K, 3, NG)
    yg3 = yg.reshape(K, 3, NG)
    xP = xg3[k2, f2]  # (K, 3, NG) neighbor's face points
    yP = yg3[k2, f2]
    d = np.hypot(
        xg3[:, :, :, None] - xP[:, :, None, :], yg3[:, :, :, None] - yP[:, :, None, :]
    )
    jbest = np.argmin(d, axis=3)
    dbest = np.take_along_axis(d, jbest[..., None], axis=3)[..., 0]
    # tolerance scaled by the face diameter (mesh-unit independent)
    face_diam = np.hypot(
        xg3[:, :, 0] - xg3[:, :, -1], yg3[:, :, 0] - yg3[:, :, -1]
    )
    matched = dbest < 1e-6 * face_diam[:, :, None] + 1e-13

    trace_ids = (
        np.arange(K)[:, None, None] * (3 * NG)
        + np.arange(3)[None, :, None] * NG
        + np.arange(NG)[None, None, :]
    )
    mapP_cand = k2[:, :, None] * (3 * NG) + f2[:, :, None] * NG + jbest
    mapP = np.where(matched, mapP_cand, trace_ids).reshape(K, 3 * NG)
    mapM = trace_ids.reshape(K, 3 * NG)

    # per-tag BC gauss-node sets from the face tag table
    bc_idx, bc_mask = {}, {}
    for tag in BC_TAGS:
        faces = np.argwhere(mesh.bc_type == tag)
        flat = (
            (faces[:, 0] * 3 + faces[:, 1])[:, None] * NG + np.arange(NG)[None, :]
        ).ravel()
        n = flat.size
        size = max(1, n)
        pidx = np.zeros(size, dtype=np.int32)
        pidx[:n] = flat
        pm = np.zeros(size, dtype=bool)
        pm[:n] = True
        bc_idx[tag] = jnp.asarray(pidx)
        bc_mask[tag] = jnp.asarray(pm)

    to = lambda a: (np.asarray(a, np.float64) if dtype is None else jnp.asarray(a, dtype=dtype))
    return GaussFaceContext2D(
        n_gauss=NG,
        interp=to(interp),
        x=to(xg), y=to(yg), nx=to(nx), ny=to(ny), sJ=to(sJ), W=to(W),
        mapM=jnp.asarray(mapM.astype(np.int32)),
        mapP=jnp.asarray(mapP.astype(np.int32)),
        bc_idx=bc_idx, bc_mask=bc_mask,
        Dr=to(Drg), Ds=to(Dsg),
        rx=to(ys / Jg), ry=to(-xs / Jg),
        sx=to(-yr / Jg), sy=to(xr / Jg),
        J=to(Jg),
    )
