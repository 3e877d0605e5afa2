"""Element partitioning for multi-chip execution.

Reference analog: METIS k-way mesh partitioning
(/root/reference/src/MeshManager.cpp:491-544) producing element->rank maps
that the reference never actually consumes. Here partitioning is load-bearing:
elements are *reordered* so each shard owns a contiguous equal-size block of
the element axis — XLA then shards `(K, ...)` arrays with a plain
`PartitionSpec('element')` and every shard has identical static shapes.

Partitioners:
 - `graph_partition` (DEFAULT): cut-minimizing recursive spectral bisection
   (Fiedler vector of the face-adjacency Laplacian) with greedy boundary
   swap refinement — the METIS_PartMeshNodal/METIS_OBJTYPE_CUT analog
   (/root/reference/src/MeshManager.cpp:491-544) without a METIS
   dependency. Deterministic (fixed eigensolver start vector), exactly
   balanced block sizes.
 - `rcb_partition`: recursive coordinate bisection over element centroids —
   geometric, cheap, kept as fallback and as the comparison baseline.

`partition_cut` measures the face cut (= per-step halo exchange size), so
the choice is recorded, not asserted (tests/test_parallel.py compares the
two on the irregular coastal mesh).
"""
from __future__ import annotations

import numpy as np

from ..mesh.gmsh import Mesh2D, build_mesh


def rcb_partition(centroids: np.ndarray, n_parts: int) -> np.ndarray:
    """Recursive coordinate bisection: returns part id per element.
    n_parts must be a power of two for clean bisection; other counts fall
    back to a sorted-split along the longer axis."""
    K = centroids.shape[0]
    part = np.zeros(K, dtype=np.int32)

    def split(ids: np.ndarray, parts: int, base: int):
        if parts == 1:
            part[ids] = base
            return
        c = centroids[ids]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        order = ids[np.argsort(c[:, axis], kind="stable")]
        left_parts = parts // 2
        nleft = (len(ids) * left_parts) // parts
        split(order[:nleft], left_parts, base)
        split(order[nleft:], parts - left_parts, base + left_parts)

    split(np.arange(K), n_parts, 0)
    return part


def _fiedler_side(nbrs: list[np.ndarray], n_left: int) -> np.ndarray:
    """Bisect a connected(ish) subgraph by its Fiedler vector: the n_left
    smallest entries form the left side. ``nbrs[i]`` lists local neighbor
    ids of local vertex i. Deterministic: fixed eigensolver start vector."""
    n = len(nbrs)
    rows = np.repeat(np.arange(n), [len(v) for v in nbrs])
    cols = np.concatenate(nbrs) if n else np.empty(0, dtype=int)
    import scipy.sparse as sp

    A = sp.coo_matrix((np.ones(rows.size), (rows, cols)), shape=(n, n)).tocsr()

    # A disconnected block (possible after bisecting an irregular mesh) has
    # several zero Laplacian eigenvalues; the "Fiedler" vector is then just
    # a component-indicator and the split is arbitrary. Assign whole
    # components greedily (largest first, zero cut by construction), and
    # top off the exact n_left balance by Fiedler-splitting one component.
    n_comp, labels = sp.csgraph.connected_components(A, directed=False)
    if n_comp > 1:
        comps = sorted((np.where(labels == c)[0] for c in range(n_comp)),
                       key=len, reverse=True)
        side = np.zeros(n, dtype=bool)
        rem = n_left
        leftover = []
        for ids in comps:
            if len(ids) <= rem:
                side[ids] = True
                rem -= len(ids)
            else:
                leftover.append(ids)
        if rem > 0:
            ids = leftover[0]  # exists: total leftover size >= rem
            pos = {g: i for i, g in enumerate(ids)}
            # components are closed under adjacency: every neighbor maps
            sub = [np.array([pos[g] for g in nbrs[g0]], dtype=int)
                   for g0 in ids]
            side[ids[_fiedler_side(sub, rem)]] = True
        return side

    L = sp.diags(np.asarray(A.sum(axis=1)).ravel()) - A
    if n <= 512:
        _, vecs = np.linalg.eigh(L.toarray())
        fiedler = vecs[:, 1]
    else:
        from scipy.sparse.linalg import eigsh

        v0 = np.random.default_rng(0).standard_normal(n)
        _, vecs = eigsh(L.tocsc(), k=2, sigma=-1e-4, which="LM", v0=v0)
        # column order of shift-invert eigsh follows eigenvalue order
        fiedler = vecs[:, 1]
    order = np.argsort(fiedler, kind="stable")
    side = np.zeros(n, dtype=bool)
    side[order[:n_left]] = True
    return side


def _refine_bisection(nbrs: list[np.ndarray], side: np.ndarray) -> np.ndarray:
    """Greedy balanced boundary refinement: repeatedly swap the best
    (left, right) pair with positive combined cut gain — Kernighan-Lin
    style, exact balance preserved by swapping in pairs. Runs until no
    improving swap remains (bounded by n swaps; gains recomputed
    incrementally on the swapped pair's neighborhoods)."""
    side = side.copy()
    n = len(nbrs)
    deg = np.array([len(v) for v in nbrs])
    # gain of flipping v = (cut edges) - (internal edges) incident to v
    ext = np.array([int(np.sum(side[v] != side[i])) for i, v in enumerate(nbrs)])
    for _ in range(n):
        gain = 2 * ext - deg
        left = np.where(side)[0]
        right = np.where(~side)[0]
        if left.size == 0 or right.size == 0:
            break
        u = left[np.argmax(gain[left])]
        v = right[np.argmax(gain[right])]
        w_uv = 1 if np.any(nbrs[u] == v) else 0
        if gain[u] + gain[v] - 2 * w_uv <= 0:
            break
        side[u], side[v] = False, True
        # incremental ext update: u, v and their neighbors change
        touched = {u, v, *nbrs[u].tolist(), *nbrs[v].tolist()}
        for i in touched:
            ext[i] = int(np.sum(side[nbrs[i]] != side[i]))
    return side


def graph_partition(etoe: np.ndarray, n_parts: int) -> np.ndarray:
    """Cut-minimizing k-way partition of the element face-adjacency graph
    by recursive spectral bisection + balanced swap refinement (reference
    contract: METIS k-way with METIS_OBJTYPE_CUT,
    /root/reference/src/MeshManager.cpp:491-544). Returns part id per
    element; block sizes match RCB's proportional split exactly."""
    K = etoe.shape[0]
    self_ids = np.arange(K)[:, None]
    nbr_all = [np.unique(row[(row != k) & (row >= 0)])
               for k, row in enumerate(np.where(etoe == self_ids, -1, etoe))]
    part = np.zeros(K, dtype=np.int32)

    def split(ids: np.ndarray, parts: int, base: int):
        if parts == 1:
            part[ids] = base
            return
        local = {g: i for i, g in enumerate(ids)}
        # subgraph adjacency: only neighbors inside this block
        nbrs = [np.array([local[g] for g in nbr_all[g0] if g in local], dtype=int)
                for g0 in ids]
        left_parts = parts // 2
        n_left = (len(ids) * left_parts) // parts
        side = _fiedler_side(nbrs, n_left)
        side = _refine_bisection(nbrs, side)
        split(ids[side], left_parts, base)
        split(ids[~side], parts - left_parts, base + left_parts)

    split(np.arange(K), n_parts, 0)
    return part


def partition_cut(etoe: np.ndarray, part: np.ndarray) -> int:
    """Number of shared faces crossing partition boundaries — exactly the
    per-step halo trace count the exchange must ship."""
    k_ids = np.arange(etoe.shape[0])[:, None]
    interior = etoe != k_ids  # boundary faces are self-connected
    return int(np.sum(interior & (part[etoe] != part[:, None])) // 2)


def compute_partition(mesh: Mesh2D, n_parts: int, method: str = "auto") -> np.ndarray:
    """Part id per element. method: 'auto' (default: measure both and keep
    the smaller face cut — never worse than either), 'graph' (spectral
    cut-minimizing) or 'rcb' (geometric bisection). On the structured
    box.msh RCB's straight-line cuts win; on the irregular coastal
    R_8km_circle.msh the spectral partitioner wins — auto picks per-mesh."""
    if method == "rcb":
        cent = mesh.verts[mesh.etov].mean(axis=1)
        return rcb_partition(cent, n_parts)
    if method == "graph":
        return graph_partition(mesh.etoe, n_parts)
    if method == "auto":
        pg = graph_partition(mesh.etoe, n_parts)
        cent = mesh.verts[mesh.etov].mean(axis=1)
        pr = rcb_partition(cent, n_parts)
        cg = partition_cut(mesh.etoe, pg)
        cr = partition_cut(mesh.etoe, pr)
        return pg if cg < cr else pr
    raise ValueError(f"unknown partition method {method!r}")


def partition_mesh(mesh: Mesh2D, n_parts: int, method: str = "auto"
                   ) -> tuple[Mesh2D, np.ndarray, int]:
    """Reorder elements into contiguous shard blocks.

    Returns (reordered mesh, permutation giving the old element index of
    each new position, max block size Kp). When K is divisible by n_parts
    the RCB sorted-split yields exactly equal blocks (Kp = K/n_parts);
    otherwise callers must pad fields to Kp per shard (see pad_elements).
    """
    verts = mesh.verts
    part = compute_partition(mesh, n_parts, method)

    # stable sort by part id -> contiguous blocks, preserving locality
    perm = np.argsort(part, kind="stable")
    etov_new = mesh.etov[perm]
    bc_new = mesh.bc_type[perm] if mesh.bc_type is not None else None

    new_mesh = build_mesh(verts, etov_new)
    if bc_new is not None:
        # build_mesh may flip orientation; ours was already CCW, and
        # permutation preserves per-face tags
        new_mesh.bc_type = bc_new
    new_mesh.boundary_lines = mesh.boundary_lines
    new_mesh.boundary_tags = mesh.boundary_tags

    counts = np.bincount(part, minlength=n_parts)
    kp = int(counts.max())
    return new_mesh, perm, kp


def rcm_order(mesh: Mesh2D) -> tuple[Mesh2D, np.ndarray]:
    """Reorder elements by reverse Cuthill-McKee over the face-adjacency
    graph, bounding the neighbor lane-index bandwidth to ~sqrt(K). This is
    what makes the blocked Pallas trace exchange (ops/sw2d_blocked.py) cheap
    on UNSTRUCTURED meshes: the '+'-trace roll-combo count drops from O(K)
    to O(bandwidth). Returns (reordered mesh, permutation old-index-of-new).
    """
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    K, nf = mesh.etoe.shape
    rows = np.repeat(np.arange(K), nf)
    cols = mesh.etoe.reshape(-1)
    A = sp.coo_matrix((np.ones(K * nf), (rows, cols)), shape=(K, K)).tocsr()
    perm = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))
    new_mesh = build_mesh(mesh.verts, mesh.etov[perm])
    if mesh.bc_type is not None:
        new_mesh.bc_type = mesh.bc_type[perm]
    new_mesh.boundary_lines = mesh.boundary_lines
    new_mesh.boundary_tags = mesh.boundary_tags
    return new_mesh, perm


def partition_block_sizes(mesh: Mesh2D, n_parts: int, method: str = "auto"
                          ) -> np.ndarray:
    """Per-shard element counts of the partition — MUST be called with the
    same method as `partition_mesh` so padding sizes line up (both run the
    same deterministic partitioner)."""
    return np.bincount(compute_partition(mesh, n_parts, method),
                       minlength=n_parts)


def rcb_block_sizes(mesh: Mesh2D, n_parts: int) -> np.ndarray:
    """Back-compat alias: block sizes of the RCB partition specifically."""
    return partition_block_sizes(mesh, n_parts, method="rcb")


def pad_context(ctx, sizes):
    """Arbitrary-K element sharding via GHOST-element padding (reference
    analog: METIS handles any K, MeshManager.cpp:491-544; our contiguous
    equal-block sharding needs K % n_shards == 0 — this removes that
    restriction at the CONTEXT level).

    ``sizes``: per-shard REAL element counts of the contiguous blocks the
    context's element order already follows (from `rcb_block_sizes` /
    `partition_mesh`). Every shard's block is padded to max(sizes) with
    ghost elements that are

     - geometrically valid (element 0's geometry copied — no degenerate
       Jacobians), but with ``fscale = 0`` so they contribute NOTHING to
       surface integrals or the pmax adaptive-dt reduction;
     - fully self-connected (each face's '+' trace is its own '-' trace)
       and absent from every BC table — no coupling to real elements, so
       real-element results are BITWISE identical to the unpadded context;
     - zero-preserving in linear operators (isolated blocks), so Krylov
       solves seeded with zero ghost rhs/x0 keep exactly zero ghost
       residuals and identical inner products / iterates.

    Returns (padded context, real-element mask (K_new,) bool) — apply the
    mask in any user-level reduction over elements (costs, norms).
    """
    import jax.numpy as jnp

    from ..context import BCMaps, DGContext2D

    sizes = np.asarray(sizes, dtype=np.int64)
    n_shards = len(sizes)
    K, n_p = ctx.k_elem, ctx.n_p
    n_faces, n_fp = ctx.n_faces, ctx.n_fp
    n_tr = n_faces * n_fp
    assert int(sizes.sum()) == K, (sizes, K)
    kp = int(sizes.max())
    K_new = n_shards * kp
    if K_new == K:
        return ctx, np.ones(K, dtype=bool)

    starts = np.concatenate([[0], np.cumsum(sizes)])
    newpos = np.empty(K, dtype=np.int64)
    for s in range(n_shards):
        newpos[starts[s]:starts[s + 1]] = s * kp + np.arange(sizes[s])
    is_real = np.zeros(K_new, dtype=bool)
    is_real[newpos] = True
    src = np.zeros(K_new, dtype=np.int64)  # old element feeding each new row
    src[newpos] = np.arange(K)

    def rows(a):  # (K, ...) -> (K_new, ...); ghosts copy element 0
        return np.asarray(a)[src]

    def remap_vol(m):
        m = np.asarray(m)
        return (newpos[m // n_p] * n_p + m % n_p).astype(m.dtype)

    def remap_tr(m):
        m = np.asarray(m)
        return (newpos[m // n_tr] * n_tr + m % n_tr).astype(m.dtype)

    ghost = ~is_real
    fmask_flat = np.asarray(ctx.fmask).reshape(-1)

    vmapM = rows(remap_vol(ctx.vmapM))
    vmapP = rows(remap_vol(ctx.vmapP))
    mapP = rows(remap_tr(ctx.mapP))
    kn = np.arange(K_new)[:, None]
    vmapM[ghost] = (kn * n_p + fmask_flat[None, :])[ghost]
    vmapP[ghost] = vmapM[ghost]
    mapP[ghost] = (kn * n_tr + np.arange(n_tr)[None, :])[ghost]

    face_nbr = face_flip = None
    if ctx.face_nbr is not None:
        fn = np.asarray(ctx.face_nbr).reshape(K, n_faces)
        fn = (newpos[fn // n_faces] * n_faces + fn % n_faces)[src]
        fn[ghost] = (np.arange(K_new)[:, None] * n_faces
                     + np.arange(n_faces)[None, :])[ghost]
        face_nbr = jnp.asarray(fn.reshape(-1).astype(np.int32))
        fl = np.asarray(ctx.face_flip).reshape(K, n_faces)[src]
        fl[ghost] = False
        face_flip = jnp.asarray(fl.reshape(-1))

    fscale = rows(ctx.fscale)
    fscale[ghost] = 0.0
    bc_table = rows(ctx.bc_table)
    bc_table[ghost] = 0

    bc_idx = {t: jnp.asarray(remap_tr(a)) for t, a in ctx.bc_maps.idx.items()}
    bc_maps = BCMaps(idx=bc_idx, mask=ctx.bc_maps.mask)

    # SEM assembly maps: ghosts get fresh unique node ids (isolated)
    scatter_old = np.asarray(ctx.scatter_ids)
    n_unique = int(np.asarray(ctx.gather_ids).shape[0])
    scatter = np.zeros(K_new * n_p, dtype=scatter_old.dtype)
    real_nodes = (newpos[:, None] * n_p + np.arange(n_p)[None, :]).ravel()
    scatter[real_nodes] = scatter_old
    ghost_nodes = np.setdiff1d(np.arange(K_new * n_p), real_nodes)
    scatter[ghost_nodes] = n_unique + np.arange(ghost_nodes.size)
    gather = np.concatenate(
        [remap_vol(ctx.gather_ids), ghost_nodes.astype(scatter_old.dtype)])

    dt = np.asarray(ctx.x).dtype
    asdt = lambda a: jnp.asarray(a, dtype=dt)
    asint = lambda a: jnp.asarray(np.asarray(a).astype(np.int32))
    new = DGContext2D(
        n_order=ctx.n_order, n_p=n_p, k_elem=K_new, n_faces=n_faces,
        n_fp=n_fp,
        r=ctx.r, s=ctx.s, V=ctx.V, Vinv=ctx.Vinv, Dr=ctx.Dr, Ds=ctx.Ds,
        Drw=ctx.Drw, Dsw=ctx.Dsw, lift=ctx.lift, filter=ctx.filter,
        fmask=ctx.fmask,
        x=asdt(rows(ctx.x)), y=asdt(rows(ctx.y)), J=asdt(rows(ctx.J)),
        rx=asdt(rows(ctx.rx)), ry=asdt(rows(ctx.ry)),
        sx=asdt(rows(ctx.sx)), sy=asdt(rows(ctx.sy)),
        nx=asdt(rows(ctx.nx)), ny=asdt(rows(ctx.ny)),
        fscale=asdt(fscale), sJ=asdt(rows(ctx.sJ)),
        vmapM=asint(vmapM), vmapP=asint(vmapP), mapP=asint(mapP),
        mapB=asint(remap_tr(ctx.mapB)), maskB=ctx.maskB,
        vmapB=asint(remap_vol(ctx.vmapB)),
        bc_maps=bc_maps, bc_table=asint(bc_table),
        gather_ids=asint(gather), scatter_ids=asint(scatter),
        face_nbr=face_nbr, face_flip=face_flip,
    )
    return new, is_real


def pad_elements(mesh: Mesh2D, n_parts: int) -> Mesh2D:
    """Mesh-level padding is the wrong level (degenerate elements would
    corrupt connectivity); use `pad_context` on the built context instead."""
    if mesh.num_elements % n_parts == 0:
        return mesh
    raise ValueError(
        f"K={mesh.num_elements} not divisible by n_parts={n_parts}; "
        "build the DG context and pad it with pad_context(ctx, "
        "rcb_block_sizes(mesh, n_parts)) instead"
    )
