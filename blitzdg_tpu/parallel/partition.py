"""Element partitioning for multi-chip execution.

Reference analog: METIS k-way mesh partitioning
(/root/reference/src/MeshManager.cpp:491-544) producing element->rank maps
that the reference never actually consumes. Here partitioning is load-bearing:
elements are *reordered* so each shard owns a contiguous equal-size block of
the element axis — XLA then shards `(K, ...)` arrays with a plain
`PartitionSpec('element')` and every shard has identical static shapes.

Partitioner: recursive coordinate bisection (RCB) over element centroids —
no METIS dependency, deterministic, and produces compact blocks with small
surface (halo) cut for the meshes this framework targets.
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


def partition_mesh(mesh: Mesh2D, n_parts: int) -> tuple[Mesh2D, np.ndarray, int]:
    """Reorder elements into contiguous shard blocks.

    Returns (reordered mesh, permutation giving the old element index of
    each new position, max block size Kp). When K is divisible by n_parts
    the RCB sorted-split yields exactly equal blocks (Kp = K/n_parts);
    otherwise callers must pad fields to Kp per shard (see pad_elements).
    """
    K = mesh.num_elements
    verts = mesh.verts
    cent = verts[mesh.etov].mean(axis=1)
    part = rcb_partition(cent, n_parts)

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


def pad_elements(mesh: Mesh2D, n_parts: int) -> Mesh2D:
    """Pad K to a multiple of n_parts by replicating the last element as
    disconnected degenerate copies? Not supported in v1 — meshes whose K is
    not divisible by the shard count should be generated at a divisible
    size (generators are parametric)."""
    if mesh.num_elements % n_parts == 0:
        return mesh
    raise ValueError(
        f"K={mesh.num_elements} not divisible by n_parts={n_parts}; "
        "regenerate the mesh at a divisible element count"
    )
