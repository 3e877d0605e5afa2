"""Face connectivity and boundary-tag matching for unstructured meshes.

Host-side setup (numpy). Reference analog: MeshManager::buildConnectivity
(/root/reference/src/MeshManager.cpp:383-489), which forms the sparse
FToV*FToV^T product and reads off entries equal to 2 (shared faces). Here
we get the same result directly: sort each face's vertex pair into a key and
match key-equal faces — O(K log K), no sparse algebra needed.

Local face ordering convention (same as the reference / Hesthaven-Warburton):
face f of an element connects local vertices (f, (f+1) mod Nfaces).
"""
from __future__ import annotations

import numpy as np


def face_vertices(etov: np.ndarray) -> np.ndarray:
    """(K, Nfaces, 2) vertex ids of each local face."""
    K, Nf = etov.shape
    nxt = np.roll(np.arange(Nf), -1)
    return np.stack([etov, etov[:, nxt]], axis=-1)


def build_connectivity(etov: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EToE/EToF: for each (element, face), the neighbor element and its
    local face id; boundary faces are self-referential."""
    K, Nf = etov.shape
    fv = face_vertices(etov).reshape(K * Nf, 2)
    key = np.sort(fv, axis=1)

    order = np.lexsort((key[:, 1], key[:, 0]))
    sk = key[order]
    etoe = np.repeat(np.arange(K, dtype=np.int32), Nf)
    etof = np.tile(np.arange(Nf, dtype=np.int32), K)

    same = np.all(sk[:-1] == sk[1:], axis=1)
    a = order[:-1][same]  # first face of each matched pair
    b = order[1:][same]  # second face
    etoe_out = etoe.copy()
    etof_out = etof.copy()
    etoe_out[a], etof_out[a] = etoe[b], etof[b]
    etoe_out[b], etof_out[b] = etoe[a], etof[a]
    return etoe_out.reshape(K, Nf), etof_out.reshape(K, Nf)


def match_line_tags(mesh) -> None:
    """Overwrite bc_type on faces whose vertex pair matches a boundary line
    element carrying a nonzero physical tag."""
    if mesh.boundary_lines is None or len(mesh.boundary_lines) == 0:
        return
    K, Nf = mesh.etov.shape
    fv = face_vertices(mesh.etov).reshape(K * Nf, 2)
    fkey = np.sort(fv, axis=1)
    lkey = np.sort(mesh.boundary_lines, axis=1)

    lut = {tuple(k): t for k, t in zip(lkey, mesh.boundary_tags) if t != 0}
    if not lut:
        return
    bc = mesh.bc_type.reshape(-1)
    for i, k in enumerate(map(tuple, fkey)):
        if bc[i] != 0 and k in lut:
            bc[i] = lut[k]
    mesh.bc_type = bc.reshape(K, Nf)
