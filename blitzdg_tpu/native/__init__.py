"""Native (C++) mesh-runtime kernels with ctypes bindings.

Auto-builds ``libdgmesh.so`` from dgmesh.cpp on first use (g++ -O2 -shared);
every entry point has a numpy fallback so the framework works without a
toolchain. ``available()`` reports whether the native library loaded.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_HERE, "libdgmesh.so")
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_HERE, "dgmesh.cpp")
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", _LIB_PATH],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
        os.path.join(_HERE, "dgmesh.cpp")
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

    lib.dg_build_connectivity.argtypes = [i32p, ctypes.c_int32, ctypes.c_int32, i32p, i32p]
    lib.dg_build_connectivity.restype = ctypes.c_int

    lib.dg_build_maps.argtypes = [
        f64p, f64p, ctypes.c_int32, ctypes.c_int32,
        i32p, ctypes.c_int32, ctypes.c_int32,
        i32p, i32p, f64p, i32p, ctypes.c_double,
        i32p, i32p, i32p,
    ]
    lib.dg_build_maps.restype = ctypes.c_int

    lib.dg_parse_gmsh_elements.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.dg_parse_gmsh_elements.restype = ctypes.c_int

    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def build_connectivity(etov: np.ndarray):
    """Native EToE/EToF; falls back to the numpy implementation."""
    lib = _load()
    if lib is None:
        from ..mesh.connectivity import build_connectivity as np_impl

        return np_impl(etov)
    etov = np.ascontiguousarray(etov, dtype=np.int32)
    K, nf = etov.shape
    etoe = np.empty_like(etov)
    etof = np.empty_like(etov)
    rc = lib.dg_build_connectivity(etov, K, nf, etoe, etof)
    assert rc == 0
    return etoe, etof


def build_maps(x, y, fmask, etoe, etof, verts, etov, node_tol=1e-5):
    """Native vmapM/vmapP/mapP; same contract as triangle._build_maps."""
    lib = _load()
    if lib is None:
        return None  # caller falls back
    x = np.ascontiguousarray(x, dtype=np.float64).reshape(-1)
    y = np.ascontiguousarray(y, dtype=np.float64).reshape(-1)
    fmask = np.ascontiguousarray(fmask, dtype=np.int32)
    etoe = np.ascontiguousarray(etoe, dtype=np.int32)
    etof = np.ascontiguousarray(etof, dtype=np.int32)
    verts = np.ascontiguousarray(verts[:, :2], dtype=np.float64)
    etov = np.ascontiguousarray(etov, dtype=np.int32)
    K, nfaces = etoe.shape
    nfp = fmask.shape[1]
    np_ = x.size // K
    ntr = nfaces * nfp
    vmapM = np.empty((K, ntr), dtype=np.int32)
    vmapP = np.empty((K, ntr), dtype=np.int32)
    mapP = np.empty((K, ntr), dtype=np.int32)
    rc = lib.dg_build_maps(
        x, y, K, np_, fmask, nfaces, nfp, etoe, etof, verts, etov,
        node_tol, vmapM, vmapP, mapP,
    )
    assert rc == 0
    return vmapM, vmapP, mapP


def parse_gmsh_elements(text: str):
    """Native $Elements scan. Returns (tris, quads, lines, line_tags) or
    None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    raw = text.encode()
    nt = ctypes.c_int32()
    nq = ctypes.c_int32()
    nl = ctypes.c_int32()
    rc = lib.dg_parse_gmsh_elements(raw, len(raw), ctypes.byref(nt),
                                    ctypes.byref(nq), ctypes.byref(nl),
                                    None, None, None, None)
    if rc != 0:
        return None
    tris = np.empty((nt.value, 3), dtype=np.int32)
    quads = np.empty((nq.value, 4), dtype=np.int32)
    lines = np.empty((nl.value, 2), dtype=np.int32)
    tags = np.empty((nl.value,), dtype=np.int32)
    rc = lib.dg_parse_gmsh_elements(
        raw, len(raw), ctypes.byref(nt), ctypes.byref(nq), ctypes.byref(nl),
        tris.ctypes.data_as(ctypes.c_void_p),
        quads.ctypes.data_as(ctypes.c_void_p),
        lines.ctypes.data_as(ctypes.c_void_p),
        tags.ctypes.data_as(ctypes.c_void_p),
    )
    assert rc == 0
    return tris, quads, lines, tags
