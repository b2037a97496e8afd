"""ctypes bindings for the native host-runtime library (csrc/).

The C++ engine re-provides the host-side machinery the reference obtains
from native dependencies (partitioner, boundary topology, point-in-polygon,
gridded interpolation — SURVEY §2b) plus this framework's operator-sparsity
builders.  Loading is lazy; every entry point has a bit-identical numpy
fallback in the corresponding Python module, so the framework is fully
functional without the library.  Disable explicitly with SHAKTI_NATIVE=0.

Build:  make -C csrc
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _find_lib():
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cands = [
        os.environ.get("SHAKTI_NATIVE_LIB"),
        os.path.join(here, "csrc", "libshakti_native.so"),
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "libshakti_native.so"),
    ]
    for c in cands:
        if c and os.path.exists(c):
            return c
    return None


def _expected_hash(lib_path: str) -> str | None:
    """sha256(shakti_native.cpp)[:16] for the source next to the .so, or
    None when no source is present (installed binary: nothing to check)."""
    src = os.path.join(os.path.dirname(lib_path), "shakti_native.cpp")
    if not os.path.exists(src):
        return None
    import hashlib
    with open(src, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def _looks_stale(lib_path: str) -> bool:
    """Staleness probe that does NOT dlopen: the build stamps the source
    hash into .rodata, so a fresh binary contains the expected hex string
    verbatim.  Checking before any CDLL matters — dlopen caches by path,
    so a rebuild after loading would relink over a live mapping and the
    re-CDLL would return the stale cached handle anyway."""
    expected = _expected_hash(lib_path)
    if expected is None:
        return False
    try:
        with open(lib_path, "rb") as f:
            return expected.encode() not in f.read()
    except OSError:
        return True


def _hash_ok(L, lib_path: str) -> bool:
    """The binary embeds sha256(shakti_native.cpp)[:16] at build time; when
    the source file sits next to the .so, a mismatch means the binary is
    stale and must not be trusted over the numpy fallbacks."""
    src = os.path.join(os.path.dirname(lib_path), "shakti_native.cpp")
    if not os.path.exists(src):
        return True  # installed without source: nothing to compare against
    try:
        fn = L.shakti_src_hash
    except AttributeError:
        return False  # pre-hash binary next to source: treat as stale
    fn.restype = ctypes.c_char_p
    embedded = fn().decode()
    if not embedded:
        return True  # built without the stamp (custom flags): accept
    import hashlib
    with open(src, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16] == embedded


def _try_build() -> str | None:
    """Build libshakti_native.so from source on first use (the binary is
    NOT checked into the repo — supply-chain hygiene; numpy fallbacks cover
    hosts without a toolchain).  Returns the built path or None."""
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    csrc = os.path.join(here, "csrc")
    if not os.path.exists(os.path.join(csrc, "shakti_native.cpp")):
        return None
    import subprocess
    try:
        r = subprocess.run(["make", "-C", csrc], capture_output=True,
                           timeout=240)
    except (OSError, subprocess.TimeoutExpired):
        return None
    path = os.path.join(csrc, "libshakti_native.so")
    return path if r.returncode == 0 and os.path.exists(path) else None


def lib():
    """The loaded library handle, or None (fallback mode)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("SHAKTI_NATIVE", "1") == "0":
        return None
    path = _find_lib()
    if path is None:
        path = _try_build()
    elif _looks_stale(path):
        # Rebuild BEFORE the first dlopen (see _looks_stale).  If the
        # toolchain is absent keep the old path: _hash_ok below still
        # arbitrates (e.g. accepts a stampless custom build).
        path = _try_build() or path
    if path is None:
        return None
    try:
        L = ctypes.CDLL(path)
    except OSError:
        return None
    if not _hash_ok(L, path):
        return None  # stale and unrebuildable: numpy fallbacks
    i64, i32, u8, f64 = (ctypes.c_int64, ctypes.c_int32, ctypes.c_uint8,
                         ctypes.c_double)
    P = ctypes.POINTER
    L.shakti_rcb_order.argtypes = [P(f64), i64, i64, P(i64)]
    L.shakti_rcb_partition.argtypes = [P(f64), i64, i32, P(i32)]
    L.shakti_boundary_edges.argtypes = [P(i32), i64, P(i32)]
    L.shakti_boundary_edges.restype = i64
    L.shakti_points_in_polygon.argtypes = [P(f64), i64, P(f64), i64, P(u8)]
    L.shakti_ell_build.argtypes = [P(i32), i64, i64, i64, P(i32), P(i32), P(i32)]
    L.shakti_ell_build.restype = i64
    L.shakti_bell_build.argtypes = [P(i32), i64, i64, i64, i64, P(i32), P(i64), P(i64)]
    L.shakti_bell_build.restype = i64
    L.shakti_bcsr_build.argtypes = [P(i32), i64, i64, i64, i64, P(i32), P(i32),
                                    P(i32), P(i32), P(i32), P(i32)]
    L.shakti_bcsr_build.restype = i64
    L.shakti_bilinear.argtypes = [P(f64), i64, P(f64), i64, P(f64), P(f64),
                                  P(f64), i64, P(f64)]
    _LIB = L
    return _LIB


def available() -> bool:
    return lib() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def rcb_order(points: np.ndarray, leaf: int = 32):
    L = lib()
    if L is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float64)
    out = np.empty(pts.shape[0], dtype=np.int64)
    L.shakti_rcb_order(_ptr(pts, ctypes.c_double), pts.shape[0], leaf,
                       _ptr(out, ctypes.c_int64))
    return out


def rcb_partition(points: np.ndarray, n_parts: int):
    L = lib()
    if L is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float64)
    out = np.empty(pts.shape[0], dtype=np.int32)
    L.shakti_rcb_partition(_ptr(pts, ctypes.c_double), pts.shape[0], n_parts,
                           _ptr(out, ctypes.c_int32))
    return out


def boundary_edges(cells: np.ndarray):
    L = lib()
    if L is None:
        return None
    cl = np.ascontiguousarray(cells, dtype=np.int32)
    buf = np.empty((3 * cl.shape[0], 2), dtype=np.int32)
    m = L.shakti_boundary_edges(_ptr(cl, ctypes.c_int32), cl.shape[0],
                                _ptr(buf, ctypes.c_int32))
    return buf[:m].copy()


def points_in_polygon(points: np.ndarray, polygon: np.ndarray):
    L = lib()
    if L is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float64)
    poly = np.ascontiguousarray(polygon, dtype=np.float64)
    out = np.zeros(pts.shape[0], dtype=np.uint8)
    L.shakti_points_in_polygon(_ptr(pts, ctypes.c_double), pts.shape[0],
                               _ptr(poly, ctypes.c_double), poly.shape[0],
                               _ptr(out, ctypes.c_uint8))
    return out.astype(bool)


def ell_build(cells: np.ndarray, n_nodes: int):
    L = lib()
    if L is None:
        return None
    cl = np.ascontiguousarray(cells, dtype=np.int32)
    max_k = 16
    while True:
        cols = np.empty(n_nodes * max_k, dtype=np.int32)
        slot_map = np.empty(9 * cl.shape[0], dtype=np.int32)
        diag = np.empty(n_nodes, dtype=np.int32)
        K = L.shakti_ell_build(_ptr(cl, ctypes.c_int32), cl.shape[0], n_nodes,
                               max_k, _ptr(cols, ctypes.c_int32),
                               _ptr(slot_map, ctypes.c_int32),
                               _ptr(diag, ctypes.c_int32))
        if K > 0:
            # the library writes with row stride K (== the returned value)
            return (cols[:n_nodes * K].reshape(n_nodes, K).copy(),
                    slot_map, diag, int(K))
        max_k = -int(K)


def bell_build(cells: np.ndarray, n_nodes: int, B: int):
    L = lib()
    if L is None:
        return None
    cl = np.ascontiguousarray(cells, dtype=np.int32)
    NB = -(-n_nodes // B)
    max_kb = 16
    while True:
        nbr = np.empty(NB * max_kb, dtype=np.int32)
        slot_map = np.empty(9 * cl.shape[0], dtype=np.int64)
        diag = np.empty(n_nodes, dtype=np.int64)
        KB = L.shakti_bell_build(_ptr(cl, ctypes.c_int32), cl.shape[0],
                                 n_nodes, B, max_kb,
                                 _ptr(nbr, ctypes.c_int32),
                                 _ptr(slot_map, ctypes.c_int64),
                                 _ptr(diag, ctypes.c_int64))
        if KB > 0:
            # the library writes with row stride KB (== the returned value)
            return (nbr[:NB * KB].reshape(NB, KB).copy(),
                    slot_map, diag, int(KB))
        max_kb = -int(KB)


def bilinear(gx, gy, f, px, py):
    L = lib()
    if L is None:
        return None
    gx = np.ascontiguousarray(gx, dtype=np.float64)
    gy = np.ascontiguousarray(gy, dtype=np.float64)
    f = np.ascontiguousarray(f, dtype=np.float64)
    px = np.ascontiguousarray(np.atleast_1d(px), dtype=np.float64)
    py = np.ascontiguousarray(np.atleast_1d(py), dtype=np.float64)
    out = np.empty(px.shape[0], dtype=np.float64)
    L.shakti_bilinear(_ptr(gx, ctypes.c_double), gx.shape[0],
                      _ptr(gy, ctypes.c_double), gy.shape[0],
                      _ptr(f, ctypes.c_double), _ptr(px, ctypes.c_double),
                      _ptr(py, ctypes.c_double), px.shape[0],
                      _ptr(out, ctypes.c_double))
    return out


def bcsr_build(cells: np.ndarray, n_nodes: int, B: int):
    L = lib()
    if L is None:
        return None
    cl = np.ascontiguousarray(cells, dtype=np.int32)
    c = cl.shape[0]
    max_nnzb = max(9 * max(c // 4, 1), 64)
    while True:
        brow = np.empty(max_nnzb, dtype=np.int32)
        bcol = np.empty(max_nnzb, dtype=np.int32)
        blk = np.empty(9 * c, dtype=np.int32)
        off = np.empty(9 * c, dtype=np.int32)
        dblk = np.empty(n_nodes, dtype=np.int32)
        doff = np.empty(n_nodes, dtype=np.int32)
        nnzb = L.shakti_bcsr_build(_ptr(cl, ctypes.c_int32), c, n_nodes, B,
                                   max_nnzb, _ptr(brow, ctypes.c_int32),
                                   _ptr(bcol, ctypes.c_int32),
                                   _ptr(blk, ctypes.c_int32),
                                   _ptr(off, ctypes.c_int32),
                                   _ptr(dblk, ctypes.c_int32),
                                   _ptr(doff, ctypes.c_int32))
        if nnzb > 0:
            return (brow[:nnzb].copy(), bcol[:nnzb].copy(), blk, off,
                    dblk, doff)
        max_nnzb = -int(nnzb)
