"""ctypes loader for the native C++ setup kernels (native/fst_native.cpp).

Compiled on first use with g++ (cached in native/); every entry point has a
pure-numpy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "native", "fst_native.cpp")
_SO = os.path.join(_HERE, "..", "native", "libfstnative.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.build_csr_pattern.restype = ctypes.c_int64
        lib.build_csr_pattern.argtypes = [
            i64p, ctypes.c_int64, ctypes.c_int64, i32p, i32p, i32p, i32p,
        ]
        lib.build_facets.restype = ctypes.c_int64
        lib.build_facets.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int32, i64p, i32p, i32p, i32p,
        ]
        lib.build_ell.restype = ctypes.c_int64
        lib.build_ell.argtypes = [i32p, i32p, ctypes.c_int64, i32p, i32p]
        lib.aggregate.restype = ctypes.c_int64
        lib.aggregate.argtypes = [i32p, i32p, ctypes.c_int64, i64p]
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.csr_spgemm.restype = ctypes.c_int64
        lib.csr_spgemm.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            i64p, i64p, f64p, i64p, i64p, f64p, i64p, i64p, f64p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _ptr(arr, t):
    return arr.ctypes.data_as(ctypes.POINTER(t))


def available():
    return _load() is not None


def build_csr_pattern(keys, ndof):
    """keys (n,) int64 row*ndof+col -> (positions, indptr, indices, rows).

    Native path ~5-10x faster than np.unique on multi-10M-entry meshes."""
    lib = _load()
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    n = keys.shape[0]
    if lib is None:
        uniq, inverse = np.unique(keys, return_inverse=True)
        rows = (uniq // ndof).astype(np.int32)
        cols = (uniq % ndof).astype(np.int32)
        indptr = np.zeros(ndof + 1, dtype=np.int32)
        np.add.at(indptr[1:], rows, 1)
        return (
            inverse.astype(np.int32),
            np.cumsum(indptr).astype(np.int32),
            cols,
            rows,
        )
    nnz = lib.build_csr_pattern(
        _ptr(keys, ctypes.c_int64), n, ndof, None, None, None, None
    )
    positions = np.empty(n, dtype=np.int32)
    indptr = np.empty(ndof + 1, dtype=np.int32)
    indices = np.empty(nnz, dtype=np.int32)
    rows = np.empty(nnz, dtype=np.int32)
    lib.build_csr_pattern(
        _ptr(keys, ctypes.c_int64),
        n,
        ndof,
        _ptr(positions, ctypes.c_int32),
        _ptr(indptr, ctypes.c_int32),
        _ptr(indices, ctypes.c_int32),
        _ptr(rows, ctypes.c_int32),
    )
    return positions, indptr, indices, rows


def build_facets(cells):
    """cells (nc, nvc) int32 (vertex-sorted) -> facet tables, or None if the
    native library is unavailable (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    cells = np.ascontiguousarray(cells, dtype=np.int32)
    nc, nvc = cells.shape
    fnv = nvc - 1
    facet_id = np.empty(nc * nvc, dtype=np.int64)
    nf = lib.build_facets(
        _ptr(cells, ctypes.c_int32), nc, nvc, None, None, None, None
    )
    facet_vertices = np.empty(nf * fnv, dtype=np.int32)
    facet_cells = np.empty(nf * 2, dtype=np.int32)
    facet_local = np.empty(nf * 2, dtype=np.int32)
    lib.build_facets(
        _ptr(cells, ctypes.c_int32),
        nc,
        nvc,
        _ptr(facet_id, ctypes.c_int64),
        _ptr(facet_vertices, ctypes.c_int32),
        _ptr(facet_cells, ctypes.c_int32),
        _ptr(facet_local, ctypes.c_int32),
    )
    return (
        facet_id.reshape(nc, nvc),
        facet_vertices.reshape(nf, fnv),
        facet_cells.reshape(nf, 2),
        facet_local.reshape(nf, 2),
    )


def aggregate(indptr, indices, n):
    """Greedy aggregation for AMG; returns (agg ids (n,), n_aggregates) or
    None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    agg = np.empty(n, dtype=np.int64)
    n_agg = lib.aggregate(
        _ptr(indptr, ctypes.c_int32), _ptr(indices, ctypes.c_int32), n,
        _ptr(agg, ctypes.c_int64),
    )
    return agg, int(n_agg)


def csr_spgemm(m, n, Ap, Ai, Ax, Bp, Bi, Bx):
    """C = A(m x k) @ B(k x n) on host CSR (int64 indptr/indices, f64 data)
    via native Gustavson row-merge; returns (indptr, indices, data) with
    sorted columns, or None when the native library is unavailable (the
    caller falls back to la/sparse_algebra's sort-reduce formulation)."""
    lib = _load()
    if lib is None:
        return None
    c_i64, c_f64 = ctypes.c_int64, ctypes.c_double
    Ap = np.ascontiguousarray(Ap, dtype=np.int64)
    Ai = np.ascontiguousarray(Ai, dtype=np.int64)
    Ax = np.ascontiguousarray(Ax, dtype=np.float64)
    Bp = np.ascontiguousarray(Bp, dtype=np.int64)
    Bi = np.ascontiguousarray(Bi, dtype=np.int64)
    Bx = np.ascontiguousarray(Bx, dtype=np.float64)
    nnz = lib.csr_spgemm(
        m, n, _ptr(Ap, c_i64), _ptr(Ai, c_i64), _ptr(Ax, c_f64),
        _ptr(Bp, c_i64), _ptr(Bi, c_i64), _ptr(Bx, c_f64),
        None, None, None,
    )
    Cp = np.empty(m + 1, dtype=np.int64)
    Ci = np.empty(nnz, dtype=np.int64)
    Cx = np.empty(nnz, dtype=np.float64)
    lib.csr_spgemm(
        m, n, _ptr(Ap, c_i64), _ptr(Ai, c_i64), _ptr(Ax, c_f64),
        _ptr(Bp, c_i64), _ptr(Bi, c_i64), _ptr(Bx, c_f64),
        _ptr(Cp, c_i64), _ptr(Ci, c_i64), _ptr(Cx, c_f64),
    )
    return Cp, Ci, Cx


def build_ell(indptr, indices, ndof):
    """CSR -> ELLPACK (transposed): (W, ell_idx (W,ndof), ell_pos (nnz,))."""
    lib = _load()
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    if lib is None:
        counts = np.diff(indptr)
        W = int(counts.max())
        nnz = indices.shape[0]
        rows = np.repeat(np.arange(ndof, dtype=np.int64), counts)
        slot = np.arange(nnz) - np.repeat(indptr[:-1], counts)
        ell_idx = np.tile(np.arange(ndof, dtype=np.int32), (W, 1))
        ell_idx[slot, rows] = indices
        ell_pos = (slot * ndof + rows).astype(np.int32)
        return W, ell_idx, ell_pos
    W = lib.build_ell(
        _ptr(indptr, ctypes.c_int32), _ptr(indices, ctypes.c_int32), ndof,
        None, None,
    )
    ell_idx = np.empty((W, ndof), dtype=np.int32)
    ell_pos = np.empty(indices.shape[0], dtype=np.int32)
    lib.build_ell(
        _ptr(indptr, ctypes.c_int32),
        _ptr(indices, ctypes.c_int32),
        ndof,
        _ptr(ell_idx, ctypes.c_int32),
        _ptr(ell_pos, ctypes.c_int32),
    )
    return W, ell_idx, ell_pos
