"""Native C++ setup kernels vs the numpy reference implementations."""

import numpy as np
import pytest

from fenicssolver_tpu import native
from fenicssolver_tpu.core import UnitCubeMesh, UnitSquareMesh, FunctionSpace


@pytest.mark.skipif(not native.available(), reason="g++ unavailable")
def test_csr_pattern_matches_numpy():
    mesh = UnitCubeMesh(5, 5, 5)
    V = FunctionSpace(mesh, "CG", 1)
    cd = mesh.cells_array.astype(np.int64)
    k = cd.shape[1]
    rows = np.repeat(cd, k, axis=1).ravel()
    cols = np.tile(cd, (1, k)).ravel()
    keys = rows * V.ndof + cols

    pos, indptr, indices, rws = native.build_csr_pattern(keys, V.ndof)
    # numpy reference
    uniq, inverse = np.unique(keys, return_inverse=True)
    assert indices.shape[0] == uniq.shape[0]
    assert np.array_equal(pos, inverse.astype(np.int32))
    assert np.array_equal(indices, (uniq % V.ndof).astype(np.int32))
    assert np.array_equal(rws, (uniq // V.ndof).astype(np.int32))
    counts = np.bincount(rws, minlength=V.ndof)
    assert np.array_equal(indptr, np.concatenate([[0], np.cumsum(counts)]))


@pytest.mark.skipif(not native.available(), reason="g++ unavailable")
def test_facets_match_numpy():
    for mesh in (UnitSquareMesh(6, 5), UnitCubeMesh(3, 4, 2)):
        ref = mesh._compute_facets()
        out = native.build_facets(mesh.cells_array)
        assert out is not None
        facet_id, fverts, fcells, flocal = out
        assert np.array_equal(fverts, ref["facet_vertices"])
        assert np.array_equal(facet_id, ref["cell_facets"])
        assert np.array_equal(fcells, ref["facet_cells"])
        assert np.array_equal(flocal, ref["facet_local"])


@pytest.mark.skipif(not native.available(), reason="g++ unavailable")
def test_ell_matches_numpy():
    mesh = UnitSquareMesh(7, 7)
    V = FunctionSpace(mesh, "CG", 1)
    cd = mesh.cells_array.astype(np.int64)
    k = cd.shape[1]
    keys = (np.repeat(cd, k, axis=1) * V.ndof + np.tile(cd, (1, k))).ravel()
    pos, indptr, indices, rws = native.build_csr_pattern(keys, V.ndof)
    W, ell_idx, ell_pos = native.build_ell(indptr, indices, V.ndof)
    # reconstruct CSR from ELL and compare (pad slots self-index with 0 data)
    data = np.random.RandomState(0).rand(indices.shape[0])
    ell_data = np.zeros(W * V.ndof)
    ell_data[ell_pos] = data
    x = np.random.RandomState(1).rand(V.ndof)
    y_ell = (ell_data.reshape(W, V.ndof) * x[ell_idx]).sum(0)
    import scipy.sparse as sp

    A = sp.csr_matrix((data, indices, indptr), shape=(V.ndof, V.ndof))
    assert np.allclose(y_ell, A @ x)
