"""Unit tests: quadrature exactness, basis properties, facet trace tables
(SURVEY.md §4: the asserting per-layer tests the reference lacks)."""

from math import factorial

import numpy as np
import pytest

from fenicssolver_tpu.core import elements


@pytest.mark.parametrize("deg", range(1, 8))
def test_triangle_quadrature_exact(deg):
    p, w = elements.quadrature(2, deg)
    for a in range(deg + 1):
        for b in range(deg + 1 - a):
            q = np.sum(w * p[:, 0] ** a * p[:, 1] ** b)
            exact = factorial(a) * factorial(b) / factorial(a + b + 2)
            assert abs(q - exact) < 1e-13


@pytest.mark.parametrize("deg", range(1, 6))
def test_tet_quadrature_exact(deg):
    p, w = elements.quadrature(3, deg)
    for a in range(deg + 1):
        for b in range(deg + 1 - a):
            for c in range(deg + 1 - a - b):
                q = np.sum(w * p[:, 0] ** a * p[:, 1] ** b * p[:, 2] ** c)
                exact = (
                    factorial(a) * factorial(b) * factorial(c)
                    / factorial(a + b + c + 3)
                )
                assert abs(q - exact) < 1e-13


@pytest.mark.parametrize("tdim", [1, 2, 3])
@pytest.mark.parametrize("degree", [1, 2])
def test_partition_of_unity_and_nodal(tdim, degree):
    pts, _ = elements.quadrature(tdim, 3)
    phi, dphi = elements.tabulate(tdim, degree, pts)
    # partition of unity and zero gradient sum
    assert np.allclose(phi.sum(axis=1), 1.0)
    assert np.allclose(dphi.sum(axis=1), 0.0, atol=1e-13)
    # nodal: phi_i(x_j) = delta_ij
    nodes = elements.dof_reference_coords(tdim, degree)
    phi_n, _ = elements.tabulate(tdim, degree, nodes)
    assert np.allclose(phi_n, np.eye(phi_n.shape[1]), atol=1e-13)


@pytest.mark.parametrize("tdim", [2, 3])
def test_p2_reproduces_quadratics(tdim):
    """P2 interpolation of a quadratic is exact at quadrature points."""
    rng = np.random.RandomState(0)
    pts, _ = elements.quadrature(tdim, 4)
    nodes = elements.dof_reference_coords(tdim, 2)

    def f(x):
        return 1 + x.sum(-1) + (x**2).sum(-1) + x[..., 0] * x[..., -1]

    coeffs = f(nodes)
    phi, dphi = elements.tabulate(tdim, 2, pts)
    assert np.allclose(phi @ coeffs, f(pts), atol=1e-13)


@pytest.mark.parametrize("tdim", [2, 3])
def test_facet_quadrature_in_cell(tdim):
    """Facet quadrature mapped into the cell integrates facet polynomials."""
    cell_pts, fpts, fw = elements.facet_quadrature_in_cell(tdim, 3)
    # weights sum to the reference facet volume (1 for interval, 1/2 tri)
    ref_vol = 1.0 if tdim == 2 else 0.5
    assert abs(fw.sum() - ref_vol) < 1e-14
    # mapped points lie on the correct reference facet planes
    # facet 0 is opposite vertex 0: plane sum(xi) = 1
    assert np.allclose(cell_pts[0].sum(axis=1), 1.0)
    # facet k>0 is opposite vertex k: plane xi_{k-1} = 0
    for lf in range(1, tdim + 1):
        assert np.allclose(cell_pts[lf][:, lf - 1], 0.0)
