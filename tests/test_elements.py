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


def test_p3_nodality_and_partition_of_unity():
    """P3 Lagrange basis (degree 3, ROADMAP capability 9): 1 at its own
    node, 0 at the others; sums to 1 with zero gradient sum."""
    for tdim in (1, 2, 3):
        ref = elements.dof_reference_coords(tdim, 3)
        assert len(ref) == elements.num_dofs(tdim, 3)
        phi, dphi = elements.tabulate(tdim, 3, ref)
        assert np.abs(phi - np.eye(len(ref))).max() < 1e-12
        qp, _ = elements.quadrature(tdim, 5)
        phiq, dphiq = elements.tabulate(tdim, 3, qp)
        assert np.abs(phiq.sum(axis=1) - 1).max() < 1e-12
        assert np.abs(dphiq.sum(axis=1)).max() < 1e-12


def test_p3_cubic_exactness_3d():
    """A cubic solution is reproduced to machine precision on a P3 space —
    the strongest check of edge-pair orientation and the face-bubble
    dofmap (global continuity would break by O(1) if either were off)."""
    import jax.numpy as jnp

    from fenicssolver_tpu.core import FunctionSpace, UnitCubeMesh
    from fenicssolver_tpu.la import krylov
    from fenicssolver_tpu.ops import assembly, geometry

    mesh = UnitCubeMesh(3, 3, 3)
    V = FunctionSpace(mesh, "CG", 3)

    def u_ex(x):
        return x[:, 0] ** 3 + 2 * x[:, 1] ** 3 - x[:, 2] ** 3

    def f_ex(x):  # f = -lap u
        return -(6 * x[:, 0] + 12 * x[:, 1] - 6 * x[:, 2])

    qdeg = 6
    tab = geometry.basis_tables(mesh.tdim, 3, qdeg)
    ctx = geometry.build_cell_context(V, qdeg)
    phi = jnp.asarray(tab.phi)
    dphi = jnp.asarray(tab.dphi)
    qw = jnp.asarray(tab.qw)
    qpx = np.asarray(ctx.qpx)
    fq = jnp.asarray(f_ex(qpx.reshape(-1, 3)).reshape(qpx.shape[:2]))

    def kernel(ue, geom, aux):
        dphig = geometry.phys_grads(dphi, geom.Jinv)
        g = geometry.interp_grad(dphig, ue)
        r = jnp.einsum("q,qg,qig->i", qw, g, dphig) * geom.detJ
        return r - jnp.einsum("q,q,qi->i", qw, aux["f"], phi) * geom.detJ

    form = assembly.Form(space=V)
    form.cell_terms.append(
        assembly.CellTerm(kernel=kernel, ctx=ctx, aux={"f": fq})
    )
    form.finalize()
    A, b = assembly.assemble_linear_system(form)
    bd = V.facet_dofs(mesh.exterior_facets())
    dd = assembly.DirichletData(V.ndof)
    dd.add(bd, u_ex(V.dof_coords[bd]))
    dd.finalize()
    op = assembly.constrained_operator(A.matvec, dd.free_mask)
    rhs = assembly.constrained_rhs(A.matvec, b, dd.free_mask, dd.u_bc)
    diag = dd.free_mask * A.diagonal() + (1 - dd.free_mask)
    x, _, _ = krylov.cg(
        op, rhs, M=krylov.jacobi_preconditioner(diag), tol=1e-14, maxiter=8000
    )
    err = np.abs(np.asarray(x) - u_ex(V.dof_coords)).max()
    assert err < 1e-11, err


def test_p3_vector_patch_test():
    """Vector P3 space: an affine displacement field (constant strain) is
    reproduced exactly through assemble+solve with boundary Dirichlet —
    exercises VectorFunctionSpace dofmaps and facet_dofs at degree 3."""
    import jax.numpy as jnp

    from fenicssolver_tpu.core import UnitCubeMesh
    from fenicssolver_tpu.core.spaces import VectorFunctionSpace
    from fenicssolver_tpu.la import krylov
    from fenicssolver_tpu.ops import assembly, geometry

    mesh = UnitCubeMesh(2, 2, 2)
    V = VectorFunctionSpace(mesh, "CG", 3)
    tab = geometry.basis_tables(3, 3, 6)
    ctx = geometry.build_cell_context(V, 6)
    phi = jnp.asarray(tab.phi)
    dphi = jnp.asarray(tab.dphi)
    qw = jnp.asarray(tab.qw)
    ks = V.scalar_space.ndof_el
    mu, lam = 1.0, 1.5
    I = jnp.eye(3)

    def kernel(ue, geom, aux):
        U = ue.reshape(ks, 3)
        dphig = geometry.phys_grads(dphi, geom.Jinv)
        gU = jnp.einsum("qkg,kv->qvg", dphig, U)
        eps = 0.5 * (gU + jnp.swapaxes(gU, 1, 2))
        sig = 2 * mu * eps + lam * jnp.trace(
            eps, axis1=1, axis2=2
        )[:, None, None] * I
        return jnp.einsum("q,qvg,qkg->kv", qw * geom.detJ, sig, dphig).reshape(-1)

    form = assembly.Form(space=V)
    form.cell_terms.append(assembly.CellTerm(kernel=kernel, ctx=ctx))
    form.finalize()
    A, _ = assembly.assemble_linear_system(form)
    B = np.array([[0.1, 0.02, 0.0], [0.03, -0.05, 0.01], [0.0, 0.04, 0.08]])
    c = np.array([0.01, -0.02, 0.005])
    full = (V.scalar_space.dof_coords @ B.T + c).reshape(-1)
    bd = V.facet_dofs(mesh.exterior_facets())
    dd = assembly.DirichletData(V.ndof)
    dd.add(bd, full[bd])
    dd.finalize()
    op = assembly.constrained_operator(A.matvec, dd.free_mask)
    rhs = assembly.constrained_rhs(
        A.matvec, jnp.zeros(V.ndof), dd.free_mask, dd.u_bc
    )
    diag = dd.free_mask * A.diagonal() + (1 - dd.free_mask)
    x, _, _ = krylov.cg(
        op, rhs, M=krylov.jacobi_preconditioner(diag), tol=1e-14, maxiter=8000
    )
    assert np.abs(np.asarray(x) - full).max() < 1e-11
