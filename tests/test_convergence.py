"""Mesh-convergence rates: the strongest correctness evidence for the
assembly + solve stack (P1 ~ h^2, P2 ~ h^3, P3 ~ h^4 in L2 for Poisson)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fenicssolver_tpu.core import FunctionSpace, UnitSquareMesh
from fenicssolver_tpu.la import krylov
from fenicssolver_tpu.ops import assembly, geometry


def solve_poisson(n, degree):
    """-Laplace(u) = f with u = sin(pi x) sin(pi y) manufactured."""
    mesh = UnitSquareMesh(n, n)
    V = FunctionSpace(mesh, "CG", degree)
    qdeg = 2 * degree + 2
    tab = geometry.basis_tables(mesh.tdim, degree, qdeg)
    ctx = geometry.build_cell_context(V, qdeg)
    phi = jnp.asarray(tab.phi)
    dphi = jnp.asarray(tab.dphi)
    qw = jnp.asarray(tab.qw)
    qpx = np.asarray(ctx.qpx)
    f_q = jnp.asarray(
        2 * np.pi**2 * np.sin(np.pi * qpx[..., 0]) * np.sin(np.pi * qpx[..., 1])
    )

    def kernel(ue, geom, aux_e):
        dphig = geometry.phys_grads(dphi, geom.Jinv)
        g = geometry.interp_grad(dphig, ue)
        r = jnp.einsum("q,qg,qig->i", qw, g, dphig) * geom.detJ
        return r - jnp.einsum("q,q,qi->i", qw, aux_e["f"], phi) * geom.detJ

    form = assembly.Form(space=V)
    form.cell_terms.append(
        assembly.CellTerm(kernel=kernel, ctx=ctx, aux={"f": f_q})
    )
    form.finalize()
    A, b = assembly.assemble_linear_system(form)
    dd = assembly.DirichletData(V.ndof)
    dd.add(V.facet_dofs(mesh.exterior_facets()), 0.0)
    dd.finalize()
    op = assembly.constrained_operator(A.matvec, dd.free_mask)
    rhs = assembly.constrained_rhs(A.matvec, b, dd.free_mask, dd.u_bc)
    diag = dd.free_mask * A.diagonal() + (1 - dd.free_mask)
    x, _, _ = krylov.cg(
        op, rhs, M=krylov.jacobi_preconditioner(diag), tol=1e-13, maxiter=4000
    )
    # L2 error via quadrature
    u_e = jnp.asarray(x)[ctx.cell_dofs]
    u_q = jnp.einsum("qk,ck->cq", phi, u_e)
    exact_q = np.sin(np.pi * qpx[..., 0]) * np.sin(np.pi * qpx[..., 1])
    err2 = jnp.einsum("q,cq,c->", qw, (u_q - exact_q) ** 2, ctx.detJ)
    return float(np.sqrt(err2))


@pytest.mark.parametrize("degree,expected_rate", [(1, 2.0), (2, 3.0), (3, 4.0)])
def test_poisson_convergence_rate(degree, expected_rate):
    e1 = solve_poisson(8, degree)
    e2 = solve_poisson(16, degree)
    rate = np.log2(e1 / e2)
    assert rate > expected_rate - 0.2, (e1, e2, rate)


def test_scalar_name_typo_aliases():
    """The reference's misspellings are accepted (SURVEY.md §2.6)."""
    from fenicssolver_tpu.solvers.scalar_transport import ScalarTransportSolver
    from tests.test_heat_transfer import base_settings, make_bcs

    from fenicssolver_tpu.core import AutoSubDomain, near

    mesh = UnitSquareMesh(4, 4)
    Q = FunctionSpace(mesh, "CG", 1)
    top = AutoSubDomain(lambda x: near(x[1], 1.0))
    bottom = AutoSubDomain(lambda x: near(x[1], 0.0))
    bcs = {
        "hi": {"boundary": top, "boundary_id": 1, "type": "Dirichlet",
               "value": 360.0},
        "lo": {"boundary": bottom, "boundary_id": 2, "type": "Dirichlet",
               "value": 300.0},
    }
    s = base_settings(Q, bcs)
    s["scalar_name"] = "eletric_potential"  # reference typo
    s["material"] = {"relative_elelectric_permittivity": 11.7}  # example typo
    s["initial_values"] = {"electric_potential": 300}
    solver = ScalarTransportSolver(s)
    assert solver.scalar_name == "electric_potential"
    T = solver.solve()
    assert np.isfinite(T.values).all()
