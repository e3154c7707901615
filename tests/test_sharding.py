"""Multi-device domain-decomposition tests on a virtual 8-device CPU mesh
(SURVEY.md §4: the analog of the reference's MPI runs, never tested in-repo)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenicssolver_tpu.core import FunctionSpace, UnitSquareMesh
from fenicssolver_tpu.ops import assembly, geometry
from fenicssolver_tpu.parallel.partition import partition_cells
from fenicssolver_tpu.parallel.sharding import ShardedEllipticSolver


def poisson_kernel(qdeg, mesh_tdim, degree):
    tab = geometry.basis_tables(mesh_tdim, degree, qdeg)
    phi = jnp.asarray(tab.phi)
    dphi = jnp.asarray(tab.dphi)
    qw = jnp.asarray(tab.qw)

    def kernel(ue, geom, aux):
        dphig = geometry.phys_grads(dphi, geom.Jinv)
        g = geometry.interp_grad(dphig, ue)
        r = jnp.einsum("q,qg,qig->i", qw, g, dphig) * geom.detJ
        r = r - jnp.einsum("q,qi->i", qw, phi) * geom.detJ  # f = 1
        return r

    return kernel


def test_partition_covers_all_cells():
    mesh = UnitSquareMesh(10, 10)
    part, parts = partition_cells(mesh, 8)
    assert part.shape[0] == mesh.num_cells()
    all_ids = np.sort(parts[parts >= 0].ravel())
    assert np.array_equal(all_ids, np.arange(mesh.num_cells()))
    counts = np.bincount(part, minlength=8)
    assert counts.max() - counts.min() <= 2  # balanced


def test_sharded_poisson_matches_serial():
    """8-device sharded assemble+PCG == serial solve to solver tolerance."""
    assert len(jax.devices()) >= 8
    mesh = UnitSquareMesh(12, 12)
    V = FunctionSpace(mesh, "CG", 1)
    kernel = poisson_kernel(2, mesh.tdim, 1)

    # serial reference
    ctx = geometry.build_cell_context(V, 2)
    form = assembly.Form(space=V)
    form.cell_terms.append(assembly.CellTerm(kernel=kernel, ctx=ctx))
    form.finalize()
    A, b = assembly.assemble_linear_system(form)
    bd = V.facet_dofs(mesh.exterior_facets())
    dd = assembly.DirichletData(V.ndof)
    dd.add(bd, 0.0)
    dd.finalize()
    from fenicssolver_tpu.la import krylov

    op = assembly.constrained_operator(A.matvec, dd.free_mask)
    rhs = assembly.constrained_rhs(A.matvec, b, dd.free_mask, dd.u_bc)
    diag = dd.free_mask * A.diagonal() + (1 - dd.free_mask)
    x_ref, _, _ = krylov.cg(
        op, rhs, M=krylov.jacobi_preconditioner(diag), tol=1e-12, maxiter=2000
    )

    # sharded solve over 8 devices
    ss = ShardedEllipticSolver(V, kernel, devices=jax.devices()[:8])
    x, iters = ss.solve(b, dd.free_mask, dd.u_bc, tol=1e-12, maxiter=2000)
    err = np.linalg.norm(np.asarray(x) - np.asarray(x_ref)) / np.linalg.norm(
        np.asarray(x_ref)
    )
    assert err < 1e-10, err
    assert iters > 0
