"""Sharded smoothed-aggregation AMG (parallel/amg_halo.py): unstructured
distributed solves on the 8-virtual-device mesh must match serial at 1e-10
with SERIAL-AMG-like (mesh-near-independent) iteration counts — the
distributed preconditioner the reference gets from petsc_amg/hypre under MPI
for ANY mesh (FenicsSolver/SolverBase.py:643-672,
examples/test_flow_pass_cylinder.py:249-254); round-3 VERDICT item 1."""

import jax.numpy as jnp
import numpy as np
import pytest

from fenicssolver_tpu.core import FunctionSpace, VectorFunctionSpace
from fenicssolver_tpu.core.meshgen import perturbed_tet_box
from fenicssolver_tpu.la import krylov
from fenicssolver_tpu.la.amg import AMGPreconditioner, rigid_body_modes
from fenicssolver_tpu.ops import assembly, geometry
from fenicssolver_tpu.parallel.amg_halo import HaloAMGSolver


def _poisson(n, seed=0):
    mesh = perturbed_tet_box(n, seed=seed)
    assert getattr(mesh, "lattice_info", None) is None
    V = FunctionSpace(mesh, "CG", 1)
    tab = geometry.basis_tables(mesh.tdim, 1, 2)
    phi = jnp.asarray(tab.phi)
    dphi = jnp.asarray(tab.dphi)
    qw = jnp.asarray(tab.qw)

    def kernel(ue, geom, aux):
        dphig = geometry.phys_grads(dphi, geom.Jinv)
        g = geometry.interp_grad(dphig, ue)
        r = jnp.einsum("q,qg,qig->i", qw, g, dphig) * geom.detJ
        return r - jnp.einsum("q,qi->i", qw, phi) * geom.detJ

    ctx = geometry.build_cell_context(V, 2)
    form = assembly.Form(space=V)
    form.cell_terms.append(assembly.CellTerm(kernel=kernel, ctx=ctx))
    form.finalize()
    A, b = assembly.assemble_linear_system(form)
    dd = assembly.DirichletData(V.ndof)
    dd.add(V.facet_dofs(mesh.exterior_facets()), 0.0)
    dd.finalize()
    return mesh, V, A, b, dd


def _elasticity(n, seed=1):
    mesh = perturbed_tet_box(n, seed=seed)
    V = VectorFunctionSpace(mesh, "CG", 1)
    tab = geometry.basis_tables(mesh.tdim, 1, 2)
    phi = jnp.asarray(tab.phi)
    dphi = jnp.asarray(tab.dphi)
    qw = jnp.asarray(tab.qw)
    d = 3
    ks = phi.shape[1]
    mu, lmbda = 1.0, 1.5
    I = jnp.eye(d)
    f = jnp.array([0.0, 0.0, -1.0])

    def kernel(ue, geom, aux):
        U = ue.reshape(ks, d)
        dphig = geometry.phys_grads(dphi, geom.Jinv)
        gradU = jnp.einsum("qkg,kv->qvg", dphig, U)
        eps = 0.5 * (gradU + jnp.swapaxes(gradU, 1, 2))
        sig = (
            2 * mu * eps
            + lmbda * jnp.trace(eps, axis1=1, axis2=2)[:, None, None] * I
        )
        wdet = qw * geom.detJ
        r = jnp.einsum("q,qvg,qkg->kv", wdet, sig, dphig)
        fq = jnp.broadcast_to(f, (phi.shape[0], d))
        r = r - jnp.einsum("q,qv,qk->kv", wdet, fq, phi)
        return r.reshape(-1)

    ctx = geometry.build_cell_context(V, 2)
    form = assembly.Form(space=V)
    form.cell_terms.append(assembly.CellTerm(kernel=kernel, ctx=ctx))
    form.finalize()
    A, b = assembly.assemble_linear_system(form)
    dd = assembly.DirichletData(V.ndof)
    dd.add(V.facet_dofs(mesh.exterior_facets()), 0.0)
    dd.finalize()
    return mesh, V, A, b, dd


def _serial_amg_cg(A, b, dd, nullspace=None, tol=1e-10):
    As = A.to_scipy() if hasattr(A, "to_scipy") else A
    free = np.asarray(dd.free_mask)
    M = AMGPreconditioner(As, nullspace=nullspace, free_mask=free > 0.5)
    op = assembly.constrained_operator(A.matvec, dd.free_mask)
    rhs = assembly.constrained_rhs(A.matvec, b, dd.free_mask, dd.u_bc)
    x, it, res = krylov.cg(op, rhs, M=M, tol=tol, maxiter=300)
    return np.asarray(x), int(it)


def test_unstructured_poisson_matches_serial_amg():
    mesh, V, A, b, dd = _poisson(12)
    hs = HaloAMGSolver(A, V.dof_coords, np.asarray(dd.free_mask))
    x, it, res = hs.solve(np.asarray(b), np.asarray(dd.u_bc), tol=1e-10)
    x_ref, it_ref = _serial_amg_cg(A, b, dd)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-9, err
    # within ~2x the serial SA-AMG count (VERDICT r3 item 1 done-criterion)
    assert it <= 2 * it_ref + 2, (it, it_ref)


def test_iteration_count_mesh_near_independent():
    its = []
    for n in (10, 16, 20):
        mesh, V, A, b, dd = _poisson(n)
        hs = HaloAMGSolver(A, V.dof_coords, np.asarray(dd.free_mask))
        x, it, res = hs.solve(np.asarray(b), np.asarray(dd.u_bc), tol=1e-10)
        assert np.isfinite(np.asarray(x)).all()
        its.append(it)
    # 8x dof growth: AMG-like flatness, not Jacobi's O(1/h)
    assert its[-1] <= its[0] + 6, its


def test_vector_elasticity_rigid_body_nullspace():
    mesh, V, A, b, dd = _elasticity(8)
    ns = rigid_body_modes(V.scalar_space.dof_coords, V.vdim)
    hs = HaloAMGSolver(
        A, V.dof_coords, np.asarray(dd.free_mask), nullspace=ns
    )
    x, it, res = hs.solve(np.asarray(b), np.asarray(dd.u_bc), tol=1e-10)
    x_ref, it_ref = _serial_amg_cg(A, b, dd, nullspace=ns)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-9, err
    assert it <= 2 * it_ref + 2, (it, it_ref)


def test_nonzero_dirichlet_exact_linear_field():
    # u = 2x + 3y - z is in P1: with matching Dirichlet data and zero
    # source the solve must reproduce it exactly on the perturbed mesh
    mesh = perturbed_tet_box(8, seed=3)
    V = FunctionSpace(mesh, "CG", 1)
    tab = geometry.basis_tables(mesh.tdim, 1, 2)
    dphi = jnp.asarray(tab.dphi)
    qw = jnp.asarray(tab.qw)

    def kernel(ue, geom, aux):
        dphig = geometry.phys_grads(dphi, geom.Jinv)
        g = geometry.interp_grad(dphig, ue)
        return jnp.einsum("q,qg,qig->i", qw, g, dphig) * geom.detJ

    ctx = geometry.build_cell_context(V, 2)
    form = assembly.Form(space=V)
    form.cell_terms.append(assembly.CellTerm(kernel=kernel, ctx=ctx))
    form.finalize()
    A, b = assembly.assemble_linear_system(form)
    xy = np.asarray(V.dof_coords)
    u_exact = 2 * xy[:, 0] + 3 * xy[:, 1] - xy[:, 2]
    dd = assembly.DirichletData(V.ndof)
    bd = np.asarray(V.facet_dofs(mesh.exterior_facets()))
    dd.add(bd, u_exact[bd])
    dd.finalize()
    hs = HaloAMGSolver(A, V.dof_coords, np.asarray(dd.free_mask))
    x, it, res = hs.solve(np.asarray(b), np.asarray(dd.u_bc), tol=1e-12)
    assert np.abs(x - u_exact).max() < 1e-8


def test_update_values_refreshes_operator():
    mesh, V, A, b, dd = _poisson(8)
    hs = HaloAMGSolver(A, V.dof_coords, np.asarray(dd.free_mask))
    x1, _, _ = hs.solve(np.asarray(b), np.asarray(dd.u_bc), tol=1e-11)
    As = A.to_scipy() if hasattr(A, "to_scipy") else A
    hs.update_values(As * 2.0)
    x2, _, _ = hs.solve(np.asarray(b), np.asarray(dd.u_bc), tol=1e-11)
    err = np.linalg.norm(x2 - np.asarray(x1) / 2.0) / np.linalg.norm(x1)
    assert err < 1e-9, err


def test_fgmres_nonsymmetric_advection():
    # Poisson + strong skew advection: nonsymmetric system through the
    # V-cycle-preconditioned FGMRES path
    mesh, V, A, b, dd = _poisson(10)
    As = (A.to_scipy() if hasattr(A, "to_scipy") else A).tolil()
    import scipy.sparse as sp

    As = sp.csr_matrix(As)
    n = As.shape[0]
    rng = np.random.default_rng(0)
    skew = sp.random(n, n, density=2.0 / n, random_state=rng, format="csr")
    As_ns = (As + 0.3 * (skew - skew.T) * As.diagonal().mean()).tocsr()
    free = np.asarray(dd.free_mask)
    hs = HaloAMGSolver(As_ns, V.dof_coords, free)
    x, it, res = hs.solve(
        np.asarray(b), np.asarray(dd.u_bc), method="fgmres", tol=1e-10,
        maxiter=400,
    )
    # direct reference on the constrained system
    ubc = np.asarray(dd.u_bc)
    import scipy.sparse.linalg as spl

    D = sp.diags(free)
    Ac = D @ As_ns @ D + sp.diags(1.0 - free)
    rhs = free * (np.asarray(b) - As_ns @ (ubc * (1 - free))) + (
        1 - free
    ) * ubc
    x_ref = spl.spsolve(Ac.tocsc(), rhs)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-8, (err, it, res)
