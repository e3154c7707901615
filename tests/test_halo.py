"""Halo-exchange sharded CG (parallel/halo.py): 8-virtual-device solves must
match serial at 1e-10 with per-device vectors ~ndof/8 + interface (VERDICT r1
item 3 — replaces the replicate+psum scheme for scaling past one host)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenicssolver_tpu.core import (
    FunctionSpace,
    UnitCubeMesh,
    UnitSquareMesh,
    VectorFunctionSpace,
)
from fenicssolver_tpu.la import krylov
from fenicssolver_tpu.ops import assembly, geometry
from fenicssolver_tpu.parallel.halo import (
    HaloShardedSolver,
    quantile_grid_partition,
)


def _assembled_poisson(mesh, degree=1):
    V = FunctionSpace(mesh, "CG", degree)
    tab = geometry.basis_tables(mesh.tdim, degree, 2)
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
    return V, A, b, dd, form


def _assembled_elasticity(n):
    mesh = UnitCubeMesh(n, n, n)
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
        sig = 2 * mu * eps + lmbda * jnp.trace(
            eps, axis1=1, axis2=2
        )[:, None, None] * I
        wdet = qw * geom.detJ
        r = jnp.einsum("q,qvg,qkg->kv", wdet, sig, dphig)
        r = r - jnp.einsum("q,qv,qk->kv", wdet,
                           jnp.broadcast_to(f, (phi.shape[0], d)), phi)
        return r.reshape(-1)

    ctx = geometry.build_cell_context(V, 2)
    form = assembly.Form(space=V)
    form.cell_terms.append(assembly.CellTerm(kernel=kernel, ctx=ctx))
    form.finalize()
    A, b = assembly.assemble_linear_system(form)
    dd = assembly.DirichletData(V.ndof)
    dd.add(V.facet_dofs(mesh.exterior_facets()), 0.0)
    dd.finalize()
    return V, A, b, dd, form


def _serial(A, b, dd, tol=1e-12):
    op = assembly.constrained_operator(A.matvec, dd.free_mask)
    rhs = assembly.constrained_rhs(A.matvec, b, dd.free_mask, dd.u_bc)
    diag = dd.free_mask * A.diagonal() + (1 - dd.free_mask)
    x, _, _ = krylov.cg(
        op, rhs, M=krylov.jacobi_preconditioner(diag), tol=tol, maxiter=4000
    )
    return np.asarray(x)


def test_partition_balanced():
    rng = np.random.default_rng(0)
    coords = rng.random((1000, 3))
    owner = quantile_grid_partition(coords, (2, 2, 2))
    counts = np.bincount(owner, minlength=8)
    assert counts.max() - counts.min() <= 8


def test_halo_poisson3d_matches_serial():
    assert len(jax.devices()) >= 8
    mesh = UnitCubeMesh(10, 10, 10)
    V, A, b, dd, form = _assembled_poisson(mesh)
    hs = HaloShardedSolver(A, V.dof_coords, devices=jax.devices()[:8])
    x, iters = hs.solve(b, dd.free_mask, dd.u_bc, tol=1e-12, maxiter=4000)
    x_ref = _serial(A, b, dd)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-10, err
    assert iters > 0
    # per-device local vector ~ ndof/8 + interface, NOT ndof
    assert hs.Lp < V.ndof / 8 + 6 * (11 * 11) + 64, (hs.Lp, V.ndof)


def test_halo_poisson2d_matches_serial():
    assert len(jax.devices()) >= 8
    mesh = UnitSquareMesh(16, 16)
    V, A, b, dd, form = _assembled_poisson(mesh, degree=2)
    hs = HaloShardedSolver(A, V.dof_coords, devices=jax.devices()[:8])
    x, iters = hs.solve(b, dd.free_mask, dd.u_bc, tol=1e-12, maxiter=4000)
    x_ref = _serial(A, b, dd)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-10, err


def test_halo_elasticity_matches_serial():
    assert len(jax.devices()) >= 8
    V, A, b, dd, form = _assembled_elasticity(6)
    hs = HaloShardedSolver(A, V.dof_coords, devices=jax.devices()[:8])
    x, iters = hs.solve(b, dd.free_mask, dd.u_bc, tol=1e-12, maxiter=4000)
    x_ref = _serial(A, b, dd)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-10, err
    assert hs.Lp < V.ndof / 2, (hs.Lp, V.ndof)


def test_distributed_routing_from_solver_layer():
    """solver_parameters.distributed routes a case through the halo solver
    and matches the serial solve (VERDICT r1 item 3: 'so a JSON case can
    actually run sharded')."""
    from fenicssolver_tpu.solvers.scalar_transport import ScalarTransportSolver
    from tests.test_heat_transfer import base_settings, make_bcs

    mesh = UnitSquareMesh(12, 12)
    Q = FunctionSpace(mesh, "CG", 1)
    s = base_settings(Q, make_bcs())
    serial = ScalarTransportSolver(s)
    serial.material["conductivity"] = 0.6
    T_serial = serial.solve()

    s2 = base_settings(Q, make_bcs())
    s2["solver_settings"]["solver_parameters"]["distributed"] = True
    dist = ScalarTransportSolver(s2)
    dist.material["conductivity"] = 0.6
    T_dist = dist.solve()
    err = np.linalg.norm(T_dist.values - T_serial.values) / np.linalg.norm(
        T_serial.values
    )
    assert err < 1e-9, err


# -- element-level sharded assembly (HaloElementSolver) -----------------------


def test_element_sharded_poisson3d_matches_serial():
    """Sharded device-side assembly + halo CG == serial assemble+solve
    (ROADMAP scaling item 6: assembly itself runs in the sharded layout)."""
    from fenicssolver_tpu.parallel.halo import (
        HaloElementSolver,
        batches_from_form,
    )

    assert len(jax.devices()) >= 8
    mesh = UnitCubeMesh(8, 8, 8)
    V, A, b, dd, form = _assembled_poisson(mesh)
    hs = HaloElementSolver(
        batches_from_form(form), V.dof_coords, V.ndof,
        devices=jax.devices()[:8],
    )
    x, iters = hs.solve(dd.free_mask, dd.u_bc, tol=1e-12, maxiter=4000)
    x_ref = _serial(A, b, dd)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-10, err
    assert hs.Lp < V.ndof / 2, (hs.Lp, V.ndof)


def test_element_sharded_elasticity_matches_serial():
    from fenicssolver_tpu.parallel.halo import (
        HaloElementSolver,
        batches_from_form,
    )

    assert len(jax.devices()) >= 8
    V, A, b, dd, form = _assembled_elasticity(6)
    hs = HaloElementSolver(
        batches_from_form(form), V.dof_coords, V.ndof,
        devices=jax.devices()[:8],
    )
    x, iters = hs.solve(dd.free_mask, dd.u_bc, tol=1e-12, maxiter=4000)
    x_ref = _serial(A, b, dd)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-10, err


def test_element_sharded_with_facet_terms():
    """Boundary-facet batches (Robin/HTC-type term) assemble sharded too."""
    from fenicssolver_tpu.parallel.halo import (
        HaloElementSolver,
        batches_from_form,
    )

    assert len(jax.devices()) >= 8
    mesh = UnitSquareMesh(12, 12)
    V = FunctionSpace(mesh, "CG", 1)
    tab = geometry.basis_tables(mesh.tdim, 1, 2)
    phi = jnp.asarray(tab.phi)
    dphi = jnp.asarray(tab.dphi)
    qw = jnp.asarray(tab.qw)

    def cell_kernel(ue, geom, aux):
        dphig = geometry.phys_grads(dphi, geom.Jinv)
        g = geometry.interp_grad(dphig, ue)
        r = jnp.einsum("q,qg,qig->i", qw, g, dphig) * geom.detJ
        return r - jnp.einsum("q,qi->i", qw, phi) * geom.detJ

    htc, Ta = 5.0, 300.0
    fphi_tab, _, fw, _ = geometry.facet_basis_tables(mesh.tdim, 1, 2)
    fphi = jnp.asarray(fphi_tab)
    fwj = jnp.asarray(fw)

    def facet_kernel(ue, geom, aux):
        phif = fphi[geom.local_id]
        T_q = phif @ ue
        val = htc * (Ta - T_q)
        return -jnp.einsum("q,q,qi->i", fwj * geom.detF, val, phif)

    ctx = geometry.build_cell_context(V, 2)
    fids = mesh.exterior_facets()
    fctx = geometry.build_facet_context(V, fids, 2)
    form = assembly.Form(space=V)
    form.cell_terms.append(assembly.CellTerm(kernel=cell_kernel, ctx=ctx))
    form.facet_terms.append(assembly.FacetTerm(kernel=facet_kernel, ctx=fctx))
    form.finalize()
    A, b = assembly.assemble_linear_system(form)
    dd = assembly.DirichletData(V.ndof)
    dd.finalize()  # pure Robin: no Dirichlet rows
    x_ref = _serial(A, b, dd)
    hs = HaloElementSolver(
        batches_from_form(form), V.dof_coords, V.ndof,
        devices=jax.devices()[:8],
    )
    x, iters = hs.solve(dd.free_mask, dd.u_bc, tol=1e-12, maxiter=4000)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-10, err


def test_element_distributed_routing_from_solver_layer():
    """solver_parameters.distributed = "element" runs a real scalar case
    with sharded assembly and matches the serial result."""
    from fenicssolver_tpu.solvers.scalar_transport import ScalarTransportSolver
    from tests.test_heat_transfer import base_settings, make_bcs

    mesh = UnitSquareMesh(12, 12)
    Q = FunctionSpace(mesh, "CG", 1)
    s = base_settings(Q, make_bcs())
    serial = ScalarTransportSolver(s)
    serial.material["conductivity"] = 0.6
    T_serial = serial.solve()

    s2 = base_settings(Q, make_bcs())
    s2["solver_settings"]["solver_parameters"]["distributed"] = "element"
    dist = ScalarTransportSolver(s2)
    dist.material["conductivity"] = 0.6
    T_dist = dist.solve()
    err = np.linalg.norm(T_dist.values - T_serial.values) / np.linalg.norm(
        T_serial.values
    )
    assert err < 1e-8, err


def test_halo_setup_memory_scales():
    """Setup must be O(ndof + interface), not O(nd x ndof) (VERDICT r2
    item 6 — the old g2l map was a dense (nd, ndof) int64 array with
    per-rank full scans).  Pinned structurally: no stored array may have
    the (nd, ndof) shape, the per-rank global->local lookups must be
    O(local), and setup wall time stays in seconds at 117k dofs.  (Peak
    host memory is dominated by the documented block-ELL tile fill-in,
    which is the device layout itself, so an absolute byte bound would
    only measure that.)"""
    import time

    import scipy.sparse as sp

    from fenicssolver_tpu.ops.structured import (
        box_cells,
        box_tet_geometry,
    )

    n = 48  # 117649 dofs, ~1.7M nnz
    ndof = (n + 1) ** 3
    cells = box_cells(n, n, n)
    Jinv, detJ = box_tet_geometry(n, n, n, dtype=np.float64)
    gref = np.array([[-1.0, -1, -1], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    g = np.einsum("kt,ctg->ckg", gref, Jinv)
    Ae = np.einsum("cig,cjg,c->cij", g, g, detJ / 6.0)
    rows = np.repeat(cells, 4, axis=1).ravel()
    cols = np.tile(cells, (1, 4)).ravel()
    A = sp.coo_matrix((Ae.ravel(), (rows, cols)), shape=(ndof, ndof)).tocsr()
    coords = np.stack(
        np.meshgrid(*([np.arange(n + 1.0)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3)
    t0 = time.perf_counter()
    hs = HaloShardedSolver(A, coords, devices=jax.devices()[:8])
    dt = time.perf_counter() - t0
    # seconds-scale (the old quadratic setup was minutes + OOM at this
    # size); 150 s absorbs cold-process compile variance on the 1-core
    # CI box — measured 18 s warm in-suite, ~55-77 s cold/contended.
    # The STRUCTURAL assertion below is the real regression pin.
    assert dt < 150.0, dt
    # structural: nothing stored is a dense (nd, ndof) map
    nd = hs.n_dev
    for name, v in vars(hs).items():
        arrs = v if isinstance(v, (list, tuple)) else [v]
        for a in arrs:
            if hasattr(a, "shape") and tuple(getattr(a, "shape", ())) == (
                nd,
                ndof,
            ):
                raise AssertionError(f"dense (nd, ndof) array in {name}")
    # the lookup tables are O(local): keys per rank ~ ndof/nd + interface
    for li in hs._l2l:
        assert len(li._keys) < ndof // nd + 3 * (n + 1) ** 2 + 64
