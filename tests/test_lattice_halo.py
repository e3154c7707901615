"""Slab-sharded lattice GMG-CG (parallel/lattice.py): mesh-independent
distributed iteration counts (VERDICT r2 item 2 — the reference gets this
from petsc_amg under MPI, ``SolverBase.py:643-672``; the Jacobi halo CG
needed hundreds of iterations at 64^3)."""

import jax
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spl

from fenicssolver_tpu.core import FunctionSpace, UnitCubeMesh
from fenicssolver_tpu.ops.structured import (
    LatticePattern,
    box_cells,
    box_tet_geometry,
)
from fenicssolver_tpu.parallel.lattice import (
    LatticeHaloSolver,
    stencil_fields_from_csr,
)


def _poisson_csr(n, kfield=None):
    ndof = (n + 1) ** 3
    cells = box_cells(n, n, n)
    Jinv, detJ = box_tet_geometry(n, n, n, dtype=np.float64)
    gref = np.array([[-1.0, -1, -1], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    g = np.einsum("kt,ctg->ckg", gref, Jinv)
    w = detJ / 6.0 if kfield is None else detJ / 6.0 * kfield
    Ae = np.einsum("cig,cjg,c->cij", g, g, w)
    rows = np.repeat(cells, 4, axis=1).ravel()
    cols = np.tile(cells, (1, 4)).ravel()
    A = sp.coo_matrix((Ae.ravel(), (rows, cols)), shape=(ndof, ndof)).tocsr()
    b = np.zeros(ndof)
    np.add.at(b, cells.ravel(), np.repeat(detJ / 6.0 / 4.0, 4))
    pat = LatticePattern(n, n, n)
    free = np.ones(ndof)
    free[pat.boundary_vertices()] = 0.0
    return A, b, free


def _serial(A, b, free, ubc):
    Af = sp.diags(free) @ A @ sp.diags(free) + sp.diags(1 - free)
    rhs = free * (b - A @ ubc) + (1 - free) * ubc
    return spl.spsolve(Af.tocsc(), rhs)


def test_stencil_fields_roundtrip():
    """CSR -> 15 stencil fields -> dense matvec equals A @ x."""
    n = 6
    A, b, free = _poisson_csr(n)
    shape3 = (n + 1,) * 3
    coef = stencil_fields_from_csr(A, shape3)
    from fenicssolver_tpu.la.gmg import OFFSETS_T, _shift
    import jax.numpy as jnp

    x = np.random.default_rng(1).random((n + 1) ** 3)
    x3 = jnp.asarray(x.reshape(shape3))
    y = sum(
        jnp.asarray(coef[oi]) * _shift(x3, d)
        for oi, d in enumerate(OFFSETS_T)
    )
    assert np.allclose(np.asarray(y).ravel(), A @ x, atol=1e-12)


def test_lattice_halo_matches_serial_and_iters_flat():
    """Iteration counts stay ~constant across refinement (the whole point:
    Jacobi's grew O(1/h)); solutions match a serial direct solve."""
    assert len(jax.devices()) >= 8
    iters_seen = []
    for n in (16, 32):
        A, b, free = _poisson_csr(n)
        s = LatticeHaloSolver(
            A, {"n": (n, n, n), "extent": (1.0, 1.0, 1.0)},
            devices=jax.devices()[:8], gather_max=2000,
        )
        x, it = s.solve(b, free, np.zeros_like(b), tol=1e-10, maxiter=100)
        x_ref = _serial(A, b, free, np.zeros_like(b))
        err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
        assert err < 1e-9, (n, err)
        iters_seen.append(it)
    assert max(iters_seen) <= 15, iters_seen
    assert iters_seen[1] <= iters_seen[0] + 3, iters_seen


def test_lattice_halo_variable_coefficient():
    """The CG matvec uses the TRUE assembled fields; a 10:1 coefficient
    field must still converge to the exact solution."""
    assert len(jax.devices()) >= 8
    n = 16
    rng = np.random.default_rng(0)
    kf = 1.0 + 9.0 * rng.random(6 * n**3)
    A, b, free = _poisson_csr(n, kf)
    s = LatticeHaloSolver(
        A, {"n": (n, n, n), "extent": (1.0, 1.0, 1.0)},
        devices=jax.devices()[:8], gather_max=2000,
    )
    x, it = s.solve(b, free, np.zeros_like(b), tol=1e-10, maxiter=200)
    x_ref = _serial(A, b, free, np.zeros_like(b))
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-8, err


def test_lattice_halo_nonzero_dirichlet():
    """Nonzero boundary values flow through the constrained rhs exactly as
    in SolverBase.solve_static."""
    assert len(jax.devices()) >= 8
    n = 16
    A, b, free = _poisson_csr(n)
    shape3 = (n + 1,) * 3
    X = np.linspace(0, 1, n + 1)
    ubc3 = np.broadcast_to(X[:, None, None], shape3).copy()  # u = x on bdy
    ubc = np.where(free < 0.5, ubc3.ravel(), 0.0)
    s = LatticeHaloSolver(
        A, {"n": (n, n, n), "extent": (1.0, 1.0, 1.0)},
        devices=jax.devices()[:8], gather_max=2000,
    )
    x, it = s.solve(np.zeros_like(b), free, ubc, tol=1e-10, maxiter=100)
    # Laplace with u = x on the boundary -> u = x everywhere
    err = np.abs(x - ubc3.ravel()).max()
    assert err < 1e-8, err


def test_update_operator_reuses_compile():
    assert len(jax.devices()) >= 8
    n = 16
    A, b, free = _poisson_csr(n)
    s = LatticeHaloSolver(
        A, {"n": (n, n, n), "extent": (1.0, 1.0, 1.0)},
        devices=jax.devices()[:8], gather_max=2000,
    )
    x1, _ = s.solve(b, free, np.zeros_like(b), tol=1e-10, maxiter=100)
    ncompiled = len(s._compiled)
    s.update_operator(A.multiply(2.0).tocsr())
    x2, _ = s.solve(2.0 * b, free, np.zeros_like(b), tol=1e-10, maxiter=100)
    assert len(s._compiled) == ncompiled  # no recompile
    assert np.linalg.norm(x2 - x1) / np.linalg.norm(x1) < 1e-9


def test_solver_layer_routes_lattice_gmg():
    """distributed=true on a UnitCubeMesh P1 case uses the lattice GMG
    halo solver and matches the serial solve."""
    from fenicssolver_tpu.solvers.scalar_transport import ScalarTransportSolver
    from tests.test_heat_transfer import base_settings, make_bcs

    mesh = UnitCubeMesh(16, 16, 16)
    Q = FunctionSpace(mesh, "CG", 1)
    s = base_settings(Q, make_bcs())
    serial = ScalarTransportSolver(s)
    T_serial = serial.solve()

    s2 = base_settings(Q, make_bcs())
    s2["solver_settings"]["solver_parameters"]["distributed"] = True
    dist = ScalarTransportSolver(s2)
    T_dist = dist.solve()
    assert getattr(dist, "_lattice_halo_solver", None) is not None
    err = np.linalg.norm(T_dist.values - T_serial.values) / np.linalg.norm(
        T_serial.values
    )
    assert err < 1e-9, err


def test_lattice_halo_two_axis_mesh():
    """The same solver over a (2, 4) device mesh with DISTINCT axis names
    (DCN-ready topology): collectives take the axis-name tuple, so
    multi-slice is a config change, not a rewrite (ROADMAP item 7)."""
    assert len(jax.devices()) >= 8
    n = 16
    A, b, free = _poisson_csr(n)
    s = LatticeHaloSolver(
        A, {"n": (n, n, n), "extent": (1.0, 1.0, 1.0)},
        devices=jax.devices()[:8], gather_max=2000,
        mesh_axes=(("dcn", 2), ("ici", 4)),
    )
    assert s._axes == ("dcn", "ici")
    x, it = s.solve(b, free, np.zeros_like(b), tol=1e-10, maxiter=100)
    x_ref = _serial(A, b, free, np.zeros_like(b))
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-9, err


def _elasticity_csr(n, mu=1.0, lam=1.5):
    import jax.numpy as jnp

    from fenicssolver_tpu.core import UnitCubeMesh
    from fenicssolver_tpu.core.spaces import VectorFunctionSpace
    from fenicssolver_tpu.ops import assembly, geometry

    mesh = UnitCubeMesh(n, n, n)
    V = VectorFunctionSpace(mesh, "CG", 1)
    tab = geometry.basis_tables(3, 1, 2)
    phi = jnp.asarray(tab.phi)
    dphi = jnp.asarray(tab.dphi)
    qw = jnp.asarray(tab.qw)
    d = 3
    ks = phi.shape[1]
    I = jnp.eye(d)
    f = jnp.array([0.0, 0.0, -1.0])

    def kern(ue, geom, aux):
        U = ue.reshape(ks, d)
        dphig = geometry.phys_grads(dphi, geom.Jinv)
        gU = jnp.einsum("qkg,kv->qvg", dphig, U)
        eps = 0.5 * (gU + jnp.swapaxes(gU, 1, 2))
        sig = 2 * mu * eps + lam * jnp.trace(
            eps, axis1=1, axis2=2
        )[:, None, None] * I
        wdet = qw * geom.detJ
        r = jnp.einsum("q,qvg,qkg->kv", wdet, sig, dphig)
        fq = jnp.broadcast_to(f, (phi.shape[0], d))
        return (r - jnp.einsum("q,qv,qk->kv", wdet, fq, phi)).reshape(-1)

    ctx = geometry.build_cell_context(V, 2)
    form = sp.coo_matrix  # placeholder to appease linters
    from fenicssolver_tpu.ops.assembly import CellTerm, Form

    form = Form(space=V)
    form.cell_terms.append(CellTerm(kernel=kern, ctx=ctx))
    form.finalize()
    from fenicssolver_tpu.ops import assembly as asmb

    A, b = asmb.assemble_linear_system(form)
    dd = asmb.DirichletData(V.ndof)
    dd.add(V.facet_dofs(mesh.exterior_facets()), 0.0)
    dd.finalize()
    return mesh, V, A, b, dd


def test_vector_lattice_matches_direct_and_iters_flat():
    """Sharded VECTOR GMG-CG (elasticity block taps): mesh-near-independent
    iterations, 1e-10 vs a direct solve."""
    from fenicssolver_tpu.parallel.lattice import LatticeHaloVectorSolver

    assert len(jax.devices()) >= 8
    iters_seen = []
    for n in (16, 24):
        mesh, V, A, b, dd = _elasticity_csr(n)
        s = LatticeHaloVectorSolver(
            A, mesh.lattice_info, 1.0, 1.5,
            devices=jax.devices()[:8], gather_max=3000,
        )
        x, it = s.solve(
            np.asarray(b), np.asarray(dd.free_mask), np.asarray(dd.u_bc),
            tol=1e-10, maxiter=100,
        )
        As = A.to_scipy()
        fr = np.asarray(dd.free_mask)
        Af = (sp.diags(fr) @ As @ sp.diags(fr) + sp.diags(1 - fr)).tocsr()
        # Jacobi-CG reference (a 3D vector direct factorization at 47k
        # dofs takes minutes and GBs of fill)
        Mj = sp.diags(1.0 / Af.diagonal())
        xr, code = spl.cg(
            Af, fr * np.asarray(b), rtol=1e-13, maxiter=20000, M=Mj
        )
        assert code == 0
        err = np.linalg.norm(x - xr) / np.linalg.norm(xr)
        assert err < 1e-8, (n, err)
        iters_seen.append(it)
    assert max(iters_seen) <= 25, iters_seen
    assert iters_seen[1] <= iters_seen[0] + 5, iters_seen


def test_solver_layer_routes_vector_lattice():
    """LinearElasticitySolver with distributed=true on a UnitCubeMesh uses
    the sharded vector GMG and matches serial."""
    from fenicssolver_tpu.core import AutoSubDomain, near
    from fenicssolver_tpu.core.spaces import VectorFunctionSpace
    from fenicssolver_tpu.solvers.linear_elasticity import (
        LinearElasticitySolver,
    )

    mesh = UnitCubeMesh(16, 16, 16)
    V = VectorFunctionSpace(mesh, "CG", 1)
    from fenicssolver_tpu.core import AutoSubDomain

    whole = AutoSubDomain(lambda x: True)

    def settings():
        return {
            "solver_name": "LinearElasticitySolver",
            "function_space": V,
            "boundary_conditions": {
                "fixed": {
                    "boundary": whole,
                    "boundary_id": 1,
                    "values": [
                        {"variable": "displacement", "type": "Dirichlet",
                         "value": (0.0, 0.0, 0.0)}
                    ],
                }
            },
            "body_source": (0.0, 0.0, -9.8e3),
            "material": {
                "elastic_modulus": 200e9, "poisson_ratio": 0.3,
                "density": 7800.0,
            },
            "solver_settings": {
                "transient_settings": {"transient": False},
                "reference_values": {},
                "solver_parameters": {
                    "relative_tolerance": 1e-11,
                    "maximum_iterations": 500,
                },
            },
            "vector_name": "displacement",
            "report_settings": {"logging_level": 40, "plotting_freq": 0,
                                "saving_freq": 0},
        }

    serial = LinearElasticitySolver(settings())
    u_serial = serial.solve()

    s2 = settings()
    s2["solver_settings"]["solver_parameters"]["distributed"] = True
    dist = LinearElasticitySolver(s2)
    u_dist = dist.solve()
    from fenicssolver_tpu.parallel.lattice import LatticeHaloVectorSolver

    assert isinstance(
        getattr(dist, "_lattice_halo_solver", None), LatticeHaloVectorSolver
    )
    err = np.linalg.norm(u_dist.values - u_serial.values) / np.linalg.norm(
        u_serial.values
    )
    assert err < 1e-8, err


def test_vector_lattice_free_surface_engages():
    """Round-4 (VERDICT r3 item 7): a free-surface (cantilever-style) mask
    now ENGAGES the sharded vector GMG — the truncated-tap hierarchy
    (exact boundary blocks, Galerkin by P1 nesting) replaces the
    rediscretized-constant-tap one whose V-cycle stalled at ~0.17
    residual and forced the old fully-clamped gate + halo-CG fallback."""
    from fenicssolver_tpu.core import AutoSubDomain, near
    from fenicssolver_tpu.core.spaces import VectorFunctionSpace
    from fenicssolver_tpu.parallel.lattice import LatticeHaloVectorSolver
    from fenicssolver_tpu.solvers.linear_elasticity import (
        LinearElasticitySolver,
    )

    mesh = UnitCubeMesh(16, 16, 16)
    V = VectorFunctionSpace(mesh, "CG", 1)
    bottom = AutoSubDomain(lambda x: near(x[2], 0.0))
    s = {
        "solver_name": "LinearElasticitySolver",
        "function_space": V,
        "boundary_conditions": {
            "fixed": {
                "boundary": bottom,
                "boundary_id": 1,
                "values": [
                    {"variable": "displacement", "type": "Dirichlet",
                     "value": (0.0, 0.0, 0.0)}
                ],
            }
        },
        "body_source": (0.0, 0.0, -9.8e3),
        "material": {
            "elastic_modulus": 200e9, "poisson_ratio": 0.3,
            "density": 7800.0,
        },
        "solver_settings": {
            "transient_settings": {"transient": False},
            "reference_values": {},
            "solver_parameters": {
                "relative_tolerance": 1e-10,
                "maximum_iterations": 4000,
                "distributed": True,
            },
        },
        "vector_name": "displacement",
        "report_settings": {"logging_level": 40, "plotting_freq": 0,
                            "saving_freq": 0},
    }
    dist = LinearElasticitySolver(s)
    u = dist.solve()
    assert isinstance(
        getattr(dist, "_lattice_halo_solver", None), LatticeHaloVectorSolver
    )
    assert dist.last_iterations <= 40, dist.last_iterations
    assert np.isfinite(u.values).all()
    # tip deflection downward under gravity
    assert u.values.reshape(-1, 3)[:, 2].min() < 0
    # matches the serial solve (same case, distributed off)
    import copy

    s2 = copy.deepcopy({k: v for k, v in s.items() if k != "function_space"})
    s2["function_space"] = V
    s2["solver_settings"]["solver_parameters"]["distributed"] = False
    serial = LinearElasticitySolver(s2)
    u_s = serial.solve()
    err = np.linalg.norm(u.values - u_s.values) / np.linalg.norm(u_s.values)
    assert err < 1e-8, err


def test_pencil_matches_serial_and_iters_flat():
    """2-D pencil decomposition (ROADMAP item 8): x AND y sharded over a
    (4, 2) device mesh — interface strips instead of full planes — with
    the SAME mesh-independent GMG iteration counts and serial accuracy."""
    from fenicssolver_tpu.parallel.lattice import LatticePencilSolver

    assert len(jax.devices()) >= 8
    iters_seen = []
    for n in (16, 32):
        A, b, free = _poisson_csr(n)
        s = LatticePencilSolver(
            A, {"n": (n, n, n), "extent": (1.0, 1.0, 1.0)},
            devices=jax.devices()[:8], gather_max=2000,
        )
        assert (s.ndx, s.ndy) == (4, 2)
        x, it = s.solve(b, free, np.zeros_like(b), tol=1e-10, maxiter=100)
        x_ref = _serial(A, b, free, np.zeros_like(b))
        err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
        assert err < 1e-9, (n, err)
        iters_seen.append(it)
    assert max(iters_seen) <= 15, iters_seen
    assert iters_seen[1] <= iters_seen[0] + 3, iters_seen


def test_pencil_variable_coefficient_and_nonzero_dirichlet():
    """Pencil CG matvec uses the TRUE assembled fields (10:1 coefficient
    jump) and nonzero Dirichlet data flows through the constrained rhs."""
    from fenicssolver_tpu.parallel.lattice import LatticePencilSolver

    assert len(jax.devices()) >= 8
    n = 16
    rng = np.random.default_rng(0)
    kf = 1.0 + 9.0 * rng.random(6 * n**3)
    A, b, free = _poisson_csr(n, kf)
    s = LatticePencilSolver(
        A, {"n": (n, n, n), "extent": (1.0, 1.0, 1.0)},
        devices=jax.devices()[:8], gather_max=2000,
    )
    x, it = s.solve(b, free, np.zeros_like(b), tol=1e-10, maxiter=200)
    x_ref = _serial(A, b, free, np.zeros_like(b))
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-8

    # Laplace with u = x on the boundary -> u = x everywhere
    A2, b2, free2 = _poisson_csr(n)
    shape3 = (n + 1,) * 3
    X = np.linspace(0, 1, n + 1)
    ubc3 = np.broadcast_to(X[:, None, None], shape3).copy()
    ubc = np.where(free2 < 0.5, ubc3.ravel(), 0.0)
    s2 = LatticePencilSolver(
        A2, {"n": (n, n, n), "extent": (1.0, 1.0, 1.0)},
        devices=jax.devices()[:8], gather_max=2000,
    )
    x2, _ = s2.solve(np.zeros_like(b2), free2, ubc, tol=1e-10, maxiter=100)
    assert np.abs(x2 - ubc3.ravel()).max() < 1e-8


def test_pencil_anisotropic_lattice_and_mesh_shape():
    """Non-cubic lattice (24, 16, 8) with unequal extents over an explicit
    (2, 4) pencil grid: cuts, masks, and transfers must all honour the
    per-axis sizes."""
    from fenicssolver_tpu.parallel.lattice import LatticePencilSolver
    from fenicssolver_tpu.ops.structured import (
        LatticePattern, box_cells, box_tet_geometry,
    )

    assert len(jax.devices()) >= 8
    nx, ny, nz = 24, 16, 8
    ex, ey, ez = 3.0, 2.0, 1.0
    ndof = (nx + 1) * (ny + 1) * (nz + 1)
    cells = box_cells(nx, ny, nz)
    Jinv, detJ = box_tet_geometry(nx, ny, nz, dtype=np.float64,
                                  extent=(ex, ey, ez))
    gref = np.array([[-1.0, -1, -1], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    g = np.einsum("kt,ctg->ckg", gref, Jinv)
    Ae = np.einsum("cig,cjg,c->cij", g, g, detJ / 6.0)
    rows = np.repeat(cells, 4, axis=1).ravel()
    cols = np.tile(cells, (1, 4)).ravel()
    A = sp.coo_matrix((Ae.ravel(), (rows, cols)),
                      shape=(ndof, ndof)).tocsr()
    b = np.zeros(ndof)
    np.add.at(b, cells.ravel(), np.repeat(detJ / 6.0 / 4.0, 4))
    pat = LatticePattern(nx, ny, nz)
    free = np.ones(ndof)
    free[pat.boundary_vertices()] = 0.0

    s = LatticePencilSolver(
        A, {"n": (nx, ny, nz), "extent": (ex, ey, ez)},
        devices=jax.devices()[:8], gather_max=500, mesh_shape=(2, 4),
    )
    x, it = s.solve(b, free, np.zeros_like(b), tol=1e-10, maxiter=100)
    x_ref = _serial(A, b, free, np.zeros_like(b))
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-9, err
    assert it <= 15, it


def test_solver_layer_routes_pencil():
    """distributed='pencil' routes the same case through the 2-D pencil
    decomposition and matches the serial solve."""
    from fenicssolver_tpu.parallel.lattice import LatticePencilSolver
    from fenicssolver_tpu.solvers.scalar_transport import ScalarTransportSolver
    from tests.test_heat_transfer import base_settings, make_bcs

    mesh = UnitCubeMesh(16, 16, 16)
    Q = FunctionSpace(mesh, "CG", 1)
    s = base_settings(Q, make_bcs())
    T_serial = ScalarTransportSolver(s).solve()

    s2 = base_settings(Q, make_bcs())
    s2["solver_settings"]["solver_parameters"]["distributed"] = "pencil"
    dist = ScalarTransportSolver(s2)
    T_dist = dist.solve()
    assert isinstance(
        getattr(dist, "_lattice_halo_solver", None), LatticePencilSolver
    )
    err = np.linalg.norm(T_dist.values - T_serial.values) / np.linalg.norm(
        T_serial.values
    )
    assert err < 1e-9, err
