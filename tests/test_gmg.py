"""Geometric multigrid (la/gmg.py): stencil exactness, transfer adjointness,
and GMG-PCG convergence vs Jacobi-PCG on the flagship Poisson problem."""

import jax.numpy as jnp
import numpy as np
import pytest

from fenicssolver_tpu.core import FunctionSpace, UnitCubeMesh
from fenicssolver_tpu.la import gmg, krylov
from fenicssolver_tpu.ops import assembly, geometry
from fenicssolver_tpu.ops.structured import LatticePattern, box_tet_geometry


def _poisson(n):
    mesh = UnitCubeMesh(n, n, n)
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
    bd = V.facet_dofs(mesh.exterior_facets())
    dd = assembly.DirichletData(V.ndof)
    dd.add(bd, 0.0)
    dd.finalize()
    return mesh, V, A, b, dd


def test_stencil_matches_assembled_operator():
    n = 6
    mesh, V, A, b, dd = _poisson(n)
    shape3 = (n + 1,) * 3
    coefs = gmg.p1_box_stencil(1.0 / n, 1.0 / n, 1.0 / n)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(V.ndof)
    x[np.asarray(dd.free_mask) == 0] = 0.0  # zero on Dirichlet boundary
    y_stencil = np.asarray(
        gmg.stencil_apply(jnp.asarray(x).reshape(shape3), jnp.asarray(coefs))
    ).ravel()
    y_assembled = np.asarray(A.matvec(jnp.asarray(x)))
    free = np.asarray(dd.free_mask) > 0
    err = np.linalg.norm((y_stencil - y_assembled)[free]) / np.linalg.norm(
        y_assembled[free]
    )
    assert err < 1e-12, err


def test_variable_stencil_assembly_matches_generic():
    """The slice-add stencil assembly (96 static adds via
    ``stencil_entry_table``) must reproduce the generic element->CSR
    assembled operator entry-for-entry, including boundary rows.  This is
    the correctness anchor for the bench's scatter-free fast path."""
    from fenicssolver_tpu.ops.structured import (
        TET_PATHS,
        stencil_entry_table,
    )

    n = 5
    mesh, V, A, b, dd = _poisson(n)
    N = n + 1
    Jinv, detJ = box_tet_geometry(n, n, n, dtype=np.float64)
    gref = np.array([[-1.0, -1, -1], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    g = np.einsum("kt,ctg->ckg", gref, Jinv)
    Ae = np.einsum("cig,cjg,c->ijc", g, g, detJ / 6.0)
    Ae6 = Ae.reshape(4, 4, 6, n, n, n)
    coef = np.zeros((len(gmg.OFFSETS_T), N, N, N))
    for t, a, bb, oi, ca in stencil_entry_table():
        coef[oi, ca[0]:ca[0] + n, ca[1]:ca[1] + n, ca[2]:ca[2] + n] += (
            Ae6[a, bb, t]
        )
    rng = np.random.default_rng(1)
    x = rng.standard_normal(V.ndof)
    y_stencil = np.asarray(
        gmg.stencil_apply(jnp.asarray(x).reshape(N, N, N), jnp.asarray(coef))
    ).ravel()
    y_assembled = np.asarray(A.matvec(jnp.asarray(x)))
    err = np.linalg.norm(y_stencil - y_assembled) / np.linalg.norm(y_assembled)
    assert err < 1e-12, err
    # rhs: f = 1 load vector via the same slice adds
    detJ6 = detJ.reshape(6, n, n, n)
    b3 = np.zeros((N, N, N))
    for t, path in enumerate(TET_PATHS):
        for ca in path:
            b3[ca[0]:ca[0] + n, ca[1]:ca[1] + n, ca[2]:ca[2] + n] += (
                detJ6[t] / 24.0
            )
    err_b = np.linalg.norm(b3.ravel() - np.asarray(b)) / np.linalg.norm(b)
    assert err_b < 1e-12, err_b


def test_factored_scalar_tables_match_generic():
    """The geometry-factorized scalar assembly (46 grouped pads of 60
    weighted per-type coefficient-field terms, ``scalar_stencil_tables``)
    must reproduce the generic 96-entry slice-add assembly exactly for an
    ARBITRARY per-cell coefficient field — the correctness anchor for the
    bench's BENCH_ASSEMBLY=factored default."""
    from fenicssolver_tpu.ops.structured import (
        scalar_stencil_tables,
        stencil_entry_table,
    )

    n = 5
    N = n + 1
    rng = np.random.default_rng(3)
    Jinv, detJ = box_tet_geometry(n, n, n, dtype=np.float64)
    detJ = detJ * (1.0 + 0.4 * rng.random(detJ.shape))  # per-cell variation
    gref = np.array([[-1.0, -1, -1], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    g = np.einsum("kt,ctg->ckg", gref, Jinv)
    Ae = np.einsum("cig,cjg,c->ijc", g, g, detJ / 6.0)
    Ae6 = Ae.reshape(4, 4, 6, n, n, n)
    coef_ref = np.zeros((len(gmg.OFFSETS_T), N, N, N))
    for t, a, bb, oi, ca in stencil_entry_table():
        coef_ref[oi, ca[0]:ca[0] + n, ca[1]:ca[1] + n, ca[2]:ca[2] + n] += (
            Ae6[a, bb, t]
        )
    _, det_t = box_tet_geometry(1, 1, 1, extent=(1.0 / n,) * 3,
                                dtype=np.float64)
    s6 = detJ.reshape(6, n, n, n) / det_t[:, None, None, None]
    coef_f = np.zeros_like(coef_ref)
    for oi, ca, w in scalar_stencil_tables(n, n, n):
        blk = sum(w[t] * s6[t] for t in range(6) if abs(w[t]) > 1e-14)
        coef_f[oi, ca[0]:ca[0] + n, ca[1]:ca[1] + n, ca[2]:ca[2] + n] += blk
    err = np.abs(coef_f - coef_ref).max() / np.abs(coef_ref).max()
    assert err < 1e-13, err


def test_transfer_adjointness():
    """restrict3 == prolong3^T (required for an SPD V-cycle)."""
    rng = np.random.default_rng(1)
    fine = jnp.asarray(rng.standard_normal((9, 9, 9)))
    coarse = jnp.asarray(rng.standard_normal((5, 5, 5)))
    lhs = float(jnp.vdot(gmg.prolong3(coarse), fine))
    rhs = float(jnp.vdot(coarse, gmg.restrict3(fine)))
    assert lhs == pytest.approx(rhs, rel=1e-12)


def test_gmg_pcg_matches_jacobi_and_converges_fast():
    n = 16
    mesh, V, A, b, dd = _poisson(n)
    op = assembly.constrained_operator(A.matvec, dd.free_mask)
    rhs = assembly.constrained_rhs(A.matvec, b, dd.free_mask, dd.u_bc)
    diag = dd.free_mask * A.diagonal() + (1 - dd.free_mask)

    x_j, it_j, _ = krylov.cg(
        op, rhs, M=krylov.jacobi_preconditioner(diag), tol=1e-10, maxiter=2000
    )
    G = gmg.build_gmg(n, n, n)
    x_g, it_g, res_g = krylov.cg(
        op, rhs, M=gmg.preconditioner(G), tol=1e-10, maxiter=200
    )
    err = np.linalg.norm(np.asarray(x_g) - np.asarray(x_j)) / np.linalg.norm(
        np.asarray(x_j)
    )
    assert err < 1e-8, err
    assert it_g <= 20, f"GMG-PCG took {it_g} iterations"
    assert it_g < it_j / 3, (it_g, it_j)


def test_gmg_anisotropic_box():
    """Non-cubic extents/counts: stencil and hierarchy still correct."""
    from fenicssolver_tpu.core import BoxMesh, Point

    nx, ny, nz = 8, 8, 4
    mesh = BoxMesh(Point(0, 0, 0), Point(2.0, 1.0, 1.0), nx, ny, nz)
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
    bd = V.facet_dofs(mesh.exterior_facets())
    dd = assembly.DirichletData(V.ndof)
    dd.add(bd, 0.0)
    dd.finalize()
    op = assembly.constrained_operator(A.matvec, dd.free_mask)
    rhs = assembly.constrained_rhs(A.matvec, b, dd.free_mask, dd.u_bc)
    diag = dd.free_mask * A.diagonal() + (1 - dd.free_mask)
    x_ref, _, _ = krylov.cg(
        op, rhs, M=krylov.jacobi_preconditioner(diag), tol=1e-12, maxiter=2000
    )
    G = gmg.build_gmg(nx, ny, nz, extent=(2.0, 1.0, 1.0), coarse_max=200)
    assert len(G.levels) >= 1  # actually exercises transfer + coarse solve
    x_g, it_g, _ = krylov.cg(
        op, rhs, M=gmg.preconditioner(G), tol=1e-12, maxiter=200
    )
    err = np.linalg.norm(np.asarray(x_g) - np.asarray(x_ref)) / np.linalg.norm(
        np.asarray(x_ref)
    )
    assert err < 1e-8, err
    assert it_g <= 30, it_g


def test_structured_pattern_matches_native():
    """LatticePattern CSR == the generic global-sort pattern (bench setup)."""
    from fenicssolver_tpu import native

    mesh = UnitCubeMesh(5, 4, 3)
    V = FunctionSpace(mesh, "CG", 1)
    cd = np.asarray(V.cell_dofs)
    rows = np.repeat(cd, 4, axis=1).ravel().astype(np.int64)
    cols = np.tile(cd, (1, 4)).ravel().astype(np.int64)
    inv_g, indptr_g, indices_g, _ = native.build_csr_pattern(keys := rows * V.ndof + cols, V.ndof)
    pat = LatticePattern(5, 4, 3)
    assert np.array_equal(pat.indptr, indptr_g)
    assert np.array_equal(pat.indices, np.asarray(indices_g))
    assert np.array_equal(
        pat.entry_slots(rows.astype(np.int32), cols.astype(np.int32)),
        np.asarray(inv_g),
    )
    assert np.array_equal(
        np.unique(V.facet_dofs(mesh.exterior_facets())),
        np.sort(pat.boundary_vertices()),
    )
    Jinv_s, detJ_s = box_tet_geometry(5, 4, 3, dtype=np.float64)
    X = mesh.coords[mesh.cells_array]
    J = np.swapaxes(X[:, 1:, :] - X[:, :1, :], 1, 2)
    assert np.allclose(np.linalg.inv(J), Jinv_s)
    assert np.allclose(np.abs(np.linalg.det(J)), detJ_s)


def test_elasticity_stencil_and_vector_gmg():
    """Vector P1 elasticity stencil (grouped slice-add assembly from
    material fields, ops/structured.elasticity_stencil_tables) matches the
    generic assembled operator entry-for-entry, and the vector GMG
    (la/gmg_elastic.py) preconditions PCG to 1e-10 in O(10) iterations —
    the bench's vector fast-path correctness anchors."""
    from fenicssolver_tpu.la import gmg_elastic, krylov
    from fenicssolver_tpu.ops.structured import elasticity_stencil_tables
    from tests.test_halo import _assembled_elasticity, _serial

    n = 4
    V, A, b, dd, form = _assembled_elasticity(n)  # mu=1.0, lmbda=1.5
    N = n + 1
    mu3 = np.full((n, n, n), 1.0)
    lam3 = np.full((n, n, n), 1.5)
    coef = np.zeros((15, 3, 3, N, N, N))
    for oi, ca, Bmu, Blam in elasticity_stencil_tables(n, n, n):
        coef[oi, :, :, ca[0]:ca[0] + n, ca[1]:ca[1] + n,
             ca[2]:ca[2] + n] += (
            mu3[None, None] * Bmu[:, :, None, None, None]
            + lam3[None, None] * Blam[:, :, None, None, None]
        )
    rng = np.random.default_rng(0)
    x = rng.standard_normal(V.ndof)
    x3 = jnp.asarray(np.moveaxis(x.reshape(N, N, N, 3), -1, 0))
    cj = jnp.asarray(coef)
    y = None
    for oi, d in enumerate(gmg.OFFSETS_T):
        xs = (x3 if oi == gmg.CENTER_IDX
              else jnp.stack([gmg._shift(x3[j], d) for j in range(3)]))
        t = jnp.stack([
            cj[oi, i, 0] * xs[0] + cj[oi, i, 1] * xs[1] + cj[oi, i, 2] * xs[2]
            for i in range(3)
        ])
        y = t if y is None else y + t
    y_flat = np.moveaxis(np.asarray(y), 0, -1).ravel()
    y_ref = np.asarray(A.matvec(jnp.asarray(x)))
    err = np.linalg.norm(y_flat - y_ref) / np.linalg.norm(y_ref)
    assert err < 1e-12, err

    n2 = 8
    V2, A2, b2, dd2, _ = _assembled_elasticity(n2)
    G = gmg_elastic.build_gmg_elastic(n2, n2, n2, 1.0, 1.5, coarse_max=400)
    op = assembly.constrained_operator(A2.matvec, dd2.free_mask)
    rhs = assembly.constrained_rhs(A2.matvec, b2, dd2.free_mask, dd2.u_bc)
    x2, it, res = krylov.cg(
        op, rhs, M=lambda r: gmg_elastic.vcycle(G, r), tol=1e-10, maxiter=100
    )
    x_ref = _serial(A2, b2, dd2)
    err2 = np.linalg.norm(np.asarray(x2) - x_ref) / np.linalg.norm(x_ref)
    assert err2 < 1e-8, err2
    assert int(it) < 25, int(it)


def test_gmg_routing_from_solver_parameters():
    """preconditioner = "gmg" on a BoxMesh JSON-style case uses the
    lattice multigrid from the solver layer (the bench fast path on the
    actual solver surface), matching the Jacobi reference."""
    import unittest.mock as mock

    from fenicssolver_tpu.core import AutoSubDomain, near
    from fenicssolver_tpu.solvers.scalar_transport import ScalarTransportSolver

    def settings(pc=None):
        mesh = UnitCubeMesh(8, 8, 8)
        V = FunctionSpace(mesh, "CG", 1)
        top = AutoSubDomain(lambda x: near(x[2], 1.0))
        bottom = AutoSubDomain(lambda x: near(x[2], 0.0))
        sp = {"relative_tolerance": 1e-12, "maximum_iterations": 3000}
        if pc:
            sp["preconditioner"] = pc
        return {
            "scalar_name": "temperature", "function_space": V, "mesh": None,
            "boundary_conditions": {
                "hot": {"boundary": top, "boundary_id": 1,
                        "type": "Dirichlet", "value": 360.0},
                "cold": {"boundary": bottom, "boundary_id": 2,
                         "type": "Dirichlet", "value": 300.0},
            },
            "material": {"density": 1000, "specific_heat_capacity": 4200,
                         "thermal_conductivity": 0.6},
            "solver_settings": {
                "transient_settings": {"transient": False},
                "reference_values": {}, "solver_parameters": sp,
            },
            "report_settings": {"logging_level": 40},
        }

    with mock.patch("fenicssolver_tpu.solvers.solver_base.DENSE_LIMIT", 100):
        T_ref = ScalarTransportSolver(settings()).solve()
        solver = ScalarTransportSolver(settings(pc="gmg"))
        T = solver.solve()
    assert hasattr(solver, "_gmg_cache")  # the gmg branch actually ran
    err = np.linalg.norm(T.values - T_ref.values) / np.linalg.norm(
        T_ref.values
    )
    assert err < 1e-9, err


def test_vcycle_scale_equivariant():
    """V-cycle must be exactly scale-equivariant: M(s A) = M(A)/s.  The
    unmasked coarsest identity rows broke this by returning constrained
    residual at UNIT scale (a factor-|A| pollution of the prolongated
    correction — invisible at unit coefficients, fatal at elastic-moduli
    scale ~1e11; round-3 regression)."""
    import jax.numpy as jnp

    from fenicssolver_tpu.la import gmg, gmg_elastic

    rng = np.random.default_rng(0)
    SC = 7.69e10
    r = jnp.asarray(rng.random(17**3))
    G1 = gmg.build_gmg(16, 16, 16, identity_on_constrained=False)
    # conductivity scaling enters through the taps: scale via extent trick
    z1 = np.asarray(gmg.vcycle(G1, r))
    # scalar taps scale linearly with conductivity; emulate with scaled G
    G2 = gmg.GMGData(
        levels=tuple(
            gmg.GMGLevel(
                coefs=lv.coefs * SC, free3=lv.free3,
                inv_diag=lv.inv_diag / SC,
            )
            for lv in G1.levels
        ),
        coarse_inv=G1.coarse_inv / SC,
        shape3=G1.shape3, nu=G1.nu, omega=G1.omega,
        fine_free=G1.fine_free,
    )
    z2 = np.asarray(gmg.vcycle(G2, r))
    assert np.linalg.norm(z2 * SC - z1) / np.linalg.norm(z1) < 1e-12

    rv = jnp.asarray(rng.random(3 * 17**3))
    Ge1 = gmg_elastic.build_gmg_elastic(
        16, 16, 16, 1.0, 1.5, identity_on_constrained=False
    )
    Ge2 = gmg_elastic.build_gmg_elastic(
        16, 16, 16, SC, 1.5 * SC, identity_on_constrained=False
    )
    y1 = np.asarray(gmg_elastic.vcycle(Ge1, rv))
    y2 = np.asarray(gmg_elastic.vcycle(Ge2, rv))
    assert np.linalg.norm(y2 * SC - y1) / np.linalg.norm(y1) < 1e-12


def test_gmg_elastic_free_surface_cantilever_flat_iters():
    """Round-4 (VERDICT r3 item 7): the truncated-tap hierarchy makes the
    vector GMG valid with FREE SURFACES — the reference's own cantilever
    scenario (examples/test_linear_elasticity.py:42).  Checks (a) the
    truncated stencil apply IS the assembled operator, (b) V-cycle-PCG
    iteration counts stay flat under refinement with only one face
    clamped (the constant-tap hierarchy stalled at ~0.17 residual)."""
    import jax.numpy as jnp

    from fenicssolver_tpu.core import UnitCubeMesh, VectorFunctionSpace
    from fenicssolver_tpu.la import krylov
    from fenicssolver_tpu.la.gmg_elastic import (
        build_gmg_elastic,
        stencil_apply_vec_trunc,
        vcycle,
    )
    from fenicssolver_tpu.ops import assembly, geometry

    mu, lam = 1.0, 1.5

    def setup(n):
        mesh = UnitCubeMesh(n, n, n)
        V = VectorFunctionSpace(mesh, "CG", 1)
        tab = geometry.basis_tables(mesh.tdim, 1, 2)
        phi = jnp.asarray(tab.phi)
        dphi = jnp.asarray(tab.dphi)
        qw = jnp.asarray(tab.qw)
        I = jnp.eye(3)
        f = jnp.array([0.0, 0.0, -1.0])

        def kernel(ue, geom, aux):
            U = ue.reshape(4, 3)
            dphig = geometry.phys_grads(dphi, geom.Jinv)
            gradU = jnp.einsum("qkg,kv->qvg", dphig, U)
            eps = 0.5 * (gradU + jnp.swapaxes(gradU, 1, 2))
            sig = 2 * mu * eps + lam * jnp.trace(
                eps, axis1=1, axis2=2
            )[:, None, None] * I
            wdet = qw * geom.detJ
            r = jnp.einsum("q,qvg,qkg->kv", wdet, sig, dphig)
            fq = jnp.broadcast_to(f, (phi.shape[0], 3))
            return (r - jnp.einsum("q,qv,qk->kv", wdet, fq, phi)).reshape(-1)

        ctx = geometry.build_cell_context(V, 2)
        form = assembly.Form(space=V)
        form.cell_terms.append(assembly.CellTerm(kernel=kernel, ctx=ctx))
        form.finalize()
        A, b = assembly.assemble_linear_system(form)
        coords = np.asarray(V.scalar_space.dof_coords)
        clamped = np.nonzero(coords[:, 0] < 1e-12)[0]
        dd = assembly.DirichletData(V.ndof)
        dd.add(
            np.concatenate([clamped * 3, clamped * 3 + 1, clamped * 3 + 2]),
            0.0,
        )
        dd.finalize()
        return V, A, b, dd

    # (a) truncated apply == assembled matvec on the all-free operator
    n = 4
    V, A, b, dd = setup(n)
    G = build_gmg_elastic(
        n, n, n, mu, lam, free3=np.ones((n + 1,) * 3, dtype=bool),
        coarse_max=100,  # 375 vector dofs: force one smoothed level
    )
    assert G.levels and G.levels[0].groups, "truncated mode did not engage"
    x = np.random.default_rng(0).random(V.ndof)
    x3 = jnp.moveaxis(jnp.asarray(x.reshape((n + 1,) * 3 + (3,))), -1, 0)
    y_st = np.moveaxis(
        np.asarray(stencil_apply_vec_trunc(x3, G.levels[0].groups)), 0, -1
    ).ravel()
    y_A = np.asarray(A.matvec(jnp.asarray(x)))
    assert np.abs(y_st - y_A).max() < 1e-12 * np.abs(y_A).max() + 1e-13

    # (b) flat iterations on the cantilever under refinement
    its = []
    for n in (8, 16):
        V, A, b, dd = setup(n)
        free = np.asarray(dd.free_mask)
        free3 = (free.reshape(-1, 3)[:, 0] > 0.5).reshape((n + 1,) * 3)
        G = build_gmg_elastic(n, n, n, mu, lam, free3=free3)
        M = lambda r: vcycle(G, r)
        op = assembly.constrained_operator(A.matvec, dd.free_mask)
        rhs = assembly.constrained_rhs(A.matvec, b, dd.free_mask, dd.u_bc)
        _, it, res = krylov.cg(op, rhs, M=M, tol=1e-10, maxiter=100)
        assert float(res) <= 1e-10
        its.append(int(it))
    assert its[1] <= its[0] + 4, its
