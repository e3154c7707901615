"""Smoothed-aggregation AMG tests (reference ``solve_amg`` parity,
``SolverBase.py:643-705``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fenicssolver_tpu.core import (
    AutoSubDomain,
    BoxMesh,
    Constant,
    FunctionSpace,
    Point,
    UnitCubeMesh,
    VectorFunctionSpace,
    near,
)
from fenicssolver_tpu.la import krylov
from fenicssolver_tpu.la.amg import AMGPreconditioner, rigid_body_modes
from fenicssolver_tpu.ops import assembly, geometry


def _poisson_system(n=14):
    mesh = UnitCubeMesh(n, n, n)
    V = FunctionSpace(mesh, "CG", 1)
    tab = geometry.basis_tables(3, 1, 2)
    phi, dphi, qw = (jnp.asarray(tab.phi), jnp.asarray(tab.dphi),
                     jnp.asarray(tab.qw))

    def kernel(ue, geom, aux):
        dphig = geometry.phys_grads(dphi, geom.Jinv)
        g = geometry.interp_grad(dphig, ue)
        return (jnp.einsum("q,qg,qig->i", qw, g, dphig)
                - jnp.einsum("q,qi->i", qw, phi)) * geom.detJ

    ctx = geometry.build_cell_context(V, 2)
    form = assembly.Form(space=V)
    form.cell_terms.append(assembly.CellTerm(kernel=kernel, ctx=ctx))
    form.finalize()
    A, b = assembly.assemble_linear_system(form)
    dd = assembly.DirichletData(V.ndof)
    dd.add(V.facet_dofs(mesh.exterior_facets()), 0.0)
    dd.finalize()
    return A, b, dd


def test_amg_accelerates_poisson():
    A, b, dd = _poisson_system(14)
    Ac = assembly.constrain_csr(A, dd.free_mask)
    rhs = assembly.constrained_rhs(A.matvec, b, dd.free_mask, dd.u_bc)
    amg = AMGPreconditioner(Ac.to_scipy(), free_mask=np.asarray(dd.free_mask))
    # hierarchy actually coarsens
    sizes = [
        int(l["A"].n if hasattr(l["A"], "n") else l["A"].pattern.n)
        for l in amg.levels
    ]
    assert len(sizes) >= 1 and sizes[0] > 4 * (
        amg.coarse_dense.shape[0] if len(sizes) == 1 else sizes[-1] // 4
    )
    x_amg, it_amg, res = krylov.cg(Ac.matvec, rhs, M=amg, tol=1e-10, maxiter=200)
    diag = dd.free_mask * A.diagonal() + (1 - dd.free_mask)
    x_j, it_j, _ = krylov.cg(
        Ac.matvec, rhs, M=krylov.jacobi_preconditioner(diag),
        tol=1e-10, maxiter=3000,
    )
    assert float(res) < 1e-9
    assert int(it_amg) < int(it_j) / 2  # at least 2x fewer iterations
    err = np.linalg.norm(np.asarray(x_amg - x_j)) / np.linalg.norm(np.asarray(x_j))
    assert err < 1e-8


def test_solve_amg_elasticity_with_nullspace():
    """3D cantilever through the solver's AMG path with rigid-body modes."""
    from fenicssolver_tpu.solvers.linear_elasticity import LinearElasticitySolver
    from tests.test_linear_elasticity import solver_settings, E_mod

    L = 5.0
    mesh = BoxMesh(Point(0, 0, 0), Point(L, 1, 1), 15, 3, 3)
    V = VectorFunctionSpace(mesh, "CG", 1)
    left = AutoSubDomain(lambda x: near(x[0], 0.0))
    right = AutoSubDomain(lambda x: near(x[0], L))
    Fy = 1e6
    bcs = {
        "fixed": {"boundary": left, "boundary_id": 1, "type": "Dirichlet",
                  "value": Constant((0, 0, 0))},
        "tip": {"boundary": right, "boundary_id": 2, "type": "force",
                "value": (0.0, Fy, 0.0)},
    }
    settings = solver_settings(V, bcs)
    solver = LinearElasticitySolver(settings)
    # force the AMG path regardless of size threshold
    solver.solve_form = lambda F, u_, bcs_: solver.solve_amg(F, u_, bcs_)
    u = solver.solve()
    U = u.values.reshape(-1, 3)
    assert np.isfinite(U).all()
    X = V.scalar_space.dof_coords
    tip = np.abs(X[:, 0] - L) < 1e-9
    tip_defl = U[tip, 1].mean()
    I = 1.0 / 12.0
    beam = Fy * L**3 / (3 * E_mod * I)
    # P1 shear-locking underestimates; just require the right ballpark
    assert 0.3 * beam < tip_defl < 1.5 * beam, (tip_defl, beam)


def test_rigid_body_modes_in_kernel():
    """K @ rigid-body modes ~ 0 for an unconstrained elasticity operator."""
    from fenicssolver_tpu.solvers.linear_elasticity import LinearElasticitySolver
    from tests.test_linear_elasticity import solver_settings

    mesh = BoxMesh(Point(0, 0, 0), Point(1, 1, 1), 3, 3, 3)
    V = VectorFunctionSpace(mesh, "CG", 1)
    bcs = {}
    solver = LinearElasticitySolver(solver_settings(V, bcs))
    solver.init_solver()
    solver.current_step, solver.current_time = 0, 0.0
    form, dd = solver.generate_form(0, None, None, solver.w_current, solver.w_prev)
    A, _ = assembly.assemble_linear_system(form)
    B = rigid_body_modes(V.scalar_space.dof_coords, 3)
    KB = np.stack([np.asarray(A.matvec(jnp.asarray(B[:, j]))) for j in range(6)])
    scale = float(jnp.abs(A.data).max())
    assert np.abs(KB).max() < 1e-8 * scale


def test_amg_routing_from_solver_parameters():
    """solver_parameters.preconditioner = "amg" routes ANY solver's linear
    solves through the SA-AMG V-cycle (the reference only wires petsc_amg
    into 3D elasticity): same answer as Jacobi-PCG, far fewer iterations."""
    from fenicssolver_tpu.core import FunctionSpace, UnitSquareMesh
    from fenicssolver_tpu.solvers.scalar_transport import ScalarTransportSolver
    from tests.test_heat_transfer import base_settings, make_bcs

    mesh = UnitSquareMesh(40, 40)
    Q = FunctionSpace(mesh, "CG", 1)

    s = base_settings(Q, make_bcs())
    serial = ScalarTransportSolver(s)
    serial.material["conductivity"] = 0.6
    # force the iterative path (DENSE_LIMIT covers this size by default)
    import unittest.mock as mock

    with mock.patch("fenicssolver_tpu.solvers.solver_base.DENSE_LIMIT", 500):
        T_ref = serial.solve()

    s2 = base_settings(Q, make_bcs())
    s2["solver_settings"]["solver_parameters"]["preconditioner"] = "amg"
    amg_solver = ScalarTransportSolver(s2)
    amg_solver.material["conductivity"] = 0.6
    built = []
    orig_init = AMGPreconditioner.__init__

    def counting_init(self, *a, **k):
        built.append(1)
        return orig_init(self, *a, **k)

    with mock.patch("fenicssolver_tpu.solvers.solver_base.DENSE_LIMIT", 500), \
            mock.patch.object(AMGPreconditioner, "__init__", counting_init):
        T = amg_solver.solve()
    assert built, "AMG preconditioner was never constructed"
    err = np.linalg.norm(T.values - T_ref.values) / np.linalg.norm(
        T_ref.values
    )
    assert err < 1e-7, err


def test_amg_f32_hierarchy_stays_f32():
    """An f32 operator must get an f32 V-cycle: one f64 level array
    promotes every Krylov iteration's preconditioner application, which
    on TPU means X64-split emulation (2x memory, many-x slower) inside
    the IPCS scan.  Host setup math stays f64; only the DEVICE arrays
    are cast.  Also pins that f32 AMG-PCG still converges."""
    A, b, dd = _poisson_system(10)
    Ac = assembly.constrain_csr(A, dd.free_mask)
    sp32 = Ac.to_scipy().astype(np.float32)
    amg = AMGPreconditioner(sp32, free_mask=np.asarray(dd.free_mask))

    def leaf_dtypes(obj):
        for name in ("tiles", "data"):
            if hasattr(obj, name):
                return [getattr(obj, name).dtype]
        if isinstance(obj, dict):
            return [d for v in obj.values() for d in leaf_dtypes(v)]
        if hasattr(obj, "dtype"):
            return [obj.dtype]
        return []

    dts = [d for lv in amg.levels for d in leaf_dtypes(lv)]
    if amg.coarse_dense is not None:
        dts.append(amg.coarse_dense.dtype)
    if amg._coarse_cheb is not None:
        dts += leaf_dtypes(amg._coarse_cheb)
    assert dts and all(d == np.float32 for d in dts), dts

    z = amg(jnp.ones(A.shape[0], jnp.float32))
    assert z.dtype == jnp.float32

    rhs = assembly.constrained_rhs(
        A.matvec, b, dd.free_mask, dd.u_bc
    ).astype(jnp.float32)
    Ac32 = Ac._replace(data=Ac.data.astype(jnp.float32))
    x, it, res = krylov.cg(
        Ac32.matvec, rhs, M=amg, tol=1e-5, maxiter=100
    )
    assert x.dtype == jnp.float32
    assert float(res) < 1e-5 * float(jnp.linalg.norm(rhs)) * 10
    assert int(it) < 40
