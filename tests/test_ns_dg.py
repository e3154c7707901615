"""DG incompressible Navier-Stokes (solvers/navier_stokes_dg.py — beyond
parity, ROADMAP item 10; the reference has no DG flow solver at all).

Anchors: DG2/DG1 reproduces Poiseuille flow exactly (the SIPG + upwind +
weak-Dirichlet discretization is consistent and the exact solution lies
in the discrete space); global mass balance closes at round-off; the
solution agrees with the CG (Taylor-Hood) solver on the same mesh."""

import copy

import numpy as np
import pytest

from fenicssolver_tpu.solvers.navier_stokes_dg import NSDGSolver
from tests.test_navier_stokes import (
    NU,
    RHO,
    U_MAX,
    channel_settings,
    poiseuille_exact,
)


def dg_settings(nx=6, ny=6):
    s = copy.deepcopy(channel_settings(nx=nx, ny=ny))
    s["solver_name"] = "NSDGSolver"
    return s


def _fields(solver, up):
    W = solver.function_space
    d = solver.mesh.gdim
    u = np.asarray(up.values[W.slice_of(0)]).reshape(-1, d)
    p = np.asarray(up.values[W.slice_of(1)])
    return u, p


def test_dg_turbulence_validation_matches_cg():
    """Unknown turbulence models are rejected unconditionally (even with
    Cs=0), identically to the CG solver; a known model with Cs!=0 gets the
    DG-specific LES-unsupported error (ADVICE r3)."""
    from fenicssolver_tpu.solvers.solver_base import SolverError

    s = dg_settings(nx=4, ny=4)
    s["turbulence_settings"] = {"model": "k-epsilon", "Cs": 0.0}
    with pytest.raises(SolverError, match="k-epsilon"):
        NSDGSolver(s).solve()
    s = dg_settings(nx=4, ny=4)
    s["turbulence_settings"] = {"model": "Smagorinsky", "Cs": 0.17}
    with pytest.raises(SolverError, match="not supported by"):
        NSDGSolver(s).solve()
    # Cs = 0 on a KNOWN model is laminar — accepted, like the CG solver
    s = dg_settings(nx=4, ny=4)
    s["turbulence_settings"] = {"model": "Smagorinsky", "Cs": 0.0}
    up = NSDGSolver(s).solve()
    assert np.isfinite(np.asarray(up.values)).all()


def test_dg_poiseuille_exact():
    s = dg_settings(nx=5, ny=4)
    solver = NSDGSolver(s)
    up = solver.solve()
    u, p = _fields(solver, up)
    W = solver.function_space
    Vv, Q = W.subspaces[0], W.subspaces[1]
    Xv = Vv.scalar_space.dof_coords
    Xp = Q.dof_coords
    u_ex = np.zeros_like(u)
    u_ex[:, 0] = 4 * U_MAX * Xv[:, 1] * (1 - Xv[:, 1])
    dpdx = -8.0 * NU * U_MAX * RHO
    p_ex = dpdx * (Xp[:, 0] - 1.0)
    err_u = np.linalg.norm(u - u_ex) / np.linalg.norm(u_ex)
    err_p = np.linalg.norm(p - p_ex) / np.linalg.norm(p_ex)
    assert err_u < 1e-8, err_u
    assert err_p < 1e-7, err_p


def test_dg_mass_balance_and_cg_agreement():
    """Sharper anchor than grid-convergence: on the same mesh the DG and
    CG (Taylor-Hood) solutions of the exactly-representable channel flow
    coincide, and the DG boundary flux integral closes."""
    from fenicssolver_tpu.ops import assembly, geometry
    from fenicssolver_tpu.solvers.navier_stokes import (
        CoupledNavierStokesSolver,
    )

    import jax.numpy as jnp

    s = dg_settings(nx=4, ny=4)
    solver = NSDGSolver(s)
    up = solver.solve()

    s_cg = copy.deepcopy(channel_settings(nx=4, ny=4))
    cg = CoupledNavierStokesSolver(s_cg)
    up_cg = cg.solve()

    u_dg, p_dg = _fields(solver, up)
    u_cg, p_cg = _fields(cg, up_cg)
    # different dof layouts: compare at shared physical points via the
    # exact fields both must reproduce (P2/DG2 exactness)
    for u, sv in ((u_dg, solver), (u_cg, cg)):
        Xv = sv.function_space.subspaces[0].scalar_space.dof_coords
        u_ex = np.stack(
            [4 * U_MAX * Xv[:, 1] * (1 - Xv[:, 1]), np.zeros(len(Xv))], axis=1
        )
        assert np.linalg.norm(u - u_ex) / np.linalg.norm(u_ex) < 1e-7

    # global mass balance: integral of u.n over the whole boundary ~ 0
    W = solver.function_space
    mesh = solver.mesh
    d = mesh.gdim
    Vv = W.subspaces[0]
    kv = Vv.scalar_space.ndof_el
    qdeg = 4
    ext = mesh.exterior_facets()
    fctx = geometry.build_facet_context(W, ext, qdeg)
    fphi_tab, _, fw, _ = geometry.facet_basis_tables(
        mesh.tdim, Vv.degree, qdeg
    )
    fphi = jnp.asarray(fphi_tab)
    fwj = jnp.asarray(fw)

    def kern(we, geom, aux_e):
        U = we[: kv * d].reshape(kv, d)
        u_q = jnp.einsum("qk,kv->qv", fphi[geom.local_id], U)
        return jnp.sum(
            fwj * geom.detF * jnp.einsum("qv,v->q", u_q, geom.normal)
        )

    flux = float(
        assembly.assemble_functional(
            kern, fctx, u=jnp.asarray(up.values)
        )
    )
    inflow = 4 * U_MAX / 6.0  # integral of the parabola over [0,1]
    assert abs(flux) < 1e-10 * inflow, flux


def test_dg_picard_matches_newton():
    s = dg_settings(nx=4, ny=3)
    newton = NSDGSolver(s)
    up_n = newton.solve()

    s2 = dg_settings(nx=4, ny=3)
    picard = NSDGSolver(s2)
    picard.using_nonlinear_solver = False
    up_p = picard.solve()
    # same discrete solution through two different linearizations
    err = np.linalg.norm(up_p.values - up_n.values) / np.linalg.norm(
        up_n.values
    )
    assert err < 1e-3, err


def test_dg_symmetry_halfchannel_exact():
    """Half-channel with the Poiseuille centerline as a free-slip
    symmetry plane: the DG2/DG1 solution still reproduces the exact
    profile (the Nitsche-on-normal symmetry terms are consistent)."""
    from fenicssolver_tpu.core import (
        AutoSubDomain,
        Expression,
        RectangleMesh,
        near,
    )

    mesh = RectangleMesh((0.0, 0.0), (1.0, 0.5), 5, 3)
    inlet = AutoSubDomain(lambda x: near(x[0], 0.0))
    outlet = AutoSubDomain(lambda x: near(x[0], 1.0))
    center = AutoSubDomain(lambda x: near(x[1], 0.5))
    bottom = AutoSubDomain(lambda x: near(x[1], 0.0))
    parabola = Expression(
        ("umax*4.0*x[1]*(1.0-x[1])", "0"), umax=U_MAX, degree=2
    )
    s = dg_settings()
    s["mesh"] = mesh
    s["boundary_conditions"] = {
        "inlet": {"boundary": inlet, "boundary_id": 1, "values": [
            {"variable": "velocity", "type": "Dirichlet",
             "value": parabola}]},
        "outlet": {"boundary": outlet, "boundary_id": 2, "values": [
            {"variable": "pressure", "type": "Dirichlet", "value": 0.0}]},
        "center": {"boundary": center, "boundary_id": 3, "values": [
            {"variable": "velocity", "type": "symmetry", "value": None}]},
        "bottom": {"boundary": bottom, "boundary_id": 4, "values": [
            {"variable": "velocity", "type": "Dirichlet",
             "value": (0.0, 0.0)}]},
    }
    solver = NSDGSolver(s)
    up = solver.solve()
    u, p = _fields(solver, up)
    Xv = solver.function_space.subspaces[0].scalar_space.dof_coords
    u_ex = np.stack(
        [4 * U_MAX * Xv[:, 1] * (1 - Xv[:, 1]), np.zeros(len(Xv))], axis=1
    )
    err = np.linalg.norm(u - u_ex) / np.linalg.norm(u_ex)
    assert err < 1e-8, err


def test_dg_farfield_outlet_exact():
    """Farfield (zero velocity gradient, traced pressure work) on the
    upper half of the outlet, pressure-Dirichlet gauge on the lower
    half: both closures are consistent with exact Poiseuille, so the
    solution stays exact."""
    from fenicssolver_tpu.core import AutoSubDomain, near

    s = dg_settings(nx=4, ny=4)
    bcs = s["boundary_conditions"]
    out_lo = AutoSubDomain(lambda x: near(x[0], 1.0) and x[1] <= 0.5)
    out_hi = AutoSubDomain(lambda x: near(x[0], 1.0) and x[1] >= 0.5)
    bcs["outlet"] = {"boundary": out_lo, "boundary_id": 2, "values": [
        {"variable": "pressure", "type": "Dirichlet", "value": 0.0}]}
    bcs["outlet_far"] = {"boundary": out_hi, "boundary_id": 5, "values": [
        {"variable": "velocity", "type": "farfield", "value": None}]}
    solver = NSDGSolver(s)
    up = solver.solve()
    u, p = _fields(solver, up)
    Xv = solver.function_space.subspaces[0].scalar_space.dof_coords
    u_ex = np.stack(
        [4 * U_MAX * Xv[:, 1] * (1 - Xv[:, 1]), np.zeros(len(Xv))], axis=1
    )
    err = np.linalg.norm(u - u_ex) / np.linalg.norm(u_ex)
    assert err < 1e-8, err


def test_dg_drag_postproc_exact_wall_shear():
    """The CG solver's calc_drag_and_lift postproc runs unchanged on the
    DG mixed space; on the exactly-resolved channel the wall force IS
    the analytic shear integral (sharper than the CG test's 15% — the
    DG solution is exact, so only quadrature error remains).  Note the
    gradient-form deviation does not matter here: on the walls u = 0
    along the wall, so the extra transpose term integrates to zero."""
    s = dg_settings(nx=4, ny=4)
    solver = NSDGSolver(s)
    up = solver.solve()
    drag, lift = solver.calc_drag_and_lift(up, 0, 1, [3, 4])
    tau_wall = RHO * NU * 4 * U_MAX  # mu * |du/dy| at each wall
    assert abs(abs(drag) - 2 * tau_wall) / (2 * tau_wall) < 1e-8, (
        drag, 2 * tau_wall,
    )
    assert abs(lift) < 1e-8 * tau_wall, lift


def test_dg_unstructured_cylinder_flow():
    """DG NS on a Delaunay mesh (interior-facet machinery off the
    lattice): flow past a cylinder in a channel at Re ~ 20 stays finite,
    conserves mass through the domain, and the cylinder feels a positive
    drag of the CG solution's magnitude."""
    from fenicssolver_tpu.core import AutoSubDomain, Expression, near
    from fenicssolver_tpu.core.meshgen import rectangle_with_hole
    from fenicssolver_tpu.solvers.navier_stokes import (
        CoupledNavierStokesSolver,
    )

    mesh = rectangle_with_hole(
        (0.0, 0.0), (1.2, 0.6), (0.4, 0.3), 0.1, resolution=14
    )
    inlet = AutoSubDomain(lambda x: near(x[0], 0.0))
    outlet = AutoSubDomain(lambda x: near(x[0], 1.2))
    walls = AutoSubDomain(
        lambda x: near(x[1], 0.0) or near(x[1], 0.6)
    )
    cyl = AutoSubDomain(
        lambda x: (x[0] - 0.4) ** 2 + (x[1] - 0.3) ** 2 < 0.125**2
    )
    prof = Expression(
        ("umax*4.0*x[1]*(0.6-x[1])/0.09", "0"), umax=0.1, degree=2
    )
    nu_c = 0.001  # Re = U_mean * D / nu ~ 13
    bcs = {
        "inlet": {"boundary": inlet, "boundary_id": 1, "values": [
            {"variable": "velocity", "type": "Dirichlet", "value": prof}]},
        "outlet": {"boundary": outlet, "boundary_id": 2, "values": [
            {"variable": "pressure", "type": "Dirichlet", "value": 0.0}]},
        "walls": {"boundary": walls, "boundary_id": 3, "values": [
            {"variable": "velocity", "type": "Dirichlet",
             "value": (0.0, 0.0)}]},
        "cyl": {"boundary": cyl, "boundary_id": 4, "values": [
            {"variable": "velocity", "type": "Dirichlet",
             "value": (0.0, 0.0)}]},
    }
    import copy as _copy

    base = dg_settings()
    base["mesh"] = mesh
    base["boundary_conditions"] = bcs
    base["material"] = {"density": 1.0, "kinematic_viscosity": nu_c}
    base["initial_values"] = {"velocity": (0.0, 0.0), "pressure": 0.0}
    solver = NSDGSolver(_copy.deepcopy(base))
    up = solver.solve()
    assert np.isfinite(up.values).all()
    drag_dg, lift_dg = solver.calc_drag_and_lift(up, 0, 1, [4])

    base_cg = _copy.deepcopy(base)
    base_cg["solver_name"] = "CoupledNavierStokesSolver"
    cg = CoupledNavierStokesSolver(base_cg)
    up_cg = cg.solve()
    drag_cg, _ = cg.calc_drag_and_lift(up_cg, 0, 1, [4])

    assert drag_dg > 0 and drag_cg > 0
    # same physics on the same mesh, two different discretizations
    assert abs(drag_dg - drag_cg) / abs(drag_cg) < 0.1, (drag_dg, drag_cg)


def test_dg_adjoint_drag_sensitivity():
    """Differentiable DG NS: boundary values live in per-boundary aux keys
    ("g:<name>"), so the adjoint machinery (ops/adjoint.py, dense path for
    the saddle point) differentiates the wall drag w.r.t. the inflow
    amplitude; verified against central finite differences."""
    import jax
    import jax.numpy as jnp

    from fenicssolver_tpu.ops.adjoint import make_implicit_solver

    s = dg_settings(nx=3, ny=3)
    solver = NSDGSolver(s)
    up = solver.solve()
    form, d = solver.generate_form(
        0, None, None, solver.w_current, solver.w_prev
    )
    isolver = make_implicit_solver(
        form, d, linear=False, spd=False, method="dense", newton_rtol=1e-12
    )
    # locate the inlet term's baked boundary data
    g0 = None
    for t in form.facet_terms:
        if t.aux is not None and "g:inlet" in t.aux:
            g0 = t.aux["g:inlet"]
    assert g0 is not None
    u_ref = isolver({})
    rel = np.linalg.norm(np.asarray(u_ref) - up.values) / np.linalg.norm(
        up.values
    )
    assert rel < 1e-8, rel  # forward Newton == production solve

    W = solver.function_space
    mesh = solver.mesh
    from fenicssolver_tpu.ops import geometry

    dgm = mesh.gdim
    mu = (float(solver.material["kinematic_viscosity"])
          * float(solver.material["density"]))
    Vv, Q = W.subspaces[0], W.subspaces[1]
    kv = Vv.scalar_space.ndof_el
    nu_off = kv * dgm
    kp = Q.ndof_el
    fids = np.concatenate(
        [solver.boundary_facet_ids(3), solver.boundary_facet_ids(4)]
    )
    fctx = geometry.build_facet_context(W, fids, 4)
    _, fdphi_v_tab, fw, _ = geometry.facet_basis_tables(
        mesh.tdim, Vv.degree, 4
    )
    fphi_p_tab, _, _, _ = geometry.facet_basis_tables(mesh.tdim, Q.degree, 4)
    fdphi_v = jnp.asarray(fdphi_v_tab)
    fphi_p = jnp.asarray(fphi_p_tab)
    fwj = jnp.asarray(fw)
    I2 = jnp.eye(dgm)

    def facet_force(we, local_id, detF, normal, Jinv):
        U = we[:nu_off].reshape(kv, dgm)
        P = we[nu_off:nu_off + kp]
        dphif = jnp.einsum("qkt,tg->qkg", fdphi_v[local_id], Jinv)
        gU = jnp.einsum("qkg,kv->qvg", dphif, U)
        p_q = fphi_p[local_id] @ P
        sig = mu * (gU + jnp.swapaxes(gU, 1, 2)) - p_q[:, None, None] * I2
        return -jnp.einsum(
            "q,qv->v", fwj * detF,
            jnp.einsum("qvg,g->qv", sig, normal),
        )

    def drag(upv):
        f = jax.vmap(facet_force)(
            upv[fctx.cell_dofs], fctx.local_id, fctx.detF, fctx.normal,
            fctx.Jinv,
        )
        return jnp.sum(f, axis=0)[0]

    def J(scale):
        return drag(isolver({"g:inlet": g0 * scale}))

    g = jax.grad(J)(1.0)
    eps = 1e-4
    fd = (float(J(1.0 + eps)) - float(J(1.0 - eps))) / (2 * eps)
    assert abs(float(g) - fd) <= 2e-5 * max(abs(fd), 1e-8), (float(g), fd)
    assert abs(fd) > 1e-8


def test_dg_3d_couette_exact():
    """3D: plane Couette flow in a duct (u = (y, 0, 0), p = 0) is degree
    1, so DG2/DG1 must reproduce it exactly — exercising the 3D interior
    -facet machinery, 3D weak Dirichlet, the do-nothing outflow, and the
    symmetry planes in the spanwise direction."""
    from fenicssolver_tpu.core import (
        AutoSubDomain,
        Expression,
        UnitCubeMesh,
        near,
    )

    mesh = UnitCubeMesh(2, 2, 2)
    inlet = AutoSubDomain(lambda x: near(x[0], 0.0))
    outlet = AutoSubDomain(lambda x: near(x[0], 1.0))
    bottom = AutoSubDomain(lambda x: near(x[1], 0.0))
    top = AutoSubDomain(lambda x: near(x[1], 1.0))
    span = AutoSubDomain(lambda x: near(x[2], 0.0) or near(x[2], 1.0))
    couette = Expression(("x[1]", "0", "0"), degree=1)
    s = dg_settings()
    s["mesh"] = mesh
    s["material"] = {"density": 1.0, "kinematic_viscosity": 0.5}
    s["initial_values"] = {"velocity": (0.0, 0.0, 0.0), "pressure": 0.0}
    s["boundary_conditions"] = {
        "inlet": {"boundary": inlet, "boundary_id": 1, "values": [
            {"variable": "velocity", "type": "Dirichlet",
             "value": couette}]},
        "outlet": {"boundary": outlet, "boundary_id": 2, "values": [
            {"variable": "pressure", "type": "Dirichlet", "value": 0.0}]},
        "bottom": {"boundary": bottom, "boundary_id": 3, "values": [
            {"variable": "velocity", "type": "Dirichlet",
             "value": (0.0, 0.0, 0.0)}]},
        "top": {"boundary": top, "boundary_id": 4, "values": [
            {"variable": "velocity", "type": "Dirichlet",
             "value": (1.0, 0.0, 0.0)}]},
        "span": {"boundary": span, "boundary_id": 5, "values": [
            {"variable": "velocity", "type": "symmetry", "value": None}]},
    }
    solver = NSDGSolver(s)
    up = solver.solve()
    u, p = _fields(solver, up)
    Xv = solver.function_space.subspaces[0].scalar_space.dof_coords
    u_ex = np.zeros_like(u)
    u_ex[:, 0] = Xv[:, 1]
    err = np.linalg.norm(u - u_ex) / np.linalg.norm(u_ex)
    assert err < 1e-8, err
    assert np.abs(p).max() < 1e-6 * np.abs(u_ex).max()


def test_dg_sipg_momentum_proxy_spd():
    """The DG momentum proxy (broken Laplacian + SIPG jumps + Nitsche
    Dirichlet terms, ``NSDGSolver._visc_mass_matrix``) is symmetric and
    positive definite on the broken space — the property the round-4
    cell-local proxy lacked (per-cell rigid-body nullspace) and the one
    that makes the momentum multigrid well posed (VERDICT r4 item 7)."""
    s = dg_settings(4, 4)
    solver = NSDGSolver(s)
    Vv = solver.function_space.subspaces[0]
    nu0 = float(solver.material["kinematic_viscosity"])
    A = solver._visc_mass_matrix(Vv, solver.vel_degree, nu0, 0.0).to_scipy()
    assert abs(A - A.T).max() < 1e-12
    eigs = np.linalg.eigvalsh(A.toarray())
    assert eigs[0] > 1e-6, eigs[0]


def test_dg_pmg_momentum_iterations_flat():
    """p-multigrid DG2 -> CG P1 on the SIPG proxy: CG iteration counts
    stay mesh-independent across a 2x refinement (measured 31/33 at
    nx=8/16; direct Jacobi-CG grows as 1/h)."""
    import jax.numpy as jnp

    from fenicssolver_tpu.la import krylov
    from fenicssolver_tpu.ops import assembly as _asm

    counts = {}
    for nx in (8, 16):
        solver = NSDGSolver(dg_settings(nx, nx))
        Vv = solver.function_space.subspaces[0]
        nu0 = float(solver.material["kinematic_viscosity"])
        A = solver._visc_mass_matrix(Vv, solver.vel_degree, nu0, 0.0)
        A2c = _asm.constrain_csr(A, jnp.ones(Vv.ndof))
        Mp = solver._build_pmg(A2c, np.ones(Vv.ndof, bool), Vv.vdim, nu0, 0.0)
        rng = np.random.default_rng(0)
        b = jnp.asarray(rng.standard_normal(Vv.ndof))
        x, it, res = krylov.cg(A2c.matvec, b, M=Mp, tol=1e-10, maxiter=200)
        assert res < 1e-10
        counts[nx] = int(it)
    assert counts[8] <= 45 and counts[16] <= counts[8] + 8, counts


def test_dg_serial_fieldsplit_matches_dense():
    """The serial beyond-dense DG path (fieldsplit FGMRES with the p-MG
    momentum V-cycle) reproduces the dense-LU solution — closing VERDICT
    r4 weak-5's serial half (the DG fieldsplit previously had no usable
    momentum preconditioner at any scale)."""
    from fenicssolver_tpu.la import direct

    anchor = NSDGSolver(dg_settings(6, 6)).solve().values

    s = dg_settings(6, 6)
    s["solver_settings"]["solver_parameters"].update(
        preconditioner="fieldsplit", relative_tolerance=1e-10
    )
    solver = NSDGSolver(s)
    saved = direct.DENSE_LIMIT
    try:
        direct.DENSE_LIMIT = 100
        up = solver.solve()
    finally:
        direct.DENSE_LIMIT = saved
    # the p-MG momentum preconditioner must have engaged (not the
    # Jacobi-BiCGStab degenerate fallback)
    cache = getattr(solver, "_mom_amg_cache", None)
    assert cache is not None and cache["amg"] is not None
    it = int(getattr(solver, "_last_outer_iters", 0))
    assert 0 < it <= 120, it
    err = np.linalg.norm(up.values - anchor) / np.linalg.norm(anchor)
    assert err < 1e-8, err
