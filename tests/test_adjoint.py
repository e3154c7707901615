"""Differentiable implicit solves (ops/adjoint.py): adjoint gradients vs
central finite differences on linear and nonlinear diffusion problems,
plus gradients with respect to Dirichlet boundary values.

Beyond-parity capability — the reference cannot differentiate through a
PETSc solve at all."""

import jax
import jax.numpy as jnp
import numpy as np

from fenicssolver_tpu.core.mesh import UnitSquareMesh
from fenicssolver_tpu.core.spaces import FunctionSpace
from fenicssolver_tpu.ops import assembly, geometry
from fenicssolver_tpu.ops.adjoint import make_implicit_solver


def _poisson_form(nx=8, nonlinear=False):
    """-div(kappa(c) grad u) = f with per-CELL parameter field kappa in
    aux (theta key "kappa"); nonlinear variant kappa_eff = kappa(1+u^2/4)."""
    mesh = UnitSquareMesh(nx, nx)
    V = FunctionSpace(mesh, "CG", 1)
    tab = geometry.basis_tables(mesh.tdim, 1, 2)
    dphi, qw, phi = (jnp.asarray(tab.dphi), jnp.asarray(tab.qw),
                     jnp.asarray(tab.phi))

    def kern(ue, geom, aux):
        dphig = geometry.phys_grads(dphi, geom.Jinv)
        g = geometry.interp_grad(dphig, ue)      # (q, gdim)
        k = aux["kappa"]                          # per-cell scalar
        if nonlinear:
            uq = phi @ ue                         # (q,)
            keff = k * (1.0 + 0.25 * uq[:, None] ** 2)
            diff = jnp.einsum("q,qg,qig->i", qw, keff * g, dphig)
            src = jnp.einsum("q,qi->i", qw, phi) * aux["f"]
        else:
            diff = k * jnp.einsum("q,qg,qig->i", qw, g, dphig)
            src = jnp.einsum("q,qi->i", qw, phi) * aux["f"]
        return (diff - src) * geom.detJ

    ctx = geometry.build_cell_context(V, 2)
    nc = mesh.num_cells()
    form = assembly.Form(space=V)
    form.cell_terms.append(assembly.CellTerm(
        kernel=kern, ctx=ctx,
        aux={"kappa": jnp.ones(nc), "f": jnp.ones(nc)},
    ))
    form.finalize()

    bdofs = np.asarray(V.facet_dofs(mesh.exterior_facets()))
    d = assembly.DirichletData(V.ndof)
    d.add(bdofs, np.zeros(len(bdofs)))
    d.finalize()
    return mesh, V, form, d


def _mismatch(form, V, solver, theta, u_bc=None, target=None):
    u = solver(theta, u_bc)
    t = 0.0 if target is None else target
    return jnp.sum((u - t) ** 2)


def test_linear_adjoint_grad_matches_fd():
    mesh, V, form, d = _poisson_form(nx=8)
    solver = make_implicit_solver(form, d, linear=True, spd=True)
    nc = mesh.num_cells()
    rng = np.random.default_rng(0)
    kappa = jnp.asarray(1.0 + 0.5 * rng.random(nc))
    theta = {"kappa": kappa, "f": jnp.ones(nc)}

    def J(th):
        return _mismatch(form, V, solver, th)

    g = jax.grad(J)(theta)
    # central FD on a handful of cells (f64 CPU backend)
    eps = 1e-6
    for c in [0, nc // 3, nc - 1]:
        e = np.zeros(nc)
        e[c] = 1.0
        jp = float(J({"kappa": kappa + eps * e, "f": theta["f"]}))
        jm = float(J({"kappa": kappa - eps * e, "f": theta["f"]}))
        fd = (jp - jm) / (2 * eps)
        ad = float(g["kappa"][c])
        assert abs(ad - fd) <= 1e-6 * max(abs(fd), 1.0), (c, ad, fd)
    # source-term gradient too (second aux key through the same vjp)
    c = nc // 2
    e = np.zeros(nc)
    e[c] = 1.0
    jp = float(J({"kappa": kappa, "f": theta["f"] + eps * e}))
    jm = float(J({"kappa": kappa, "f": theta["f"] - eps * e}))
    fd = (jp - jm) / (2 * eps)
    ad = float(g["f"][c])
    assert abs(ad - fd) <= 1e-6 * max(abs(fd), 1.0), (ad, fd)


def test_linear_adjoint_grad_wrt_dirichlet_value():
    mesh, V, form, d = _poisson_form(nx=6)
    solver = make_implicit_solver(form, d, linear=True, spd=True)
    theta = {"kappa": jnp.ones(mesh.num_cells()),
             "f": jnp.ones(mesh.num_cells())}
    u_bc0 = jnp.asarray(d.u_bc)
    bdof = int(np.flatnonzero(np.asarray(d.free_mask) < 0.5)[3])

    def J(ubc):
        u = solver(theta, ubc)
        return jnp.sum(u ** 2)

    g = jax.grad(J)(u_bc0)
    eps = 1e-6
    e = np.zeros(V.ndof)
    e[bdof] = 1.0
    fd = (float(J(u_bc0 + eps * e)) - float(J(u_bc0 - eps * e))) / (2 * eps)
    ad = float(g[bdof])
    assert abs(ad - fd) <= 1e-6 * max(abs(fd), 1.0), (ad, fd)
    # free dofs get zero cotangent through u_bc
    fdof = int(np.flatnonzero(np.asarray(d.free_mask) > 0.5)[0])
    assert float(g[fdof]) == 0.0


def test_nonlinear_adjoint_grad_matches_fd():
    mesh, V, form, d = _poisson_form(nx=6, nonlinear=True)
    solver = make_implicit_solver(form, d, linear=False, spd=True)
    nc = mesh.num_cells()
    rng = np.random.default_rng(1)
    kappa = jnp.asarray(1.0 + 0.3 * rng.random(nc))
    f = jnp.full(nc, 4.0)  # drive u large enough that (1+u^2/4) matters

    def J(kap):
        u = solver({"kappa": kap, "f": f})
        return jnp.sum(u ** 2)

    u = solver({"kappa": kappa, "f": f})
    assert float(jnp.max(jnp.abs(u))) > 0.05  # the nonlinearity is active
    g = jax.grad(J)(kappa)
    eps = 1e-6
    for c in [1, nc // 2]:
        e = np.zeros(nc)
        e[c] = 1.0
        fd = (float(J(kappa + eps * e)) - float(J(kappa - eps * e))) / (
            2 * eps
        )
        ad = float(g[c])
        assert abs(ad - fd) <= 5e-6 * max(abs(fd), 1.0), (c, ad, fd)


def test_linear_adjoint_jits_end_to_end():
    """linear=True: value-and-grad under jax.jit compiles and matches the
    eager gradient (the whole forward+adjoint pipeline is lax loops)."""
    mesh, V, form, d = _poisson_form(nx=6)
    solver = make_implicit_solver(form, d, linear=True, spd=True)
    nc = mesh.num_cells()
    kappa = jnp.asarray(np.linspace(1.0, 2.0, nc))
    f = jnp.ones(nc)

    def J(kap):
        u = solver({"kappa": kap, "f": f})
        return jnp.sum(u ** 2)

    v_e, g_e = jax.value_and_grad(J)(kappa)
    v_j, g_j = jax.jit(jax.value_and_grad(J))(kappa)
    assert abs(float(v_e) - float(v_j)) < 1e-12 * max(abs(float(v_e)), 1.0)
    assert float(jnp.max(jnp.abs(g_e - g_j))) < 1e-10


def test_transient_adjoint_through_scan():
    """Reverse-mode through a WHOLE transient: backward-Euler heat
    conduction stepped by lax.scan over the differentiable implicit
    solve; gradients of the final-time energy w.r.t. the conductivity
    field AND the initial condition match central finite differences.
    The per-step history (previous solution gathered per element) flows
    through the same aux_update channel as the material parameters, so
    the chain rule composes across steps with no extra machinery."""
    mesh = UnitSquareMesh(6, 6)
    V = FunctionSpace(mesh, "CG", 1)
    tab = geometry.basis_tables(mesh.tdim, 1, 2)
    dphi, qw, phi = (jnp.asarray(tab.dphi), jnp.asarray(tab.qw),
                     jnp.asarray(tab.phi))
    dt = 0.05

    def kern(ue, geom, aux):
        dphig = geometry.phys_grads(dphi, geom.Jinv)
        g = geometry.interp_grad(dphig, ue)
        uq = phi @ ue
        upq = phi @ aux["uprev_e"]
        mass = jnp.einsum("q,q,qi->i", qw, (uq - upq) / dt, phi)
        diff = aux["kappa"] * jnp.einsum("q,qg,qig->i", qw, g, dphig)
        return (mass + diff) * geom.detJ

    ctx = geometry.build_cell_context(V, 2)
    nc = mesh.num_cells()
    k = V.ndof_el
    form = assembly.Form(space=V)
    form.cell_terms.append(assembly.CellTerm(
        kernel=kern, ctx=ctx,
        aux={"kappa": jnp.ones(nc), "uprev_e": jnp.zeros((nc, k))},
    ))
    form.finalize()
    bdofs = np.asarray(V.facet_dofs(mesh.exterior_facets()))
    d = assembly.DirichletData(V.ndof)
    d.add(bdofs, np.zeros(len(bdofs)))
    d.finalize()
    solver = make_implicit_solver(form, d, linear=True, spd=True)
    cd = jnp.asarray(ctx.cell_dofs)
    X = V.dof_coords
    u0 = jnp.asarray(
        np.sin(np.pi * X[:, 0]) * np.sin(np.pi * X[:, 1])
    ) * jnp.asarray(d.free_mask)
    nsteps = 5

    def run(kappa, u_init):
        def step(u_old, _):
            u_new = solver({"kappa": kappa, "uprev_e": u_old[cd]})
            return u_new, ()

        u_T, _ = jax.lax.scan(step, u_init, None, length=nsteps)
        return jnp.sum(u_T ** 2)

    g_k, g_u0 = jax.grad(run, argnums=(0, 1))(jnp.ones(nc), u0)
    eps = 1e-6
    for c in [2, nc // 2]:
        e = np.zeros(nc)
        e[c] = 1.0
        fd = (float(run(jnp.ones(nc) + eps * e, u0))
              - float(run(jnp.ones(nc) - eps * e, u0))) / (2 * eps)
        assert abs(float(g_k[c]) - fd) <= 1e-6 * max(abs(fd), 1e-3), (
            c, float(g_k[c]), fd,
        )
    free_dof = int(np.flatnonzero(np.asarray(d.free_mask) > 0.5)[7])
    e = np.zeros(V.ndof)
    e[free_dof] = 1.0
    fd = (float(run(jnp.ones(nc), u0 + eps * e))
          - float(run(jnp.ones(nc), u0 - eps * e))) / (2 * eps)
    assert abs(float(g_u0[free_dof]) - fd) <= 1e-6 * max(abs(fd), 1e-3), (
        float(g_u0[free_dof]), fd,
    )


def test_ns_drag_sensitivity_wrt_inflow():
    """Differentiable Navier-Stokes: the mixed saddle-point form from
    CoupledNavierStokesSolver.generate_form runs through the dense-path
    implicit solver (zero pressure diagonal defeats Jacobi-Krylov), the
    forward Newton reproduces the production solve, and the adjoint
    gradient of the bottom-wall drag w.r.t. an inflow amplitude scale
    matches central finite differences."""
    from fenicssolver_tpu.ops import geometry
    from fenicssolver_tpu.solvers.navier_stokes import (
        CoupledNavierStokesSolver,
    )
    from tests.test_navier_stokes import NU, RHO, channel_settings

    s = channel_settings(nx=4, ny=4)
    s["solver_settings"]["solver_parameters"] = dict(
        s["solver_settings"]["solver_parameters"], nonlinear=True
    )
    solver = CoupledNavierStokesSolver(s)
    up = solver.solve()
    form, d = solver.generate_form(
        0, None, None, solver.w_current, solver.w_prev
    )
    isolver = make_implicit_solver(
        form, d, linear=False, spd=False, method="dense", newton_rtol=1e-12
    )
    u_bc0 = jnp.asarray(d.u_bc)
    u_sol = isolver({}, u_bc0)
    ref = np.asarray(up.values)
    rel = np.linalg.norm(np.asarray(u_sol) - ref) / np.linalg.norm(ref)
    assert rel < 1e-8, rel  # forward pass == production solve

    # differentiable drag on the bottom wall (boundary_id 4): the same
    # traction integrand as calc_drag_and_lift, traced over up-values
    W = solver.function_space
    mesh = solver.mesh
    dgm = mesh.gdim
    mu = NU * RHO
    Vv, Q = W.subspaces[0], W.subspaces[1]
    kv = Vv.scalar_space.ndof_el
    nu_off = kv * dgm
    kp = Q.ndof_el
    qdeg = 3
    fids = solver.boundary_facet_ids(4)
    fctx = geometry.build_facet_context(W, fids, qdeg)
    fphi_v_tab, fdphi_v_tab, fw, _ = geometry.facet_basis_tables(
        mesh.tdim, Vv.degree, qdeg
    )
    fphi_p_tab, _, _, _ = geometry.facet_basis_tables(
        mesh.tdim, Q.degree, qdeg
    )
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
        t = jnp.einsum("qvg,g->qv", sig, normal)
        return -jnp.einsum("q,qv->v", fwj * detF, t)

    def drag_of(upv):
        f = jax.vmap(facet_force)(
            upv[fctx.cell_dofs], fctx.local_id, fctx.detF, fctx.normal,
            fctx.Jinv,
        )
        return jnp.sum(f, axis=0)[0]

    def J(scale):
        return drag_of(isolver({}, u_bc0 * scale))

    g = jax.grad(J)(1.0)
    eps = 1e-4
    fd = (float(J(1.0 + eps)) - float(J(1.0 - eps))) / (2 * eps)
    assert abs(float(g) - fd) <= 2e-5 * max(abs(fd), 1e-6), (float(g), fd)
    assert abs(fd) > 1e-8  # the sensitivity is non-trivial


def test_elasticity_compliance_sensitivity():
    """Vector-space adjoint through the spd Krylov path: gradient of the
    compliance of a cantilever (tip-loaded linear elasticity) w.r.t. a
    per-cell Young's-modulus field matches finite differences."""
    from fenicssolver_tpu.core.spaces import VectorFunctionSpace

    mesh = UnitSquareMesh(6, 4)
    V = VectorFunctionSpace(mesh, "CG", 1)
    tab = geometry.basis_tables(mesh.tdim, 1, 2)
    dphi, qw, phi = (jnp.asarray(tab.dphi), jnp.asarray(tab.qw),
                     jnp.asarray(tab.phi))
    nu_p = 0.3
    ks = V.scalar_space.ndof_el
    d = V.vdim
    traction = jnp.asarray([0.0, -0.01])

    def kern(ue, geom, aux):
        U = ue.reshape(ks, d)
        dphig = geometry.phys_grads(dphi, geom.Jinv)
        gU = jnp.einsum("qkg,kv->qvg", dphig, U)
        eps = 0.5 * (gU + jnp.swapaxes(gU, 1, 2))
        E = aux["E"]
        lam = E * nu_p / ((1 + nu_p) * (1 - 2 * nu_p))
        mu = E / (2 * (1 + nu_p))
        tr = jnp.trace(eps, axis1=1, axis2=2)
        sig = 2 * mu * eps + lam * tr[:, None, None] * jnp.eye(d)
        r = jnp.einsum("q,qvg,qkg->kv", qw, sig, dphig)
        return (r * geom.detJ).reshape(-1)

    ctx = geometry.build_cell_context(V, 2)
    nc = mesh.num_cells()
    form = assembly.Form(space=V)
    form.cell_terms.append(assembly.CellTerm(
        kernel=kern, ctx=ctx, aux={"E": jnp.ones(nc)}))
    # tip traction on the right edge
    right = np.flatnonzero(
        np.abs(np.asarray(mesh.midpoints("facet"))[:, 0] - 1.0) < 1e-12
    )
    right = np.intersect1d(right, np.asarray(mesh.exterior_facets()))
    fctx = geometry.build_facet_context(V, right.astype(np.int32), 2)
    fphi_tab, _, fw, _ = geometry.facet_basis_tables(mesh.tdim, 1, 2)
    fphi, fwj = jnp.asarray(fphi_tab), jnp.asarray(fw)

    def fkern(ue, geom, aux):
        phif = fphi[geom.local_id]
        r = -jnp.einsum("q,v,qk->kv", fwj * geom.detF, traction, phif)
        return r.reshape(-1)

    form.facet_terms.append(assembly.FacetTerm(kernel=fkern, ctx=fctx))
    form.finalize()

    X = V.scalar_space.dof_coords
    clamped = np.flatnonzero(np.abs(X[:, 0]) < 1e-12)
    dd = assembly.DirichletData(V.ndof)
    dd.add(np.concatenate([2 * clamped, 2 * clamped + 1]),
           np.zeros(2 * len(clamped)))
    dd.finalize()

    solver = make_implicit_solver(form, dd, linear=True, spd=True)

    def compliance(E):
        u = solver({"E": E})
        return jnp.sum(u * u)

    E0 = jnp.asarray(1.0 + 0.2 * np.random.default_rng(5).random(nc))
    g = jax.grad(compliance)(E0)
    eps = 1e-6
    for c in [0, nc - 2]:
        e = np.zeros(nc)
        e[c] = 1.0
        fd = (float(compliance(E0 + eps * e))
              - float(compliance(E0 - eps * e))) / (2 * eps)
        assert abs(float(g[c]) - fd) <= 1e-5 * max(abs(fd), 1e-10), (
            c, float(g[c]), fd,
        )
    # stiffening anywhere must REDUCE the compliance of a load-driven body
    assert (np.asarray(g) < 1e-12).all()
