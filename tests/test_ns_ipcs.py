"""IPCS segregated transient Navier-Stokes (fast_paths.compile_transient_ns_ipcs).

The reference ships this scheme as a standalone dolfin script embedded in
its cylinder example (``examples/test_flow_pass_cylinder.py:144-281``:
tentative velocity / pressure Poisson / velocity projection, constant
operators, per-step PETSc solves).  Here the whole transient is ONE
``lax.scan`` device program; these tests anchor it quantitatively (the
reference script prints u_max and never asserts).
"""

import numpy as np
import pytest

from fenicssolver_tpu.solvers import fast_paths
from fenicssolver_tpu.solvers.navier_stokes import CoupledNavierStokesSolver

from .test_navier_stokes import NU, RHO, U_MAX, channel_settings


def _exact(V, Q):
    xy = V.scalar_space.dof_coords
    a = 4 * U_MAX
    mu = RHO * NU
    u = np.zeros((V.ndof // 2, 2))
    u[:, 0] = a * xy[:, 1] * (1 - xy[:, 1])
    p = 2 * a * mu * (1 - Q.dof_coords[:, 0])
    return u.reshape(-1), p


def test_ipcs_exact_steady_state_is_fixed_point():
    """One IPCS step from the exact Poiseuille state must return it
    unchanged: the CN tentative-velocity form with the reference's
    nabla_grad outflow closure (natural condition mu du/dn - p n = 0) is
    EXACT for fully-developed channel flow, step 2 then reproduces p, and
    step 3 reproduces u.  A sign/transposition error in any term shows up
    here immediately (contracting the outflow closure against the wrong
    gradient index leaves mu (grad u)^T n = (0, mu u'(y)) uncancelled)."""
    solver = CoupledNavierStokesSolver(channel_settings(nx=8, ny=8))
    run, aux = fast_paths.compile_transient_ns_ipcs(solver, dt=0.05,
                                                    n_steps=1)
    u0, p0 = _exact(aux["V"], aux["Q"])
    (u, p), _ = run(u0, p0)
    assert np.max(np.abs(np.asarray(u) - u0)) < 1e-10
    assert np.max(np.abs(np.asarray(p) - p0)) < 1e-8


def test_ipcs_poiseuille_startup():
    """Impulsive start from rest converges to the exact parabolic profile
    (steady-state of the transient scheme; measured 1.0e-4 rel-max at 200
    steps of dt=0.05 on the 16x16 channel)."""
    solver = CoupledNavierStokesSolver(channel_settings(nx=16, ny=16))
    run, aux = fast_paths.compile_transient_ns_ipcs(solver, dt=0.05,
                                                    n_steps=200)
    V, Q = aux["V"], aux["Q"]
    (u, p), norms = run(np.zeros(V.ndof), np.zeros(Q.ndof))
    u = np.asarray(u).reshape(-1, 2)
    uex, pex = _exact(V, Q)
    uex = uex.reshape(-1, 2)
    umax = np.max(np.abs(uex[:, 0]))
    assert np.max(np.abs(u[:, 0] - uex[:, 0])) / umax < 2e-4
    assert np.max(np.abs(u[:, 1])) / umax < 1e-3
    # pressure gradient recovered too (gauge fixed by the outlet BC);
    # the splitting error is O(dt) in the pressure — measured 2.9e-3
    # rel-max at dt=0.05
    assert np.max(np.abs(np.asarray(p) - pex)) / np.max(np.abs(pex)) < 1e-2
    # the norm history must have settled (steady state reached; the
    # residual oscillation floor is the Krylov tolerance, measured 6e-6)
    n = np.asarray(norms)
    assert abs(n[-1] - n[-10]) / n[-1] < 1e-4


def test_ipcs_weak_divergence():
    """The projected velocity is discretely solenoidal: the weak
    divergence residual int div(u) q_a against every pressure test
    function is at the Krylov-tolerance floor (measured 1.1e-5 scaled by
    ||u||; a broken projection step sits at O(1))."""
    import jax.numpy as jnp

    solver = CoupledNavierStokesSolver(channel_settings(nx=16, ny=16))
    run, aux = fast_paths.compile_transient_ns_ipcs(solver, dt=0.05,
                                                    n_steps=50)
    V, Q = aux["V"], aux["Q"]
    (u, p), _ = run(np.zeros(V.ndof), np.zeros(Q.ndof))
    # assemble the weak divergence functional b[a] = int div(u) q_a
    from fenicssolver_tpu.ops import geometry

    mesh = solver.mesh
    qdeg = 2 * solver.vel_degree
    tab_v = geometry.basis_tables(mesh.tdim, solver.vel_degree, qdeg)
    tab_p = geometry.basis_tables(mesh.tdim, Q.degree, qdeg)
    ctx = geometry.build_cell_context(V.scalar_space, qdeg)
    dphig_v = np.einsum("qkt,ctg->cqkg", tab_v.dphi, np.asarray(ctx.Jinv))
    wdet = tab_v.qw[None, :] * np.asarray(ctx.detJ)[:, None]
    Ue = np.asarray(u).reshape(-1, 2)[V.scalar_space.cell_dofs]
    div_q = np.einsum("cqkg,ckg->cq", dphig_v, Ue)
    b = np.zeros(Q.ndof)
    np.add.at(
        b, np.asarray(Q.cell_dofs).reshape(-1),
        np.einsum("cq,cq,qa->ca", wdet, div_q, tab_p.phi).reshape(-1),
    )
    # scale against the momentum: ||div u|| per unit velocity
    assert np.linalg.norm(b) / max(np.linalg.norm(np.asarray(u)), 1e-300) \
        < 5e-5
