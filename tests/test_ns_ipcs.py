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


def test_ipcs_f32_request_stays_f32_under_x64():
    """``dtype=float32`` must hold through the WHOLE scan even with
    jax_enable_x64 on (the examples' config): one f64 quadrature table or
    AMG level promotes every einsum and tile array to f64, which on the
    real TPU is stored X64-split (2x memory) and software-emulated —
    measured 19.5 GB vs ~5 GB at 200k dofs (HBM OOM on the 16 GB chip).
    Asserts every traced-argument leaf and both outputs are f32, and the
    result still converges toward Poiseuille."""
    import jax
    import jax.numpy as jnp

    solver = CoupledNavierStokesSolver(channel_settings(nx=16, ny=16))
    run, aux = fast_paths.compile_transient_ns_ipcs(
        solver, dt=0.05, n_steps=60, tol=1e-6, dtype=jnp.float32
    )
    V, Q = aux["V"], aux["Q"]
    # every floating leaf of the traced-argument pytree must be f32 (an
    # f64 leaf is exactly the promotion hazard)
    for key, leaf in jax.tree_util.tree_leaves_with_path(run._p0):
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            assert jnp.asarray(leaf).dtype == jnp.float32, key
    (u, p), norms = run(np.zeros(V.ndof, np.float32),
                        np.zeros(Q.ndof, np.float32))
    assert np.asarray(u).dtype == np.float32
    assert np.asarray(p).dtype == np.float32
    assert np.asarray(norms).dtype == np.float32
    u = np.asarray(u).reshape(-1, 2)
    uex, _ = _exact(V, Q)
    uex = uex.reshape(-1, 2)
    umax = np.max(np.abs(uex[:, 0]))
    # 60 steps of startup: not converged, but clearly flowing (>60% of
    # the exact centreline) and finite — f32 arithmetic sanity
    assert np.isfinite(u).all()
    assert np.max(u[:, 0]) > 0.6 * umax


def test_ipcs_matrix_free_projection():
    """``matrix_free_mass=True`` solves the step-3 CONSISTENT-mass
    projection with the element-einsum operator instead of block-ELL
    tiles — must (a) keep the exact Poiseuille state a fixed point,
    (b) converge the startup to the same steady state as the tiled
    solve (identical accuracy: it is the same linear system), and
    (c) hold NO A3 tile array in the traced-argument pytree.  (A fully
    explicit HRZ-lumped projection was measured here and rejected:
    3.4% steady-state defect on this very startup.)"""
    solver = CoupledNavierStokesSolver(channel_settings(nx=8, ny=8))
    run, aux = fast_paths.compile_transient_ns_ipcs(
        solver, dt=0.05, n_steps=1, matrix_free_mass=True
    )
    assert "A3_tiles" not in run._p0
    u0, p0 = _exact(aux["V"], aux["Q"])
    (u, p), _ = run(u0, p0)
    assert np.max(np.abs(np.asarray(u) - u0)) < 1e-8
    assert np.max(np.abs(np.asarray(p) - p0)) < 1e-8

    solver = CoupledNavierStokesSolver(channel_settings(nx=16, ny=16))
    run, aux = fast_paths.compile_transient_ns_ipcs(
        solver, dt=0.05, n_steps=200, matrix_free_mass=True,
        report_iters=True,
    )
    V, Q = aux["V"], aux["Q"]
    (u, p), (norms, k1, k2, k3) = run(np.zeros(V.ndof), np.zeros(Q.ndof))
    u = np.asarray(u).reshape(-1, 2)
    uex, _ = _exact(V, Q)
    uex = uex.reshape(-1, 2)
    umax = np.max(np.abs(uex[:, 0]))
    assert np.max(np.abs(u[:, 0] - uex[:, 0])) / umax < 5e-4
    assert np.max(np.abs(u[:, 1])) / umax < 2e-3
    # all three Krylov solves actually iterated
    assert int(np.max(np.asarray(k3))) > 0
    assert int(np.max(np.asarray(k1))) > 0
    assert int(np.max(np.asarray(k2))) > 0


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
