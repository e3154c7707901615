"""NS extras: non-Newtonian viscosity, G2 stabilization, point source."""

import numpy as np

from fenicssolver_tpu.core import FunctionSpace, UnitSquareMesh
from fenicssolver_tpu.solvers.navier_stokes import CoupledNavierStokesSolver

from .test_navier_stokes import channel_settings


def test_non_newtonian_viscosity():
    """nu(p) traced into the kernel (reference ``:194-213``); Newton
    linearizes the extra p-dependence automatically."""
    s = channel_settings(nx=6, ny=6)
    s["material"]["Newtonian"] = False
    solver = CoupledNavierStokesSolver(s)
    up = solver.solve()
    assert np.isfinite(up.values).all()
    W = solver.function_space
    u = up.values[W.slice_of(0)].reshape(-1, 2)
    assert 0 < u[:, 0].max() < 1.0


def test_g2_stabilization():
    s = channel_settings(nx=6, ny=6)
    s["advection_settings"] = {
        "stabilization_method": "G2",
        "Re": 10,
        "kappa1": 4.0,
        "kappa2": 2.0,
    }
    solver = CoupledNavierStokesSolver(s)
    up = solver.solve()
    assert np.isfinite(up.values).all()


def test_scalar_point_source():
    """Delta load raises the temperature near its location."""
    from fenicssolver_tpu.compat import PointSource
    from fenicssolver_tpu.solvers.scalar_transport import ScalarTransportSolver
    from .test_heat_transfer import base_settings, make_bcs

    mesh = UnitSquareMesh(8, 8)
    Q = FunctionSpace(mesh, "CG", 1)
    s = base_settings(Q, make_bcs())
    s["point_source"] = [PointSource(Q, (0.5, 0.5), 50.0)]
    solver = ScalarTransportSolver(s)
    solver.material["conductivity"] = 0.6
    T = solver.solve()
    assert np.isfinite(T.values).all()
    X = Q.dof_coords
    mid = np.argmin(np.linalg.norm(X - [0.5, 0.5], axis=1))
    y = X[:, 1]
    T_lin = 300 + 60 * y
    # heating at the point source pushes T above the pure-conduction field
    assert T.values[mid] > T_lin[mid] + 1.0


def test_backflow_stabilization_inactive_without_backflow():
    """advection_settings.backflow_stabilization adds the directional
    do-nothing term -1/2 (u.n)_- u.v on open boundaries (documented
    deviation; the reference form ``:449-452`` has no backflow
    treatment).  On a Poiseuille channel the outlet has u.n >= 0
    everywhere, so the term is EXACTLY zero and the solution must be
    bit-for-bit the plain do-nothing one."""
    base = CoupledNavierStokesSolver(channel_settings(nx=6, ny=6)).solve()
    s = channel_settings(nx=6, ny=6)
    s["advection_settings"] = {"backflow_stabilization": True}
    stab = CoupledNavierStokesSolver(s).solve()
    err = np.abs(stab.values - base.values).max() / np.abs(base.values).max()
    assert err < 1e-10, f"term fired without backflow: {err:.2e}"


def _open_cavity_settings(nu=0.05, backflow=False):
    """Lid-driven cavity with an OPEN right side (pressure Dirichlet):
    the rotating cell pushes flow out near the top of the open boundary
    and back IN near the bottom — genuine backflow through an open
    boundary in steady state."""
    from fenicssolver_tpu.core import AutoSubDomain, Expression, near

    mesh = UnitSquareMesh(10, 10)
    lid = AutoSubDomain(lambda x: near(x[1], 1.0))
    left = AutoSubDomain(lambda x: near(x[0], 0.0))
    bottom = AutoSubDomain(lambda x: near(x[1], 0.0))
    right = AutoSubDomain(lambda x: near(x[0], 1.0))
    # lid profile vanishing at the corners (regularized cavity)
    lidvel = Expression(("16.0*x[0]*x[0]*(1.0-x[0])*(1.0-x[0])", "0"),
                        degree=2)
    bcs = {
        "lid": {"boundary": lid, "boundary_id": 1, "values": [
            {"variable": "velocity", "type": "Dirichlet", "value": lidvel}]},
        "left": {"boundary": left, "boundary_id": 2, "values": [
            {"variable": "velocity", "type": "Dirichlet", "value": (0.0, 0.0)}]},
        "bottom": {"boundary": bottom, "boundary_id": 3, "values": [
            {"variable": "velocity", "type": "Dirichlet", "value": (0.0, 0.0)}]},
        "right": {"boundary": right, "boundary_id": 4, "values": [
            {"variable": "pressure", "type": "Dirichlet", "value": 0.0}]},
    }
    s = channel_settings(nx=10, ny=10)
    s["mesh"] = mesh
    s["boundary_conditions"] = bcs
    s["material"]["kinematic_viscosity"] = nu
    if backflow:
        s["advection_settings"] = {"backflow_stabilization": True}
    return s


def test_backflow_stabilization_on_open_cavity():
    """With genuine backflow through the open boundary the directional
    term is active: the stabilized solve converges, the backflow is
    really there (u.n < 0 somewhere on the open side), and the solution
    differs measurably-but-moderately from the plain form."""
    plain = CoupledNavierStokesSolver(_open_cavity_settings()).solve()
    stab_solver = CoupledNavierStokesSolver(
        _open_cavity_settings(backflow=True)
    )
    stab = stab_solver.solve()
    assert np.isfinite(stab.values).all()
    W = stab_solver.function_space
    u = stab.values[W.slice_of(0)].reshape(-1, 2)
    X = W.subspaces[0].scalar_space.dof_coords
    on_right = np.isclose(X[:, 0], 1.0)
    un = u[on_right, 0]  # outward normal (1, 0): u.n = u_x
    assert un.min() < -1e-4, "no backflow: the test case is vacuous"
    assert un.max() > 1e-3
    rel = np.abs(stab.values - plain.values).max() / np.abs(plain.values).max()
    assert 1e-8 < rel < 0.2, f"unexpected deviation {rel:.3e}"
