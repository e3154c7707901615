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
