"""DG scalar transport tests — the reference's DG solver was broken
("all result is NAN", ``ScalarTransportDGSolver.py:25``); these assert it
actually works here."""

import numpy as np

from fenicssolver_tpu.core import AutoSubDomain, Constant, UnitSquareMesh, near
from fenicssolver_tpu.solvers.scalar_transport_dg import ScalarTransportDGSolver

from .test_heat_transfer import T_cold, T_hot, base_settings, make_bcs


def test_dg_diffusion_matches_analytic():
    """SIPG pure diffusion reproduces the linear conduction profile."""
    mesh = UnitSquareMesh(10, 10)
    settings = base_settings(None, make_bcs())
    settings["mesh"] = mesh
    settings["function_space"] = None
    settings["fe_degree"] = 1
    solver = ScalarTransportDGSolver(settings)
    solver.material["conductivity"] = 0.6
    T = solver.solve()
    assert np.isfinite(T.values).all()
    y = solver.shadow_space.dof_coords[:, 1]
    T_exact = T_cold + (T_hot - T_cold) * y
    err = np.linalg.norm(T.values - T_exact) / np.linalg.norm(T_exact)
    assert err < 5e-3, err
    # DG solution itself is also accurate (not just the projection)
    y_dg = solver.function_space.dof_coords[:, 1]
    err_dg = np.linalg.norm(
        solver.result_dg.values - (T_cold + (T_hot - T_cold) * y_dg)
    ) / np.linalg.norm(T_exact)
    assert err_dg < 5e-3, err_dg


def test_dg_upwind_advection():
    """Advection-dominated transport stays bounded (upwind flux works)."""
    mesh = UnitSquareMesh(10, 10)
    settings = base_settings(None, make_bcs())
    settings["mesh"] = mesh
    settings["function_space"] = None
    settings["fe_degree"] = 1
    settings["material"] = {"capacity": 1.0, "conductivity": 0.01}
    settings["convective_velocity"] = Constant((0.0, -1.0))  # grid Pe = 5
    solver = ScalarTransportDGSolver(settings)
    T = solver.solve()
    assert np.isfinite(T.values).all()
    # upwinding keeps the solution within the boundary data range (+tol)
    assert T.values.min() > T_cold - 8
    assert T.values.max() < T_hot + 8
