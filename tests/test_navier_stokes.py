"""Navier-Stokes tests (reference parity: ``examples/test_cfd_solver.py``,
``examples/test_flow_pass_cylinder.py`` — asserting against exact Poiseuille
flow and physical bounds instead of eyeballing)."""

import copy

import numpy as np
import pytest

from fenicssolver_tpu.core import (
    AutoSubDomain,
    Constant,
    Expression,
    UnitSquareMesh,
    near,
)
from fenicssolver_tpu.solvers.navier_stokes import CoupledNavierStokesSolver

U_MAX = 0.3
NU = 0.05
RHO = 1000.0


def channel_settings(nx=8, ny=8, transient=False):
    mesh = UnitSquareMesh(nx, ny)
    inlet = AutoSubDomain(lambda x: near(x[0], 0.0))
    outlet = AutoSubDomain(lambda x: near(x[0], 1.0))
    top = AutoSubDomain(lambda x: near(x[1], 1.0))
    bottom = AutoSubDomain(lambda x: near(x[1], 0.0))
    parabola = Expression(
        ("umax*4.0*x[1]*(1.0-x[1])", "0"), umax=U_MAX, degree=2
    )
    bcs = {
        "inlet": {
            "boundary": inlet,
            "boundary_id": 1,
            "values": [
                {"variable": "velocity", "type": "Dirichlet", "value": parabola}
            ],
        },
        "outlet": {
            "boundary": outlet,
            "boundary_id": 2,
            "values": [
                {"variable": "pressure", "type": "Dirichlet", "value": 0.0}
            ],
        },
        "top": {
            "boundary": top,
            "boundary_id": 3,
            "values": [
                {"variable": "velocity", "type": "Dirichlet", "value": (0.0, 0.0)}
            ],
        },
        "bottom": {
            "boundary": bottom,
            "boundary_id": 4,
            "values": [
                {"variable": "velocity", "type": "Dirichlet", "value": (0.0, 0.0)}
            ],
        },
    }
    return {
        "solver_name": "CoupledNavierStokesSolver",
        "mesh": mesh,
        "fe_degree": 1,  # Taylor-Hood: velocity P2, pressure P1
        "boundary_conditions": bcs,
        "body_source": None,
        "initial_values": {"velocity": (0.0, 0.0), "pressure": 0.0},
        "material": {"density": RHO, "kinematic_viscosity": NU},
        "solver_settings": {
            "transient_settings": {
                "transient": transient,
                "starting_time": 0,
                "time_step": 0.05,
                "ending_time": 0.2,
            },
            "reference_values": {"temperature": 293, "pressure": 101325},
            "solver_parameters": {
                "relative_tolerance": 1e-11,
                "maximum_iterations": 100,
                "monitor_convergence": False,
            },
        },
        "report_settings": {
            "plotting_freq": 0,
            "saving_freq": 0,
            "plotting_interactive": False,
            "logging_level": 40,
        },
    }


def poiseuille_exact(solver):
    """u = (4 U y (1-y), 0); p/rho falls linearly: dp/dx = -8 nu U / H^2."""
    W = solver.function_space
    Vv, Q = W.subspaces[0], W.subspaces[1]
    Xv = Vv.scalar_space.dof_coords
    Xp = Q.dof_coords
    u_ex = np.zeros((Xv.shape[0], 2))
    u_ex[:, 0] = 4 * U_MAX * Xv[:, 1] * (1 - Xv[:, 1])
    dpdx = -8.0 * NU * U_MAX * RHO  # dynamic pressure gradient
    p_ex = dpdx * (Xp[:, 0] - 1.0)  # p = 0 at outlet x=1
    return u_ex, p_ex


def check_poiseuille(solver, up, tol_u, tol_p):
    u_ex, p_ex = poiseuille_exact(solver)
    W = solver.function_space
    u = up.values[W.slice_of(0)].reshape(-1, 2)
    p = up.values[W.slice_of(1)]
    err_u = np.linalg.norm(u - u_ex) / np.linalg.norm(u_ex)
    err_p = np.linalg.norm(p - p_ex) / max(np.linalg.norm(p_ex), 1e-300)
    assert err_u < tol_u, (err_u, err_p)
    assert err_p < tol_p, (err_u, err_p)


def test_poiseuille_newton():
    """Steady Poiseuille flow is exactly representable by Taylor-Hood."""
    solver = CoupledNavierStokesSolver(channel_settings())
    up = solver.solve()
    check_poiseuille(solver, up, 1e-9, 1e-8)


def test_poiseuille_picard():
    """Same flow through the Picard under-relaxation path (reference
    ``test_flow_pass_cylinder.py:131`` pattern)."""
    solver = CoupledNavierStokesSolver(channel_settings())
    solver.using_nonlinear_solver = False
    up = solver.solve()
    check_poiseuille(solver, up, 1e-3, 1e-2)


def test_poiseuille_transient():
    """Backward-Euler startup flows toward the steady profile."""
    solver = CoupledNavierStokesSolver(channel_settings(transient=True))
    up = solver.solve()
    # nu*t/H^2 = 0.05*0.2 = small: not fully developed; just check sanity
    W = solver.function_space
    u = up.values[W.slice_of(0)].reshape(-1, 2)
    assert np.isfinite(u).all()
    assert u[:, 0].max() <= U_MAX * 1.05


def test_lid_driven_cavity():
    """Re=100 lid-driven cavity: classic sanity values (Ghia et al.)."""
    mesh = UnitSquareMesh(12, 12)
    lid = AutoSubDomain(lambda x: near(x[1], 1.0))
    walls = AutoSubDomain(
        lambda x: near(x[0], 0.0) | near(x[0], 1.0) | near(x[1], 0.0)
    )
    bcs = {
        "walls": {
            "boundary": walls,
            "boundary_id": 1,
            "values": [
                {"variable": "velocity", "type": "Dirichlet", "value": (0.0, 0.0)}
            ],
        },
        "lid": {
            "boundary": lid,
            "boundary_id": 2,
            "values": [
                {"variable": "velocity", "type": "Dirichlet", "value": (1.0, 0.0)}
            ],
        },
    }
    s = channel_settings()
    s["mesh"] = mesh
    s["boundary_conditions"] = bcs
    s["material"] = {"density": 1.0, "kinematic_viscosity": 0.01}  # Re = 100
    solver = CoupledNavierStokesSolver(s)
    up = solver.solve()
    W = solver.function_space
    u = up.values[W.slice_of(0)].reshape(-1, 2)
    assert np.isfinite(u).all()
    X = W.subspaces[0].scalar_space.dof_coords
    # u_x at the vertical centerline midheight is negative (return flow),
    # Ghia: u_x(0.5, 0.5) ~ -0.20 for Re=100
    mid = (np.abs(X[:, 0] - 0.5) < 1e-9) & (np.abs(X[:, 1] - 0.5) < 1e-9)
    assert mid.any()
    ux_mid = u[mid, 0].mean()
    assert -0.35 < ux_mid < -0.05, ux_mid


def test_coupled_temperature():
    """u-p-T coupled: hot bottom wall heats the channel flow."""
    s = channel_settings(nx=6, ny=6)
    s["solving_temperature"] = True
    s["initial_values"]["temperature"] = 300.0
    s["material"].update(
        {"specific_heat_capacity": 100.0, "thermal_conductivity": 10.0}
    )
    s["boundary_conditions"]["inlet"]["values"].append(
        {"variable": "temperature", "type": "Dirichlet", "value": 300.0}
    )
    s["boundary_conditions"]["bottom"]["values"].append(
        {"variable": "temperature", "type": "Dirichlet", "value": 350.0}
    )
    solver = CoupledNavierStokesSolver(s)
    up = solver.solve()
    W = solver.function_space
    T = up.values[W.slice_of(2)]
    assert np.isfinite(T).all()
    assert T.min() > 299.0 and T.max() < 351.0
    assert T.mean() > 300.5  # heated above the inlet temperature


def test_drag_lift_and_stress_postproc():
    solver = CoupledNavierStokesSolver(channel_settings(nx=6, ny=6))
    up = solver.solve()
    drag, lift = solver.calc_drag_and_lift(up, 0, 1, [3, 4])
    # wall shear resists the flow: total x-force on walls from fluid is
    # positive drag = - integral sigma.n (n pointing out of fluid)
    tau_wall = RHO * NU * 4 * U_MAX  # mu * du/dy at y=0
    assert np.isfinite(drag) and np.isfinite(lift)
    assert abs(abs(drag) - 2 * tau_wall) / (2 * tau_wall) < 0.15, (
        drag, 2 * tau_wall,
    )
    verts, traction = solver.boundary_traction(up)
    assert np.isfinite(traction).all()
