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
    FunctionSpace,
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


def _zero_flow_T_settings(nx=8, ny=8):
    """Coupled u-p-T with no flow: the T block reduces to pure conduction,
    giving analytic 1D anchors for the thermal boundary terms."""
    s = channel_settings(nx=nx, ny=ny)
    s["solving_temperature"] = True
    s["initial_values"]["temperature"] = 300.0
    s["material"].update(
        {"specific_heat_capacity": 100.0, "thermal_conductivity": 10.0}
    )
    s["boundary_conditions"]["inlet"]["values"][0]["value"] = (0.0, 0.0)
    s["boundary_conditions"]["bottom"]["values"].append(
        {"variable": "temperature", "type": "Dirichlet", "value": 300.0}
    )
    return s


def _coupled_T(s):
    solver = CoupledNavierStokesSolver(s)
    up = solver.solve()
    W = solver.function_space
    T = up.values[W.slice_of(2)]
    y = W.subspaces[2].dof_coords[:, 1]
    return T, y


def test_coupled_htc_wall_conduction_limit():
    """HTC on the temperature block of the mixed residual (VERDICT r1 item
    4; reference CoupledNavierStokesSolver.py:247-286 gets it via the
    embedded ScalarTransportSolver): k T' = h (Ta - T) at the wall gives the
    exact linear profile T = 300 + h*50/(k+h) * y."""
    s = _zero_flow_T_settings()
    s["boundary_conditions"]["top"]["values"].append(
        {"variable": "temperature", "type": "HTC", "value": 5.0,
         "ambient": 350.0}
    )
    T, y = _coupled_T(s)
    slope = 5.0 * 50.0 / (10.0 + 5.0)
    T_exact = 300.0 + slope * y
    err = np.linalg.norm(T - T_exact) / np.linalg.norm(T_exact)
    assert err < 1e-8, err


def test_coupled_heat_flux_wall_conduction_limit():
    """Raw heat-flux BC: k dT/dy = g at the top wall -> slope g/k."""
    s = _zero_flow_T_settings()
    s["boundary_conditions"]["top"]["values"].append(
        {"variable": "temperature", "type": "heat_flux", "value": 100.0}
    )
    T, y = _coupled_T(s)
    T_exact = 300.0 + (100.0 / 10.0) * y
    err = np.linalg.norm(T - T_exact) / np.linalg.norm(T_exact)
    assert err < 1e-8, err


def test_coupled_neumann_matches_segregated():
    """Neumann (fixedGradient) semantics must match the segregated
    ScalarTransportSolver (capacity scaling parity)."""
    from fenicssolver_tpu.solvers.scalar_transport import ScalarTransportSolver

    s = _zero_flow_T_settings()
    grad_val = 0.02
    s["boundary_conditions"]["top"]["values"].append(
        {"variable": "temperature", "type": "Neumann", "value": grad_val}
    )
    T, y = _coupled_T(s)

    mesh2 = UnitSquareMesh(8, 8)
    Q = FunctionSpace(mesh2, "CG", 1)
    bot = AutoSubDomain(lambda x: near(x[1], 0.0))
    top = AutoSubDomain(lambda x: near(x[1], 1.0))
    bcs = {
        "bottom": {"boundary": bot, "boundary_id": 1, "values": {
            "temperature": {"variable": "temperature", "type": "Dirichlet",
                            "value": 300.0}}},
        "top": {"boundary": top, "boundary_id": 2, "values": {
            "temperature": {"variable": "temperature", "type": "Neumann",
                            "value": grad_val}}},
    }
    s2 = {
        "solver_name": "ScalarTransportSolver", "scalar_name": "temperature",
        "mesh": None, "function_space": Q, "boundary_conditions": bcs,
        "initial_values": {"temperature": 300.0},
        "material": {"density": RHO, "specific_heat_capacity": 100.0,
                     "thermal_conductivity": 10.0},
        "solver_settings": {
            "transient_settings": {"transient": False, "starting_time": 0,
                                   "time_step": 0.1, "ending_time": 1},
            "reference_values": {"temperature": 300},
            "solver_parameters": {"relative_tolerance": 1e-12,
                                  "maximum_iterations": 500,
                                  "monitor_convergence": False}},
        "report_settings": {"plotting_freq": 0, "saving_freq": 0,
                            "plotting_interactive": False,
                            "logging_level": 40},
    }
    seg = ScalarTransportSolver(s2)
    T_seg = seg.solve().values
    # both are linear-in-y exact solutions on matching P1 nodes
    yq = Q.dof_coords[:, 1]
    fit_c = np.polyfit(y, T, 1)
    fit_s = np.polyfit(yq, T_seg, 1)
    assert np.allclose(fit_c, fit_s, rtol=1e-8), (fit_c, fit_s)


def test_coupled_htc_advective_matches_segregated():
    """Heated-wall channel (HTC) with Poiseuille advection: coupled NS-T vs
    the segregated ScalarTransportSolver on the same velocity field."""
    from fenicssolver_tpu.solvers.scalar_transport import ScalarTransportSolver

    s = channel_settings(nx=8, ny=8)
    s["solving_temperature"] = True
    s["initial_values"]["temperature"] = 300.0
    # moderate cell Peclet (~4) so the comparison tests BC parity, not
    # the two solvers' slightly different SUPG tau definitions
    s["material"].update(
        {"specific_heat_capacity": 2.0, "thermal_conductivity": 10.0}
    )
    s["boundary_conditions"]["inlet"]["values"].append(
        {"variable": "temperature", "type": "Dirichlet", "value": 300.0}
    )
    s["boundary_conditions"]["top"]["values"].append(
        {"variable": "temperature", "type": "HTC", "value": 20.0,
         "ambient": 360.0}
    )
    T, _ = _coupled_T(s)

    mesh2 = UnitSquareMesh(8, 8)
    Q = FunctionSpace(mesh2, "CG", 1)
    inlet = AutoSubDomain(lambda x: near(x[0], 0.0))
    top = AutoSubDomain(lambda x: near(x[1], 1.0))
    bcs = {
        "inlet": {"boundary": inlet, "boundary_id": 1, "values": {
            "temperature": {"variable": "temperature", "type": "Dirichlet",
                            "value": 300.0}}},
        "top": {"boundary": top, "boundary_id": 2, "values": {
            "temperature": {"variable": "temperature", "type": "HTC",
                            "value": 20.0, "ambient": 360.0}}},
    }
    s2 = {
        "solver_name": "ScalarTransportSolver", "scalar_name": "temperature",
        "mesh": None, "function_space": Q, "boundary_conditions": bcs,
        "initial_values": {"temperature": 300.0},
        "material": {"density": RHO, "specific_heat_capacity": 2.0,
                     "thermal_conductivity": 10.0},
        "convective_velocity": Expression(
            ("umax*4.0*x[1]*(1.0-x[1])", "0"), umax=U_MAX, degree=2
        ),
        "advection_settings": {"stabilization_method": "SPUG"},
        "solver_settings": {
            "transient_settings": {"transient": False, "starting_time": 0,
                                   "time_step": 0.1, "ending_time": 1},
            "reference_values": {"temperature": 300},
            "solver_parameters": {"relative_tolerance": 1e-12,
                                  "maximum_iterations": 500,
                                  "monitor_convergence": False}},
        "report_settings": {"plotting_freq": 0, "saving_freq": 0,
                            "plotting_interactive": False,
                            "logging_level": 40},
    }
    seg = ScalarTransportSolver(s2)
    T_seg = seg.solve().values
    err = np.linalg.norm(T - T_seg) / np.linalg.norm(T_seg - 300.0 + 1e-30)
    # same mesh/degree; SUPG tau definitions differ slightly between the two
    # solvers, so compare loosely on the temperature RISE
    rise_err = np.linalg.norm((T - 300) - (T_seg - 300)) / np.linalg.norm(
        T_seg - 300
    )
    assert rise_err < 0.05, rise_err


def test_taylor_hood_p3_p2_poiseuille():
    """fe_degree = 2 -> P3 velocity / P2 pressure Taylor-Hood (the P3
    element family, ROADMAP capability 9): exact Poiseuille."""
    s = channel_settings(nx=6, ny=6)
    s["fe_degree"] = 2
    solver = CoupledNavierStokesSolver(s)
    assert solver.vel_degree == 3
    up = solver.solve()
    check_poiseuille(solver, up, 1e-9, 1e-8)
