"""Electrostatics + functional-assembly tests (reference parity:
``examples/test_electrostatics.py`` — with the flux check ASSERTED against
the analytic value instead of printed)."""

import numpy as np

from fenicssolver_tpu.compat import (
    AutoSubDomain,
    Constant,
    FacetNormal,
    FunctionSpace,
    Measure,
    MeshFunction,
    UnitSquareMesh,
    assemble,
    dot,
    grad,
    near,
)
from fenicssolver_tpu.solvers.scalar_transport import (
    ScalarTransportSolver,
    electric_permittivity_in_vacumm,
)

V_high, V_low, V_ground = 360.0, 300.0, 300.0
rel_eps = 11.7
epsilon = rel_eps * electric_permittivity_in_vacumm
electric_displacement = (V_high - V_low) / 1.0 * epsilon


def make_settings(Q, bcs):
    return {
        "solver_name": "ScalarTransportSolver",
        "mesh": None,
        "function_space": Q,
        "boundary_conditions": bcs,
        "body_source": None,
        "initial_values": {"electric_potential": V_ground},
        "material": {
            "name": "silicon",
            "density": 2500,
            "relative_electric_permittivity": rel_eps,
            "electric_conductivity": 1.0 / 2300,
        },
        "solver_settings": {
            "transient_settings": {
                "transient": False,
                "starting_time": 0,
                "time_step": 0.1,
                "ending_time": 1,
            },
            "reference_values": {
                "temperature": 300,
                "electric_potential": V_ground,
            },
            "solver_parameters": {
                "relative_tolerance": 1e-12,
                "maximum_iterations": 500,
                "monitor_convergence": False,
            },
        },
        "report_settings": {
            "plotting_freq": 0,
            "saving_freq": 0,
            "plotting_interactive": False,
            "logging_level": 40,
        },
        "scalar_name": "electric_potential",
    }


def test_electrostatics_flux_matches_analytic():
    mesh = UnitSquareMesh(20, 20)
    Q = FunctionSpace(mesh, "CG", 1)
    top = AutoSubDomain(lambda x: near(x[1], 1.0))
    bottom = AutoSubDomain(lambda x: near(x[1], 0.0))
    left = AutoSubDomain(lambda x: near(x[0], 0.0))
    right = AutoSubDomain(lambda x: near(x[0], 1.0))
    bcs = {
        "high": {
            "boundary": top,
            "boundary_id": 1,
            "type": "Dirichlet",
            "value": Constant(V_high),
        },
        "low": {
            "boundary": bottom,
            "boundary_id": 2,
            "type": "Dirichlet",
            "value": Constant(V_low),
        },
        "left": {
            "boundary": left,
            "boundary_id": 3,
            "type": "flux",
            "value": Constant(0),
        },
        "right": {
            "boundary": right,
            "boundary_id": 4,
            "type": "flux",
            "value": Constant(0),
        },
    }
    solver = ScalarTransportSolver(make_settings(Q, bcs))
    T = solver.solve()

    # linear potential profile
    y = Q.dof_coords[:, 1]
    T_exact = V_low + (V_high - V_low) * y
    err = np.linalg.norm(T.values - T_exact) / np.linalg.norm(T_exact)
    assert err < 1e-10, err

    # functional assembly: electric displacement integral on the bottom
    # (the reference's print-and-eyeball check, asserted here)
    normal = FacetNormal(mesh)
    boundary_facets = MeshFunction("size_t", mesh, mesh.tdim - 1)
    boundary_facets.set_all(0)
    bottom.mark(boundary_facets, 1)
    ds = Measure("ds", subdomain_data=boundary_facets)
    flux = assemble(epsilon * dot(grad(T), normal) * ds(1))
    # outward normal at the bottom is -y: flux = -epsilon dV/dy = -D
    assert abs(-flux - electric_displacement) / electric_displacement < 1e-9


def test_functional_assembly_dx():
    """Volume integral of a Function over the mesh."""
    from fenicssolver_tpu.compat import interpolate, Expression

    mesh = UnitSquareMesh(8, 8)
    Q = FunctionSpace(mesh, "CG", 1)
    f = interpolate(Expression("x[0]", degree=1), Q)
    from fenicssolver_tpu.ops.functional import IntegralForm

    val = assemble(f * Measure("dx"))
    assert abs(val - 0.5) < 1e-12
    val2 = assemble(dot(grad(f), grad(f)) * Measure("dx"))
    assert abs(val2 - 1.0) < 1e-12
