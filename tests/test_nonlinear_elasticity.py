"""Hyperelastic + large-deformation tests (reference parity:
``examples/test_nonlinear_elasticity.py``, ``examples/test_large_deformation.py``)."""

import numpy as np
import pytest

from fenicssolver_tpu.core import (
    AutoSubDomain,
    Constant,
    Expression,
    Point,
    RectangleMesh,
    UnitCubeMesh,
    UnitSquareMesh,
    near,
)
from fenicssolver_tpu.solvers.large_deformation import LargeDeformationSolver
from fenicssolver_tpu.solvers.nonlinear_elasticity import NonlinearElasticitySolver


def settings_3d(mesh_n=4):
    """Unit-cube twist: the dolfin hyperelasticity demo boundary conditions
    the reference example reuses (``test_nonlinear_elasticity.py:46-63``)."""
    mesh = UnitCubeMesh(mesh_n, mesh_n, mesh_n)
    left = AutoSubDomain(lambda x: near(x[0], 0.0))
    right = AutoSubDomain(lambda x: near(x[0], 1.0))
    c = Constant((0.0, 0.0, 0.0))
    r = Expression(
        (
            "scale*0.0",
            "scale*(y0 + (x[1] - y0)*cos(theta) - (x[2] - z0)*sin(theta) - x[1])",
            "scale*(z0 + (x[1] - y0)*sin(theta) + (x[2] - z0)*cos(theta) - x[2])",
        ),
        scale=0.5,
        y0=0.5,
        z0=0.5,
        theta=np.pi / 3,
        degree=2,
    )
    bcs = {
        "left": {"boundary": left, "boundary_id": 1, "type": "Dirichlet", "value": c},
        "right": {"boundary": right, "boundary_id": 2, "type": "Dirichlet", "value": r},
    }
    return {
        "solver_name": "NonlinearElasticitySolver",
        "mesh": mesh,
        "fe_degree": 1,
        "boundary_conditions": bcs,
        "body_source": Constant((0.0, -0.5, 0.0)),
        "material": {
            "elastic_modulus": 10,
            "poisson_ratio": 0.3,
            "density": 800,
            "thermal_expansion_coefficient": 2e-6,
        },
        "solver_settings": {
            "transient_settings": {
                "transient": False,
                "starting_time": 0,
                "time_step": 0.1,
                "ending_time": 1,
            },
            "reference_values": {"temperature": 293},
            "solver_parameters": {
                "relative_tolerance": 1e-10,
                "maximum_iterations": 50,
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


def test_neo_hookean_twist():
    """The hyperelasticity-demo twist converges via Newton and the
    Dirichlet data is satisfied exactly."""
    s = settings_3d(4)
    solver = NonlinearElasticitySolver(s)
    u = solver.solve()
    U = u.values.reshape(-1, 3)
    assert np.isfinite(U).all()
    V = solver.function_space
    X = V.scalar_space.dof_coords
    left = np.abs(X[:, 0]) < 1e-12
    assert np.abs(U[left]).max() < 1e-12
    # the twisted face matches the rotation expression
    right = np.abs(X[:, 0] - 1.0) < 1e-12
    theta, scale = np.pi / 3, 0.5
    y, z = X[right, 1], X[right, 2]
    uy = scale * (0.5 + (y - 0.5) * np.cos(theta) - (z - 0.5) * np.sin(theta) - y)
    uz = scale * (0.5 + (y - 0.5) * np.sin(theta) + (z - 0.5) * np.cos(theta) - z)
    assert np.abs(U[right, 1] - uy).max() < 1e-10
    assert np.abs(U[right, 2] - uz).max() < 1e-10
    # interior deformed but bounded
    assert 0 < np.abs(U).max() < 1.0


def test_neo_hookean_small_strain_matches_linear():
    """For tiny loads the neo-Hookean solution matches linear elasticity."""
    from fenicssolver_tpu.core import VectorFunctionSpace
    from fenicssolver_tpu.solvers.linear_elasticity import LinearElasticitySolver

    mesh = UnitSquareMesh(6, 6)
    V = VectorFunctionSpace(mesh, "CG", 1)
    left = AutoSubDomain(lambda x: near(x[0], 0.0))
    right = AutoSubDomain(lambda x: near(x[0], 1.0))
    s_mag = 1e-4  # tiny stress -> linear regime (E = 10)
    bcs = {
        "left": {
            "boundary": left,
            "boundary_id": 1,
            "type": "Dirichlet",
            "value": Constant((0.0, 0.0)),
        },
        "right": {
            "boundary": right,
            "boundary_id": 2,
            "type": "stress",
            "value": (s_mag, 0.0),
        },
    }
    base = {
        "mesh": None,
        "function_space": V,
        "boundary_conditions": bcs,
        "temperature_distribution": None,
        "material": {
            "elastic_modulus": 10.0,
            "poisson_ratio": 0.3,
            "density": 800,
            "thermal_expansion_coefficient": 2e-6,
        },
        "solver_settings": {
            "transient_settings": {
                "transient": False,
                "starting_time": 0,
                "time_step": 0.1,
                "ending_time": 1,
            },
            "reference_values": {"temperature": 293},
            "solver_parameters": {
                "relative_tolerance": 1e-12,
                "maximum_iterations": 50,
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
    import copy

    lin = LinearElasticitySolver(copy.deepcopy(base))
    u_lin = lin.solve()
    V2 = VectorFunctionSpace(mesh, "CG", 1)
    base["function_space"] = V2
    nl = NonlinearElasticitySolver(copy.deepcopy(base))
    u_nl = nl.solve()
    diff = np.linalg.norm(u_nl.values - u_lin.values) / np.linalg.norm(u_lin.values)
    assert diff < 1e-3, diff


@pytest.mark.parametrize("nu", [0.3, 0.5])
def test_large_deformation_2d(nu):
    """2D beam under tip force, compressible and incompressible
    (reference ``test_large_deformation.py:95-96``)."""
    mesh = RectangleMesh(Point(0, 0), Point(2.0, 0.2), 10, 2)
    left = AutoSubDomain(lambda x: near(x[0], 0.0))
    right = AutoSubDomain(lambda x: near(x[0], 2.0))
    bcs = {
        "fixed": {
            "boundary": left,
            "boundary_id": 1,
            "type": "Dirichlet",
            "variable": "displacement",
            "value": (0.0, 0.0),
        },
        "fixed_velocity": {
            "boundary": left,
            "boundary_id": 1,
            "type": "Dirichlet",
            "variable": "velocity",
            "value": (0.0, 0.0),
        },
        "stress_b": {
            "boundary": right,
            "boundary_id": 2,
            "type": "force",
            "value": (0, 5),
        },
    }
    s = {
        "solver_name": "LargeDeformationSolver",
        "mesh": mesh,
        "fe_degree": 1,
        "boundary_conditions": bcs,
        "material": {
            "elastic_modulus": 1e5,
            "poisson_ratio": nu,
            "density": 1000,
            "thermal_expansion_coefficient": 2e-6,
        },
        "solver_settings": {
            "transient_settings": {
                "transient": True,
                "starting_time": 0,
                "time_step": 0.05,
                "ending_time": 0.2,
            },
            "reference_values": {"temperature": 293},
            "solver_parameters": {
                "relative_tolerance": 1e-8,
                "maximum_iterations": 50,
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
    solver = LargeDeformationSolver(s)
    w = solver.solve()
    assert np.isfinite(w.values).all()
    u = solver.displacement()
    U = u.values.reshape(-1, 2)
    assert np.isfinite(U).all()
    # tip moves upward under the upward force
    X = solver.function_space.subspaces[0].scalar_space.dof_coords
    tip = np.abs(X[:, 0] - 2.0) < 1e-9
    assert U[tip, 1].mean() > 0
    # clamped edge stays fixed
    root = np.abs(X[:, 0]) < 1e-9
    assert np.abs(U[root]).max() < 1e-10
