"""Hyperelasticity example (ported from the reference's
``examples/test_nonlinear_elasticity.py``: the dolfin hyperelasticity-demo
unit-cube twist)."""

import numpy as np

from config import is_interactive

interactively = is_interactive()

from fenicssolver_tpu.compat import *  # noqa: F403
from fenicssolver_tpu.solvers.nonlinear_elasticity import NonlinearElasticitySolver


def test():
    mesh = UnitCubeMesh(6, 4, 4)  # coarser than the reference's 24x16x16
    B = Constant((0.0, -0.5, 0.0))

    left = CompiledSubDomain("near(x[0], side)", side=0.0)
    right = CompiledSubDomain("near(x[0], side)", side=1.0)
    c = Constant((0.0, 0.0, 0.0))
    r = Expression(
        (
            "scale*0.0",
            "scale*(y0 + (x[1] - y0)*cos(theta) - (x[2] - z0)*sin(theta) - x[1])",
            "scale*(z0 + (x[1] - y0)*sin(theta) + (x[2] - z0)*cos(theta) - x[2])",
        ),
        scale=0.5, y0=0.5, z0=0.5, theta=pi / 3, degree=2,
    )

    from collections import OrderedDict

    bcs = OrderedDict()
    bcs["left"] = {"boundary": left, "boundary_id": 1, "type": "Dirichlet",
                   "value": c}
    bcs["right"] = {"boundary": right, "boundary_id": 2, "type": "Dirichlet",
                    "value": r}

    s = {
        "solver_name": "NonlinearElasticitySolver",
        "mesh": mesh,
        "fe_degree": 1,
        "boundary_conditions": bcs,
        "body_source": B,
        "surface_source": {"value": Constant(0.1),
                           "direction": Constant((1, 0.0, 0.0))},
        "material": {
            "name": "rubber",
            "elastic_modulus": 10,
            "poisson_ratio": 0.3,
            "density": 800,
            "thermal_expansion_coefficient": 2e-6,
        },
        "solver_settings": {
            "transient_settings": {"transient": False, "starting_time": 0,
                                   "time_step": 0.1, "ending_time": 1},
            "reference_values": {"temperature": 293},
            "solver_parameters": {"relative_tolerance": 1e-10,
                                  "maximum_iterations": 50,
                                  "monitor_convergence": False},
        },
        "report_settings": {"plotting_freq": 0, "saving_freq": 0,
                            "plotting_interactive": False, "logging_level": 40},
    }
    solver = NonlinearElasticitySolver(s)
    u = solver.solve()
    assert np.isfinite(u.values).all()
    print("twist |u|_max =", float(np.abs(u.values).max()))
    if interactively:
        solver.plot()


if __name__ == "__main__":
    test()
    print("test_nonlinear_elasticity: OK")
