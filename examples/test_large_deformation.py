"""Large-deformation example (ported from the reference's
``examples/test_large_deformation.py``: 2D beam, compressible nu=0.3 and
incompressible nu=0.5)."""

import numpy as np

from config import is_interactive

interactively = is_interactive()

from fenicssolver_tpu.compat import *  # noqa: F403
from fenicssolver_tpu.solvers.large_deformation import LargeDeformationSolver


def solve_elasticity(twod, n, E, nu, dt, t_end, name):
    gdim = 2
    mesh = RectangleMesh(Point(0, 0), Point(2.0, 0.2), n, max(n // 8, 2))
    x1 = 2.0
    left = AutoSubDomain(lambda x: near(x[0], 0.0))
    right = AutoSubDomain(lambda x: near(x[0], x1))

    from collections import OrderedDict

    bcs = OrderedDict()
    bcs["fixed"] = {
        "boundary": left, "boundary_id": 1, "type": "Dirichlet",
        "variable": "displacement", "value": gdim * (0.0,),
    }
    bcs["fixed_velocity"] = {
        "boundary": left, "boundary_id": 1, "type": "Dirichlet",
        "variable": "velocity", "value": gdim * (0.0,),
    }
    bcs["stress_b"] = {
        "boundary": right, "boundary_id": 2, "type": "force", "value": (0, 5),
    }

    s = {
        "solver_name": "LargeDeformationSolver",
        "mesh": mesh,
        "fe_degree": 1,
        "boundary_conditions": bcs,
        "material": {
            "name": "steel", "elastic_modulus": E, "poisson_ratio": nu,
            "density": 1000, "thermal_expansion_coefficient": 2e-6,
        },
        "solver_settings": {
            "transient_settings": {
                "transient": True, "starting_time": 0,
                "time_step": dt, "ending_time": t_end,
            },
            "reference_values": {"temperature": 293},
            "solver_parameters": {"relative_tolerance": 1e-8,
                                  "maximum_iterations": 50,
                                  "monitor_convergence": False},
        },
        "report_settings": {"plotting_freq": 0, "saving_freq": 0,
                            "plotting_interactive": False, "logging_level": 40},
    }
    solver = LargeDeformationSolver(s)
    w = solver.solve()
    assert np.isfinite(w.values).all()
    u = solver.displacement()
    print(f"{name}: |u|_max = {float(np.abs(u.values).max()):.4g}")
    if interactively:
        solver.plot()
    return solver


if __name__ == "__main__":
    solve_elasticity(True, 16, 1e5, 0.3, 0.05, 0.2, "results_2d_comp")
    solve_elasticity(True, 16, 1e5, 0.5, 0.05, 0.2, "results_2d_incomp")
    print("test_large_deformation: OK")
