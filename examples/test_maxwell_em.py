"""Maxwell electromagnetics example — the reference lists this solver as
"under development" and never ships it (``Readme.md:40``); delivered here.

A current-carrying strip between two grounded planes (the 2D slab
analog of a busbar): magnetostatic vector potential A_z, post-processed
B = curl A with the analytic peak value and field energy asserted, then
a magneto-quasistatic (eddy-current) decay transient whose rate matches
the analytic eigenvalue.
"""

import numpy as np

from config import is_interactive

interactively = is_interactive()

from fenicssolver_tpu.compat import *  # noqa: F403
from fenicssolver_tpu.solvers.maxwell import (
    MaxwellEMSolver,
    magnetic_permeability_in_vacuum as MU0,
)

mesh = UnitSquareMesh(20, 20)
Q = FunctionSpace(mesh, "CG", 2)

left = AutoSubDomain(lambda x: near(x[0], 0.0))
right = AutoSubDomain(lambda x: near(x[0], 1.0))

J0 = 1.0e6  # A/m^2 in the strip
X1, X2 = 0.4, 0.6

bcs = {
    "left": {"boundary": left, "boundary_id": 1, "values": [
        {"variable": "magnetic_potential", "type": "Dirichlet", "value": 0.0}
    ]},
    "right": {"boundary": right, "boundary_id": 2, "values": [
        {"variable": "magnetic_potential", "type": "Dirichlet", "value": 0.0}
    ]},
}

settings = {
    "solver_name": "MaxwellEMSolver",
    "mesh": None,
    "function_space": Q,
    "boundary_conditions": bcs,
    "body_source": Expression(
        "J0*(x[0] > x1)*(x[0] < x2)", degree=0, J0=J0, x1=X1, x2=X2
    ),
    "initial_values": {"magnetic_potential": 0.0},
    "material": {"name": "air", "relative_magnetic_permeability": 1.0},
    "solver_settings": {
        "transient_settings": {"transient": False, "starting_time": 0,
                               "time_step": 0.002, "ending_time": 0.02},
        "reference_values": {},
        "solver_parameters": {"relative_tolerance": 1e-12,
                              "maximum_iterations": 500,
                              "monitor_convergence": False},
    },
    "report_settings": {"plotting_freq": 0, "saving_freq": 0,
                        "plotting_interactive": False, "logging_level": 40},
    "scalar_name": "magnetic_potential",
}


def test():
    solver = MaxwellEMSolver(settings)
    A = solver.solve()
    # peak flux density at the strip edges: B_max = mu0 J0 w / 2
    B, wdet = solver.magnetic_flux_density_qp(A)
    B_max = float(np.abs(np.asarray(B)).max())
    B_ref = MU0 * J0 * (X2 - X1) / 2.0
    print(f"B_max = {B_max:.6e} T (analytic {B_ref:.6e})")
    assert abs(B_max - B_ref) / B_ref < 1e-6
    E = solver.magnetic_energy(A)
    print(f"magnetic energy = {E:.6e} J/m")
    assert E > 0

    # eddy-current decay: the (1,1) mode in a conductor with nu/sigma = 1
    tr = dict(settings)
    tr = {k: (dict(v) if isinstance(v, dict) else v) for k, v in settings.items()}
    tr["material"] = {"relative_magnetic_permeability": 1.0,
                      "electrical_conductivity": 1.0 / MU0}
    tr["body_source"] = None
    top = AutoSubDomain(lambda x: near(x[1], 1.0))
    bottom = AutoSubDomain(lambda x: near(x[1], 0.0))
    tr["boundary_conditions"] = dict(bcs)
    tr["boundary_conditions"]["top"] = {
        "boundary": top, "boundary_id": 3, "values": [
            {"variable": "magnetic_potential", "type": "Dirichlet",
             "value": 0.0}]}
    tr["boundary_conditions"]["bottom"] = {
        "boundary": bottom, "boundary_id": 4, "values": [
            {"variable": "magnetic_potential", "type": "Dirichlet",
             "value": 0.0}]}
    X = Q.dof_coords
    mode = np.sin(np.pi * X[:, 0]) * np.sin(np.pi * X[:, 1])
    tr["initial_values"] = {"magnetic_potential": mode}
    tr["solver_settings"]["transient_settings"] = {
        "transient": True, "starting_time": 0.0,
        "time_step": 0.002, "ending_time": 0.02,
    }
    solver2 = MaxwellEMSolver(tr)
    A2 = solver2.solve()
    lam = 2.0 * np.pi**2
    ref = mode * np.exp(-lam * 0.02)
    err = np.linalg.norm(A2.values - ref) / np.linalg.norm(ref)
    print(f"eddy-current decay rel error = {err:.2e}")
    assert err < 5e-3
    if interactively:
        solver.plot()


if __name__ == "__main__":
    test()
    print("test_maxwell_em: OK")
