"""Contact mechanics example (beyond parity — ``/root/reference`` has no
contact anywhere): a hyperelastic block is pressed onto a rigid plane
and then indented by a rigid ball.

The penalty formulation adds the facet energy k/2 <gap(X+u)>_-^2 on the
candidate surface; residual and consistent active-set tangent come from
the same per-element autodiff as every other term.  Checks: the contact
integral balances the imposed-displacement reaction exactly (global
equilibrium), penetration scales as 1/k, and the ball contact stays
localized under the indenter.
"""

import numpy as np

from config import is_interactive

interactively = is_interactive()

from fenicssolver_tpu.compat import *  # noqa: F403
from fenicssolver_tpu.solvers.nonlinear_elasticity import (
    NonlinearElasticitySolver,
)

E, NU = 10.0, 0.3


def settings(delta, contact, nx=10):
    mesh = UnitSquareMesh(nx, nx)  # noqa: F405
    top = AutoSubDomain(lambda x: near(x[1], 1.0))  # noqa: F405
    return {
        "solver_name": "NonlinearElasticitySolver",
        "mesh": mesh,
        "fe_degree": 1,
        "boundary_conditions": {
            "top": {"boundary": top, "boundary_id": 1, "type": "Dirichlet",
                    "value": Constant((0.0, -delta))},  # noqa: F405
        },
        "contact_settings": contact,
        "material": {"elastic_modulus": E, "poisson_ratio": NU,
                     "density": 1.0},
        "solver_settings": {
            "transient_settings": {"transient": False},
            "reference_values": {"temperature": 293},
            "solver_parameters": {"relative_tolerance": 1e-11,
                                  "maximum_iterations": 60,
                                  "monitor_convergence": False},
        },
        "report_settings": {"plotting_freq": 0, "saving_freq": 0,
                            "plotting_interactive": False,
                            "logging_level": 40},
    }


def test():
    bottom = AutoSubDomain(lambda x: near(x[1], 0.0))  # noqa: F405

    # 1) flat punch onto a rigid plane: equilibrium + 1/k scaling
    pens = []
    forces = []
    for k in (1e3 * E, 1e4 * E):
        contact = {"boundary": bottom,
                   "obstacle": {"type": "plane", "point": (0.0, 0.0),
                                "normal": (0.0, 1.0)},
                   "penalty": k}
        solver = NonlinearElasticitySolver(settings(0.05, contact))
        u = solver.solve()
        U = u.values.reshape(-1, 2)
        X = solver.function_space.scalar_space.dof_coords
        bot = np.abs(X[:, 1]) < 1e-12
        pens.append(-(X[bot, 1] + U[bot, 1]).min())
        forces.append(solver.contact_force()[1])
    print(f"plane contact: force {forces[0]:.4f} (k) vs {forces[1]:.4f} "
          f"(10k); penetration {pens[0]:.2e} -> {pens[1]:.2e}")
    assert 6.0 < pens[0] / pens[1] < 14.0, pens
    assert abs(forces[1] - forces[0]) < 0.02 * forces[0], forces

    # 2) rigid ball indenter: localized contact patch
    ball = {"boundary": bottom,
            "obstacle": {"type": "sphere", "center": (0.5, -0.29),
                         "radius": 0.3},
            "penalty": 1e3 * E}
    solver = NonlinearElasticitySolver(settings(0.05, ball, nx=14))
    u = solver.solve()
    U = u.values.reshape(-1, 2)
    X = solver.function_space.scalar_space.dof_coords
    y = X + U
    bot = np.abs(X[:, 1]) < 1e-12
    g = np.linalg.norm(y[bot] - np.array([0.5, -0.29]), axis=1) - 0.3
    xb = X[bot, 0]
    fc = solver.contact_force()
    patch = np.abs(xb[np.abs(g) < 5e-3] - 0.5).max()
    print(f"ball indenter: contact force ({fc[0]:.2e}, {fc[1]:.4f}), "
          f"touching nodes within |x-0.5| <= {patch:.3f}")
    assert fc[1] > 0.0
    assert abs(fc[0]) < 0.05 * fc[1]
    assert (g[np.abs(xb - 0.5) > 0.4] > 0.05).all()

    if interactively:
        try:
            import matplotlib.pyplot as plt

            th = np.linspace(0, np.pi, 100)
            plt.plot(0.5 + 0.3 * np.cos(th), -0.29 + 0.3 * np.sin(th), "k-")
            plt.scatter(y[:, 0], y[:, 1], s=4)
            plt.gca().set_aspect("equal")
            plt.title("deformed block over the rigid ball")
            plt.show()
        except Exception:
            pass

    print("test_contact_mechanics: OK")


if __name__ == "__main__":
    test()
