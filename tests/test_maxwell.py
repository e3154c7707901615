"""MaxwellEMSolver (solvers/maxwell.py): the reference PROMISES this
solver and never shipped it (``Readme.md:40``,
``ScalarTransportSolver.py:35`` point at a nonexistent MaxwellEMSolver);
delivered here for the 2D out-of-plane vector-potential formulation.

Anchors:
- slab current sheet: -nu A'' = J on a strip -> piecewise-quadratic A,
  exactly representable by P2 (checked at 1e-8), B = curl A piecewise
  linear with the analytic jump;
- magneto-quasistatic decay: sigma dA/dt = nu Lap A with the (1,1)
  eigenmode -> exponential decay at rate (nu/sigma) 2 pi^2.
"""

import numpy as np
import pytest

from fenicssolver_tpu.core import (
    AutoSubDomain,
    Expression,
    FunctionSpace,
    UnitSquareMesh,
    near,
)
from fenicssolver_tpu.solvers.maxwell import (
    MaxwellEMSolver,
    magnetic_permeability_in_vacuum as MU0,
)

J0 = 2.0e6  # A/m^2 in the strip x in (x1, x2)
X1, X2 = 0.4, 0.6


def slab_settings(Q, transient=False, sigma=None):
    left = AutoSubDomain(lambda x: near(x[0], 0.0))
    right = AutoSubDomain(lambda x: near(x[0], 1.0))
    bcs = {
        "left": {
            "boundary": left,
            "boundary_id": 1,
            "values": [
                {"variable": "magnetic_potential", "type": "Dirichlet",
                 "value": 0.0}
            ],
        },
        "right": {
            "boundary": right,
            "boundary_id": 2,
            "values": [
                {"variable": "magnetic_potential", "type": "Dirichlet",
                 "value": 0.0}
            ],
        },
    }
    mat = {"relative_magnetic_permeability": 1.0}
    if sigma is not None:
        mat["electrical_conductivity"] = sigma
    return {
        "solver_name": "MaxwellEMSolver",
        "function_space": Q,
        "boundary_conditions": bcs,
        "body_source": Expression(
            "J0*(x[0] > x1)*(x[0] < x2)", degree=0, J0=J0, x1=X1, x2=X2
        ),
        "initial_values": {"magnetic_potential": 0.0},
        "material": mat,
        "solver_settings": {
            "transient_settings": {
                "transient": transient,
                "starting_time": 0.0,
                "time_step": 0.002,
                "ending_time": 0.02,
            },
            "reference_values": {},
            "solver_parameters": {
                "relative_tolerance": 1e-12,
                "maximum_iterations": 500,
            },
        },
        "report_settings": {"plotting_freq": 0, "saving_freq": 0,
                            "logging_level": 40},
        "scalar_name": "magnetic_potential",
    }


def A_exact(x):
    """-nu A'' = J0 on (X1, X2), A(0) = A(1) = 0, symmetric strip."""
    nu = 1.0 / MU0
    w = X2 - X1
    # total current per unit height I = J0 w; by symmetry A'(0.5) = 0
    # outside: A linear; inside: parabola
    A1 = J0 * w / (2.0 * nu)  # |A'| outside the strip
    A_at_X1 = A1 * X1
    x = np.asarray(x, dtype=float)
    inside = (x > X1) & (x < X2)
    lo = x < X1 + 1e-300
    Aout_l = A1 * x
    Aout_r = A1 * (1.0 - x)
    Ain = (
        A_at_X1
        + (J0 / nu) * (0.5 * w * (x - X1) - 0.5 * (x - X1) ** 2)
        - (J0 / (2.0 * nu)) * 0.0
    )
    # inside: A'' = -J0/nu, A'(X1+) = A1 -> A = A(X1) + A1 (x-X1) - J0/(2nu)(x-X1)^2
    Ain = A_at_X1 + A1 * (x - X1) - (J0 / (2.0 * nu)) * (x - X1) ** 2
    return np.where(x <= X1, Aout_l, np.where(x >= X2, Aout_r, Ain))


def test_magnetostatic_slab_exact_p2():
    mesh = UnitSquareMesh(10, 10)
    Q = FunctionSpace(mesh, "CG", 2)
    solver = MaxwellEMSolver(slab_settings(Q))
    A = solver.solve()
    X = Q.dof_coords
    ref = A_exact(X[:, 0])
    err = np.linalg.norm(A.values - ref) / np.linalg.norm(ref)
    assert err < 1e-8, err
    # B = (dA/dy, -dA/dx): B_y = -A'(x); check max |B| = mu0 J0 w / 2 at
    # the strip edges
    B, wdet = solver.magnetic_flux_density_qp(A)
    Bmax = float(np.abs(np.asarray(B)).max())
    assert Bmax == pytest.approx(MU0 * J0 * (X2 - X1) / 2.0, rel=1e-6)
    # energy positive and matches the 1D integral nu/2 int A'(x)^2
    E = solver.magnetic_energy(A)
    nu = 1.0 / MU0
    from scipy.integrate import quad

    dA = lambda x: np.gradient(A_exact(np.array([x - 1e-6, x + 1e-6])),
                               2e-6)[0]
    # analytic: piecewise; integrate |A'|^2 directly
    A1 = J0 * (X2 - X1) / (2.0 * nu)
    # outside both sides: A'^2 = A1^2 over length X1 + (1-X2)
    # inside: A' = A1 - (J0/nu)(x-X1): int over strip
    w = X2 - X1
    inside = quad(lambda x: (A1 - (J0 / nu) * (x - X1)) ** 2, X1, X2)[0]
    E_ref = 0.5 * nu * (A1**2 * (X1 + 1 - X2) + inside)
    assert E == pytest.approx(E_ref, rel=1e-6)


def test_eddy_current_decay_rate():
    """sigma dA/dt = nu Lap A: the (1,1) Dirichlet eigenmode decays as
    exp(-(nu/sigma) 2 pi^2 t); Crank-Nicolson tracks it to O(dt^2)."""
    sigma = 1.0 / MU0  # makes nu/sigma = 1 -> decay rate 2 pi^2
    mesh = UnitSquareMesh(16, 16)
    Q = FunctionSpace(mesh, "CG", 2)
    s = slab_settings(Q, transient=True, sigma=sigma)
    # all-boundary Dirichlet zero for the eigenmode
    top = AutoSubDomain(lambda x: near(x[1], 1.0))
    bottom = AutoSubDomain(lambda x: near(x[1], 0.0))
    s["boundary_conditions"]["top"] = {
        "boundary": top, "boundary_id": 3,
        "values": [{"variable": "magnetic_potential", "type": "Dirichlet",
                    "value": 0.0}],
    }
    s["boundary_conditions"]["bottom"] = {
        "boundary": bottom, "boundary_id": 4,
        "values": [{"variable": "magnetic_potential", "type": "Dirichlet",
                    "value": 0.0}],
    }
    s["body_source"] = None
    X = Q.dof_coords
    mode = np.sin(np.pi * X[:, 0]) * np.sin(np.pi * X[:, 1])
    s["initial_values"] = {"magnetic_potential": mode}
    dt, t_end = 0.002, 0.02
    s["solver_settings"]["transient_settings"].update(
        {"time_step": dt, "ending_time": t_end}
    )
    solver = MaxwellEMSolver(s)
    A = solver.solve()
    lam = 2.0 * np.pi**2  # nu/sigma = 1
    ref = mode * np.exp(-lam * t_end)
    err = np.linalg.norm(A.values - ref) / np.linalg.norm(ref)
    assert err < 5e-3, err


def test_rejects_3d():
    from fenicssolver_tpu.core import UnitCubeMesh
    from fenicssolver_tpu.solvers.solver_base import SolverError

    mesh = UnitCubeMesh(4, 4, 4)
    Q = FunctionSpace(mesh, "CG", 1)
    s = slab_settings(Q)
    with pytest.raises(SolverError):
        MaxwellEMSolver(s)


def test_cli_dispatch():
    """solver_name routes through main()."""
    from fenicssolver_tpu.main import main as fst_main

    mesh = UnitSquareMesh(6, 6)
    Q = FunctionSpace(mesh, "CG", 2)
    s = slab_settings(Q)
    fst_main(s)  # must not raise
