"""WavePropagationSolver (solvers/wave.py): the reference PROMISES wave
propagation and never ships it (``Readme.md:41``).  Implicit Newmark
average-acceleration in u-form, consistent second-order start.

Anchors: the (1,1) standing mode u = cos(w t) sin(pi x) sin(pi y) with
w = c pi sqrt(2) (O(dt^2) error), dt-convergence of the scheme, and
discrete energy conservation."""

import numpy as np
import pytest

from fenicssolver_tpu.core import AutoSubDomain, FunctionSpace, UnitSquareMesh, near
from fenicssolver_tpu.solvers.wave import WavePropagationSolver

C = 2.0


def _edge(a, w):
    return lambda x: near(x[a], w)


def settings(Q, dt, t_end, mode):
    bcs = {}
    for i, (axis_i, val_i) in enumerate(
        [(0, 0.0), (0, 1.0), (1, 0.0), (1, 1.0)]
    ):
        dom = AutoSubDomain(_edge(axis_i, val_i))
        bcs[f"b{i}"] = {
            "boundary": dom,
            "boundary_id": i + 1,
            "values": [
                {"variable": "amplitude", "type": "Dirichlet", "value": 0.0}
            ],
        }
    return {
        "solver_name": "WavePropagationSolver",
        "function_space": Q,
        "boundary_conditions": bcs,
        "initial_values": {"amplitude": mode, "amplitude_velocity": 0.0},
        "material": {"wave_speed": C},
        "solver_settings": {
            "transient_settings": {
                "transient": True,
                "starting_time": 0.0,
                "time_step": dt,
                "ending_time": t_end,
            },
            "reference_values": {},
            "solver_parameters": {
                "relative_tolerance": 1e-12,
                "maximum_iterations": 500,
            },
        },
        "report_settings": {"plotting_freq": 0, "saving_freq": 0,
                            "logging_level": 40},
        "scalar_name": "amplitude",
    }


def run(n, dt, t_end, degree=2):
    mesh = UnitSquareMesh(n, n)
    Q = FunctionSpace(mesh, "CG", degree)
    X = Q.dof_coords
    mode = np.sin(np.pi * X[:, 0]) * np.sin(np.pi * X[:, 1])
    solver = WavePropagationSolver(settings(Q, dt, t_end, mode))
    u = solver.solve()
    w = C * np.pi * np.sqrt(2.0)
    ref = np.cos(w * t_end) * mode
    err = np.linalg.norm(u.values - ref) / np.linalg.norm(mode)
    return solver, u, err


def test_standing_mode():
    _, _, err = run(16, 0.0025, 0.2)
    assert err < 2e-3, err


def test_dt_convergence_second_order():
    _, _, e1 = run(24, 0.01, 0.2)
    _, _, e2 = run(24, 0.005, 0.2)
    # spatial error is ~1e-4 at n=24 P2; temporal part should drop ~4x
    assert e2 < 0.4 * e1, (e1, e2)


def test_energy_conserved():
    solver, u, _ = run(12, 0.005, 0.3)
    E_end = solver.energy()
    # initial energy of the mode: PE = c^2/2 * |grad u0|^2 = c^2 pi^2/4
    E0 = C * C * np.pi**2 / 4.0
    assert E_end == pytest.approx(E0, rel=5e-3)


def test_cli_dispatch():
    from fenicssolver_tpu.main import main as fst_main

    mesh = UnitSquareMesh(6, 6)
    Q = FunctionSpace(mesh, "CG", 1)
    X = Q.dof_coords
    mode = np.sin(np.pi * X[:, 0]) * np.sin(np.pi * X[:, 1])
    fst_main(settings(Q, 0.01, 0.05, mode))
