"""Distributed routing beyond the box lattice (round-3 VERDICT items 1+2):

- `distributed: true` on an UNSTRUCTURED mesh routes SPD solves through the
  sharded-AMG halo CG (parallel/amg_halo.py), not the Jacobi halo CG;
- nonlinear Newton solves (hyperelastic / large-deformation / plasticity)
  run their per-iteration linear solves sharded instead of silently
  serializing (reference: Newton under the same MPI as everything else,
  FenicsSolver/SolverBase.py:615-626 + :102-118);
- when only one device is visible, a WARNING fires and the solve falls
  back serial (no silent behavior change).
"""

import copy
import logging

import jax
import numpy as np
import pytest

from fenicssolver_tpu.core import (
    AutoSubDomain,
    Constant,
    FunctionSpace,
    near,
)
from fenicssolver_tpu.core.meshgen import perturbed_tet_box
from fenicssolver_tpu.solvers.scalar_transport import ScalarTransportSolver
from fenicssolver_tpu.solvers.nonlinear_elasticity import (
    NonlinearElasticitySolver,
)

from .test_nonlinear_elasticity import settings_3d


def _heat_settings(mesh, distributed=False):
    hot = AutoSubDomain(lambda x: near(x[0], 0.0))
    cold = AutoSubDomain(lambda x: near(x[0], 1.0))
    bcs = {
        "hot": {"boundary": hot, "boundary_id": 1, "type": "Dirichlet",
                "value": 360.0},
        "cold": {"boundary": cold, "boundary_id": 2, "type": "Dirichlet",
                 "value": 300.0},
    }
    return {
        "solver_name": "ScalarTransportSolver",
        "mesh": mesh,
        "scalar_name": "temperature",
        "boundary_conditions": bcs,
        "initial_values": {"temperature": 300.0},
        "material": {
            "density": 1000,
            "specific_heat_capacity": 4200,
            "thermal_conductivity": 0.6,
        },
        "solver_settings": {
            "transient_settings": {
                "transient": False, "starting_time": 0,
                "time_step": 0.1, "ending_time": 1,
            },
            "reference_values": {"temperature": 300.0},
            "solver_parameters": {
                "relative_tolerance": 1e-10,
                "maximum_iterations": 500,
                "monitor_convergence": False,
                **({"distributed": True} if distributed else {}),
            },
        },
        "report_settings": {
            "plotting_freq": 0, "saving_freq": 0,
            "plotting_interactive": False, "logging_level": 40,
        },
    }


def test_unstructured_distributed_routes_through_sharded_amg():
    # perturbed tets, no lattice_info: the lattice GMG cannot engage; the
    # sharded-AMG path must (and must match the serial solve at 1e-8)
    mesh_s = perturbed_tet_box(10, seed=5)
    mesh_d = perturbed_tet_box(10, seed=5)
    serial = ScalarTransportSolver(_heat_settings(mesh_s))
    T_s = serial.solve()
    dist = ScalarTransportSolver(_heat_settings(mesh_d, distributed=True))
    T_d = dist.solve()
    assert getattr(dist, "_halo_amg_solver", None) is not None, (
        "sharded AMG path did not engage on the unstructured mesh"
    )
    err = np.linalg.norm(T_d.values - T_s.values) / np.linalg.norm(T_s.values)
    assert err < 1e-8, err


def test_distributed_newton_hyperelastic_matches_serial():
    serial = NonlinearElasticitySolver(settings_3d(4))
    u_s = serial.solve()
    s = settings_3d(4)
    s["solver_settings"]["solver_parameters"]["distributed"] = True
    dist = NonlinearElasticitySolver(s)
    u_d = dist.solve()
    assert getattr(dist, "_halo_amg_solver", None) is not None, (
        "distributed Newton linear solves did not go through the halo path"
    )
    err = np.linalg.norm(u_d.values - u_s.values) / np.linalg.norm(u_s.values)
    assert err < 1e-8, err


def test_single_device_newton_warns_and_falls_back(monkeypatch, caplog):
    s = settings_3d(3)
    s["solver_settings"]["solver_parameters"]["distributed"] = True
    solver = NonlinearElasticitySolver(s)
    one = jax.devices()[:1]
    monkeypatch.setattr(jax, "devices", lambda *a, **k: one)
    solver.logger.setLevel(logging.WARNING)
    with caplog.at_level(logging.WARNING, logger=solver.logger.name):
        u = solver.solve()
    assert any(
        "distributed Newton solve requested but only one device" in r.message
        for r in caplog.records
    ), [r.message for r in caplog.records]
    assert np.isfinite(u.values).all()
