"""SolverBase plumbing: time series, dynamics, save(), HDF5 mesh input,
settings pretty-printer."""

import os

import numpy as np
import pytest

from fenicssolver_tpu.core import (
    AutoSubDomain,
    BoxMesh,
    Constant,
    FunctionSpace,
    Point,
    UnitSquareMesh,
    VectorFunctionSpace,
    near,
)
from fenicssolver_tpu.solvers.scalar_transport import ScalarTransportSolver

from .test_heat_transfer import base_settings, make_bcs


def test_time_series_stepping():
    """`time_series` drives non-uniform steps (the reference returned dt=0,
    SolverBase.py:447)."""
    mesh = UnitSquareMesh(6, 6)
    Q = FunctionSpace(mesh, "CG", 1)
    s = base_settings(Q, make_bcs())
    s["material"] = {"capacity": 1.0, "conductivity": 1.0}
    s["solver_settings"]["transient_settings"] = {
        "transient": True,
        "starting_time": 0.0,
        "time_step": None,
        "time_series": [0.0, 0.1, 0.3, 0.6, 1.0],
        "ending_time": 0.6,
    }
    solver = ScalarTransportSolver(s)
    assert solver.get_time_step(0) == pytest.approx(0.1)
    assert solver.get_time_step(2) == pytest.approx(0.3)
    assert solver.get_current_time(2) == pytest.approx(0.3)
    T = solver.solve()
    assert np.isfinite(T.values).all()


def test_time_series_boundary_value():
    """A numeric sequence longer than the spatial dimension in a transient
    run is a per-step time series -> value[current_step] (reference
    SolverBase.py:365-366; ADVICE r1: the old code returned a length-n
    Constant vector instead)."""
    mesh = UnitSquareMesh(4, 4)
    Q = FunctionSpace(mesh, "CG", 1)
    s = base_settings(Q, make_bcs())
    s["solver_settings"]["transient_settings"] = {
        "transient": True,
        "starting_time": 0.0,
        "time_step": 0.1,
        "ending_time": 0.5,
    }
    solver = ScalarTransportSolver(s)
    series = [300.0, 310.0, 320.0, 330.0, 340.0]
    solver.current_step = 0
    assert solver.translate_value(series) == pytest.approx(300.0)
    solver.current_step = 2
    assert solver.translate_value(series) == pytest.approx(320.0)
    # a length-==-dimension sequence stays a Constant vector
    c = solver.translate_value([1.0, 2.0])
    assert isinstance(c, Constant)
    assert np.allclose(c.values(), [1.0, 2.0])
    # steady case: a too-long numeric sequence is an error, not a vector
    steady = ScalarTransportSolver(base_settings(Q, make_bcs()))
    steady.current_step = 0
    with pytest.raises(Exception):
        steady.translate_value(series)


def test_time_series_dirichlet_solve():
    """End-to-end: a time-series Dirichlet value is applied per step."""
    mesh = UnitSquareMesh(6, 6)
    Q = FunctionSpace(mesh, "CG", 1)
    bcs = make_bcs()
    series = [300.0, 310.0, 320.0, 330.0, 340.0, 350.0]
    bcs["hot"]["values"]["temperature"]["value"] = series
    s = base_settings(Q, bcs)
    s["solver_settings"]["transient_settings"] = {
        "transient": True,
        "starting_time": 0.0,
        "time_step": 0.1,
        "ending_time": 0.35,
    }
    solver = ScalarTransportSolver(s)
    T = solver.solve()
    top = np.abs(Q.dof_coords[:, 1] - 1.0) < 1e-9
    vals = np.unique(np.round(T.values[top], 6))
    assert len(vals) == 1, "Dirichlet row not uniform"
    # the last applied value is one of the later series entries, not 300
    # and not the whole-series vector
    assert vals[0] in series[1:], vals
    """solving_dynamics adds the inertial term from acceleration history
    (reference :216-220 with the inverted-division bug fixed)."""
    from fenicssolver_tpu.solvers.linear_elasticity import LinearElasticitySolver
    from .test_linear_elasticity import solver_settings

    mesh = BoxMesh(Point(0, 0, 0), Point(2, 1, 1), 4, 2, 2)
    V = VectorFunctionSpace(mesh, "CG", 1)
    left = AutoSubDomain(lambda x: near(x[0], 0.0))
    right = AutoSubDomain(lambda x: near(x[0], 2.0))
    import math

    bcs = {
        "fixed": {"boundary": left, "boundary_id": 1, "type": "Dirichlet",
                  "value": Constant((0, 0, 0))},
        "pull": {
            "boundary": right, "boundary_id": 2, "type": "stress",
            "value": (lambda t: (1e6 * math.sin(20 * t), 0.0, 0.0)),
        },
    }
    s = solver_settings(V, bcs)
    s["solver_settings"]["transient_settings"] = {
        "transient": True, "starting_time": 0.0,
        "time_step": 0.01, "ending_time": 0.04,
    }
    solver = LinearElasticitySolver(s)
    solver.solving_dynamics = True
    u = solver.solve()
    assert np.isfinite(u.values).all()
    assert np.abs(u.values).max() > 0


def test_mixed_space_save(tmp_path):
    """save() splits mixed results into one PVD per variable (the reference
    crashed on ListTensor.rename, SolverBase.py:585)."""
    from fenicssolver_tpu.solvers.navier_stokes import CoupledNavierStokesSolver
    from .test_navier_stokes import channel_settings

    s = channel_settings(nx=4, ny=4)
    solver = CoupledNavierStokesSolver(s)
    solver.solve()
    out = str(tmp_path / "res.pvd")
    solver.save(out)
    assert (tmp_path / "res_velocity.pvd").exists()
    assert (tmp_path / "res_pressure.pvd").exists()


def test_hdf5_mesh_into_solver(tmp_path):
    from fenicssolver_tpu.io import meshio
    from fenicssolver_tpu.core import MeshFunction

    mesh = UnitSquareMesh(6, 6)
    mf = MeshFunction("size_t", mesh, mesh.tdim - 1)
    AutoSubDomain(lambda x: near(x[1], 1.0)).mark(mf, 1)
    AutoSubDomain(lambda x: near(x[1], 0.0)).mark(mf, 2)
    AutoSubDomain(lambda x: near(x[0], 0.0)).mark(mf, 3)
    fn = str(tmp_path / "m.h5")
    meshio.write_hdf5(fn, mesh, boundaries=mf.values)
    s = base_settings(None, make_bcs())
    s["function_space"] = None
    s["mesh"] = fn
    s["fe_degree"] = 1
    solver = ScalarTransportSolver(s)
    solver.material["conductivity"] = 0.6
    T = solver.solve()
    y = solver.function_space.dof_coords[:, 1]
    T_exact = 300 + 60 * y
    err = np.linalg.norm(T.values - T_exact) / np.linalg.norm(T_exact)
    assert err < 1e-9


def test_settings_pretty_print(capsys):
    mesh = UnitSquareMesh(3, 3)
    Q = FunctionSpace(mesh, "CG", 1)
    solver = ScalarTransportSolver(base_settings(Q, make_bcs()))
    solver.print()
    assert "boundary_conditions" in capsys.readouterr().out
