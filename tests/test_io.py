"""IO tests: mesh formats, VTU/PVD output, checkpoint/restart (incl. the
non-matching-mesh restart the reference delegated to fenicstools,
``SolverBase.py:378-385``)."""

import os

import numpy as np
import pytest

from fenicssolver_tpu.core import (
    Expression,
    Function,
    FunctionSpace,
    Mesh,
    UnitSquareMesh,
    VectorFunctionSpace,
    interpolate,
)
from fenicssolver_tpu.io import checkpoint, meshio


def test_vtu_pvd_roundtrip(tmp_path):
    mesh = UnitSquareMesh(4, 4)
    Q = FunctionSpace(mesh, "CG", 1)
    f = interpolate(Expression("x[0]+x[1]", degree=1), Q)
    pvd = meshio.PVDFile(str(tmp_path / "out.pvd"))
    pvd << (f, 0.0)
    pvd << (f, 1.0)
    assert (tmp_path / "out.pvd").exists()
    assert (tmp_path / "out000000.vtu").exists()
    assert (tmp_path / "out000001.vtu").exists()
    txt = (tmp_path / "out.pvd").read_text()
    assert 'timestep="1.0"' in txt


def test_hdf5_roundtrip(tmp_path):
    mesh = UnitSquareMesh(3, 3)
    fn = str(tmp_path / "mesh.h5")
    meshio.write_hdf5(fn, mesh, subdomains=np.arange(mesh.num_cells()))
    coords, cells, sub, bnd = meshio.read_hdf5(fn)
    assert np.allclose(coords, mesh.coords)
    assert (cells == mesh.cells_array).all()
    assert (sub == np.arange(mesh.num_cells())).all()


def test_checkpoint_same_mesh(tmp_path):
    mesh = UnitSquareMesh(5, 5)
    Q = FunctionSpace(mesh, "CG", 2)
    f = interpolate(Expression("sin(x[0])*x[1]", degree=2), Q)
    fn = str(tmp_path / "ckpt.npz")
    checkpoint.save_function(fn, f, t=1.5, step=3)
    g = Function(Q, fn)  # Function(space, filename) restart path
    assert np.allclose(g.values, f.values)


def test_checkpoint_nonmatching_mesh(tmp_path):
    """Restart on a finer mesh interpolates (fenicstools parity)."""
    mesh1 = UnitSquareMesh(6, 6)
    Q1 = FunctionSpace(mesh1, "CG", 1)
    f = interpolate(Expression("x[0]+2*x[1]", degree=1), Q1)
    fn = str(tmp_path / "ckpt.npz")
    checkpoint.save_function(fn, f)
    mesh2 = UnitSquareMesh(9, 9)
    Q2 = FunctionSpace(mesh2, "CG", 1)
    g = Function(Q2, fn)
    expected = Q2.dof_coords[:, 0] + 2 * Q2.dof_coords[:, 1]
    # linear field is reproduced exactly by P1 point interpolation
    assert np.abs(g.values - expected).max() < 1e-10


def test_checkpoint_vector_nonmatching(tmp_path):
    mesh1 = UnitSquareMesh(6, 6)
    V1 = VectorFunctionSpace(mesh1, "CG", 1)
    f = interpolate(Expression(("x[0]", "x[1]"), degree=1), V1)
    fn = str(tmp_path / "v.npz")
    checkpoint.save_function(fn, f)
    mesh2 = UnitSquareMesh(4, 4)
    V2 = VectorFunctionSpace(mesh2, "CG", 1)
    g = Function(V2, fn)
    expected = V2.scalar_space.dof_coords.reshape(-1)
    # node-major interleave: (x at node, y at node) = coords
    assert np.abs(g.values - V2.scalar_space.dof_coords.reshape(-1)).max() < 1e-10


def test_solver_state_roundtrip(tmp_path):
    from tests.test_heat_transfer import base_settings, make_bcs
    from fenicssolver_tpu.solvers.scalar_transport import ScalarTransportSolver

    mesh = UnitSquareMesh(6, 6)
    Q = FunctionSpace(mesh, "CG", 1)
    solver = ScalarTransportSolver(base_settings(Q, make_bcs()))
    solver.solve()
    fn = str(tmp_path / "state.npz")
    checkpoint.save_state(fn, solver)
    solver2 = ScalarTransportSolver(base_settings(Q, make_bcs()))
    solver2.init_solver()
    checkpoint.load_state(fn, solver2)
    assert np.allclose(solver2.w_current.values, solver.w_current.values)


def test_checkpoint_dg_family_restore(tmp_path):
    """A DG checkpoint restored onto a different mesh must rebuild the source
    space with its saved family (ADVICE r1: cell-wise DG dofs were misread
    as CG vertex dofs); same-mesh different-family must also re-interpolate
    instead of copying raw dof values."""
    mesh = UnitSquareMesh(8, 8)
    Vdg = FunctionSpace(mesh, "DG", 1)
    f = interpolate(Expression("x[0]+2*x[1]", degree=1), Vdg)
    fn = str(tmp_path / "dg_ckpt.npz")
    checkpoint.save_function(fn, f)
    # cross-mesh restore onto CG
    mesh2 = UnitSquareMesh(7, 7)
    Vcg = FunctionSpace(mesh2, "CG", 1)
    vals = checkpoint.load_function_values(fn, Vcg)
    expect = Vcg.dof_coords[:, 0] + 2 * Vcg.dof_coords[:, 1]
    assert np.linalg.norm(vals - expect) / np.linalg.norm(expect) < 1e-8
    # same-mesh, different family: fast path must NOT trigger
    Vcg_same = FunctionSpace(mesh, "CG", 1)
    vals2 = checkpoint.load_function_values(fn, Vcg_same)
    expect2 = Vcg_same.dof_coords[:, 0] + 2 * Vcg_same.dof_coords[:, 1]
    assert np.linalg.norm(vals2 - expect2) / np.linalg.norm(expect2) < 1e-8
