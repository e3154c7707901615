"""Saddle-point fieldsplit preconditioner: Newton-GMRES beyond the dense-LU
limit reproduces exact Poiseuille (PETSc fieldsplit/Schur analog)."""

import numpy as np
import pytest

import fenicssolver_tpu.la.direct as direct
from fenicssolver_tpu.solvers.navier_stokes import CoupledNavierStokesSolver

from .test_navier_stokes import channel_settings, check_poiseuille


def test_fieldsplit_gmres_poiseuille(monkeypatch):
    # force the iterative saddle-point path on a small case
    monkeypatch.setattr(direct, "DENSE_LIMIT", 500)
    solver = CoupledNavierStokesSolver(channel_settings(nx=8, ny=8))
    assert solver.function_space.ndof > 500
    up = solver.solve()
    check_poiseuille(solver, up, 1e-6, 1e-5)
