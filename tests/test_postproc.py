"""Post-processing accessors: strain energy, viscous heating, stress fields."""

import numpy as np

from fenicssolver_tpu.core import (
    AutoSubDomain,
    Constant,
    UnitSquareMesh,
    VectorFunctionSpace,
    near,
)
from fenicssolver_tpu.solvers.linear_elasticity import LinearElasticitySolver
from fenicssolver_tpu.solvers.navier_stokes import CoupledNavierStokesSolver

from .test_linear_elasticity import E_mod, nu, solver_settings
from .test_navier_stokes import NU, RHO, U_MAX, channel_settings


def test_strain_energy_uniaxial():
    """U = 1/2 integral sigma:eps dx; for the uniaxial patch the exact value
    is 1/2 s * exx * volume (fixes the reference's broken ^ operator,
    LinearElasticitySolver.py:93)."""
    mesh = UnitSquareMesh(4, 4)
    V = VectorFunctionSpace(mesh, "CG", 1)
    left = AutoSubDomain(lambda x: near(x[0], 0.0))
    right = AutoSubDomain(lambda x: near(x[0], 1.0))
    bottom = AutoSubDomain(lambda x: near(x[1], 0.0))
    s_mag = 1e8
    bcs = {
        "l": {"boundary": left, "boundary_id": 1, "type": "Dirichlet",
              "value": (Constant(0), None)},
        "b": {"boundary": bottom, "boundary_id": 3, "type": "Dirichlet",
              "value": (None, Constant(0))},
        "r": {"boundary": right, "boundary_id": 2, "type": "stress",
              "value": (s_mag, 0.0)},
    }
    solver = LinearElasticitySolver(solver_settings(V, bcs))
    u = solver.solve()
    E = solver.strain_energy(u)
    MU = E_mod / (2 * (1 + nu))
    LM = E_mod * nu / ((1 + nu) * (1 - 2 * nu))
    t = s_mag / (2 * (MU + LM))
    eyy = -LM * t / (2 * MU)
    exx = t - eyy
    exact = 0.5 * s_mag * exx  # unit volume; syy = 0
    assert abs(E - exact) / exact < 1e-9, (E, exact)


def test_viscous_heating_poiseuille():
    """Total dissipation in Poiseuille flow: integral mu (du/dy)^2 dx."""
    solver = CoupledNavierStokesSolver(channel_settings(nx=6, ny=6))
    solver.solve()
    q = solver.viscous_heat()
    assert np.isfinite(q.values).all()
    # du/dy = 4 U (1 - 2y); integral mu (du/dy)^2 over unit square
    mu = RHO * NU
    exact_total = mu * (4 * U_MAX) ** 2 / 3.0
    # integrate the projected P1 field
    from fenicssolver_tpu.compat import Measure, assemble

    total = assemble(q * Measure("dx"))
    assert abs(total - exact_total) / exact_total < 0.05, (total, exact_total)


def test_viscous_stress_fields():
    solver = CoupledNavierStokesSolver(channel_settings(nx=5, ny=5))
    up = solver.solve()
    sig = solver.viscous_stress(up)
    # wall shear sigma_xy at y=0: mu du/dy = mu 4 U
    mu = RHO * NU
    mesh = solver.mesh
    wall = np.nonzero(near(mesh.coords[:, 1], 0.0))[0]
    sxy = sig[0][1].values[wall]
    assert abs(sxy.mean() - mu * 4 * U_MAX) / (mu * 4 * U_MAX) < 0.05
