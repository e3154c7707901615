"""Smagorinsky LES eddy viscosity (BEYOND PARITY — the reference is
laminar-only; its Readme lists turbulence modelling as future work).

nu_t = (Cs * Delta_e)^2 |S| with Delta_e = V_e^(1/d), traced through the
kernel so Newton's per-element jacfwd yields the consistent tangent.
"""

import numpy as np

from fenicssolver_tpu.core import (
    AutoSubDomain,
    UnitSquareMesh,
    near,
)
from fenicssolver_tpu.ops import assembly
from fenicssolver_tpu.solvers.navier_stokes import CoupledNavierStokesSolver
from fenicssolver_tpu.solvers.solver_base import SolverError

from .test_navier_stokes import channel_settings


def _closed_box_settings(nu, nx=4):
    """All-velocity-Dirichlet box: no open-boundary viscous closures, so
    the residual difference between two solvers is exactly the volume
    viscous term."""
    s = channel_settings(nx=nx, ny=nx)
    mesh = UnitSquareMesh(nx, nx)
    walls = AutoSubDomain(lambda x: True)
    s["mesh"] = mesh
    s["boundary_conditions"] = {
        "walls": {
            "boundary": walls,
            "boundary_id": 1,
            "values": [
                {"variable": "velocity", "type": "Dirichlet",
                 "value": (0.0, 0.0)}
            ],
        },
    }
    s["material"]["kinematic_viscosity"] = nu
    return s


def _residual_at_linear_shear(s, gamma=2.0):
    solver = CoupledNavierStokesSolver(s)
    solver.init_solver()
    W = solver.function_space
    w = np.zeros(W.ndof)
    X = W.subspaces[0].scalar_space.dof_coords
    uv = w[W.slice_of(0)].reshape(-1, 2)
    uv[:, 0] = gamma * X[:, 1]  # u = (gamma*y, 0): |S| = gamma everywhere
    w[W.slice_of(0)] = uv.reshape(-1)
    solver.w_current.values = w
    form, _ = solver.generate_form(
        0, None, None, solver.w_current, solver.w_prev
    )
    return np.asarray(assembly.assemble_residual(form, w))


def test_les_linear_shear_equals_constant_viscosity():
    """For u = (gamma*y, 0), |S| = gamma is CONSTANT, so on a uniform mesh
    (one Delta_e for every cell) the Smagorinsky form must assemble the
    exact same residual as a laminar form with
    nu' = nu + (Cs*Delta)^2 * gamma — an analytic anchor for both the
    strain-rate magnitude and the filter width."""
    nu, gamma, cs, nx = 0.05, 2.0, 0.4, 4
    area = 1.0 / (2 * nx * nx)  # uniform triangulation of the unit square
    delta = np.sqrt(area)
    nu_eff = nu + (cs * delta) ** 2 * gamma

    s_les = _closed_box_settings(nu, nx)
    s_les["turbulence_settings"] = {"model": "Smagorinsky", "Cs": cs}
    r_les = _residual_at_linear_shear(s_les, gamma)

    r_eff = _residual_at_linear_shear(_closed_box_settings(nu_eff, nx), gamma)
    r_lam = _residual_at_linear_shear(_closed_box_settings(nu, nx), gamma)

    scale = np.abs(r_eff).max()
    assert np.abs(r_les - r_eff).max() / scale < 1e-12, (
        "LES residual != constant-nu_eff residual"
    )
    # and the term really fired: differs from the molecular-nu residual
    assert np.abs(r_les - r_lam).max() / scale > 1e-3


def test_les_off_is_bit_for_bit_laminar():
    """Cs = 0 (and absent turbulence_settings) leave the reference-parity
    laminar form untouched."""
    base = CoupledNavierStokesSolver(channel_settings(nx=6, ny=6)).solve()
    s = channel_settings(nx=6, ny=6)
    s["turbulence_settings"] = {"model": "Smagorinsky", "Cs": 0.0}
    off = CoupledNavierStokesSolver(s).solve()
    assert np.array_equal(np.asarray(base.values), np.asarray(off.values))


def test_les_raises_on_unknown_model():
    s = channel_settings(nx=4, ny=4)
    s["turbulence_settings"] = {"model": "k-epsilon"}
    solver = CoupledNavierStokesSolver(s)
    try:
        solver.solve()
    except SolverError as e:
        assert "k-epsilon" in str(e)
    else:
        raise AssertionError("unknown turbulence model did not raise")


def test_les_channel_raises_pressure_drop():
    """Added eddy viscosity dissipates more: driving the same inflow
    profile through the channel needs a larger inlet pressure (outlet
    pinned at 0), and the Newton solve stays well-behaved."""
    lam_solver = CoupledNavierStokesSolver(channel_settings(nx=8, ny=8))
    lam = lam_solver.solve()
    s = channel_settings(nx=8, ny=8)
    s["turbulence_settings"] = {"model": "Smagorinsky", "Cs": 1.0}
    les_solver = CoupledNavierStokesSolver(s)
    les = les_solver.solve()
    assert np.isfinite(np.asarray(les.values)).all()

    W = lam_solver.function_space
    Xp = W.subspaces[1].dof_coords
    inlet = np.abs(Xp[:, 0]) < 1e-12
    p_lam = np.asarray(lam.values)[W.slice_of(1)][inlet].mean()
    p_les = np.asarray(les.values)[W.slice_of(1)][inlet].mean()
    # measured ratio ~1.075 at this resolution; 1.03 is comfortably above
    # solver noise while pinning the dissipative direction of the effect
    assert p_les > 1.03 * p_lam, (p_lam, p_les)
