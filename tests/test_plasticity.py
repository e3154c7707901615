"""J2 plasticity (solvers/plasticity.py) vs the analytic uniaxial bilinear
law.  The reference only promises a PlasticitySolver
(``LinearElasticitySolver.py:38``; ``run_all_tests.py:14`` excludes the
absent ``test_plasticity.py``) — this one exists and is verified.

Uniaxial tension with linear isotropic hardening: sigma = E eps while
sigma < sigma_y, then sigma(eps) continues with slope E H / (E + H).
A displacement-driven homogeneous bar reproduces it exactly (to Newton
tolerance) at every load step, including elastic unloading.
"""

import numpy as np
import pytest

from fenicssolver_tpu.core import AutoSubDomain, UnitCubeMesh, near
from fenicssolver_tpu.core.spaces import VectorFunctionSpace
from fenicssolver_tpu.solvers.plasticity import PlasticitySolver

E = 200e3
NU = 0.3
SIG_Y = 250.0
H = 20e3


def make_bar():
    mesh = UnitCubeMesh(2, 2, 2)
    V = VectorFunctionSpace(mesh, "CG", 1)
    x0 = AutoSubDomain(lambda x: near(x[0], 0.0))
    x1 = AutoSubDomain(lambda x: near(x[0], 1.0))
    y0 = AutoSubDomain(lambda x: near(x[1], 0.0))
    z0 = AutoSubDomain(lambda x: near(x[2], 0.0))
    bcs = {
        "left": {"boundary": x0, "boundary_id": 1, "values": [
            {"variable": "displacement", "type": "Dirichlet",
             "value": (0.0, None, None)}]},
        "pull": {"boundary": x1, "boundary_id": 2, "values": [
            {"variable": "displacement", "type": "Dirichlet",
             "value": (0.0, None, None)}]},
        "y0": {"boundary": y0, "boundary_id": 3, "values": [
            {"variable": "displacement", "type": "Dirichlet",
             "value": (None, 0.0, None)}]},
        "z0": {"boundary": z0, "boundary_id": 4, "values": [
            {"variable": "displacement", "type": "Dirichlet",
             "value": (None, None, 0.0)}]},
    }
    return {
        "solver_name": "PlasticitySolver",
        "function_space": V,
        "boundary_conditions": bcs,
        "material": {
            "elastic_modulus": E, "poisson_ratio": NU, "density": 7800.0,
            "yield_strength": SIG_Y, "hardening_modulus": H,
        },
        "solver_settings": {
            "transient_settings": {"transient": False},
            "reference_values": {"temperature": 293},
            "solver_parameters": {
                "relative_tolerance": 1e-11, "maximum_iterations": 60,
            },
        },
        "vector_name": "displacement",
        "report_settings": {"logging_level": 40, "plotting_freq": 0,
                            "saving_freq": 0},
    }


def sigma_analytic(eps):
    """Bilinear uniaxial response with linear isotropic hardening."""
    s_el = E * eps
    if abs(s_el) <= SIG_Y:
        return s_el
    return np.sign(eps) * (SIG_Y + H * (abs(eps) - SIG_Y / E)) * E / (E + H)


def test_uniaxial_bilinear_response():
    eps_y = SIG_Y / E  # 1.25e-3
    settings = make_bar()
    solver = PlasticitySolver(settings)
    solver.init_solver()
    solver.current_time = 0.0
    # load to 2.4x yield strain in 4 increments, then unload elastically
    steps = [0.5 * eps_y, 1.2 * eps_y, 1.8 * eps_y, 2.4 * eps_y, 1.9 * eps_y]
    prev_plastic = 0.0
    for i, eps in enumerate(steps):
        bc = settings["boundary_conditions"]["pull"]["values"][0]
        bc["value"] = (float(eps), None, None)  # bar length 1
        solver.current_step = i
        solver.solve_current_step()
        sig3 = np.asarray(solver.cauchy_stress_qp())
        sxx = sig3[:, :, 0, 0]
        # homogeneous state: every qp carries the same uniaxial stress
        assert sxx.std() < 1e-6 * max(abs(sxx).max(), 1.0), sxx.std()
        # lateral stresses vanish (free contraction)
        assert np.abs(sig3[:, :, 1, 1]).max() < 1e-6 * abs(sxx).max()
        s_exact = plastic_corrected(steps[: i + 1])
        rel = abs(sxx.mean() - s_exact) / abs(s_exact)
        assert rel < 1e-6, (i, eps, sxx.mean(), s_exact, rel)
        alpha = np.asarray(solver.equivalent_plastic_strain())
        assert alpha.max() >= prev_plastic - 1e-12  # plastic strain grows
        prev_plastic = alpha.max()
    # after unloading below the new yield surface, alpha stayed frozen
    assert alpha.std() < 1e-8


def plastic_corrected(history):
    """Path-dependent uniaxial response for a monotone-then-unload path."""
    eps_p = 0.0
    sig = 0.0
    for eps in history:
        sig_tr = E * (eps - eps_p)
        flow = SIG_Y + H * eps_p  # alpha == eps_p for uniaxial J2
        if abs(sig_tr) > flow:
            dgam = (abs(sig_tr) - flow) / (E + H)
            eps_p += np.sign(sig_tr) * dgam
            sig = np.sign(sig_tr) * (flow + H * dgam)
        else:
            sig = sig_tr
    return sig


def test_perfect_plasticity_stress_cap():
    """H = 0: the stress plateaus exactly at the yield strength."""
    settings = make_bar()
    settings["material"]["hardening_modulus"] = 0.0
    solver = PlasticitySolver(settings)
    solver.init_solver()
    eps_y = SIG_Y / E
    for i, eps in enumerate([1.5 * eps_y, 3.0 * eps_y]):
        bc = settings["boundary_conditions"]["pull"]["values"][0]
        bc["value"] = (float(eps), None, None)
        solver.current_step = i
        solver.solve_current_step()
    sxx = np.asarray(solver.cauchy_stress_qp())[:, :, 0, 0]
    assert abs(sxx.mean() - SIG_Y) / SIG_Y < 1e-6, sxx.mean()


def test_json_dispatch():
    from fenicssolver_tpu.main import main

    s = make_bar()
    s["solver_settings"]["transient_settings"] = {
        "transient": True, "starting_time": 0.0,
        "time_step": 1.0, "ending_time": 1.5,
    }
    bc = s["boundary_conditions"]["pull"]["values"][0]
    bc["value"] = (2.0 * SIG_Y / E, None, None)
    solver = main(s)
    assert isinstance(solver, PlasticitySolver)
    assert np.asarray(solver.equivalent_plastic_strain()).max() > 0.0
