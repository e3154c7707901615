"""Plasticity example — the one the reference lists but never shipped
(``examples/run_all_tests.py:14`` excludes ``test_plasticity.py`` with the
comment that it is absent).  A displacement-driven uniaxial bar is loaded
past yield and partially unloaded; the stress at every load step is
asserted against the analytic bilinear J2 response with linear isotropic
hardening (post-yield slope E H / (E + H)); unloading is elastic with the
plastic strain frozen.
"""

import numpy as np

from config import is_interactive

interactively = is_interactive()

from fenicssolver_tpu.compat import *  # noqa: F403
from fenicssolver_tpu.solvers.plasticity import PlasticitySolver

E = 200e3  # MPa (steel)
NU = 0.3
SIG_Y = 250.0  # MPa
H = 20e3  # MPa linear isotropic hardening


def uniaxial_exact(history):
    """Path-dependent uniaxial response (alpha == axial plastic strain)."""
    eps_p, sig = 0.0, 0.0
    for eps in history:
        sig_tr = E * (eps - eps_p)
        flow = SIG_Y + H * eps_p
        if abs(sig_tr) > flow:
            dgam = (abs(sig_tr) - flow) / (E + H)
            eps_p += np.sign(sig_tr) * dgam
            sig = np.sign(sig_tr) * (flow + H * dgam)
        else:
            sig = sig_tr
    return sig


def test():
    mesh = UnitCubeMesh(3, 3, 3)
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
        "sym_y": {"boundary": y0, "boundary_id": 3, "values": [
            {"variable": "displacement", "type": "Dirichlet",
             "value": (None, 0.0, None)}]},
        "sym_z": {"boundary": z0, "boundary_id": 4, "values": [
            {"variable": "displacement", "type": "Dirichlet",
             "value": (None, None, 0.0)}]},
    }
    settings = {
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
    solver = PlasticitySolver(settings)
    solver.init_solver()
    eps_y = SIG_Y / E
    history = []
    print("  step   eps/eps_y    sigma_xx    analytic")
    for i, eps in enumerate(
        [0.6 * eps_y, 1.3 * eps_y, 2.0 * eps_y, 2.8 * eps_y, 2.0 * eps_y]
    ):
        bcs["pull"]["values"][0]["value"] = (float(eps), None, None)
        solver.current_step = i
        solver.solve_current_step()
        history.append(eps)
        sxx = float(np.asarray(solver.cauchy_stress_qp())[:, :, 0, 0].mean())
        s_exact = uniaxial_exact(history)
        print(f"  {i}     {eps / eps_y:8.2f} {sxx:11.2f} {s_exact:11.2f}")
        assert abs(sxx - s_exact) < 1e-5 * max(abs(s_exact), 1.0), (
            sxx, s_exact,
        )
    alpha = float(np.asarray(solver.equivalent_plastic_strain()).max())
    print(f"  equivalent plastic strain: {alpha:.5f}")
    assert alpha > 0
    print("test_plasticity: OK")


if __name__ == "__main__":
    test()
