"""Fully-jitted transient fast path vs the standard python time loop."""

import copy

import numpy as np

from fenicssolver_tpu.core import FunctionSpace, UnitSquareMesh
from fenicssolver_tpu.solvers.fast_paths import compile_transient_heat
from fenicssolver_tpu.solvers.scalar_transport import ScalarTransportSolver

from .test_heat_transfer import T_ambient, base_settings, make_bcs


def make(n_steps, dt):
    mesh = UnitSquareMesh(10, 10)
    Q = FunctionSpace(mesh, "CG", 1)
    s = base_settings(Q, make_bcs())
    s["material"] = {
        "density": 1.0,
        "specific_heat_capacity": 1.0,
        "thermal_conductivity": 1.0,
    }
    s["solver_settings"] = copy.deepcopy(s["solver_settings"])
    s["solver_settings"]["transient_settings"] = {
        "transient": True,
        "starting_time": 0.0,
        "time_step": dt,
        "ending_time": n_steps * dt - dt / 2,
    }
    return s


def test_jitted_scan_matches_python_loop():
    n_steps, dt = 8, 0.02
    # reference: the standard per-step python loop
    ref_solver = ScalarTransportSolver(make(n_steps, dt))
    T_ref = ref_solver.solve()

    # fast path: one jitted lax.scan over all steps
    fast_solver = ScalarTransportSolver(make(n_steps, dt))
    run, aux = compile_transient_heat(fast_solver, dt, n_steps, tol=1e-12)
    import jax.numpy as jnp

    T0 = jnp.asarray(fast_solver.get_initial_field().values)
    T_fast, norms = run(T0)
    assert np.isfinite(np.asarray(T_fast)).all()
    err = np.linalg.norm(np.asarray(T_fast) - T_ref.values) / np.linalg.norm(
        T_ref.values
    )
    assert err < 1e-8, err
    assert norms.shape == (n_steps,)
