"""Fully-jitted transient fast path vs the standard python time loop."""

import copy

import numpy as np

from fenicssolver_tpu.core import (
    AutoSubDomain,
    Constant,
    FunctionSpace,
    UnitSquareMesh,
    near,
)
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


def test_jitted_transient_ns_matches_python_loop():
    """100-step NS channel as ONE device dispatch (VERDICT r1 item 7) must
    match the python per-step loop."""
    from fenicssolver_tpu.solvers.fast_paths import compile_transient_ns
    from fenicssolver_tpu.solvers.navier_stokes import CoupledNavierStokesSolver
    from .test_navier_stokes import channel_settings

    dt, nsteps = 0.05, 100
    # python loop (few steps would suffice for agreement; run all 100 to
    # honor the 'matches the python loop' criterion at the final state)
    s = channel_settings(nx=4, ny=4, transient=True)
    s["solver_settings"]["transient_settings"]["time_step"] = dt
    s["solver_settings"]["transient_settings"]["ending_time"] = dt * nsteps - dt / 2
    solver_py = CoupledNavierStokesSolver(s)
    up_py = solver_py.solve()

    s2 = channel_settings(nx=4, ny=4, transient=True)
    solver_fast = CoupledNavierStokesSolver(s2)
    run, aux = compile_transient_ns(solver_fast, dt, nsteps, newton_iters=8)
    w0 = solver_fast.w_current.values
    w_final, norms = run(w0)
    assert np.isfinite(np.asarray(w_final)).all()
    err = np.linalg.norm(np.asarray(w_final) - up_py.values) / np.linalg.norm(
        up_py.values
    )
    assert err < 1e-7, err


def test_jitted_transient_elasticity_dynamics_matches_python_loop():
    """Jitted dynamics scan (explicit inertia) vs the python transient."""
    import math

    from fenicssolver_tpu.core import BoxMesh, Point, VectorFunctionSpace
    from fenicssolver_tpu.solvers.fast_paths import (
        compile_transient_elasticity_dynamics,
    )
    from fenicssolver_tpu.solvers.linear_elasticity import LinearElasticitySolver
    from .test_linear_elasticity import solver_settings

    def make():
        mesh = BoxMesh(Point(0, 0, 0), Point(2, 1, 1), 4, 2, 2)
        V = VectorFunctionSpace(mesh, "CG", 1)
        left = AutoSubDomain(lambda x: near(x[0], 0.0))
        bcs = {
            "fixed": {"boundary": left, "boundary_id": 1, "type": "Dirichlet",
                      "value": Constant((0, 0, 0))},
        }
        s = solver_settings(V, bcs)
        s["body_source"] = (0.0, 0.0, -1e6)
        s["solver_settings"]["transient_settings"] = {
            "transient": True, "starting_time": 0.0,
            "time_step": 0.01, "ending_time": 0.055,
        }
        s["solver_settings"]["solver_parameters"]["relative_tolerance"] = 1e-12
        return s

    solver_py = LinearElasticitySolver(make())
    solver_py.solving_dynamics = True
    u_py = solver_py.solve()

    solver_fast = LinearElasticitySolver(make())
    run, aux = compile_transient_elasticity_dynamics(
        solver_fast, 0.01, 6, tol=1e-12
    )
    u0 = solver_fast.w_current.values
    u_final, norms = run(u0, u0)
    err = np.linalg.norm(np.asarray(u_final) - u_py.values) / np.linalg.norm(
        u_py.values
    )
    assert err < 1e-6, err
