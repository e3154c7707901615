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


def test_cached_transient_form_matches_rebuild():
    """solver_parameters.cache_transient_form reuses the step-1 form and
    refreshes only the history aux — trajectory must match the per-step
    rebuild exactly, with generate_form called ~twice instead of per step
    (VERDICT r1 weak-7 / ROADMAP item 14: automatic routing)."""
    n_steps, dt = 8, 0.02
    ref_solver = ScalarTransportSolver(make(n_steps, dt))
    T_ref = ref_solver.solve()

    s = make(n_steps, dt)
    s["solver_settings"]["solver_parameters"] = dict(
        s["solver_settings"]["solver_parameters"],
        cache_transient_form=True,
    )
    solver = ScalarTransportSolver(s)
    calls = [0]
    orig = solver.generate_form

    def counting(*a, **k):
        calls[0] += 1
        return orig(*a, **k)

    solver.generate_form = counting
    T = solver.solve()
    err = np.linalg.norm(T.values - T_ref.values) / np.linalg.norm(
        T_ref.values
    )
    assert err < 1e-12, err
    assert calls[0] <= 2, calls[0]  # step 0 + step 1, then cached


def test_cached_transient_form_elasticity_dynamics():
    """Cache with the accel-carrying dynamics form: matches per-step
    rebuild (the accel aux is refreshed from history each step)."""
    import copy as _copy

    from fenicssolver_tpu.core import UnitSquareMesh as _USM
    from fenicssolver_tpu.core import VectorFunctionSpace as _VFS
    from fenicssolver_tpu.core import AutoSubDomain, near
    from fenicssolver_tpu.solvers.linear_elasticity import (
        LinearElasticitySolver,
    )

    def settings():
        mesh = _USM(6, 3)
        V = _VFS(mesh, "CG", 1)
        left = AutoSubDomain(lambda x: near(x[0], 0.0))
        right = AutoSubDomain(lambda x: near(x[0], 1.0))
        bcs = {
            "fixed": {
                "boundary": left, "boundary_id": 1,
                "values": [{"variable": "displacement",
                            "type": "Dirichlet", "value": (0.0, 0.0)}],
            },
            "load": {
                "boundary": right, "boundary_id": 2,
                "values": [{"variable": "displacement", "type": "pressure",
                            "value": 1e3}],
            },
        }
        return {
            "solver_name": "LinearElasticitySolver",
            "function_space": V,
            "boundary_conditions": bcs,
            "material": {"density": 7800.0, "elastic_modulus": 2e9,
                         "poisson_ratio": 0.3},
            "solver_settings": {
                "transient_settings": {
                    "transient": True, "starting_time": 0.0,
                    "time_step": 1e-4, "ending_time": 5.5e-4,
                },
                "solver_parameters": {
                    "relative_tolerance": 1e-12,
                    "maximum_iterations": 4000,
                },
            },
            "vector_name": "displacement",
        }

    ref = LinearElasticitySolver(settings())
    ref.solving_dynamics = True
    u_ref = ref.solve()

    s2 = settings()
    s2["solver_settings"]["solver_parameters"]["cache_transient_form"] = True
    fast = LinearElasticitySolver(s2)
    fast.solving_dynamics = True
    u = fast.solve()
    err = np.linalg.norm(u.values - u_ref.values) / max(
        np.linalg.norm(u_ref.values), 1e-30
    )
    assert err < 1e-10, err


def test_jitted_transient_ns_iterative_beyond_dense_limit():
    """The in-scan GMRES Newton update (diag saddle-point preconditioner)
    matches the python loop on a mesh past the dense cap — the jitted NS
    transient no longer has a size limit (ROADMAP item 14 leftover)."""
    import jax.numpy as jnp

    from fenicssolver_tpu.solvers.fast_paths import compile_transient_ns
    from fenicssolver_tpu.solvers.navier_stokes import (
        CoupledNavierStokesSolver,
    )

    from .test_navier_stokes import channel_settings

    dt, nsteps = 0.05, 3
    s = channel_settings(nx=22, ny=22, transient=True)
    s["solver_settings"]["transient_settings"]["time_step"] = dt
    s["solver_settings"]["transient_settings"]["ending_time"] = (
        dt * nsteps - dt / 2
    )
    ref = CoupledNavierStokesSolver(s)
    up_ref = ref.solve()

    s2 = channel_settings(nx=22, ny=22, transient=True)
    solver_fast = CoupledNavierStokesSolver(s2)
    assert solver_fast.function_space.ndof > 4096  # iterative branch
    run, aux = compile_transient_ns(solver_fast, dt, nsteps, newton_iters=8)
    w0 = solver_fast.get_initial_field().values
    w_final, norms = run(jnp.asarray(w0))
    err = np.linalg.norm(np.asarray(w_final) - up_ref.values) / max(
        np.linalg.norm(up_ref.values), 1e-30
    )
    assert err < 1e-6, err
