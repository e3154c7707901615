"""Bandwidth ordering for block-ELL fill reduction (ROADMAP item 4).

The block-ELL format's K (distinct 128-column blocks per 8-row block) is
its memory AND per-matvec HBM-traffic factor; arbitrary Delaunay node
numbering costs ~100x CSR bytes.  `la.sparse_algebra.rcm_ordering` (pure
numpy, no scipy) + the pick-best `bandwidth_ordering` shrink K where it
helps and keep the natural order on grid-derived meshes where RCM
regresses (measured: elbow Kuhn-tet 5->7, Delaunay hole 21->8)."""

import numpy as np
import pytest

from fenicssolver_tpu.core import UnitCubeMesh
from fenicssolver_tpu.core.meshgen import rectangle_with_hole
from fenicssolver_tpu.core.spaces import FunctionSpace
from fenicssolver_tpu.la.block_ell import (
    block_ell_from_csr,
    build_block_ell,
    permuted_csr_pattern,
)
from fenicssolver_tpu.la.sparse import build_pattern
from fenicssolver_tpu.la.sparse_algebra import (
    bandwidth_ordering,
    rcm_ordering,
)


def _pattern(mesh, deg=1):
    V = FunctionSpace(mesh, "CG", deg)
    pat, _ = build_pattern([np.asarray(V.cell_dofs)], V.ndof, device=False)
    return V, np.asarray(pat.indptr), np.asarray(pat.indices)


def _bandwidth(ip, ix, n):
    rows = np.repeat(np.arange(n), np.diff(ip))
    return int(np.abs(rows - ix).max())


def _K(ip, ix, n):
    K, *_ = build_block_ell(ip, ix, n)
    return K


def test_rcm_valid_permutation_and_bandwidth():
    mesh = rectangle_with_hole((0, 0), (2.2, 0.41), (0.2, 0.2), 0.05,
                               resolution=40)
    V, ip, ix = _pattern(mesh, deg=2)
    perm = rcm_ordering(ip, ix, V.ndof)
    assert sorted(perm) == list(range(V.ndof))
    ip2, ix2, take = permuted_csr_pattern(ip, ix, perm)
    assert len(ix2) == len(ix)
    bw0 = _bandwidth(ip, ix, V.ndof)
    bw1 = _bandwidth(ip2, ix2, V.ndof)
    assert bw1 < bw0 / 3, (bw0, bw1)


def test_bandwidth_ordering_picks_rcm_on_delaunay():
    mesh = rectangle_with_hole((0, 0), (2.2, 0.41), (0.2, 0.2), 0.05,
                               resolution=40)
    V, ip, ix = _pattern(mesh, deg=2)
    perm, K_win = bandwidth_ordering(ip, ix, V.ndof)
    assert perm is not None, "Delaunay numbering should trigger RCM"
    K_nat = _K(ip, ix, V.ndof)
    assert K_win < K_nat, (K_win, K_nat)
    ip2, ix2, _ = permuted_csr_pattern(ip, ix, perm)
    assert _K(ip2, ix2, V.ndof) == K_win


def test_bandwidth_ordering_keeps_natural_on_lattice():
    """Grid meshes are numbered lattice-major: RCM must NOT be applied
    (measured regression on Kuhn-tet meshes)."""
    V, ip, ix = _pattern(UnitCubeMesh(8, 8, 8), deg=1)
    perm, K_win = bandwidth_ordering(ip, ix, V.ndof)
    assert K_win <= _K(ip, ix, V.ndof)
    if perm is not None:  # only allowed if it strictly improved
        ip2, ix2, _ = permuted_csr_pattern(ip, ix, perm)
        assert _K(ip2, ix2, V.ndof) < _K(ip, ix, V.ndof)


def test_block_ell_permuted_matvec_matches():
    """A_bell built with perm acts in permuted space: unpermuting its
    matvec must reproduce the natural-order matvec exactly."""
    rng = np.random.default_rng(0)
    mesh = rectangle_with_hole((0, 0), (1.0, 0.5), (0.3, 0.25), 0.1,
                               resolution=24)
    # deg=2: P1 2D patterns sit at K_nat <= 8 where pick-best early-exits
    V, ip, ix = _pattern(mesh, deg=2)
    n = V.ndof
    import scipy.sparse as sp

    data = rng.standard_normal(len(ix))
    A = sp.csr_matrix((data, ix, ip), shape=(n, n))
    perm, _ = bandwidth_ordering(ip, ix, n)
    if perm is None:
        pytest.skip("mesh unexpectedly lattice-ordered")
    bell_nat = block_ell_from_csr(A)
    bell_p = block_ell_from_csr(A, perm=perm)
    x = rng.standard_normal(n)
    y_nat = np.asarray(bell_nat.matvec(x))
    y_p = np.asarray(bell_p.matvec(x[perm]))
    inv = np.argsort(perm)
    assert np.allclose(y_p[inv], y_nat, atol=1e-12)
    assert np.allclose(y_nat, A @ x, atol=1e-12)


def test_fast_path_heat_on_delaunay_mesh():
    """compile_transient_heat auto-orders: the jitted scan (running in
    permuted space) must still match the python loop on a Delaunay mesh
    where the RCM branch is active."""
    import copy

    from fenicssolver_tpu.core import AutoSubDomain, Constant, near
    from fenicssolver_tpu.solvers.fast_paths import compile_transient_heat
    from fenicssolver_tpu.solvers.scalar_transport import (
        ScalarTransportSolver,
    )

    mesh = rectangle_with_hole((0, 0), (1.0, 0.5), (0.3, 0.25), 0.1,
                               resolution=24)
    # deg=2: P1 2D patterns sit at K_nat <= 8 where pick-best early-exits
    Q = FunctionSpace(mesh, "CG", 2)
    left = AutoSubDomain(lambda x: near(x[0], 0.0))
    right = AutoSubDomain(lambda x: near(x[0], 1.0))
    bcs = {
        "hot": {"boundary": left, "boundary_id": 1, "values": {
            "temperature": {"variable": "temperature", "type": "Dirichlet",
                            "value": Constant(350.0)}}},
        "cold": {"boundary": right, "boundary_id": 2, "values": {
            "temperature": {"variable": "temperature", "type": "Dirichlet",
                            "value": Constant(300.0)}}},
    }
    n_steps, dt = 6, 0.01

    def settings():
        return {
            "solver_name": "ScalarTransportSolver",
            "scalar_name": "temperature",
            "mesh": None,
            "function_space": Q,
            "boundary_conditions": copy.deepcopy(bcs),
            "initial_values": {"temperature": 300.0},
            "material": {"density": 1.0, "specific_heat_capacity": 1.0,
                         "thermal_conductivity": 1.0},
            "solver_settings": {
                "transient_settings": {
                    "transient": True, "starting_time": 0.0,
                    "time_step": dt, "ending_time": n_steps * dt - dt / 2,
                },
                "reference_values": {"temperature": 300.0},
                "solver_parameters": {"relative_tolerance": 1e-12,
                                      "maximum_iterations": 500,
                                      "monitor_convergence": False},
            },
            "report_settings": {"plotting_freq": 0, "saving_freq": 0,
                                "logging_level": 40},
        }

    ref = ScalarTransportSolver(settings()).solve()
    fast_solver = ScalarTransportSolver(settings())
    run, aux = compile_transient_heat(fast_solver, dt, n_steps, tol=1e-12)
    # the auto-ordering must actually engage on this mesh
    pat = aux["A"].pattern
    perm, _ = bandwidth_ordering(
        np.asarray(pat.indptr), np.asarray(pat.indices), pat.n
    )
    assert perm is not None
    import jax.numpy as jnp

    T0 = jnp.asarray(fast_solver.get_initial_field().values)
    T_fast, norms = run(T0)
    err = np.linalg.norm(np.asarray(T_fast) - ref.values) / np.linalg.norm(
        ref.values
    )
    assert err < 1e-8, err


def test_solve_static_bell_spmv_matches_csr(monkeypatch):
    """solve_static's Krylov loop runs on the block-ELL operator in
    permuted space (pick-best ordering) by default; solution must match
    the gather-CSR path (spmv="csr") to solver tolerance, and the
    ordering must actually engage on a Delaunay mesh."""
    import copy

    import fenicssolver_tpu.solvers.solver_base as sb
    from fenicssolver_tpu.core import AutoSubDomain, Constant, near
    from fenicssolver_tpu.solvers.scalar_transport import (
        ScalarTransportSolver,
    )

    monkeypatch.setattr(sb, "DENSE_LIMIT", 200)  # force the Krylov path
    mesh = rectangle_with_hole((0, 0), (1.0, 0.5), (0.3, 0.25), 0.1,
                               resolution=28)
    Q = FunctionSpace(mesh, "CG", 2)
    left = AutoSubDomain(lambda x: near(x[0], 0.0))
    right = AutoSubDomain(lambda x: near(x[0], 1.0))
    bcs = {
        "hot": {"boundary": left, "boundary_id": 1, "values": {
            "temperature": {"variable": "temperature", "type": "Dirichlet",
                            "value": Constant(350.0)}}},
        "cold": {"boundary": right, "boundary_id": 2, "values": {
            "temperature": {"variable": "temperature", "type": "Dirichlet",
                            "value": Constant(300.0)}}},
    }

    def settings(spmv):
        return {
            "solver_name": "ScalarTransportSolver",
            "scalar_name": "temperature",
            "mesh": None,
            "function_space": Q,
            "boundary_conditions": copy.deepcopy(bcs),
            "initial_values": {"temperature": 300.0},
            "material": {"density": 1.0, "specific_heat_capacity": 1.0,
                         "thermal_conductivity": 1.0},
            "solver_settings": {
                "transient_settings": {"transient": False},
                "reference_values": {"temperature": 300.0},
                "solver_parameters": {"relative_tolerance": 1e-12,
                                      "maximum_iterations": 4000,
                                      "spmv": spmv,
                                      "monitor_convergence": False},
            },
            "report_settings": {"plotting_freq": 0, "saving_freq": 0,
                                "logging_level": 40},
        }

    s_bell = ScalarTransportSolver(settings("bell"))
    T_bell = s_bell.solve()
    cache = getattr(s_bell, "_bell_krylov_cache", None)
    assert cache is not None and cache["ok"], "bell SpMV did not engage"
    assert cache["perm"] is not None, "pick-best ordering did not engage"

    s_csr = ScalarTransportSolver(settings("csr"))
    T_csr = s_csr.solve()
    assert getattr(s_csr, "_bell_krylov_cache", None) is None
    err = np.linalg.norm(T_bell.values - T_csr.values) / np.linalg.norm(
        T_csr.values
    )
    assert err < 1e-9, err


def test_bell_spmv_budget_fallback(monkeypatch):
    """An over-budget tile fill must fall back to the gather matvec (and
    still solve correctly)."""
    import copy

    import fenicssolver_tpu.solvers.solver_base as sb
    from fenicssolver_tpu.core import AutoSubDomain, Constant, near
    from fenicssolver_tpu.solvers.scalar_transport import (
        ScalarTransportSolver,
    )

    monkeypatch.setattr(sb, "DENSE_LIMIT", 200)
    mesh = rectangle_with_hole((0, 0), (1.0, 0.5), (0.3, 0.25), 0.1,
                               resolution=20)
    Q = FunctionSpace(mesh, "CG", 1)
    left = AutoSubDomain(lambda x: near(x[0], 0.0))
    right = AutoSubDomain(lambda x: near(x[0], 1.0))
    bcs = {
        "hot": {"boundary": left, "boundary_id": 1, "values": {
            "temperature": {"variable": "temperature", "type": "Dirichlet",
                            "value": Constant(350.0)}}},
        "cold": {"boundary": right, "boundary_id": 2, "values": {
            "temperature": {"variable": "temperature", "type": "Dirichlet",
                            "value": Constant(300.0)}}},
    }
    settings = {
        "solver_name": "ScalarTransportSolver",
        "scalar_name": "temperature",
        "mesh": None,
        "function_space": Q,
        "boundary_conditions": copy.deepcopy(bcs),
        "initial_values": {"temperature": 300.0},
        "material": {"density": 1.0, "specific_heat_capacity": 1.0,
                     "thermal_conductivity": 1.0},
        "solver_settings": {
            "transient_settings": {"transient": False},
            "reference_values": {"temperature": 300.0},
            "solver_parameters": {"relative_tolerance": 1e-12,
                                  "maximum_iterations": 4000,
                                  "spmv_budget_mb": 1e-6,
                                  "monitor_convergence": False},
        },
        "report_settings": {"plotting_freq": 0, "saving_freq": 0,
                            "logging_level": 40},
    }
    s = ScalarTransportSolver(settings)
    T = s.solve()
    cache = getattr(s, "_bell_krylov_cache", None)
    assert cache is not None and not cache["ok"]
    assert 300.0 - 1e-6 <= float(np.min(T.values)) and float(
        np.max(T.values)
    ) <= 350.0 + 1e-6
