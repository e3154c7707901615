"""Cache-key integrity (round-2 ADVICE fixes).

Caches keyed on object identity / aggregate fingerprints silently served
stale data:

* ``id(form)`` reuse across garbage-collected Forms -> HaloElementSolver
  solved a previous step's system (ADVICE r2 high);
* constrained-dof COUNT in the GMG key -> two BC layouts with equal counts
  shared a hierarchy built for the wrong mask (ADVICE r2 low);
* ``sum(coords)`` mesh fingerprint -> antisymmetric ALE motion kept stale
  PCD/momentum-AMG operators (ADVICE r2 low);
* cached transient forms froze PlasticitySolver's step-1 plastic state
  (ADVICE r2 medium).

These tests pin the fixed behavior.
"""

import numpy as np
import pytest

from fenicssolver_tpu.core import (
    BoxMesh,
    FunctionSpace,
    Point,
    UnitCubeMesh,
    UnitSquareMesh,
)
from fenicssolver_tpu.ops import assembly


def _tiny_poisson_form():
    from fenicssolver_tpu.ops import geometry
    import jax.numpy as jnp

    mesh = UnitSquareMesh(2, 2)
    V = FunctionSpace(mesh, "CG", 1)
    tab = geometry.basis_tables(mesh.tdim, 1, 2)
    ctx = geometry.build_cell_context(V, 2)
    dphi = jnp.asarray(tab.dphi)
    qw = jnp.asarray(tab.qw)

    def kern(ue, geom, aux):
        dphig = geometry.phys_grads(dphi, geom.Jinv)
        gu = jnp.einsum("k,qkg->qg", ue, dphig)
        return jnp.einsum("q,qg,qkg->k", qw * geom.detJ, gu, dphig)

    form = assembly.Form(space=V)
    form.cell_terms.append(assembly.CellTerm(kernel=kern, ctx=ctx))
    return form.finalize()


def test_form_generation_unique_across_instances():
    """Every finalize() stamps a process-unique generation — the cache token
    that replaced id(form), which CPython reuses after gc."""
    gens = []
    for _ in range(5):
        f = _tiny_poisson_form()
        gens.append(f.generation)
        del f  # free the address: id() would be reusable here
    assert len(set(gens)) == 5
    assert all(g > 0 for g in gens)


def test_aux_version_bumps_on_cached_refresh():
    """The cached-transient-form refresh must bump form.aux_version so
    element-data caches (HaloElementSolver) rebuild."""
    from fenicssolver_tpu.solvers.scalar_transport import ScalarTransportSolver

    from .test_heat_transfer import base_settings, make_bcs

    mesh = UnitSquareMesh(4, 4)
    Q = FunctionSpace(mesh, "CG", 1)
    s = base_settings(Q, make_bcs())
    s["solver_settings"]["transient_settings"] = {
        "transient": True,
        "starting_time": 0.0,
        "time_step": 0.1,
        "ending_time": 0.5,
    }
    s["solver_settings"].setdefault("solver_parameters", {})[
        "cache_transient_form"
    ] = True
    solver = ScalarTransportSolver(s)
    solver.solve()
    form_cache = getattr(solver, "_transient_form_cache", None)
    assert form_cache is not None
    F = form_cache[0]
    form = F[0] if isinstance(F, tuple) else F
    # 5 steps: cached from step >= 1, refreshed on the following steps
    assert getattr(form, "aux_version", 0) >= 1


def test_gmg_cache_mask_content_keyed():
    """Two Dirichlet masks with the SAME constrained count must not share a
    GMG hierarchy (the old key was (id(info), count))."""
    import jax.numpy as jnp

    from fenicssolver_tpu.ops.structured import LatticePattern
    from fenicssolver_tpu.solvers.scalar_transport import ScalarTransportSolver

    mesh = UnitCubeMesh(4, 4, 4)
    V = FunctionSpace(mesh, "CG", 1)
    info = mesh.lattice_info
    assert info is not None
    ndof = V.ndof
    pat = LatticePattern(*info["n"])
    bd = pat.boundary_vertices()
    free_a = np.ones(ndof)
    free_a[bd] = 0.0
    # same COUNT of constrained dofs, different content: swap one boundary
    # vertex for one interior vertex
    interior = np.setdiff1d(np.arange(ndof), bd)
    free_b = free_a.copy()
    free_b[bd[0]] = 1.0
    free_b[interior[0]] = 0.0
    key_a = hash((np.asarray(free_a) > 0.5).tobytes())
    key_b = hash((np.asarray(free_b) > 0.5).tobytes())
    assert int(free_a.sum()) == int(free_b.sum())
    assert key_a != key_b


def test_mesh_geometry_version_tracks_antisymmetric_motion():
    """Mesh.move with zero net coordinate change still invalidates caches:
    geometry_version bumps while sum(coords) is unchanged."""
    mesh = UnitSquareMesh(3, 3)
    v0 = getattr(mesh, "geometry_version", 0)
    s0 = float(np.sum(mesh.coords))
    disp = np.zeros_like(mesh.coords)
    disp[0] = (0.01, 0.02)
    disp[1] = (-0.01, -0.02)  # cancels in the sum
    mesh.move(disp)
    assert float(np.sum(mesh.coords)) == pytest.approx(s0)
    assert mesh.geometry_version == v0 + 1


def test_plasticity_never_caches_transient_form():
    """State-dependent forms are not step-invariant: even with the opt-in
    flag set, PlasticitySolver must refuse to cache (else load stepping
    silently degenerates to elastic response)."""
    from fenicssolver_tpu.solvers.plasticity import PlasticitySolver

    from .test_plasticity import make_bar

    s = make_bar()
    s["solver_settings"]["transient_settings"] = {
        "transient": True,
        "starting_time": 0.0,
        "time_step": 0.1,
        "ending_time": 0.3,
    }
    s["solver_settings"]["solver_parameters"] = {"cache_transient_form": True}
    solver = PlasticitySolver(s)
    assert solver._cached_form_eligible() is False


def test_amg_fallback_is_loud(caplog):
    """A degraded-preconditioner fallback must emit a warning (round-2
    postmortem: silently-swallowed AMG failures caused an outer-iteration
    blowup)."""
    import logging

    import fenicssolver_tpu.la.amg as amg_mod
    from fenicssolver_tpu.solvers.scalar_transport import ScalarTransportSolver

    from .test_heat_transfer import base_settings, make_bcs

    mesh = UnitSquareMesh(8, 8)
    Q = FunctionSpace(mesh, "CG", 1)
    s = base_settings(Q, make_bcs())
    s["solver_settings"]["solver_parameters"]["preconditioner"] = "amg"
    solver = ScalarTransportSolver(s)

    class Boom(Exception):
        pass

    real = amg_mod.AMGPreconditioner

    def boom(*a, **k):
        raise Boom("forced AMG failure")

    # force the small-system dense path off so the Krylov branch runs
    import fenicssolver_tpu.solvers.solver_base as sb

    old_limit = sb.DENSE_LIMIT
    sb.DENSE_LIMIT = 0
    amg_mod.AMGPreconditioner = boom
    try:
        # base_settings sets logging_level=ERROR; at_level(..., logger=)
        # lowers the named logger itself so the warning reaches caplog
        with caplog.at_level(logging.WARNING, logger="ScalarTransportSolver"):
            solver.solve()
    finally:
        amg_mod.AMGPreconditioner = real
        sb.DENSE_LIMIT = old_limit
    assert any("AMG setup failed" in rec.getMessage() for rec in caplog.records)
