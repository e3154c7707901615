"""Test configuration: force CPU with 8 virtual devices and float64.

Correctness tests validate at 1e-8 rel-L2 (BASELINE.md), which needs f64 —
emulated and slow on TPU — so tests run on the CPU backend with a virtual
8-device mesh for the sharding tests (SURVEY.md §4 "multi-device tests via
jax device mesh").  The env must be set before jax initializes backends;
the axon sitecustomize re-exports JAX_PLATFORMS, so we override here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

REFERENCE_DATA = "/root/reference/data"


def reference_data_available():
    return os.path.exists(os.path.join(REFERENCE_DATA, "mesh.xml"))


# ---------------------------------------------------------------------------
# slow-test tail (VERDICT r4 item 3: `-m "not slow"` must be a REAL subset).
# The list is the measured >25 s tail of a full --durations=0 run on the
# 1-core CI box (2026-08-19, 268 tests, 98 min total); marking it centrally
# keeps the threshold auditable and re-generatable from one durations run:
#   python -m pytest tests/ -q --durations=0 | grep -E '^[0-9.]+s call'
# Matching is by exact "<file>.py::<test>" nodeid tail (parametrized ids
# included), so a fast sibling parameter stays in the fast subset.
# ---------------------------------------------------------------------------
SLOW_TESTS = {
    "test_ns_dg.py::test_dg_unstructured_cylinder_flow",  # 580s
    "test_lattice_halo.py::test_vector_lattice_free_surface_engages",  # 485s
    "test_distributed_ns.py::test_distributed_fieldsplit_outer_counts_stay_flat",  # 390s
    "test_lattice_halo.py::test_solver_layer_routes_vector_lattice",  # 364s
    "test_lattice_halo.py::test_vector_lattice_matches_direct_and_iters_flat",  # 223s
    "test_ns_fieldsplit.py::test_pcd_poiseuille_58k_dofs",  # 171s
    "test_distributed_ns.py::test_distributed_dg_ns_matches_serial",  # 141s
    "test_fast_paths.py::test_jitted_transient_ns_iterative_beyond_dense_limit",  # 141s
    "test_linear_elasticity.py::test_cantilever_tip_force_3d",  # 129s
    "test_ns_dg.py::test_dg_adjoint_drag_sensitivity",  # 105s
    "test_fsi.py::test_fsi_channel_over_elastic_wall",  # 94s
    "test_amg_halo.py::test_iteration_count_mesh_near_independent",  # 84s
    "test_ns_fieldsplit.py::test_pcd_laplacian_viscous_form_flat_outer_iterations",  # 83s
    "test_ns_fieldsplit.py::test_pcd_outer_iterations_scale",  # 81s
    "test_ns_fieldsplit.py::test_pcd_robin_unstalls_cylinder_geometry",  # 70s
    "test_lattice_halo.py::test_solver_layer_routes_lattice_gmg",  # 61s
    "test_distributed_ns.py::test_distributed_momentum_amg_fieldsplit_engages",  # 60s
    "test_amg_halo.py::test_vector_elasticity_rigid_body_nullspace",  # 57s
    "test_ns_dg.py::test_dg_3d_couette_exact",  # 50s
    "test_ns_dg.py::test_dg_picard_matches_newton",  # 48s
    "test_fast_paths.py::test_jitted_transient_ns_matches_python_loop",  # 47s
    "test_fsi.py::test_fsi_pressure_loaded_cantilever_matches_beam_theory",  # 46s
    "test_gmg.py::test_gmg_elastic_free_surface_cantilever_flat_iters",  # 44s
    "test_lattice_halo.py::test_solver_layer_routes_pencil",  # 44s
    "test_ns_fieldsplit.py::test_fieldsplit_outer_iterations_scale",  # 44s
    "test_linear_elasticity.py::test_modal_analysis_cantilever",  # 43s
    "test_fsi.py::test_fsi_with_large_deformation_solid",  # 42s
    "test_lattice_halo.py::test_pencil_matches_serial_and_iters_flat",  # 42s
    "test_amg_halo.py::test_unstructured_poisson_matches_serial_amg",  # 42s
    "test_wave.py::test_dt_convergence_second_order",  # 41s
    "test_amg.py::test_amg_routing_from_solver_parameters",  # 40s
    "test_lattice_halo.py::test_lattice_halo_matches_serial_and_iters_flat",  # 39s
    "test_ordering.py::test_fast_path_heat_on_delaunay_mesh",  # 38s
    "test_elements.py::test_p3_vector_patch_test",  # 38s
    "test_fsi.py::test_distributed_fsi_matches_serial",  # 37s
    "test_navier_stokes.py::test_coupled_htc_wall_conduction_limit",  # 36s
    "test_adjoint.py::test_ns_drag_sensitivity_wrt_inflow",  # 36s
    "test_fast_paths.py::test_jitted_scan_matches_python_loop",  # 34s
    "test_linear_elasticity.py::test_modal_lobpcg_matches_scipy",  # 32s
    "test_ns_ipcs.py::test_ipcs_matrix_free_projection",  # 32s
    "test_distributed_ns.py::test_distributed_ns_channel_matches_serial",  # 32s
    "test_ns_fieldsplit.py::test_splu_poiseuille_58k_dofs",  # 32s
    "test_amg.py::test_solve_amg_elasticity_with_nullspace",  # 31s
    "test_ns_dg.py::test_dg_turbulence_validation_matches_cg",  # 30s
    "test_ns_dg.py::test_dg_poiseuille_exact",  # 30s
    "test_adjoint.py::test_elasticity_compliance_sensitivity",  # 29s
    "test_ns_ipcs.py::test_ipcs_poiseuille_startup",  # 29s
    "test_nonlinear_elasticity.py::test_large_deformation_2d[0.3]",  # 28s
    "test_postproc.py::test_viscous_stress_fields",  # 28s
    "test_ns_fieldsplit.py::test_fieldsplit_fgmres_poiseuille",  # 27s
    "test_navier_stokes.py::test_coupled_temperature",  # 27s
    "test_gmg.py::test_elasticity_stencil_and_vector_gmg",  # 26s
    "test_wave.py::test_standing_mode",  # 26s
    "test_scalar_dg.py::test_dg_rotating_velocity_matches_cg_supg",  # 26s
    "test_ns_dg.py::test_dg_symmetry_halfchannel_exact",  # 26s
    # round-5 additions (timed in their own runs, not in the durations
    # sweep above): DG SIPG momentum-preconditioner validation
    "test_ns_dg.py::test_dg_pmg_momentum_iterations_flat",  # ~80s
    "test_ns_dg.py::test_dg_serial_fieldsplit_matches_dense",  # ~130s
    "test_distributed_ns.py::test_distributed_dg_fieldsplit_outer_count_bound",  # ~140s
    # 18-25 s band, marked selectively (each area keeps at least one
    # fast-subset representative — e.g. test_poiseuille_newton,
    # test_unstructured_distributed_routes_through_sharded_amg,
    # test_uniaxial_bilinear_response and test_energy_conserved stay)
    "test_fast_paths.py::test_cached_transient_form_elasticity_dynamics",  # 25s
    "test_navier_stokes.py::test_drag_lift_and_stress_postproc",  # 23s
    "test_scalar_dg.py::test_dg_diffusion_matches_analytic",  # 23s
    "test_ns_extras.py::test_backflow_stabilization_on_open_cavity",  # 23s
    "test_distributed_newton.py::test_distributed_newton_hyperelastic_matches_serial",  # 22s
    "test_contact.py::test_sphere_indenter_localizes_contact",  # 20s
    "test_scalar_dg.py::test_dg_varying_velocity_const_expression_matches_constant",  # 20s
    "test_contact.py::test_contact_force_balances_reaction_and_scales_with_penalty",  # 20s
    "test_amg.py::test_amg_f32_hierarchy_stays_f32",  # 19s
    "test_halo.py::test_halo_setup_memory_scales",  # 18s warm, ~77s cold
    "test_amg_halo.py::test_fgmres_nonsymmetric_advection",  # 18s
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if item.nodeid.split("/")[-1] in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
