"""FSI coupling test — the reference bundles NO FSI test (SURVEY.md §4:
"video-only evidence"); this exercises the full segregated loop:
fluid solve -> stress transfer -> solid solve -> mesh motion -> ALE."""

import numpy as np

from fenicssolver_tpu.core import (
    AutoSubDomain,
    Constant,
    Expression,
    Point,
    RectangleMesh,
    near,
)
from fenicssolver_tpu.solvers.fsi import FSISolver


def make_fsi_settings():
    # fluid: channel y in [0.5, 1]; solid: slab y in [0.3, 0.5]
    fluid_mesh = RectangleMesh(Point(0, 0.5), Point(1, 1.0), 8, 4)
    solid_mesh = RectangleMesh(Point(0, 0.3), Point(1, 0.5), 8, 2)

    inlet = AutoSubDomain(lambda x: near(x[0], 0.0))
    outlet = AutoSubDomain(lambda x: near(x[0], 1.0))
    top = AutoSubDomain(lambda x: near(x[1], 1.0))
    interface = AutoSubDomain(lambda x: near(x[1], 0.5))
    solid_bottom = AutoSubDomain(lambda x: near(x[1], 0.3))
    solid_sides = AutoSubDomain(lambda x: near(x[0], 0.0) | near(x[0], 1.0))

    parabola = Expression(
        ("umax*16.0*(x[1]-0.5)*(1.0-x[1])", "0"), umax=0.3, degree=2
    )
    fluid_bcs = {
        "inlet": {
            "boundary": inlet,
            "boundary_id": 1,
            "values": [
                {"variable": "velocity", "type": "Dirichlet", "value": parabola}
            ],
        },
        "outlet": {
            "boundary": outlet,
            "boundary_id": 2,
            "values": [
                {"variable": "pressure", "type": "Dirichlet", "value": 0.0}
            ],
        },
        "top": {
            "boundary": top,
            "boundary_id": 3,
            "values": [
                {"variable": "velocity", "type": "Dirichlet", "value": (0.0, 0.0)}
            ],
        },
        "interface": {
            "boundary": interface,
            "boundary_id": 4,
            "coupling": "FSI",
        },
    }
    solid_bcs = {
        "bottom": {
            "boundary": solid_bottom,
            "boundary_id": 1,
            "type": "Dirichlet",
            "value": Constant((0.0, 0.0)),
        },
        "sides": {
            "boundary": solid_sides,
            "boundary_id": 2,
            "type": "Dirichlet",
            "value": Constant((0.0, 0.0)),
        },
        "interface": {
            "boundary": interface,
            "boundary_id": 4,
            "coupling": "FSI",
            "type": "stress",
            "value": Constant((0.0, 0.0)),
        },
    }
    transient = {
        "transient": True,
        "starting_time": 0.0,
        "time_step": 0.02,
        "ending_time": 0.06,
    }
    report = {
        "plotting_freq": 0,
        "saving_freq": 0,
        "plotting_interactive": False,
        "logging_level": 40,
    }
    fluid_settings = {
        "solver_name": "CoupledNavierStokesSolver",
        "mesh": fluid_mesh,
        "fe_degree": 1,
        "boundary_conditions": fluid_bcs,
        "body_source": None,
        "initial_values": {"velocity": (0.0, 0.0), "pressure": 0.0},
        "material": {"density": 1000.0, "kinematic_viscosity": 0.01},
        "solver_settings": {
            "transient_settings": transient,
            "reference_values": {"pressure": 101325.0},
            "solver_parameters": {
                "relative_tolerance": 1e-9,
                "maximum_iterations": 100,
                "monitor_convergence": False,
            },
        },
        "report_settings": report,
    }
    solid_settings = {
        "solver_name": "LinearElasticitySolver",
        "mesh": solid_mesh,
        "fe_degree": 2,
        "boundary_conditions": solid_bcs,
        "temperature_distribution": None,
        "material": {
            "elastic_modulus": 1e6,
            "poisson_ratio": 0.3,
            "density": 1000,
            "thermal_expansion_coefficient": 2e-6,
        },
        "solver_settings": {
            "transient_settings": transient,
            "reference_values": {"temperature": 293},
            "solver_parameters": {
                "relative_tolerance": 1e-10,
                "maximum_iterations": 2000,
                "monitor_convergence": False,
            },
        },
        "report_settings": report,
    }
    return {
        "solver_name": "FSISolver",
        "participants": [
            {"solver_domain": "fluidic", "settings": fluid_settings},
            {"solver_domain": "elastic", "settings": solid_settings},
        ],
        "parent_mesh": None,
        "transient_settings": transient,
        "coupling_settings": {},
    }


def test_fsi_channel_over_elastic_wall():
    s = make_fsi_settings()
    fsi = FSISolver(s)
    # interface vertices matched one-to-one
    assert len(fsi.fluid_iface_verts) == 9  # 8 segments -> 9 vertices
    results = fsi.solve()
    up = fsi.fluid_solver.w_current
    assert np.isfinite(up.values).all()
    u_solid = fsi.solid_solver.w_current
    assert np.isfinite(u_solid.values).all()
    # the solid interface carries fluid load: some deformation occurred
    d = 2
    U = u_solid.values.reshape(-1, d)
    assert np.abs(U).max() > 0
    # fluid mesh followed the interface (ALE move happened)
    moved = np.abs(
        fsi.fluid_solver.mesh.coords - fsi.original_fluid_coords
    ).max()
    assert moved > 0
    # and the motion stays small/bounded for this stiff solid
    assert moved < 0.05


def test_fsi_pressure_loaded_cantilever_matches_beam_theory():
    """Quantitative FSI anchor (VERDICT r1 item 5): a static pressurized
    fluid loads a cantilever beam through the full FSI transfer machinery;
    the tip deflection must match Euler-Bernoulli w(L) = q L^4 / (8 E I)
    (nu = 0 so plane stress == plane strain; tolerance covers shear
    deflection and 2D-elasticity vs beam-theory differences)."""
    L, t = 1.0, 0.1
    p0 = 50.0
    E = 1e7
    fluid_mesh = RectangleMesh(Point(0, t), Point(L, 0.4), 10, 4)
    solid_mesh = RectangleMesh(Point(0, 0.0), Point(L, t), 20, 2)

    inlet = AutoSubDomain(lambda x: near(x[0], 0.0))
    outlet = AutoSubDomain(lambda x: near(x[0], L))
    top = AutoSubDomain(lambda x: near(x[1], 0.4))
    interface = AutoSubDomain(lambda x: near(x[1], t))
    clamp = AutoSubDomain(lambda x: near(x[0], 0.0))

    fluid_bcs = {
        "inlet": {"boundary": inlet, "boundary_id": 1, "values": [
            {"variable": "pressure", "type": "Dirichlet", "value": p0}]},
        "outlet": {"boundary": outlet, "boundary_id": 2, "values": [
            {"variable": "pressure", "type": "Dirichlet", "value": p0}]},
        "top": {"boundary": top, "boundary_id": 3, "values": [
            {"variable": "velocity", "type": "Dirichlet", "value": (0.0, 0.0)}]},
        "interface": {"boundary": interface, "boundary_id": 4,
                      "coupling": "FSI"},
    }
    solid_bcs = {
        "clamp": {"boundary": clamp, "boundary_id": 1, "type": "Dirichlet",
                  "value": Constant((0.0, 0.0))},
        "interface": {"boundary": interface, "boundary_id": 4,
                      "coupling": "FSI", "type": "stress",
                      "value": Constant((0.0, 0.0))},
    }
    # light, viscous fluid + large dt: the staggered loop is only loosely
    # coupled, so a heavy fluid reacting to the instant first-step beam
    # deflection would water-hammer (rho L dv/dt >> p0) and destabilize
    transient = {"transient": True, "starting_time": 0.0,
                 "time_step": 0.2, "ending_time": 0.6}
    report = {"plotting_freq": 0, "saving_freq": 0,
              "plotting_interactive": False, "logging_level": 40}
    fluid_settings = {
        "solver_name": "CoupledNavierStokesSolver",
        "mesh": fluid_mesh, "fe_degree": 1,
        "boundary_conditions": fluid_bcs, "body_source": None,
        "initial_values": {"velocity": (0.0, 0.0), "pressure": p0},
        "material": {"density": 1.0, "kinematic_viscosity": 0.1},
        "solver_settings": {
            "transient_settings": transient,
            "reference_values": {"pressure": 101325.0},
            "solver_parameters": {"relative_tolerance": 1e-10,
                                  "maximum_iterations": 100,
                                  "monitor_convergence": False}},
        "report_settings": report,
    }
    solid_settings = {
        "solver_name": "LinearElasticitySolver",
        "mesh": solid_mesh, "fe_degree": 2,
        "boundary_conditions": solid_bcs,
        "temperature_distribution": None,
        "material": {"elastic_modulus": E, "poisson_ratio": 0.0,
                     "density": 1000,
                     "thermal_expansion_coefficient": 0.0},
        "solver_settings": {
            "transient_settings": transient,
            "reference_values": {"temperature": 293},
            "solver_parameters": {"relative_tolerance": 1e-12,
                                  "maximum_iterations": 4000,
                                  "monitor_convergence": False}},
        "report_settings": report,
    }
    fsi = FSISolver({
        "solver_name": "FSISolver",
        "participants": [
            {"solver_domain": "fluidic", "settings": fluid_settings},
            {"solver_domain": "elastic", "settings": solid_settings},
        ],
        "parent_mesh": None,
        "transient_settings": transient,
        "coupling_settings": {},
    })
    fsi.solve()
    V = fsi.solid_solver.function_space
    U = fsi.solid_solver.w_current.values.reshape(-1, 2)
    X = V.scalar_space.dof_coords
    tip = np.argmin((X[:, 0] - L) ** 2 + (X[:, 1] - t / 2) ** 2)
    w_num = U[tip, 1]
    I = t ** 3 / 12.0
    w_exact = -p0 * L ** 4 / (8.0 * E * I)  # load pushes the beam down
    assert np.isfinite(U).all()
    assert w_num < 0, f"beam should deflect downward, got {w_num}"
    rel = abs(w_num - w_exact) / abs(w_exact)
    assert rel < 0.15, (w_num, w_exact, rel)


def test_fsi_with_large_deformation_solid():
    """LargeDeformationSolver as the FSI solid participant (the reference
    keeps it commented out, FSISolver.py:142-145).  Same pressurized-fluid
    cantilever as the linear anchor: at this load level the neo-Hookean
    response is linear, so the tip deflection must still track
    Euler-Bernoulli w(L) = q L^4 / (8 E I).  The mixed (u, v, p) solid
    carries true inertia, so the suddenly-applied load rings (undamped CN);
    the check uses the average of the last two steps."""
    L, t = 1.0, 0.1
    p0 = 50.0
    E = 1e7
    fluid_mesh = RectangleMesh(Point(0, t), Point(L, 0.4), 10, 4)
    solid_mesh = RectangleMesh(Point(0, 0.0), Point(L, t), 20, 2)

    inlet = AutoSubDomain(lambda x: near(x[0], 0.0))
    outlet = AutoSubDomain(lambda x: near(x[0], L))
    top = AutoSubDomain(lambda x: near(x[1], 0.4))
    interface = AutoSubDomain(lambda x: near(x[1], t))
    clamp = AutoSubDomain(lambda x: near(x[0], 0.0))

    fluid_bcs = {
        "inlet": {"boundary": inlet, "boundary_id": 1, "values": [
            {"variable": "pressure", "type": "Dirichlet", "value": p0}]},
        "outlet": {"boundary": outlet, "boundary_id": 2, "values": [
            {"variable": "pressure", "type": "Dirichlet", "value": p0}]},
        "top": {"boundary": top, "boundary_id": 3, "values": [
            {"variable": "velocity", "type": "Dirichlet", "value": (0.0, 0.0)}]},
        "interface": {"boundary": interface, "boundary_id": 4,
                      "coupling": "FSI"},
    }
    solid_bcs = {
        "clamp": {"boundary": clamp, "boundary_id": 1, "type": "Dirichlet",
                  "value": Constant((0.0, 0.0))},
        "interface": {"boundary": interface, "boundary_id": 4,
                      "coupling": "FSI", "type": "stress",
                      "value": Constant((0.0, 0.0))},
    }
    transient = {"transient": True, "starting_time": 0.0,
                 "time_step": 0.2, "ending_time": 0.8}
    report = {"plotting_freq": 0, "saving_freq": 0,
              "plotting_interactive": False, "logging_level": 40}
    fluid_settings = {
        "solver_name": "CoupledNavierStokesSolver",
        "mesh": fluid_mesh, "fe_degree": 1,
        "boundary_conditions": fluid_bcs, "body_source": None,
        "initial_values": {"velocity": (0.0, 0.0), "pressure": p0},
        "material": {"density": 1.0, "kinematic_viscosity": 0.1},
        "solver_settings": {
            "transient_settings": transient,
            "reference_values": {"pressure": 101325.0},
            "solver_parameters": {"relative_tolerance": 1e-10,
                                  "maximum_iterations": 100,
                                  "monitor_convergence": False}},
        "report_settings": report,
    }
    solid_settings = {
        "solver_name": "LargeDeformationSolver",
        "mesh": solid_mesh, "fe_degree": 2,
        "boundary_conditions": solid_bcs,
        "material": {"elastic_modulus": E, "poisson_ratio": 0.3,
                     "density": 10.0},
        "solver_settings": {
            "transient_settings": transient,
            "reference_values": {"temperature": 293},
            "solver_parameters": {"relative_tolerance": 1e-10,
                                  "maximum_iterations": 50,
                                  "monitor_convergence": False}},
        "report_settings": report,
    }
    fsi = FSISolver({
        "solver_name": "FSISolver",
        "participants": [
            {"solver_domain": "fluidic", "settings": fluid_settings},
            {"solver_domain": "elastic", "settings": solid_settings},
        ],
        "parent_mesh": None,
        "transient_settings": transient,
        "coupling_settings": {},
    })
    from fenicssolver_tpu.solvers.large_deformation import (
        LargeDeformationSolver,
    )

    assert isinstance(fsi.solid_solver, LargeDeformationSolver)
    fsi.solve()
    W = fsi.solid_solver.function_space
    su = W.slice_of(0)
    U_now = fsi.solid_solver.w_current.values[su].reshape(-1, 2)
    U_prev = fsi.solid_solver.w_prev.values[su].reshape(-1, 2)
    U = 0.5 * (U_now + U_prev)  # damp the undamped CN ringing
    X = W.subspaces[0].scalar_space.dof_coords
    tip = np.argmin((X[:, 0] - L) ** 2 + (X[:, 1] - t / 2) ** 2)
    w_num = U[tip, 1]
    I = t ** 3 / 12.0
    # plane strain: effective modulus E / (1 - nu^2); nu = 0 is singular
    # for the mixed form (its compressible mass balance carries 1/lambda)
    E_eff = E / (1.0 - 0.3 ** 2)
    w_exact = -p0 * L ** 4 / (8.0 * E_eff * I)
    assert np.isfinite(U).all()
    assert w_num < 0, f"beam should deflect downward, got {w_num}"
    rel = abs(w_num - w_exact) / abs(w_exact)
    assert rel < 0.3, (w_num, w_exact, rel)


def test_distributed_fsi_matches_serial():
    """Distributed FSI smoke test (VERDICT r4 item 4): the full fluid ->
    interface -> solid -> mesh-motion step loop with ``distributed: true``
    propagated to both participants and the mesh-motion solve; the fluid
    halo saddle solver must ENGAGE and the solid displacement must match
    the serial run at 1e-8 (reference analog: FSISolver.py:248-266 runs
    under the same mpirun as everything else)."""
    import copy

    import jax

    assert len(jax.devices()) >= 8
    s0 = make_fsi_settings()
    serial = FSISolver(copy.deepcopy(s0))
    serial.solve()
    u_s = np.asarray(serial.solid_solver.w_current.values)

    s = copy.deepcopy(s0)
    s.setdefault("solver_settings", {}).setdefault(
        "solver_parameters", {}
    )["distributed"] = True
    dist = FSISolver(s)
    dist.solve()
    assert dist._distributed
    assert getattr(dist.fluid_solver, "_ns_halo_solver", None) is not None
    u_d = np.asarray(dist.solid_solver.w_current.values)
    err = np.linalg.norm(u_d - u_s) / max(np.linalg.norm(u_s), 1e-30)
    assert err < 1e-8, err
