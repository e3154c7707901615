"""Frictionless penalty contact against rigid obstacles (beyond parity —
``/root/reference`` has no contact mechanics anywhere).

Anchors avoid constitutive detail: at equilibrium the contact integral
k * <gap>_- over the patch must balance the imposed load EXACTLY (global
equilibrium), penetration must scale as 1/k, and an obstacle that is
never reached must leave the solution bit-identical to the
unconstrained solve."""

import numpy as np

from fenicssolver_tpu.core import AutoSubDomain, Constant, UnitSquareMesh, near
from fenicssolver_tpu.ops import assembly
from fenicssolver_tpu.solvers.nonlinear_elasticity import (
    NonlinearElasticitySolver,
)

E, NU = 10.0, 0.3


def block_settings(delta=0.05, contact=None, nx=8):
    mesh = UnitSquareMesh(nx, nx)
    top = AutoSubDomain(lambda x: near(x[1], 1.0))
    bcs = {
        "top": {
            "boundary": top,
            "boundary_id": 1,
            "type": "Dirichlet",
            "value": Constant((0.0, -delta)),
        },
    }
    s = {
        "solver_name": "NonlinearElasticitySolver",
        "mesh": mesh,
        "fe_degree": 1,
        "boundary_conditions": bcs,
        "material": {"elastic_modulus": E, "poisson_ratio": NU,
                     "density": 1.0},
        "solver_settings": {
            "transient_settings": {"transient": False},
            "reference_values": {"temperature": 293},
            "solver_parameters": {
                "relative_tolerance": 1e-11,
                "maximum_iterations": 60,
                "monitor_convergence": False,
            },
        },
        "report_settings": {"plotting_freq": 0, "saving_freq": 0,
                            "logging_level": 40},
    }
    if contact is not None:
        s["contact_settings"] = contact
    return s


def _bottom_plane(k):
    bottom = AutoSubDomain(lambda x: near(x[1], 0.0))
    return {
        "boundary": bottom,
        "obstacle": {"type": "plane", "point": (0.0, 0.0),
                     "normal": (0.0, 1.0)},
        "penalty": k,
    }


def _top_reaction(solver):
    """Sum of the unconstrained residual over the top Dirichlet dofs =
    the force the constraint applies to the body."""
    form, _ = solver.generate_form(
        0, None, None, solver.w_current, solver.w_prev
    )
    R = np.asarray(
        assembly.assemble_residual(form, solver.w_current.values)
    ).reshape(-1, 2)
    X = solver.function_space.scalar_space.dof_coords
    topd = np.abs(X[:, 1] - 1.0) < 1e-12
    return R[topd].sum(axis=0)


def test_contact_force_balances_reaction_and_scales_with_penalty():
    k1 = 1e3 * E
    s = block_settings(contact=_bottom_plane(k1))
    solver = NonlinearElasticitySolver(s)
    u = solver.solve()
    U = u.values.reshape(-1, 2)
    X = solver.function_space.scalar_space.dof_coords
    bot = np.abs(X[:, 1]) < 1e-12
    pen1 = -(X[bot, 1] + U[bot, 1]).min()  # max penetration depth
    assert pen1 > 1e-6, pen1  # contact is active

    fc = solver.contact_force()
    assert fc[1] > 0.0  # obstacle pushes the body up
    # global equilibrium: contact force cancels the top reaction (the
    # unconstrained residual at the Dirichlet dofs is MINUS the force the
    # constraint applies)
    reac = _top_reaction(solver)
    assert abs(fc[1] + reac[1]) < 2e-8 * abs(fc[1]), (fc, reac)
    # the compressed block really transmits a load of order E*delta
    assert 0.1 * E * 0.05 < fc[1] < 3.0 * E * 0.05, fc

    # penalty scaling: 10x stiffer -> ~10x less penetration, same force
    s2 = block_settings(contact=_bottom_plane(10 * k1))
    solver2 = NonlinearElasticitySolver(s2)
    u2 = solver2.solve()
    U2 = u2.values.reshape(-1, 2)
    pen2 = -(X[bot, 1] + U2[bot, 1]).min()
    assert 6.0 < pen1 / pen2 < 14.0, (pen1, pen2)
    fc2 = solver2.contact_force()
    assert abs(fc2[1] - fc[1]) < 0.02 * abs(fc[1]), (fc, fc2)


def test_unreached_obstacle_is_inert():
    far = {
        "boundary": AutoSubDomain(lambda x: near(x[1], 0.0)),
        "obstacle": {"type": "plane", "point": (0.0, -1.0),
                     "normal": (0.0, 1.0)},
        "penalty": 1e5,
    }
    # without bottom support the block would fall: hold the bottom ux=uy=0
    # no — keep the displacement-driven block; it compresses downward by
    # at most delta << 1, never reaching y=-1
    s_free = block_settings()
    s_far = block_settings(contact=far)
    u_free = NonlinearElasticitySolver(s_free).solve()
    u_far = NonlinearElasticitySolver(s_far).solve()
    assert np.max(np.abs(u_free.values - u_far.values)) < 1e-9


def test_sphere_indenter_localizes_contact():
    # rigid ball of radius 0.3 with its pole just under the bottom face
    # center: contact must engage and stay near x = 0.5
    ball = {
        "boundary": AutoSubDomain(lambda x: near(x[1], 0.0)),
        "obstacle": {"type": "sphere", "center": (0.5, -0.29),
                     "radius": 0.3},
        "penalty": 1e3 * E,
    }
    s = block_settings(delta=0.05, contact=ball, nx=12)
    solver = NonlinearElasticitySolver(s)
    u = solver.solve()
    U = u.values.reshape(-1, 2)
    X = solver.function_space.scalar_space.dof_coords
    y = X + U
    bot = np.abs(X[:, 1]) < 1e-12
    g = np.linalg.norm(y[bot] - np.array([0.5, -0.29]), axis=1) - 0.3
    xb = X[bot, 0]
    fc = solver.contact_force()
    assert fc[1] > 0.0  # engaged (some quadrature point penetrates —
    # nodes sit on chords OUTSIDE the circle, so test the force, not g<0)
    # localization: center nodes ride the ball (|g| ~ penalty-penetration
    # scale), edge nodes hang well clear of it
    assert np.abs(g[np.abs(xb - 0.5) < 0.15]).max() < 5e-3, g
    assert (g[np.abs(xb - 0.5) > 0.35] > 0.05).all(), g
    assert abs(fc[0]) < 0.05 * fc[1]  # symmetric indentation
