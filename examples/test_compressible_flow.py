"""Compressible flow example — the reference's example suite imports
``CompressibleNSSolver`` (``examples/test_cfd_solver.py:164``) but the
module never shipped upstream; delivered here
(``fenicssolver_tpu/solvers/compressible_ns.py``).

Two quantitative cases on the explicit density-based ideal-gas solver:

1. An acoustic pulse in a closed slip-wall box: a Gaussian pressure bump
   radiates a ring wave whose front must travel at the sound speed
   c = sqrt(gamma p / rho); the measured front radius at t_end is
   asserted against c * t_end, and mass + total energy are conserved to
   round-off (slip walls, conservative group-FEM scheme).
2. The reference-surface mirror: an ideal-gas case dict in the upstream
   schema (material name 'ideal gas', kinematic_viscosity, density),
   constructed through the JSON-style settings path, CFL time step
   derived by the solver, marched viscous, and checked finite.
"""

import numpy as np

from config import is_interactive

interactively = is_interactive()

from fenicssolver_tpu.compat import *  # noqa: F403
from fenicssolver_tpu.solvers.compressible_ns import CompressibleNSSolver


def _edge(ax, w):
    return lambda x: near(x[ax], w)  # noqa: F405


def _slip_box_bcs():
    bcs = {}
    for i, (ax, w) in enumerate([(0, 0.0), (0, 1.0), (1, 0.0), (1, 1.0)]):
        bcs[f"wall{i}"] = {
            "boundary": AutoSubDomain(_edge(ax, w)),  # noqa: F405
            "boundary_id": i + 1,
            "type": "symmetry",  # slip wall
        }
    return bcs


def _settings(mesh, bcs, material, initial, t_end, cfl=0.3):
    return {
        "solver_name": "CompressibleNSSolver",
        "mesh": mesh,
        "boundary_conditions": bcs,
        "initial_values": initial,
        "material": material,
        "solver_settings": {
            "transient_settings": {
                "transient": True,
                "starting_time": 0.0,
                "ending_time": t_end,
                "cfl": cfl,
            },
            "reference_values": {},
            "solver_parameters": {},
        },
        "report_settings": {"plotting_freq": 0, "saving_freq": 0,
                            "logging_level": 40},
    }


def test():
    # -- case 1: acoustic pulse speed + conservation -----------------------
    n = 64
    mesh = UnitSquareMesh(n)  # noqa: F405
    gamma, p_bg = 1.4, 1.0
    c = np.sqrt(gamma * p_bg / 1.0)  # rho = p/(R T) = 1 with R = T = 1
    t_end = 0.25

    s = _settings(
        mesh, _slip_box_bcs(),
        material={"specific_heat_ratio": gamma, "gas_constant": 1.0},
        initial={
            "pressure": lambda x: p_bg + 0.01 * np.exp(
                -200.0 * ((x[0] - 0.5) ** 2 + (x[1] - 0.5) ** 2)
            ),
            "temperature": 1.0,
        },
        t_end=t_end,
    )
    solver = CompressibleNSSolver(s)
    solver._prepare()
    U0 = solver._initial_state()
    ml = solver._tables["mlump"]
    tot0 = (U0 * ml[None, :]).sum(axis=1)
    solver.solve()
    tot1 = solver.totals()
    dm = abs(tot1[0] - tot0[0]) / tot0[0]
    dE = abs(tot1[-1] - tot0[-1]) / abs(tot0[-1])
    print(f"closed box: d(mass)/mass = {dm:.2e}, d(E)/E = {dE:.2e}")
    assert dm < 1e-12 and dE < 1e-12

    # wave-front radius: peak |p - p_bg| along the horizontal center line
    X = np.asarray(mesh.coords)
    p_h = solver._pressure_np()
    line = np.isclose(X[:, 1], 0.5) & (X[:, 0] > 0.55)
    xs = X[line, 0]
    dp = np.abs(p_h[line] - p_bg)
    r_front = abs(xs[np.argmax(dp)] - 0.5)
    r_exact = c * t_end
    print(f"acoustic front radius = {r_front:.3f} (exact c*t = {r_exact:.3f})")
    assert abs(r_front - r_exact) / r_exact < 0.10

    # -- case 2: the reference's ideal-gas surface (viscous march) ---------
    fluid = {"name": "ideal gas", "kinematic_viscosity": 1e-2, "density": 1.3}
    s2 = _settings(
        UnitSquareMesh(16),  # noqa: F405
        _slip_box_bcs(),
        material=fluid,
        initial={
            "velocity": lambda x: (
                0.05 * np.sin(np.pi * x[0]) * np.cos(np.pi * x[1]),
                -0.05 * np.cos(np.pi * x[0]) * np.sin(np.pi * x[1]),
            ),
            "pressure": 1.0e5,
            "temperature": 293.15,
        },
        t_end=2.0e-4,
    )
    solver2 = CompressibleNSSolver(s2)
    dt = solver2.cfl_time_step()
    print(f"ideal-gas case: CFL dt = {dt:.3e}, mu = {solver2.mu:.3e}")
    assert solver2.mu == 1e-2 * 1.3  # kinematic * density
    solver2.solve()
    assert np.isfinite(solver2.state).all()
    M = solver2.mach().values.max()
    print(f"max Mach = {M:.4f}")
    assert M < 0.01  # low-Mach vortex against c ~ 343 m/s

    if interactively:
        solver.plot()


if __name__ == "__main__":
    test()
    print("test_compressible_flow: OK")
