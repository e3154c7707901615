"""Electrostatics example (ported from the reference's
``examples/test_electrostatics.py``; the displacement-flux check is asserted)."""

import numpy as np

from config import is_interactive

interactively = is_interactive()

from fenicssolver_tpu.compat import *  # noqa: F403
from fenicssolver_tpu.solvers.scalar_transport import (
    ScalarTransportSolver,
    electric_permittivity_in_vacumm,
)

mesh = UnitSquareMesh(40, 40)
Q = FunctionSpace(mesh, "CG", 1)

top = AutoSubDomain(lambda x: near(x[1], 1.0))
bottom = AutoSubDomain(lambda x: near(x[1], 0.0))
left = AutoSubDomain(lambda x: near(x[0], 0.0))
right = AutoSubDomain(lambda x: near(x[0], 1.0))

V_high, V_low, V_ground = 360, 300, 300
material = {
    "name": "silicon",
    "thermal_conductivity": 149,
    "specific_heat_capacity": 1000,
    "density": 2500,
    "relative_electric_permittivity": 11.7,
    "electric_conductivity": 1.0 / 2300,
}
epsilon = material["relative_electric_permittivity"] * electric_permittivity_in_vacumm
electric_displacement = (V_high - V_low) / 1.0 * epsilon

bcs = {
    "high": {"boundary": top, "boundary_id": 1, "type": "Dirichlet",
             "value": Constant(V_high)},
    "low": {"boundary": bottom, "boundary_id": 2, "type": "Dirichlet",
            "value": Constant(V_low)},
    "left": {"boundary": left, "boundary_id": 3, "type": "flux",
             "value": Constant(0)},
    "right": {"boundary": right, "boundary_id": 4, "type": "flux",
              "value": Constant(0)},
}

settings = {
    "solver_name": "ScalarTransportSolver",
    "mesh": None,
    "function_space": Q,
    "boundary_conditions": bcs,
    "body_source": None,
    "initial_values": {"electric_potential": V_ground},
    "material": material,
    "solver_settings": {
        "transient_settings": {"transient": False, "starting_time": 0,
                               "time_step": 0.1, "ending_time": 1},
        "reference_values": {"temperature": 300, "electric_potential": V_ground},
        "solver_parameters": {"relative_tolerance": 1e-11,
                              "maximum_iterations": 500,
                              "monitor_convergence": False},
    },
    "report_settings": {"plotting_freq": 0, "saving_freq": 0,
                        "plotting_interactive": False, "logging_level": 40},
    "scalar_name": "electric_potential",
}


def test():
    solver = ScalarTransportSolver(settings)
    T = solver.solve()
    post_process(T)
    if interactively:
        solver.plot()


def post_process(T):
    normal = FacetNormal(mesh)
    boundary_facets = MeshFunction("size_t", mesh, mesh.topology().dim() - 1)
    boundary_facets.set_all(0)
    bottom.mark(boundary_facets, 1)
    ds = Measure("ds", subdomain_data=boundary_facets)
    flux = assemble(epsilon * dot(grad(T), normal) * ds(1))
    print("electric displacement integral on the bottom (C/m):", flux)
    print("analytic:", -electric_displacement)
    assert abs(-flux - electric_displacement) / electric_displacement < 1e-8


if __name__ == "__main__":
    test()
    print("test_electrostatics: OK")
