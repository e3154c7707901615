"""Heat transfer example (ported from ``examples/test_heat_transfer.py`` of
the reference — dolfin import swapped for the compat namespace; the flux
comparison is asserted, not just printed)."""

import math

import numpy as np

from config import is_interactive

interactively = is_interactive()

from fenicssolver_tpu.compat import *  # noqa: F403
from fenicssolver_tpu.solvers.scalar_transport import ScalarTransportSolver

mesh = UnitSquareMesh(40, 40)
Q = FunctionSpace(mesh, "CG", 1)

cx_min, cy_min, cx_max, cy_max = 0, 0, 1, 1
top = AutoSubDomain(lambda x: near(x[1], cy_max))
bottom = AutoSubDomain(lambda x: near(x[1], cy_min))
left = AutoSubDomain(lambda x: near(x[0], cx_min))
right = AutoSubDomain(lambda x: near(x[0], cx_max))

T_hot = 360
T_cold = 300
T_ambient = 300

conductivity = 0.6
length = cy_max - cy_min
heat_flux = (T_hot - T_cold) / length * conductivity

bcs = {
    "hot": {
        "boundary": top,
        "boundary_id": 1,
        "values": {
            "temperature": {
                "variable": "temperature",
                "type": "Dirichlet",
                "value": Constant(T_hot),
            }
        },
    },
    "left": {
        "boundary": left,
        "boundary_id": 3,
        "values": {
            "temperature": {
                "variable": "temperature",
                "type": "heatFlux",
                "value": Constant(0),
            }
        },
    },
    "right": {
        "boundary": right,
        "boundary_id": 4,
        "values": {
            "temperature": {
                "variable": "temperature",
                "type": "symmetry",
                "value": None,
            }
        },
    },
}

settings = {
    "solver_name": "ScalarEquationSolver",
    "mesh": None,
    "function_space": Q,
    "periodic_boundary": None,
    "fe_degree": 1,
    "boundary_conditions": bcs,
    "body_source": None,
    "initial_values": {"temperature": T_ambient},
    "material": {
        "density": 1000,
        "specific_heat_capacity": 4200,
        "thermal_conductivity": 0.1,
    },
    "solver_settings": {
        "transient_settings": {
            "transient": False,
            "starting_time": 0,
            "time_step": 0.1,
            "ending_time": 1,
        },
        "reference_values": {"temperature": T_ambient},
        "solver_parameters": {
            "relative_tolerance": 1e-11,
            "maximum_iterations": 500,
            "monitor_convergence": False,
        },
    },
    "report_settings": {
        "plotting_freq": 0,
        "saving_freq": 0,
        "plotting_interactive": False,
        "logging_level": 40,
    },
    "scalar_name": "temperature",
}

K_anisotropic = Expression(
    (("exp(x[0])", "sin(x[1])"), ("sin(x[0])", "tan(x[1])")), degree=0
)


def setup(using_anisotropic_conductivity, using_convective_velocity, using_HTC):
    K = K_anisotropic if using_anisotropic_conductivity else conductivity
    if not using_HTC:
        bcs["cold"] = {
            "boundary": bottom,
            "boundary_id": 2,
            "values": {
                "temperature": {
                    "variable": "temperature",
                    "type": "heatFlux",
                    "value": Constant(heat_flux),
                }
            },
        }
    else:
        htc = 100
        bcs["hot"] = {
            "boundary": top,
            "boundary_id": 1,
            "values": {
                "temperature": {
                    "variable": "temperature",
                    "type": "heatFlux",
                    "value": Constant(heat_flux),
                }
            },
        }
        bcs["cold"] = {
            "boundary": bottom,
            "boundary_id": 2,
            "values": {
                "temperature": {
                    "variable": "temperature",
                    "type": "HTC",
                    "value": Constant(htc),
                    "ambient": Constant(T_ambient),
                }
            },
        }
    if using_convective_velocity:
        settings["convective_velocity"] = Constant((0.005, -0.005))
    else:
        settings["convective_velocity"] = None

    solver = ScalarTransportSolver(settings)
    solver.material["conductivity"] = K
    T = solver.solve()
    post_process(T)
    if interactively:
        solver.plot()
    return T


def post_process(T):
    normal = FacetNormal(mesh)
    boundary_facets = MeshFunction("size_t", mesh, mesh.topology().dim() - 1)
    boundary_facets.set_all(0)
    id = 1
    bottom.mark(boundary_facets, id)
    ds = Measure("ds", subdomain_data=boundary_facets)
    flux = assemble(conductivity * dot(grad(T), normal) * ds(id))
    print("heat flux rate integral on the surface (W/m^2):", flux)
    if interactively:
        plot(T, title="Temperature")


def test_radiation():
    bcs["cold"] = {
        "boundary": bottom,
        "boundary_id": 2,
        "values": {
            "temperature": {
                "variable": "temperature",
                "type": "Dirichlet",
                "value": Constant(T_cold),
            }
        },
    }
    settings["radiation_settings"] = {
        "ambient_temperature": T_ambient - 20,
        "emissivity": 0.9,
    }
    settings["convective_velocity"] = None
    solver = ScalarTransportSolver(settings)
    solver.material["conductivity"] = conductivity
    solver.material["emissivity"] = 0.9
    T = solver.solve()
    assert np.isfinite(T.values).all()
    post_process(T)
    if interactively:
        solver.plot()


def test():
    T = setup(
        using_anisotropic_conductivity=False,
        using_convective_velocity=True,
        using_HTC=True,
    )
    assert np.isfinite(T.values).all()


if __name__ == "__main__":
    test()
    test_radiation()
    print("test_heat_transfer: OK")
