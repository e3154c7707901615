"""Periodic boundary constraint (reference parity: ``constrained_domain``
argument of ``generate_function_space``, ``SolverBase.py:260-275``)."""

import numpy as np

from fenicssolver_tpu.core import (
    AutoSubDomain,
    Constant,
    Expression,
    FunctionSpace,
    SubDomain,
    UnitSquareMesh,
    near,
)
from fenicssolver_tpu.solvers.scalar_transport import ScalarTransportSolver

from .test_heat_transfer import base_settings


class PeriodicX(SubDomain):
    """x = 0 is the master boundary; x = 1 maps onto it (dolfin style)."""

    def inside(self, x, on_boundary):
        return near(x[0], 0.0)

    def map(self, x, y):
        y[0] = x[0] - 1.0
        y[1] = x[1]


def test_periodic_scalar_diffusion():
    mesh = UnitSquareMesh(12, 12)
    Q = FunctionSpace(mesh, "CG", 1, constrained_domain=PeriodicX())
    assert len(Q.periodic_slaves) == 13  # right-edge vertices incl. corners
    top = AutoSubDomain(lambda x: near(x[1], 1.0))
    bottom = AutoSubDomain(lambda x: near(x[1], 0.0))
    bcs = {
        "hot": {
            "boundary": top,
            "boundary_id": 1,
            "values": {
                "temperature": {
                    "variable": "temperature",
                    "type": "Dirichlet",
                    "value": Constant(360.0),
                }
            },
        },
        "cold": {
            "boundary": bottom,
            "boundary_id": 2,
            "values": {
                "temperature": {
                    "variable": "temperature",
                    "type": "Dirichlet",
                    "value": Constant(300.0),
                }
            },
        },
    }
    settings = base_settings(Q, bcs)
    # x-asymmetric source: without periodicity u(0,y) != u(1,y)
    settings["body_source"] = Expression("100*sin(2*pi*x[0] + 0.5)", degree=2)
    solver = ScalarTransportSolver(settings)
    T = solver.solve()
    assert np.isfinite(T.values).all()
    X = Q.dof_coords
    left = np.nonzero(near(X[:, 0], 0.0) & ~near(X[:, 1], 0.0)
                      & ~near(X[:, 1], 1.0))[0]
    right = np.nonzero(near(X[:, 0], 1.0) & ~near(X[:, 1], 0.0)
                       & ~near(X[:, 1], 1.0))[0]
    # match left/right by y coordinate
    left = left[np.argsort(X[left, 1])]
    right = right[np.argsort(X[right, 1])]
    assert np.allclose(T.values[left], T.values[right], atol=1e-10)
    # and the solution actually varies in x (nontrivial case)
    mid = np.abs(X[:, 1] - 0.5) < 1e-9
    assert np.ptp(T.values[mid]) > 0.01
