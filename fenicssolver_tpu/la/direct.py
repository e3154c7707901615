"""Dense direct solve for small systems.

The reference's default linear path is a PETSc LU (``SolverBase.py:603``
``LinearSolver()``); on TPU a dense LU via ``jnp.linalg.solve`` is the
equivalent for systems that fit (saddle-point NS test cases, small meshes).
Large SPD systems route to the Krylov stack instead (see
``solvers.solver_base.SolverBase.solve_linear_problem``).
"""

from __future__ import annotations

import jax.numpy as jnp

DENSE_LIMIT = 12000  # beyond this, densifying is wasteful: use Krylov


def dense_solve(A, b):
    """Solve with a dense factorization.  A: CSRMatrix or dense array."""
    if hasattr(A, "todense"):
        Ad = A.todense()
    else:
        Ad = jnp.asarray(A)
    return jnp.linalg.solve(Ad, b)
