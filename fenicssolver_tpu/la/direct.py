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


def sparse_lu_solve(A, b):
    """Host sparse LU (SuperLU) — the MUMPS-parity path.

    The reference solves its mixed NS and large-deformation systems with
    the MUMPS sparse direct solver (``CoupledNavierStokesSolver.py:154``,
    ``LargeDeformationSolver.py:151``); scipy's SuperLU is the equivalent
    here for indefinite saddle-point systems beyond the dense limit, where
    the iterative fieldsplit path's outer iterations still grow with mesh
    (see docs/ROADMAP.md).  A: CSRMatrix or scipy sparse."""
    import numpy as np
    import scipy.sparse.linalg as spl

    As = A.to_scipy() if hasattr(A, "to_scipy") else A
    lu = spl.splu(As.tocsc())
    return jnp.asarray(lu.solve(np.asarray(b)))
