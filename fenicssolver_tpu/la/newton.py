"""Newton driver with autodiff Jacobians.

Replaces dolfin's C++ ``NewtonSolver`` (reference:
``SolverBase.py:615-626``).  The residual and Jacobian callbacks are jitted
assembly closures; the element Jacobian comes from per-element ``jax.jacfwd``
of the residual kernel (the Gateaux ``derivative(F, u, T)`` analog,
``ScalarTransportSolver.py:357``).  Convergence criteria mirror dolfin's
Newton (relative + absolute residual norm).
"""

from __future__ import annotations

import numpy as np


class NewtonDivergedError(RuntimeError):
    pass


def newton_solve(
    residual_fn,
    jacobian_fn,
    linear_solve,
    u0,
    rtol=1e-9,
    atol=1e-10,
    maxiter=50,
    relax=1.0,
    logger=None,
    error_on_nonconvergence=True,
):
    """Solve R(u) = 0.  Returns (u, n_iter, converged).

    residual_fn(u) -> R ; jacobian_fn(u) -> operator accepted by
    ``linear_solve(J, -R) -> du``.
    """
    import jax.numpy as jnp

    u = jnp.asarray(u0)
    r = residual_fn(u)
    norm0 = float(jnp.linalg.norm(r))
    norm = norm0
    if logger:
        logger.info("Newton 0: residual %.6e", norm0)
    if norm0 < atol:
        return u, 0, True
    for it in range(1, maxiter + 1):
        J = jacobian_fn(u)
        du = linear_solve(J, -r)
        u = u + relax * du
        r = residual_fn(u)
        norm = float(jnp.linalg.norm(r))
        # increment criterion (dolfin Newton's convergence_criterion
        # "incremental" analog): stop at the linear-solver noise floor
        step = float(jnp.linalg.norm(du)) / max(float(jnp.linalg.norm(u)), 1e-300)
        if np.isfinite(norm) and step < 1e-12:
            if logger:
                logger.info("Newton %d: increment converged (step %.3e)", it, step)
            return u, it, True
        if logger:
            logger.info(
                "Newton %d: residual %.6e (rel %.3e)", it, norm, norm / max(norm0, 1e-300)
            )
        if not np.isfinite(norm):
            if error_on_nonconvergence:
                raise NewtonDivergedError(f"Newton diverged (NaN/Inf) at iter {it}")
            return u, it, False
        if norm < atol or norm < rtol * norm0:
            return u, it, True
    if error_on_nonconvergence:
        raise NewtonDivergedError(
            f"Newton failed to converge in {maxiter} iterations "
            f"(residual {norm:.3e}, rel {norm / max(norm0, 1e-300):.3e})"
        )
    return u, maxiter, False
