"""Differentiable implicit solves (adjoint method).

Beyond-parity capability: the reference delegates every solve to PETSc
and cannot differentiate through one at all (the closest it gets is
hand-written parameter sweeps in the examples).  Here the whole solver
stack is jax, so the solution map

    theta (per-cell/per-qp aux arrays), u_bc  ->  u*(theta, u_bc)

with R_c(u*, theta, u_bc) = 0 is exposed as a ``jax.custom_vjp`` whose
backward pass is the textbook ADJOINT method — one extra linear solve
with the TRANSPOSED Jacobian per gradient, independent of the number of
parameters.  That makes ``jax.grad`` of any scalar functional of the
solution (compliance, mismatch, flux) exact to solver tolerance and
cheap: PDE-constrained optimization, inverse conductivity problems and
sensitivity analysis come for free.

Construction (implicit function theorem).  The constrained residual is

    R_c(u, theta, u_bc) = free * R(u, theta) + (1 - free) * (u - u_bc)

with ``free`` the Dirichlet mask (``ops/assembly.DirichletData``,
replacing dolfin's DirichletBC row elimination, reference
``SolverBase.py:598-602``).  Differentiating R_c(u*) = 0:

    A du* = -(dR_c/dtheta) dtheta - (dR_c/du_bc) du_bc,
    A = D_f J + D_c          (J = dR/du, D_f = diag(free), D_c = I - D_f)

so the VJP of u* against a cotangent ``ubar`` needs lambda = A^{-T} ubar.
A^T = J^T D_f + D_c is block-triangular in the free/constrained
splitting: solve J_ff^T lambda_f = ubar_f on the free dofs, then
lambda_c = ubar_c - (J^T lambda_f)_c explicitly.  All transposed
products are MATRIX-FREE via ``jax.vjp`` of the residual assembly — no
transposed CSR is ever built.  Finally

    theta_bar = -(dR/dtheta)^T (free * lambda)     (vjp of assembly in theta)
    ubc_bar   = (1 - free) * lambda

Parameters enter through the form's per-term ``aux`` arrays using the
same ``aux_update`` override mechanism the jitted transient loops use
(``ops/assembly.assemble_residual``): ``theta`` is a dict whose keys
match existing aux keys.  Anything a kernel reads from aux —
conductivity fields, source strengths, material tables — is
differentiable.

Tracing contract: with ``linear=True`` (affine forms) both passes are
pure lax loops, so the returned function may sit under ``jax.jit`` /
``jax.grad`` compositions freely.  With ``linear=False`` the forward
pass runs the host-driven Newton loop (concrete convergence checks) and
therefore supports EAGER ``jax.grad`` / ``jax.vjp`` (primals stay
concrete) but not an enclosing ``jax.jit``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..la import krylov
from . import assembly


def _free_mask(dirichlet, ndof, dtype):
    if dirichlet is not None and dirichlet.any:
        return jnp.asarray(dirichlet.free_mask, dtype=dtype)
    return jnp.ones(ndof, dtype=dtype)


def make_implicit_solver(
    form,
    dirichlet,
    *,
    linear=False,
    spd=False,
    tol=1e-12,
    maxiter=5000,
    newton_rtol=1e-11,
    newton_maxiter=30,
    method="krylov",
    logger=None,
):
    """Build ``solve(theta, u_bc=None) -> u`` differentiable in both args.

    Parameters
    ----------
    form : finalized ``ops.assembly.Form`` (the pattern is only used for
        Jacobi diagonals; all solves are matrix-free).
    dirichlet : ``DirichletData`` or None.
    linear : the form is affine in u (one Krylov solve, fully traceable).
    spd : the free-dof Jacobian block is symmetric positive definite
        (CG; otherwise BiCGStab with a GMRES fallback).
    method : "krylov" (matrix-free, default) or "dense" — densify the
        assembled Jacobian and use ``jnp.linalg.solve`` (both passes,
        transpose solve in the backward).  The dense path is for SMALL
        INDEFINITE systems the Jacobi-Krylov combination cannot handle —
        saddle points like the mixed Navier-Stokes form (zero pressure
        diagonal) — and is still traceable (the densify is a static
        scatter of CSR data).
    theta : dict of aux-override arrays (keys must exist in the term aux
        they target); u_bc : full-length vector of Dirichlet values
        (defaults to ``dirichlet.u_bc``, non-differentiable then).
    """
    ndof = form.space.ndof

    def _dense_constrained(theta, u, free):
        """A = D_f J + D_c as a dense array (traceable scatter)."""
        J = assembly.assemble_jacobian(form, u, aux_update=theta)
        pat = J.pattern
        rows = np.repeat(
            np.arange(ndof), np.diff(np.asarray(pat.indptr))
        )
        Ad = (
            jnp.zeros((ndof, ndof), dtype=J.data.dtype)
            .at[rows, np.asarray(pat.indices)]
            .add(J.data)
        )
        return free[:, None] * Ad + jnp.diag(1.0 - free)

    def _solve_free(op, rhs, diag, x0=None):
        """Krylov solve of the symmetrically-masked free-dof system."""
        M = krylov.jacobi_preconditioner(diag)
        if spd:
            return krylov.cg(op, rhs, x0=x0, M=M, tol=tol, maxiter=maxiter)
        x, it, res = krylov.bicgstab(
            op, rhs, x0=x0, M=M, tol=tol, maxiter=maxiter
        )
        # traceable fallback: re-solve with GMRES iff BiCGStab stalled
        # (lax.cond keeps the linear path jittable)
        bad = (res > 10 * tol) | ~jnp.isfinite(res)

        def _gmres(_):
            y, _, r2 = krylov.gmres(
                op, rhs, x0=x0, M=M, tol=tol, restart=80,
                maxiter=max(maxiter // 10, 1),
            )
            return y, r2

        x, res = jax.lax.cond(bad, _gmres, lambda _: (x, res), None)
        return x, it, res

    def _diag(theta, u):
        J = assembly.assemble_jacobian(form, u, aux_update=theta)
        return J.diagonal()

    def _forward(theta, u_bc):
        free = _free_mask(dirichlet, ndof, u_bc.dtype)
        u0 = (1.0 - free) * u_bc

        def res_at(u):
            return assembly.assemble_residual(form, u, aux_update=theta)

        def lin_solve(u_at, rhs):
            if method == "dense":
                A = _dense_constrained(theta, u_at, free)
                return jnp.linalg.solve(A, rhs)

            def op(x):
                _, jx = jax.jvp(res_at, (u_at,), (free * x,))
                return free * jx + (1.0 - free) * x

            diag = free * _diag(theta, u_at) + (1.0 - free)
            x, _, _ = _solve_free(op, rhs, diag)
            return x

        if linear:
            # affine form: J x = jvp of the residual (matrix-free, exact)
            du = lin_solve(u0, -free * res_at(u0))
            return u0 + free * du

        # Newton: host loop (eager), each step one masked linear solve
        u = u0
        r = free * res_at(u)
        norm0 = float(jnp.linalg.norm(r))
        if norm0 == 0.0:
            return u
        for it in range(newton_maxiter):
            du = lin_solve(u, -r)
            u = u + free * du
            r = free * res_at(u)
            norm = float(jnp.linalg.norm(r))
            if logger:
                logger.info(
                    "adjoint-forward Newton %d: residual %.3e", it + 1, norm
                )
            if not jnp.isfinite(norm):
                raise krylov_diverged(it, norm)
            if norm < newton_rtol * norm0 + 1e-14:
                return u
        raise RuntimeError(
            f"implicit solve: Newton failed ({newton_maxiter} iters, "
            f"residual {norm:.3e})"
        )

    @jax.custom_vjp
    def solve(theta, u_bc):
        return _forward(theta, u_bc)

    def fwd(theta, u_bc):
        u = _forward(theta, u_bc)
        return u, (theta, u_bc, u)

    def bwd(saved, ubar):
        theta, u_bc, u = saved
        free = _free_mask(dirichlet, ndof, u_bc.dtype)

        def res_u(v):
            return assembly.assemble_residual(form, v, aux_update=theta)

        _, vjp_u = jax.vjp(res_u, u)

        if method == "dense":
            # A^T lambda = ubar directly (A = D_f J + D_c, dense)
            A = _dense_constrained(theta, u, free)
            lam = jnp.linalg.solve(A.T, ubar)
            lam_f = free * lam
        else:
            # adjoint solve on the free block: J_ff^T lambda_f = ubar_f.
            # J^T products are matrix-free (vjp of the assembly).
            def opT(y):
                return free * vjp_u(free * y)[0] + (1.0 - free) * y

            diag = free * _diag(theta, u) + (1.0 - free)
            lam_f, _, _ = _solve_free(opT, free * ubar, diag)
            lam_f = free * lam_f
            # constrained rows of A^T are triangular: lambda_c explicit
            jt_lam = vjp_u(lam_f)[0]
            lam = lam_f + (1.0 - free) * (ubar - jt_lam)

        # theta_bar = -(dR/dtheta)^T (free * lambda)
        def res_theta(th):
            return assembly.assemble_residual(form, u, aux_update=th)

        _, vjp_th = jax.vjp(res_theta, theta)
        theta_bar = jax.tree_util.tree_map(
            lambda g: -g, vjp_th(lam_f)[0]
        )
        ubc_bar = (1.0 - free) * lam
        return theta_bar, ubc_bar

    solve.defvjp(fwd, bwd)

    def entry(theta, u_bc=None):
        if u_bc is None:
            if dirichlet is not None and dirichlet.any:
                u_bc = jnp.asarray(dirichlet.u_bc)
            else:
                u_bc = jnp.zeros(ndof)
        return solve(theta, jnp.asarray(u_bc))

    return entry


def krylov_diverged(it, norm):
    return RuntimeError(
        f"implicit solve: residual non-finite at Newton iter {it} ({norm})"
    )
