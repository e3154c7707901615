"""TPU-resident Krylov solvers in ``lax.while_loop``.

Replaces the PETSc KSP layer (SURVEY.md §2.2: LU/CG/GMRES/BiCGStab +
Jacobi/ILU/AMG preconditioners, reference dispatch at
``SolverBase.py:592-672``).  All solvers take the operator as a function so
they run matrix-free or on assembled CSR, and all reductions are single
``jnp.vdot`` calls — under ``shard_map`` they become psum-reduced collectives
(see ``parallel.sharding``).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _as_op(A):
    if callable(A):
        return A
    return lambda x: A @ x


def identity_preconditioner(x):
    return x


def jacobi_preconditioner(diag, eps=1e-300):
    inv = jnp.where(jnp.abs(diag) > eps, 1.0 / diag, 1.0)

    def M(x):
        return inv * x

    return M


def block_jacobi_preconditioner(diag_blocks_inv, block):
    """Inverse of bsize x bsize diagonal blocks, applied blockwise."""

    def M(x):
        xb = x.reshape(-1, block)
        return jnp.einsum("nij,nj->ni", diag_blocks_inv, xb).reshape(-1)

    return M


def chebyshev_preconditioner(op, diag, degree=4, lmin_ratio=0.06, lmax=None):
    """Chebyshev-Jacobi smoothing as a fixed-cost preconditioner.

    Approximates the PETSc ``mg_levels_ksp_type chebyshev`` smoother the
    reference configures for elasticity AMG (``SolverBase.py:655-660``).
    ``lmax`` is estimated with a few power iterations on the Jacobi-scaled
    operator if not given.
    """
    inv_d = jnp.where(jnp.abs(diag) > 1e-300, 1.0 / diag, 1.0)

    def scaled_op(x):
        return inv_d * op(x)

    if lmax is None:
        x = jnp.sin(jnp.arange(diag.shape[0], dtype=diag.dtype))  # deterministic
        for _ in range(10):
            x = scaled_op(x)
            x = x / jnp.linalg.norm(x)
        lmax = jnp.vdot(x, scaled_op(x)) * 1.1
    lmin = lmax * lmin_ratio
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta

    def M(b):
        # Chebyshev iteration on D^{-1}A x = D^{-1}b, x0 = 0 (Saad recurrence)
        r = inv_d * b
        d = r / theta
        x = d
        rho = 1.0 / sigma
        for _ in range(degree - 1):
            r = r - scaled_op(d)
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = rho_new * rho * d + (2.0 * rho_new / delta) * r
            x = x + d
            rho = rho_new
        return x

    return M


def cg(A, b, x0=None, M=None, tol=1e-8, atol=0.0, maxiter=1000, psum=None):
    """Preconditioned conjugate gradients.  Returns (x, iters, relres)."""
    op = _as_op(A)
    M = M or identity_preconditioner
    x0 = jnp.zeros_like(b) if x0 is None else x0

    def dot(a, c):
        d = jnp.vdot(a, c)
        return psum(d) if psum else d

    r0 = b - op(x0)
    z0 = M(r0)
    bnorm = jnp.sqrt(dot(b, b))
    target = jnp.maximum(tol * bnorm, atol)

    def cond(state):
        x, r, z, p, rz, k = state
        return (jnp.sqrt(dot(r, r)) > target) & (k < maxiter)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = op(p)
        alpha = rz / dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = dot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    state0 = (x0, r0, z0, z0, dot(r0, z0), jnp.array(0, dtype=jnp.int32))
    x, r, *_, k = lax.while_loop(cond, body, state0)
    relres = jnp.sqrt(dot(r, r)) / jnp.maximum(bnorm, 1e-300)
    return x, k, relres


def bicgstab(A, b, x0=None, M=None, tol=1e-8, atol=0.0, maxiter=1000, psum=None):
    """Preconditioned BiCGStab (PETSc ``bicgstab`` parity)."""
    op = _as_op(A)
    M = M or identity_preconditioner
    x0 = jnp.zeros_like(b) if x0 is None else x0

    def dot(a, c):
        d = jnp.vdot(a, c)
        return psum(d) if psum else d

    r0 = b - op(x0)
    rhat = r0
    bnorm = jnp.sqrt(dot(b, b))
    target = jnp.maximum(tol * bnorm, atol)

    def cond(state):
        x, r, p, v, rho, alpha, omega, k = state
        return (jnp.sqrt(dot(r, r)) > target) & (k < maxiter)

    def body(state):
        x, r, p, v, rho, alpha, omega, k = state
        rho_new = dot(rhat, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        phat = M(p)
        v = op(phat)
        alpha = rho_new / dot(rhat, v)
        s = r - alpha * v
        shat = M(s)
        t = op(shat)
        omega = dot(t, s) / jnp.maximum(dot(t, t), 1e-300)
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        return (x, r, p, v, rho_new, alpha, omega, k + 1)

    one = jnp.asarray(1.0, dtype=b.dtype)
    state0 = (
        x0, r0, jnp.zeros_like(b), jnp.zeros_like(b), one, one, one,
        jnp.array(0, dtype=jnp.int32),
    )
    x, r, *_, k = lax.while_loop(cond, body, state0)
    relres = jnp.sqrt(dot(r, r)) / jnp.maximum(bnorm, 1e-300)
    return x, k, relres


def gmres(
    A, b, x0=None, M=None, tol=1e-8, atol=0.0, restart=50, maxiter=20, psum=None
):
    """Restarted GMRES(m) with left preconditioning and modified Gram-Schmidt.

    The Arnoldi basis lives in a fixed (restart+1, n) buffer inside a
    ``lax.fori_loop`` so the whole solve jits with static shapes.
    Returns (x, total_inner_iters, relres).
    """
    op = _as_op(A)
    M = M or identity_preconditioner
    x0 = jnp.zeros_like(b) if x0 is None else x0
    n = b.shape[0]
    m = min(restart, n)

    def dot(a, c):
        d = jnp.vdot(a, c)
        return psum(d) if psum else d

    def norm(a):
        return jnp.sqrt(dot(a, a))

    bnorm = norm(M(b))
    target = jnp.maximum(tol * bnorm, atol)

    def arnoldi_cycle(carry):
        x, _, it_tot = carry
        r = M(b - op(x))
        beta = norm(r)
        V = jnp.zeros((m + 1, n), dtype=b.dtype)
        V = V.at[0].set(r / jnp.maximum(beta, 1e-300))
        H = jnp.zeros((m + 1, m), dtype=b.dtype)
        # Givens-rotated least squares, built incrementally
        cs = jnp.zeros(m, dtype=b.dtype)
        sn = jnp.zeros(m, dtype=b.dtype)
        g = jnp.zeros(m + 1, dtype=b.dtype).at[0].set(beta)

        def inner_cond(state):
            j, carry = state
            _, _, _, _, g = carry
            return (j < m) & (jnp.abs(g[j]) > target)

        def inner_step(state):
            j, carry = state
            return j + 1, inner(j, carry)

        def inner(j, carry):
            V, H, cs, sn, g = carry
            w = M(op(V[j]))
            # modified Gram-Schmidt against all basis vectors (masked)
            def mgs(i, wh):
                w, H = wh
                hij = jnp.where(i <= j, dot(V[i], w), 0.0)
                w = w - hij * V[i]
                H = H.at[i, j].set(hij)
                return (w, H)

            w, H = lax.fori_loop(0, m + 1, lambda i, wh: mgs(i, wh), (w, H))
            hj1 = norm(w)
            H = H.at[j + 1, j].set(hj1)
            V = V.at[j + 1].set(w / jnp.maximum(hj1, 1e-300))

            # apply accumulated Givens rotations to column j
            def rot(i, Hc):
                h_i = Hc[i, j]
                h_i1 = Hc[i + 1, j]
                t1 = jnp.where(i < j, cs[i] * h_i + sn[i] * h_i1, h_i)
                t2 = jnp.where(i < j, -sn[i] * h_i + cs[i] * h_i1, h_i1)
                return Hc.at[i, j].set(t1).at[i + 1, j].set(t2)

            H = lax.fori_loop(0, m, rot, H)
            denom = jnp.sqrt(H[j, j] ** 2 + H[j + 1, j] ** 2)
            c = H[j, j] / jnp.maximum(denom, 1e-300)
            s = H[j + 1, j] / jnp.maximum(denom, 1e-300)
            cs = cs.at[j].set(c)
            sn = sn.at[j].set(s)
            H = H.at[j, j].set(denom).at[j + 1, j].set(0.0)
            g = g.at[j + 1].set(-s * g[j])
            g = g.at[j].set(c * g[j])
            return (V, H, cs, sn, g)

        j_end, (V, H, cs, sn, g) = lax.while_loop(
            inner_cond,
            inner_step,
            (jnp.array(0, jnp.int32), (V, H, cs, sn, g)),
        )
        # back substitution H[:m,:m] y = g[:m], restricted to taken steps
        Hm = H[:m, :m] + jnp.eye(m, dtype=b.dtype) * 1e-300

        def back(i_rev, y):
            i = m - 1 - i_rev
            s = g[i] - jnp.dot(Hm[i], y)
            return y.at[i].set(jnp.where(i < j_end, s / Hm[i, i], 0.0))

        y = lax.fori_loop(0, m, back, jnp.zeros(m, dtype=b.dtype))
        x_new = x + jnp.tensordot(y, V[:m], axes=(0, 0))
        return x_new, jnp.abs(g[j_end]), it_tot + j_end

    def cond(state):
        x, res, it = state
        return (res > target) & (it < maxiter * m)

    def body(state):
        return arnoldi_cycle(state)

    r0 = norm(M(b - op(x0)))
    x, res, iters = lax.while_loop(
        cond, body, (x0, r0, jnp.array(0, jnp.int32))
    )
    relres = res / jnp.maximum(bnorm, 1e-300)
    # iters counts Arnoldi steps actually taken (VERDICT r1 weak-8: the old
    # cycles*m figure overstated work in monitor logs)
    return x, iters, relres


def fgmres(
    A, b, x0=None, M=None, tol=1e-8, atol=0.0, restart=40, maxiter=30,
    psum=None,
):
    """Flexible GMRES (right preconditioning, per-vector M).

    Unlike :func:`gmres`, the preconditioner may be a *nonlinear* operator —
    e.g. an inner Krylov solve to a tolerance — because each preconditioned
    direction z_j = M(v_j) is stored and the solution is reconstructed from
    the Z basis (Saad '93).  This is the PETSc ``fgmres`` +
    fieldsplit-with-inner-ksp pattern the NS saddle-point solve uses.
    Returns (x, true_inner_iters, relres) — the iteration count reflects
    actual Arnoldi steps taken, not cycles*restart.
    """
    op = _as_op(A)
    M = M or identity_preconditioner
    x0 = jnp.zeros_like(b) if x0 is None else x0
    n = b.shape[0]
    m = min(restart, n)

    def dot(a, c):
        d = jnp.vdot(a, c)
        return psum(d) if psum else d

    def norm(a):
        return jnp.sqrt(dot(a, a))

    bnorm = norm(b)
    target = jnp.maximum(tol * bnorm, atol)

    def arnoldi_cycle(carry):
        x, _, it_tot = carry
        r = b - op(x)
        beta = norm(r)
        V = jnp.zeros((m + 1, n), dtype=b.dtype)
        Z = jnp.zeros((m, n), dtype=b.dtype)
        V = V.at[0].set(r / jnp.maximum(beta, 1e-300))
        H = jnp.zeros((m + 1, m), dtype=b.dtype)
        cs = jnp.zeros(m, dtype=b.dtype)
        sn = jnp.zeros(m, dtype=b.dtype)
        g = jnp.zeros(m + 1, dtype=b.dtype).at[0].set(beta)

        def inner_cond(state):
            j, carry = state
            _, _, _, _, _, g, _ = carry
            return (j < m) & (jnp.abs(g[j]) > target)

        def inner_step(state):
            j, carry = state
            return j + 1, inner(j, carry)

        def inner(j, carry):
            V, Z, H, cs, sn, g, nact = carry
            z = M(V[j])
            Z = Z.at[j].set(z)
            w = op(z)

            def mgs(i, wh):
                w, H = wh
                hij = jnp.where(i <= j, dot(V[i], w), 0.0)
                w = w - hij * V[i]
                H = H.at[i, j].set(hij)
                return (w, H)

            w, H = lax.fori_loop(0, m + 1, mgs, (w, H))
            hj1 = norm(w)
            H = H.at[j + 1, j].set(hj1)
            V = V.at[j + 1].set(w / jnp.maximum(hj1, 1e-300))

            def rot(i, Hc):
                h_i = Hc[i, j]
                h_i1 = Hc[i + 1, j]
                t1 = jnp.where(i < j, cs[i] * h_i + sn[i] * h_i1, h_i)
                t2 = jnp.where(i < j, -sn[i] * h_i + cs[i] * h_i1, h_i1)
                return Hc.at[i, j].set(t1).at[i + 1, j].set(t2)

            H = lax.fori_loop(0, m, rot, H)
            denom = jnp.sqrt(H[j, j] ** 2 + H[j + 1, j] ** 2)
            c = H[j, j] / jnp.maximum(denom, 1e-300)
            s = H[j + 1, j] / jnp.maximum(denom, 1e-300)
            cs = cs.at[j].set(c)
            sn = sn.at[j].set(s)
            H = H.at[j, j].set(denom).at[j + 1, j].set(0.0)
            g = g.at[j + 1].set(-s * g[j])
            g = g.at[j].set(c * g[j])
            return (V, Z, H, cs, sn, g, nact + 1)

        j_end, (V, Z, H, cs, sn, g, nact) = lax.while_loop(
            inner_cond,
            inner_step,
            (jnp.array(0, jnp.int32),
             (V, Z, H, cs, sn, g, jnp.array(0, jnp.int32))),
        )
        Hm = H[:m, :m] + jnp.eye(m, dtype=b.dtype) * 1e-300

        def back(i_rev, y):
            i = m - 1 - i_rev
            s = g[i] - jnp.dot(Hm[i], y)
            # only the j_end columns actually taken enter the LS solution
            return y.at[i].set(jnp.where(i < j_end, s / Hm[i, i], 0.0))

        y = lax.fori_loop(0, m, back, jnp.zeros(m, dtype=b.dtype))
        x_new = x + jnp.tensordot(y, Z, axes=(0, 0))
        return x_new, jnp.abs(g[j_end]), it_tot + nact

    def cond(state):
        x, res, it = state
        return (res > target) & (it < maxiter * m)

    def body(state):
        return arnoldi_cycle(state)

    r0 = norm(b - op(x0))
    x, res, iters = lax.while_loop(
        cond, body, (x0, r0, jnp.array(0, jnp.int32))
    )
    relres = res / jnp.maximum(bnorm, 1e-300)
    return x, iters, relres
