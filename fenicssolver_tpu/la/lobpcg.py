"""LOBPCG for the smallest generalized eigenpairs of K x = lambda M x.

TPU-native replacement for the reference's SLEPc shift-invert Lanczos
(``LinearElasticitySolver.py:270-312``): the block iteration is pure
matvecs + small dense Rayleigh-Ritz problems, so it runs on device with
the same CSR/block-ELL operators as the solvers; the preconditioner is
typically the AMG V-cycle (``la/amg.py``).  Knyazev's locally optimal
block scheme with an [X | W | P] trial space and M-orthonormalization by
spectral filtering (robust to near-dependence).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _rayleigh_ritz(S, A_op, M_op):
    """Project onto span(S): returns (theta (m,), C (k, m)) ascending."""
    AS = A_op(S)
    MS = M_op(S)
    G_a = S.T @ AS
    G_m = S.T @ MS
    # symmetrize (roundoff)
    G_a = 0.5 * (G_a + G_a.T)
    G_m = 0.5 * (G_m + G_m.T)
    # M-orthonormalize the basis spectrally: G_m = U diag(s) U^T
    s, U = jnp.linalg.eigh(G_m)
    keep = s > jnp.maximum(s[-1], 1e-300) * 1e-12
    inv_sqrt = jnp.where(keep, 1.0 / jnp.sqrt(jnp.where(keep, s, 1.0)), 0.0)
    B = U * inv_sqrt[None, :]  # (k, k), rank-deficient columns zeroed
    H = B.T @ G_a @ B
    H = 0.5 * (H + H.T)
    # zeroed (rank-deficient) directions would otherwise appear as spurious
    # theta = 0 "smallest" eigenpairs; push them to the top of the spectrum
    big = 1e30 * jnp.maximum(jnp.max(jnp.abs(jnp.diag(H))), 1.0)
    H = H + jnp.diag(jnp.where(keep, 0.0, big))
    theta, Y = jnp.linalg.eigh(H)
    return theta, B @ Y


def lobpcg(A_op, M_op, X0, T=None, tol=1e-8, maxiter=200):
    """Smallest ``m = X0.shape[1]`` eigenpairs of A x = theta M x.

    ``A_op/M_op/T`` act on (n, k) blocks column-wise (plain jnp matvec
    broadcast); ``T`` approximates A^-1 (e.g. an AMG V-cycle).  Returns
    (theta (m,), X (n, m), res_norms (m,), iters).
    """
    n, m = X0.shape
    ident = (lambda R: R) if T is None else T

    def colwise(op):
        def apply(B):
            if B.ndim == 1:
                return op(B)
            cols = [op(B[:, j]) for j in range(B.shape[1])]
            return jnp.stack(cols, axis=1)

        return apply

    A = colwise(A_op)
    M = colwise(M_op)
    Tc = colwise(ident)

    X = jnp.asarray(X0)
    theta, C = _rayleigh_ritz(X, A, M)
    X = X @ C[:, :m]
    theta = theta[:m]
    P = None
    res = jnp.ones(m)
    it = 0
    for it in range(1, maxiter + 1):
        AX = A(X)
        MX = M(X)
        R = AX - MX * theta[None, :]
        rn = jnp.linalg.norm(R, axis=0)
        scale = jnp.linalg.norm(AX, axis=0) + jnp.abs(theta) * jnp.linalg.norm(
            MX, axis=0
        )
        res = rn / jnp.maximum(scale, 1e-300)
        if bool(jnp.all(res < tol)):
            break
        W = Tc(R)
        S = (
            jnp.concatenate([X, W], axis=1)
            if P is None
            else jnp.concatenate([X, W, P], axis=1)
        )
        theta_all, C = _rayleigh_ritz(S, A, M)
        theta = theta_all[:m]
        Cx = C[:, :m]
        X_new = S @ Cx
        # implicit P: the part of the new X not coming from the old X block
        Cp = Cx.at[:m].set(0.0) if hasattr(Cx, "at") else Cx
        P = S @ Cp
        X = X_new
    return theta, X, res, it
