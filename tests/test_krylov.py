"""Krylov solver unit tests against dense references."""

import jax.numpy as jnp
import numpy as np
import pytest

from fenicssolver_tpu.la import krylov


def spd_system(n=80, seed=0):
    rng = np.random.RandomState(seed)
    Q = np.linalg.qr(rng.randn(n, n))[0]
    d = np.linspace(1, 100, n)
    A = (Q * d) @ Q.T
    b = rng.randn(n)
    return jnp.asarray(A), jnp.asarray(b), np.linalg.solve(A, b)


def nonsym_system(n=80, seed=1):
    rng = np.random.RandomState(seed)
    A = np.eye(n) * 10 + rng.randn(n, n)
    b = rng.randn(n)
    return jnp.asarray(A), jnp.asarray(b), np.linalg.solve(A, b)


def test_cg_spd():
    A, b, x_ref = spd_system()
    x, it, res = krylov.cg(lambda v: A @ v, b, tol=1e-12, maxiter=500)
    assert np.allclose(np.asarray(x), x_ref, atol=1e-8)
    assert float(res) < 1e-11


def test_cg_jacobi_preconditioned():
    A, b, x_ref = spd_system()
    M = krylov.jacobi_preconditioner(jnp.diag(A))
    x, it, res = krylov.cg(lambda v: A @ v, b, M=M, tol=1e-12, maxiter=500)
    assert np.allclose(np.asarray(x), x_ref, atol=1e-8)


def test_bicgstab_nonsymmetric():
    A, b, x_ref = nonsym_system()
    x, it, res = krylov.bicgstab(lambda v: A @ v, b, tol=1e-12, maxiter=1000)
    assert np.allclose(np.asarray(x), x_ref, atol=1e-6)


def test_gmres_nonsymmetric():
    A, b, x_ref = nonsym_system()
    x, it, res = krylov.gmres(
        lambda v: A @ v, b, tol=1e-12, restart=40, maxiter=50
    )
    assert np.allclose(np.asarray(x), x_ref, atol=1e-6), float(res)


def test_gmres_restarted_converges():
    A, b, x_ref = spd_system(n=120, seed=3)
    x, it, res = krylov.gmres(
        lambda v: A @ v, b, tol=1e-10, restart=20, maxiter=100
    )
    assert np.allclose(np.asarray(x), x_ref, atol=1e-6)


def test_chebyshev_preconditioner_accelerates():
    A, b, x_ref = spd_system(n=150, seed=4)
    op = lambda v: A @ v
    diag = jnp.diag(A)
    _, it_plain, _ = krylov.cg(op, b, tol=1e-10, maxiter=2000)
    M = krylov.chebyshev_preconditioner(op, diag, degree=5)
    x, it_cheb, _ = krylov.cg(op, b, M=M, tol=1e-10, maxiter=2000)
    assert int(it_cheb) < int(it_plain)
    assert np.allclose(np.asarray(x), x_ref, atol=1e-7)


def test_newton_on_scalar_system():
    """Newton solves a small nonlinear algebraic system via autodiff."""
    import jax

    from fenicssolver_tpu.la.newton import newton_solve

    def residual(u):
        return u**3 + u - jnp.arange(1.0, 6.0)

    def jacobian(u):
        return jax.jacfwd(residual)(u)

    x, it, conv = newton_solve(
        residual, jacobian, lambda J, r: jnp.linalg.solve(J, r),
        jnp.ones(5), rtol=1e-14, atol=1e-14,
    )
    assert conv
    assert np.allclose(np.asarray(residual(x)), 0.0, atol=1e-12)
