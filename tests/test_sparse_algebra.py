"""Sort-based sparse algebra for the AMG build (la/sparse_algebra.py):
every kernel checked against scipy on random unstructured matrices, and a
guard that the AMG hierarchy builds with scipy IMPORTS DISABLED (VERDICT
r2 item 7: no scipy on the build path)."""

import builtins

import numpy as np
import pytest
import scipy.sparse as sp

from fenicssolver_tpu.la.sparse_algebra import (
    HostCSR,
    coo_to_csr,
    from_scipy,
    l1_row_sums,
    rap,
    sp_add,
    sp_diag_scale,
    sp_matmat,
    sp_submatrix,
    sp_transpose,
)


def _rand(m, n, density, seed):
    return sp.random(m, n, density=density, random_state=seed).tocsr()


def _eq(H: HostCSR, S, tol=1e-13):
    S = S.tocsr()
    S.sum_duplicates()
    S.eliminate_zeros()
    D = np.abs(H.toarray() - S.toarray()).max()
    assert D < tol, D


def test_matmat_vs_scipy():
    A = _rand(40, 60, 0.1, 0)
    B = _rand(60, 30, 0.15, 1)
    _eq(sp_matmat(from_scipy(A), from_scipy(B)), A @ B)


def test_transpose_add_scale_vs_scipy():
    A = _rand(50, 50, 0.1, 2)
    B = _rand(50, 50, 0.12, 3)
    _eq(sp_transpose(from_scipy(A)), A.T)
    _eq(sp_add(from_scipy(A), from_scipy(B), 2.0, -0.5), 2.0 * A - 0.5 * B)
    dl = np.arange(1.0, 51.0)
    dr = np.linspace(0.5, 2.0, 50)
    _eq(
        sp_diag_scale(from_scipy(A), dl, dr),
        sp.diags(dl) @ A @ sp.diags(dr),
    )


def test_rap_and_submatrix_vs_scipy():
    A = _rand(80, 80, 0.08, 4)
    A = (A + A.T + 10 * sp.eye(80)).tocsr()
    P = _rand(80, 20, 0.1, 5)
    _eq(rap(from_scipy(A), from_scipy(P)), P.T @ A @ P, tol=1e-12)
    mask = np.zeros(80, bool)
    mask[::3] = True
    _eq(sp_submatrix(from_scipy(A), mask), A[mask][:, mask])
    assert np.allclose(
        l1_row_sums(from_scipy(A)),
        np.asarray(np.abs(A).sum(axis=1)).ravel(),
    )


def test_matvec_and_diagonal():
    A = _rand(70, 70, 0.1, 6) + sp.eye(70)
    H = from_scipy(A.tocsr())
    x = np.random.default_rng(7).random(70)
    assert np.allclose(H.matvec(x), A @ x)
    assert np.allclose(H.diagonal(), A.tocsr().diagonal())


def test_matvec_trailing_empty_rows():
    """reduceat regression (ADVICE r4): a trailing run of empty rows must
    not truncate the LAST nonempty row's segment sum."""
    A = sp.csr_matrix(
        np.array([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    )
    H = from_scipy(A)
    assert np.allclose(H.matvec(np.ones(3)), [6.0, 0.0, 0.0])
    # empty leading + interior rows for good measure
    B = sp.csr_matrix(
        np.array([[0.0, 0.0], [5.0, 7.0], [0.0, 0.0], [2.0, 0.0], [0.0, 0.0]])
    )
    Hb = from_scipy(B)
    x = np.array([1.0, 2.0])
    assert np.allclose(Hb.matvec(x), B @ x)


def test_amg_builds_without_scipy(monkeypatch):
    """The whole AMG hierarchy must build with scipy imports DISABLED
    once the input matrix is in HostCSR form."""
    from fenicssolver_tpu.core import FunctionSpace, UnitSquareMesh
    from fenicssolver_tpu.la.amg import AMGPreconditioner
    from fenicssolver_tpu.ops import assembly, geometry
    import jax.numpy as jnp

    mesh = UnitSquareMesh(40, 40)  # big enough for >= 2 levels
    # perturb interior nodes so the mesh is genuinely unstructured
    rng = np.random.default_rng(0)
    interior = ~(
        (mesh.coords[:, 0] % 1.0 == 0) | (mesh.coords[:, 1] % 1.0 == 0)
    )
    mesh.coords[interior] += 0.2 / 40 * (rng.random((interior.sum(), 2)) - 0.5)
    V = FunctionSpace(mesh, "CG", 1)
    tab = geometry.basis_tables(mesh.tdim, 1, 2)
    dphi = jnp.asarray(tab.dphi)
    qw = jnp.asarray(tab.qw)

    def kern(ue, geom, aux):
        dphig = geometry.phys_grads(dphi, geom.Jinv)
        g = geometry.interp_grad(dphig, ue)
        return jnp.einsum("q,qg,qig->i", qw, g, dphig) * geom.detJ

    ctx = geometry.build_cell_context(V, 2)
    form = assembly.Form(space=V)
    form.cell_terms.append(assembly.CellTerm(kernel=kern, ctx=ctx))
    form.finalize()
    A = assembly.assemble_jacobian(form, jnp.zeros(V.ndof))
    H = from_scipy(A.to_scipy())
    free = np.ones(V.ndof, bool)
    free[V.facet_dofs(mesh.exterior_facets())] = False

    real_import = builtins.__import__

    def no_scipy(name, *a, **k):
        if name.startswith("scipy"):
            raise ImportError("scipy forbidden on the AMG build path")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_scipy)
    M = AMGPreconditioner(H, free_mask=free)
    monkeypatch.undo()
    assert len(M.levels) >= 1
    # and it still works as a preconditioner
    r = np.random.default_rng(1).random(V.ndof)
    z = np.asarray(M(jnp.asarray(r)))
    assert np.isfinite(z).all()


def test_permute_sym_and_relabel_cols_vs_scipy():
    rng = np.random.default_rng(3)
    A = sp.random(60, 60, density=0.1, random_state=4, format="csr")
    A = A + A.T
    perm = rng.permutation(60)
    from fenicssolver_tpu.la.sparse_algebra import (
        sp_permute_sym,
        sp_relabel_cols,
    )

    _eq(sp_permute_sym(from_scipy(A.tocsr()), perm), A[perm][:, perm])
    P = sp.random(60, 20, density=0.15, random_state=5, format="csr")
    pc = rng.permutation(20)
    _eq(sp_relabel_cols(from_scipy(P), pc), P[:, pc])


def test_amg_coarse_reordering_reduces_bell_and_stays_exact(monkeypatch):
    """Coarse-level pick-best relabel (bell tile-fill reduction): with the
    reordering DISABLED the hierarchy must cost at least as much bell tile
    memory, and with it ENABLED the preconditioned CG still reaches the
    exact solution on a Delaunay mesh (where aggregation scrambling is
    real)."""
    import jax.numpy as jnp
    import scipy.sparse.linalg as spl

    from fenicssolver_tpu.core.meshgen import rectangle_with_hole
    from fenicssolver_tpu.core.spaces import FunctionSpace
    from fenicssolver_tpu.la import sparse_algebra as sa
    from fenicssolver_tpu.la.amg import AMGPreconditioner
    from fenicssolver_tpu.la.block_ell import BlockELL
    from fenicssolver_tpu.la.krylov import cg
    from fenicssolver_tpu.ops import assembly, geometry

    mesh = rectangle_with_hole((0, 0), (2.0, 1.0), (0.7, 0.5), 0.2,
                               resolution=48)
    V = FunctionSpace(mesh, "CG", 1)
    tab = geometry.basis_tables(mesh.tdim, 1, 2)
    dphi, qw, phi = (jnp.asarray(tab.dphi), jnp.asarray(tab.qw),
                     jnp.asarray(tab.phi))

    def kern(ue, geom, aux):
        dphig = geometry.phys_grads(dphi, geom.Jinv)
        g = geometry.interp_grad(dphig, ue)
        return (jnp.einsum("q,qg,qig->i", qw, g, dphig)
                - jnp.einsum("q,qi->i", qw, phi)) * geom.detJ

    ctx = geometry.build_cell_context(V, 2)
    form = assembly.Form(space=V)
    form.cell_terms.append(assembly.CellTerm(kernel=kern, ctx=ctx))
    form.finalize()
    A, b = assembly.assemble_linear_system(form)
    free = np.ones(V.ndof)
    free[np.asarray(V.facet_dofs(mesh.exterior_facets()))] = 0.0
    As = A.to_scipy().tocsr()
    Af = (sp.diags(free) @ As @ sp.diags(free) + sp.diags(1 - free)).tocsr()

    def bell_tiles(M):
        return sum(
            int(l["A"].tiles.size)
            for l in M.levels
            if isinstance(l["A"], BlockELL)
        )

    M_on = AMGPreconditioner(Af, free_mask=free > 0.5)
    orig = sa.bandwidth_ordering
    monkeypatch.setattr(
        sa, "bandwidth_ordering", lambda ip, ix, n, **k: (None, 0)
    )
    M_off = AMGPreconditioner(Af, free_mask=free > 0.5)
    monkeypatch.setattr(sa, "bandwidth_ordering", orig)
    assert bell_tiles(M_on) <= bell_tiles(M_off), (
        bell_tiles(M_on), bell_tiles(M_off),
    )

    rhs = jnp.asarray(free * np.asarray(b))
    from fenicssolver_tpu.la.sparse import csr_from_scipy

    Afd = csr_from_scipy(Af)
    x, it, res = cg(Afd.matvec, rhs, M=M_on, tol=1e-10, maxiter=300)
    x_ref = spl.spsolve(Af.tocsc(), np.asarray(rhs))
    err = np.linalg.norm(np.asarray(x) - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-7, (err, int(it))
