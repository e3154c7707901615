"""Block-ELL SpMV vs CSR reference."""

import jax.numpy as jnp
import numpy as np

from fenicssolver_tpu.core import FunctionSpace, UnitCubeMesh
from fenicssolver_tpu.la.block_ell import block_ell_from_csr
from fenicssolver_tpu.ops import assembly, geometry


def test_block_ell_matches_csr():
    mesh = UnitCubeMesh(6, 6, 6)
    V = FunctionSpace(mesh, "CG", 1)
    tab = geometry.basis_tables(3, 1, 2)
    phi, dphi, qw = (jnp.asarray(tab.phi), jnp.asarray(tab.dphi),
                     jnp.asarray(tab.qw))

    def kernel(ue, geom, aux):
        dphig = geometry.phys_grads(dphi, geom.Jinv)
        g = geometry.interp_grad(dphig, ue)
        return jnp.einsum("q,qg,qig->i", qw, g, dphig) * geom.detJ

    ctx = geometry.build_cell_context(V, 2)
    form = assembly.Form(space=V)
    form.cell_terms.append(assembly.CellTerm(kernel=kernel, ctx=ctx))
    form.finalize()
    A, _ = assembly.assemble_linear_system(form)
    B = block_ell_from_csr(A)
    rng = np.random.RandomState(0)
    for _ in range(3):
        x = jnp.asarray(rng.rand(V.ndof))
        y_csr = A.matvec(x)
        y_bell = B.matvec(x)
        assert np.allclose(np.asarray(y_bell), np.asarray(y_csr), atol=1e-12)


def test_block_ell_scipy_random():
    import scipy.sparse as sp

    rng = np.random.RandomState(1)
    n = 500
    A = sp.random(n, n, density=0.02, random_state=rng, format="csr")
    A = A + sp.eye(n)
    B = block_ell_from_csr(A)
    x = rng.rand(n)
    assert np.allclose(np.asarray(B.matvec(jnp.asarray(x))), A @ x, atol=1e-12)
