"""Pallas kernels vs XLA references (interpret mode on the CPU backend)."""

import jax.numpy as jnp
import numpy as np

from fenicssolver_tpu.ops import pallas_kernels as pk


def test_batched_element_matvec():
    rng = np.random.RandomState(0)
    k, nc = 4, 1000
    Ae = jnp.asarray(rng.rand(k, k, nc))
    xe = jnp.asarray(rng.rand(k, nc))
    y = pk.batched_element_matvec(Ae, xe, tile=256, interpret=True)
    ref = pk.element_matvec_reference(Ae, xe)
    assert np.allclose(np.asarray(y), np.asarray(ref), atol=1e-12)


def test_p1_stiffness_kernel():
    rng = np.random.RandomState(1)
    nc = 500
    # random well-conditioned Jacobians
    J = rng.rand(nc, 3, 3) + 2 * np.eye(3)
    Jinv = np.linalg.inv(J)
    detJ = np.abs(np.linalg.det(J))
    gref = np.array([[-1.0, -1, -1], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    JinvT = jnp.asarray(np.moveaxis(Jinv, 0, -1).copy())
    Ae = pk.p1_stiffness_kernel(
        JinvT, jnp.asarray(detJ), gref, tile=128, interpret=True
    )
    g = np.einsum("kt,ctg->ckg", gref, Jinv)
    ref = np.einsum("cig,cjg,c->ijc", g, g, detJ / 6.0)
    assert np.allclose(np.asarray(Ae), ref, atol=1e-12)
