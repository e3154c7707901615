"""Pallas TPU kernels for the hot compute paths.

``batched_element_matvec``: the matrix-free operator application
``y_e = A_e @ x_e`` over the whole element batch — the inner op of every
Krylov iteration in the partial-assembly design (``parallel.sharding``,
``bench.py``).  Data is laid out struct-of-arrays (small element axes
leading, the huge cell axis last, see MEMORY: tpu-fem-performance-rules) and
the kernel streams cell tiles through VMEM; the k x k contraction unrolls
onto the VPU as fused multiply-adds over (k, TILE) vectors.

TPU Mosaic cannot lower arbitrary cross-lane gathers (vector indexing of a
VMEM ref raises "Cannot do int indexing"), so the gather/scatter halves of
the element loop stay in XLA; this kernel covers the arithmetic core.
Falls back to the XLA einsum on non-TPU backends.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def batched_element_matvec(Ae_T, xe_T, tile=8192, interpret=None):
    """y_e = A_e @ x_e in SoA layout.

    Ae_T: (k, k, nc), xe_T: (k, nc) -> (k, nc).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k, _, nc = Ae_T.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nc_pad = _round_up(nc, tile)
    if nc_pad != nc:
        Ae_T = jnp.pad(Ae_T, ((0, 0), (0, 0), (0, nc_pad - nc)))
        xe_T = jnp.pad(xe_T, ((0, 0), (0, nc_pad - nc)))

    def kernel(a_ref, x_ref, y_ref):
        # unrolled k x k FMA over (k, TILE) lanes — pure VPU work
        for i in range(k):
            acc = a_ref[i, 0, :] * x_ref[0, :]
            for j in range(1, k):
                acc = acc + a_ref[i, j, :] * x_ref[j, :]
            y_ref[i, :] = acc

    grid = (nc_pad // tile,)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, k, tile), lambda c: (0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile), lambda c: (0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, tile), lambda c: (0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, nc_pad), xe_T.dtype),
        interpret=interpret,
    )(Ae_T, xe_T)
    return y[:, :nc]


def element_matvec_reference(Ae_T, xe_T):
    """XLA reference implementation (same SoA layout)."""
    return jnp.einsum("ijc,jc->ic", Ae_T, xe_T)


def p1_stiffness_kernel(JinvT, detJ, gref, tile=8192, interpret=None):
    """Closed-form P1 stiffness batch: (tdim, gdim, nc), (nc,) -> (k, k, nc).

    Fuses the reference-gradient push-forward and the k x k outer-product
    accumulation in VMEM (the FFC-generated element-kernel analog)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tdim, gdim, nc = JinvT.shape
    k = gref.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nc_pad = _round_up(nc, tile)
    if nc_pad != nc:
        JinvT = jnp.pad(JinvT, ((0, 0), (0, 0), (0, nc_pad - nc)))
        detJ = jnp.pad(detJ, (0, nc_pad - nc))
    gref_np = np.asarray(gref)
    vol_fact = {1: 1.0, 2: 2.0, 3: 6.0}[tdim]

    def kernel(jinv_ref, det_ref, out_ref):
        # physical gradients g[a, d] = sum_t gref[a, t] * Jinv[t, d]
        g = [
            [
                sum(
                    float(gref_np[a, t]) * jinv_ref[t, d, :]
                    for t in range(tdim)
                )
                for d in range(gdim)
            ]
            for a in range(k)
        ]
        scale = det_ref[:] * (1.0 / vol_fact)
        for a in range(k):
            for b in range(k):
                acc = g[a][0] * g[b][0]
                for d in range(1, gdim):
                    acc = acc + g[a][d] * g[b][d]
                out_ref[a, b, :] = acc * scale

    grid = (nc_pad // tile,)
    Ae = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tdim, gdim, tile), lambda c: (0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda c: (c,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, k, tile), lambda c: (0, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, k, nc_pad), JinvT.dtype),
        interpret=interpret,
    )(JinvT, detJ)
    return Ae[:, :, :nc]


#: row-major upper-triangle index of the symmetric P1 element matrix:
#: SYM10[a][b] gives the slot of Ae[a, b] in the (10, nc) packed output
SYM10 = tuple(
    tuple(
        {(0, 0): 0, (0, 1): 1, (0, 2): 2, (0, 3): 3, (1, 1): 4,
         (1, 2): 5, (1, 3): 6, (2, 2): 7, (2, 3): 8, (3, 3): 9}[
            (min(a, b), max(a, b))
        ]
        for b in range(4)
    )
    for a in range(4)
)


def p1_stiffness_sym_kernel(JinvT, detJ, tile=8192, interpret=None):
    """Symmetric-packed P1 (3D) stiffness: (3, 3, nc), (nc,) -> (10, nc).

    Exploits two P1 identities the generic kernel pays FLOPs for:
    the reference gradients of vertices 1..3 are the Cartesian basis, so
    the physical gradients ARE the rows of Jinv (the push-forward is
    free), and Ae is symmetric with zero row/column sums, so only the
    3x3 Gram matrix G = Jinv Jinv^T (6 products) plus row/total sums are
    computed — ~60% fewer FLOPs and 10/16 of the write traffic vs
    :func:`p1_stiffness_kernel`.  ``SYM10[a][b]`` maps a dense (a, b)
    index to the packed slot."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tdim, gdim, nc = JinvT.shape
    assert tdim == 3 and gdim == 3, "sym kernel is the 3D P1 fast path"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nc_pad = _round_up(nc, tile)
    if nc_pad != nc:
        JinvT = jnp.pad(JinvT, ((0, 0), (0, 0), (0, nc_pad - nc)))
        detJ = jnp.pad(detJ, (0, nc_pad - nc))

    def kernel(jinv_ref, det_ref, out_ref):
        s = det_ref[:] * (1.0 / 6.0)
        # Gram of the Jinv rows, scaled: g[i][j] = s * <Jinv_i, Jinv_j>
        r = [[jinv_ref[i, d, :] for d in range(3)] for i in range(3)]
        g = {}
        for i in range(3):
            for j in range(i, 3):
                g[(i, j)] = (
                    r[i][0] * r[j][0] + r[i][1] * r[j][1] + r[i][2] * r[j][2]
                ) * s
        # Ae[i+1, j+1] = g[i, j]; vertex-0 row/col from zero-sum identity
        rowsum = [
            g[(min(i, 0), max(i, 0))] + g[(min(i, 1), max(i, 1))]
            + g[(min(i, 2), max(i, 2))]
            for i in range(3)
        ]
        out_ref[0, :] = rowsum[0] + rowsum[1] + rowsum[2]  # (0,0)
        out_ref[1, :] = -rowsum[0]  # (0,1)
        out_ref[2, :] = -rowsum[1]  # (0,2)
        out_ref[3, :] = -rowsum[2]  # (0,3)
        out_ref[4, :] = g[(0, 0)]  # (1,1)
        out_ref[5, :] = g[(0, 1)]  # (1,2)
        out_ref[6, :] = g[(0, 2)]  # (1,3)
        out_ref[7, :] = g[(1, 1)]  # (2,2)
        out_ref[8, :] = g[(1, 2)]  # (2,3)
        out_ref[9, :] = g[(2, 2)]  # (3,3)

    grid = (nc_pad // tile,)
    Ae = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, 3, tile), lambda c: (0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda c: (c,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((10, tile), lambda c: (0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((10, nc_pad), JinvT.dtype),
        interpret=interpret,
    )(JinvT, detJ)
    return Ae[:, :nc]
