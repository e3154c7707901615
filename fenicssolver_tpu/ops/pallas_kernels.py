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


# ---------------------------------------------------------------------------
# Fused 15-tap Freudenthal stencil apply (flat layout)
# ---------------------------------------------------------------------------
#
# The XLA formulation of the lattice stencil operator (``la/gmg.py
# stencil_apply``: 14 ``jnp.pad``/slice temps) materializes every shifted
# operand in HBM AND pays the (8, 128) tile padding of the odd (N, N, N)
# lattice shapes (129 lanes -> 256): ~15 ms of the measured ~20 ms solve
# wall at 1.16M dofs is shift-temp traffic (docs/ROADMAP.md, round-3
# profile).  This kernel fuses all 15 taps into ONE pass over HBM in a
# FLAT layout with zero tile waste.
#
# Flat-shift exactness: with the lattice flattened C-order, the shifted
# read ``x[v + d]``, d = (di*Ny + dj)*Nz + dk, equals the zero-padded 3-D
# shift WHENEVER the operand is zero on the whole boundary shell: taps
# move at most one step per axis, so an interior output's reads stay
# in-bounds in 3-D, and reads that wrap a j/k edge only ever land ON the
# boundary shell (which holds zeros either way).  Callers must pre-mask
# (the GMG smoothers already apply ``free3 * x`` before every stencil,
# ``la/gmg.py:_a_free``) and mask the output on the shell.
#
# Layout: x is viewed as (rows, 128) with one leading and one trailing
# guard block of zeros.  Each grid step writes one (BLOCK, 128) output
# tile from the three input tiles (prev, cur, next); a shift by
# d = 128*s + r (python floor/mod) is two static sublane slices combined
# across the lane boundary — static slices only, no cross-lane gathers
# (which Mosaic cannot lower).

#: flat-kernel sublane block; 15 coef fields x (BLOCK, 128) f32 plus
#: double-buffering must fit VMEM (~16 MB): 512 -> ~9 MB resident
STENCIL_BLOCK = 512


def _roll_fn(interpret):
    """Lane rotate for the flat-shift kernels: Mosaic's ``tpu.rotate``
    (``pltpu.roll``) on hardware, plain ``jnp.roll`` (same semantics)
    under interpret mode where the Mosaic primitive has no rule."""
    if interpret:
        return jnp.roll
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.roll


def _flat_shift(full, block, d, rolls=None, roll=jnp.roll):
    """(BLOCK, 128) tile of ``x[v + d]`` from the 3-block window
    ``full`` = [prev; cur; next] (3*BLOCK, 128).

    The lane part of the shift is a ``pltpu.roll`` (tpu.rotate — the one
    cross-lane data movement Mosaic lowers) + a lane-iota select between
    the two adjacent row windows; a lane-dim ``concatenate`` of two
    unaligned slices does NOT lower (Mosaic layout error, measured on
    v5e).  ``rolls`` optionally caches the rolled ``full`` per lane
    offset ``r`` so taps sharing ``r`` pay one rotate."""
    s, r = divmod(int(d), 128)
    base = block + s
    if r == 0:
        return full[base:base + block, :]
    z = None if rolls is None else rolls.get(r)
    if z is None:
        # z[m, l] = full[m, (l + r) % 128] (shift as i32: tpu.dynamic_rotate
        # rejects the i64 weak type an x64 session would give the literal)
        z = roll(full, jnp.int32(128 - r), 1)
        if rolls is not None:
            rolls[r] = z
    lane = jax.lax.broadcasted_iota(jnp.int32, (block, 128), 1)
    return jnp.where(
        lane < jnp.int32(128 - r),
        z[base:base + block, :],
        z[base + 1:base + 1 + block, :],
    )


def _flat_deltas(shape3):
    from .structured import OFFSETS

    _, ny, nz = (int(v) for v in shape3)
    return tuple(
        int((di * ny + dj) * nz + dk) for di, dj, dk in OFFSETS
    )


def _flat_blocks(x_flat, block):
    """Pad flat x with one guard block each side -> ((nb+2)*BLOCK, 128)."""
    m = x_flat.shape[0]
    bl = block * 128
    nb = (m + bl - 1) // bl
    xp = jnp.concatenate(
        [
            jnp.zeros(bl, x_flat.dtype),
            x_flat,
            jnp.zeros(nb * bl - m + bl, x_flat.dtype),
        ]
    )
    return xp.reshape(-1, 128), nb


def stencil_flat_apply(x3, coef, block=STENCIL_BLOCK, interpret=None):
    """Variable-coefficient fused stencil: y[v] = sum_t coef[t, v] x[v+d_t].

    ``x3``: (Nx, Ny, Nz) operand, ZERO on the boundary shell (see module
    note); ``coef``: (15, Nx, Ny, Nz) per-vertex tap fields aligned with
    ``ops.structured.OFFSETS``.  Output boundary-shell values are garbage
    (callers mask, matching the XLA path's ``free *`` envelope)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape3 = x3.shape
    deltas = _flat_deltas(shape3)
    assert max(abs(d) for d in deltas) < block * 128, "block too small"
    m = int(np.prod(shape3))
    xp, nb = _flat_blocks(x3.reshape(-1), block)
    cpad = nb * block * 128 - m
    cf = jnp.pad(coef.reshape(15, -1), ((0, 0), (0, cpad))).reshape(
        15, -1, 128
    )

    roll = _roll_fn(interpret)

    def kernel(xprev, xcur, xnext, c_ref, y_ref):
        full = jnp.concatenate([xprev[...], xcur[...], xnext[...]], axis=0)
        rolls = {}
        acc = c_ref[0] * _flat_shift(full, block, deltas[0], rolls, roll)
        for t in range(1, 15):
            acc = acc + c_ref[t] * _flat_shift(
                full, block, deltas[t], rolls, roll
            )
        y_ref[...] = acc

    y = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 128), lambda i: (i + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 128), lambda i: (i + 2, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((15, block, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * block, 128), x3.dtype),
        interpret=interpret,
    )(xp, xp, xp, cf)
    return y.reshape(-1)[:m].reshape(shape3)


def stencil_flat_apply_const(x3, coefs, block=STENCIL_BLOCK,
                             interpret=None):
    """Constant-coefficient fused stencil (the GMG level operators,
    ``la/gmg.py``): ``coefs`` is a host tuple of 15 floats baked into the
    kernel — traffic is just x in + y out (vs 15 pad temps in XLA)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape3 = x3.shape
    deltas = _flat_deltas(shape3)
    assert max(abs(d) for d in deltas) < block * 128, "block too small"
    m = int(np.prod(shape3))
    xp, nb = _flat_blocks(x3.reshape(-1), block)
    cs = tuple(float(c) for c in coefs)

    roll = _roll_fn(interpret)

    def kernel(xprev, xcur, xnext, y_ref):
        full = jnp.concatenate([xprev[...], xcur[...], xnext[...]], axis=0)
        rolls = {}
        acc = cs[0] * _flat_shift(full, block, deltas[0], rolls, roll)
        for t in range(1, 15):
            acc = acc + cs[t] * _flat_shift(
                full, block, deltas[t], rolls, roll
            )
        y_ref[...] = acc

    y = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 128), lambda i: (i + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 128), lambda i: (i + 2, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * block, 128), x3.dtype),
        interpret=interpret,
    )(xp, xp, xp)
    return y.reshape(-1)[:m].reshape(shape3)
