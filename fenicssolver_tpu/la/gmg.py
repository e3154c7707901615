"""Geometric multigrid for P1 scalar diffusion on BoxMesh lattices.

TPU-native multigrid companion to the algebraic hierarchy in ``la/amg.py``
(the reference delegates both jobs to PETSc ``petsc_amg``,
``SolverBase.py:643-672``).  On the structured Kuhn/Freudenthal meshes the
built-in generators produce (``core/mesh.py:543-583``), every transfer and
smoothing operator is expressible as reshaped slicing on the (Nx, Ny, Nz)
vertex lattice — zero gathers/scatters, the layout TPUs stream fastest:

- operators: the constant 15-point stencil of the P1 Laplacian (computed
  numerically from one assembled patch, re-discretized per level),
- prolongation: separable per-axis linear interpolation,
- restriction: its exact transpose (full weighting), keeping the V-cycle
  symmetric so it is a valid SPD preconditioner for CG,
- smoother: damped Jacobi (the stencil diagonal is one constant).

Scope: constant-coefficient scalar diffusion with Dirichlet boundaries on
box lattices (the BASELINE.json flagship).  General unstructured/variable
problems use ``la/amg.py``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops.structured import OFFSETS, LatticePattern

#: static tuple form for slicing; index of the (0,0,0) center tap
OFFSETS_T = tuple(tuple(int(v) for v in o) for o in OFFSETS)
CENTER_IDX = OFFSETS_T.index((0, 0, 0))


def p1_box_stencil(hx, hy, hz):
    """15 stencil taps (aligned with OFFSETS) of the P1 tet Laplacian on a
    Freudenthal box lattice, assembled numerically from one 4x4x4 patch."""
    from ..core.mesh import BoxMesh

    n = 4
    N = n + 1
    mesh = BoxMesh((0, 0, 0), (n * hx, n * hy, n * hz), n, n, n)
    cells = mesh.cells_array
    X = mesh.coords[cells]
    J = np.swapaxes(X[:, 1:, :] - X[:, :1, :], 1, 2)
    detJ = np.abs(np.linalg.det(J))
    Jinv = np.linalg.inv(J)
    gref = np.array([[-1.0, -1, -1], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    g = np.einsum("kt,ctg->ckg", gref, Jinv)
    Ae = np.einsum("cig,cjg,c->cij", g, g, detJ / 6.0)
    center = (2 * N + 2) * N + 2
    deltas = (OFFSETS[:, 0] * N + OFFSETS[:, 1]) * N + OFFSETS[:, 2]
    coefs = np.zeros(len(OFFSETS))
    ca, aa = np.nonzero(cells == center)
    for c, a in zip(ca, aa):
        for b in range(4):
            d = cells[c, b] - center
            coefs[np.nonzero(deltas == d)[0][0]] += Ae[c, a, b]
    return coefs


class GMGLevel(NamedTuple):
    coefs: jnp.ndarray  # (15,)
    free3: jnp.ndarray  # (Nx, Ny, Nz) 0/1 mask
    inv_diag: jnp.ndarray  # scalar: 1 / center tap


class GMGData(NamedTuple):
    levels: tuple  # of GMGLevel, fine -> coarse
    coarse_inv: jnp.ndarray  # (n3, n3) dense MASKED inverse (zero on
    # constrained rows/cols: the coarse grid must never return correction
    # on constrained dofs — see build_gmg)
    shape3: tuple  # fine lattice shape (static)
    nu: int = 2
    omega: float = 0.8
    #: flat fine free mask; when set, vcycle adds the identity on the
    #: FINE constrained dofs (the preconditioner contract of the masked
    #: operator free*A*free + (1-free)*I).  None = pure V-cycle (the
    #: sharded lattice solvers add their own identity term outside)
    fine_free: jnp.ndarray = None


def _shift(x, d):
    """out[v] = x[v + d], zero outside the lattice."""
    slc, pads = [], []
    for ax, dd in enumerate(d):
        n = x.shape[ax]
        if dd >= 0:
            slc.append(slice(dd, n))
            pads.append((0, dd))
        else:
            slc.append(slice(0, n + dd))
            pads.append((-dd, 0))
    return jnp.pad(x[tuple(slc)], pads)


def stencil_apply(x3, coefs):
    y = coefs[CENTER_IDX] * x3
    for oi, d in enumerate(OFFSETS_T):
        if oi == CENTER_IDX:
            continue
        y = y + coefs[oi] * _shift(x3, d)
    return y


def _restrict_axis(x, ax):
    x = jnp.moveaxis(x, ax, 0)
    pads = ((1, 1),) + ((0, 0),) * (x.ndim - 1)
    xp = jnp.pad(x, pads)  # (2m+3, ...)
    y = 0.5 * xp[0:-2:2] + xp[1:-1:2] + 0.5 * xp[2::2]  # (m+1, ...)
    return jnp.moveaxis(y, 0, ax)


def _prolong_axis(x, ax):
    x = jnp.moveaxis(x, ax, 0)  # (m+1, ...)
    odd = 0.5 * (x[:-1] + x[1:])  # (m, ...)
    body = jnp.stack([x[:-1], odd], axis=1).reshape((-1,) + x.shape[1:])
    y = jnp.concatenate([body, x[-1:]], axis=0)  # (2m+1, ...)
    return jnp.moveaxis(y, 0, ax)


def restrict3(x):
    for ax in range(3):
        x = _restrict_axis(x, ax)
    return x


def prolong3(x):
    for ax in range(3):
        x = _prolong_axis(x, ax)
    return x


def build_gmg(
    nx,
    ny,
    nz,
    extent=(1.0, 1.0, 1.0),
    free3=None,
    coarse_max=800,
    nu=2,
    omega=0.8,
    dtype=None,
    identity_on_constrained=True,
    device=True,
):
    """Host setup of the level hierarchy.

    ``free3``: 0/1 fine-lattice mask of unconstrained dofs (default: whole
    boundary Dirichlet).  Coarse masks are derived by vertex injection.

    ``device=False`` keeps every array numpy: under the axon remote-compile
    tunnel EACH eager ``jnp.asarray`` conversion compiles a tiny program
    remotely (30-400 s apiece under congestion — measured 394 s of "gmg
    setup" at n=104), while numpy hierarchies embed as constants when the
    solver is jitted, costing zero extra compiles."""
    from jax.dtypes import canonicalize_dtype

    # host-side default-dtype probe: jnp.zeros(()).dtype would dispatch an
    # eager device program just to read the dtype
    dtype = dtype or canonicalize_dtype(np.float64)
    _as = (lambda a, dtype: np.asarray(a, dtype=dtype)) if not device \
        else jnp.asarray
    n = np.array([nx, ny, nz])
    h = np.array(extent, dtype=np.float64) / n
    if free3 is None:
        free3 = np.zeros(tuple(n + 1), dtype=bool)
        free3[1:-1, 1:-1, 1:-1] = True
    else:
        free3 = np.asarray(free3, dtype=bool)
    shape3 = tuple(int(v) for v in n + 1)
    levels = []
    # smoothed levels while a coarser grid exists below; the loop exit state
    # (n, h, free3) is the coarsest grid, solved densely
    while (n % 2 == 0).all() and (n >= 4).all() and int(np.prod(n + 1)) > coarse_max:
        coefs = p1_box_stencil(*h)
        levels.append(
            GMGLevel(
                coefs=_as(coefs, dtype=dtype),
                free3=_as(free3, dtype=dtype),
                inv_diag=_as(1.0 / coefs[CENTER_IDX], dtype=dtype),
            )
        )
        n = n // 2
        h = h * 2
        free3 = free3[::2, ::2, ::2]
    coefs = p1_box_stencil(*h)
    # dense inverse of the masked coarsest operator (identity on constrained)
    pat = LatticePattern(*(int(v) for v in n))
    vals = np.broadcast_to(coefs, pat._present.shape)[pat._present]
    n3 = pat.n
    D = np.zeros((n3, n3))
    rows = np.repeat(np.arange(n3), np.diff(pat.indptr))
    D[rows, pat.indices] = vals
    fr = free3.ravel().astype(np.float64)
    D = fr[:, None] * D * fr[None, :] + np.diag(1.0 - fr)
    # MASK the inverse: restriction smears residual into constrained
    # coarse rows, whose identity would return it at UNIT scale — a
    # factor-|A| relative pollution of the prolongated correction that
    # stalls PCG whenever the operator scale is far from 1 (e.g. elastic
    # moduli ~1e11; invisible at the unit-coefficient test scale)
    coarse_inv = _as(
        fr[:, None] * np.linalg.inv(D) * fr[None, :], dtype=dtype
    )
    fine_free = None
    if identity_on_constrained:
        f0 = (
            np.asarray(levels[0].free3).ravel()
            if levels
            else free3.ravel().astype(np.float64)
        )
        fine_free = _as(f0, dtype=dtype)
    return GMGData(
        levels=tuple(levels),
        coarse_inv=coarse_inv,
        shape3=shape3,
        nu=nu,
        omega=omega,
        fine_free=fine_free,
    )


def _flat_stencil_ok(lv):
    """True when a level's masked stencil apply can take the fused pallas
    flat kernel (``ops/pallas_kernels.stencil_flat_apply_const``): TPU
    backend, a host (numpy) hierarchy so the taps bake as constants, a
    lattice big enough to beat the dispatch, shifts that fit the block
    window, and a free mask that ZEROES the whole boundary shell (the
    flat-shift exactness condition — see the kernel's module note)."""
    import os

    # default OFF — measured-and-rejected on v5e (round 4): the XLA
    # pad/slice formulation runs AT the HBM roofline already (end-to-end
    # bench n=104: 28.3 ms XLA vs 45.3 ms with the pallas kernels; the
    # extra cost is the kernel's 3x window reads + lane rotates)
    if os.environ.get("FST_PALLAS_STENCIL", "0") != "1":
        return False
    if not isinstance(lv.coefs, np.ndarray) or not isinstance(
        lv.free3, np.ndarray
    ):
        return False
    f = lv.free3
    if f.ndim != 3 or int(np.prod(f.shape)) < 150_000:
        return False
    try:
        import jax

        if jax.default_backend() != "tpu":
            return False
        # x64 sessions: Mosaic rejects the i64 index-map/iota constants
        # jax emits under jax_enable_x64 (measured: 'func.return (i32,
        # i64)' fails to legalize) — and TPU f64 is emulated anyway
        if jax.config.jax_enable_x64:
            return False
    except Exception:  # pragma: no cover - backend probe only
        return False
    from ..ops.pallas_kernels import STENCIL_BLOCK, _flat_deltas

    if max(abs(d) for d in _flat_deltas(f.shape)) >= STENCIL_BLOCK * 128:
        return False
    return not (
        f[0].any() or f[-1].any() or f[:, 0].any() or f[:, -1].any()
        or f[:, :, 0].any() or f[:, :, -1].any()
    )


def _a_free(lv, x3):
    xm = lv.free3 * x3
    if _flat_stencil_ok(lv):
        from ..ops.pallas_kernels import stencil_flat_apply_const

        return lv.free3 * stencil_flat_apply_const(
            xm, np.asarray(lv.coefs), interpret=False
        )
    return lv.free3 * stencil_apply(xm, lv.coefs)


def _cycle(gmg, li, b3):
    if li == len(gmg.levels):
        z = gmg.coarse_inv @ b3.ravel()
        return z.reshape(b3.shape)
    lv = gmg.levels[li]
    om = gmg.omega
    # pre-smooth from x=0 (first sweep is just scaled b)
    x = om * lv.inv_diag * (lv.free3 * b3)
    for _ in range(gmg.nu - 1):
        x = x + om * lv.inv_diag * lv.free3 * (b3 - _a_free(lv, x))
    r = lv.free3 * (b3 - _a_free(lv, x))
    ec = _cycle(gmg, li + 1, restrict3(r))
    x = x + lv.free3 * prolong3(ec)
    for _ in range(gmg.nu):
        x = x + om * lv.inv_diag * lv.free3 * (b3 - _a_free(lv, x))
    return x


def vcycle(gmg, r_flat):
    """One V(nu, nu) cycle: flat residual -> flat correction (SPD map).

    Correction on constrained dofs is ZERO inside the hierarchy (masked
    coarse inverse + free-masked smoothing — an unmasked coarse identity
    polluted the correction by the operator scale, see build_gmg); the
    fine-level identity on constrained dofs is added at the end when the
    hierarchy was built with identity_on_constrained."""
    b3 = r_flat.reshape(gmg.shape3)
    if not gmg.levels:  # whole problem under coarse_max: direct dense solve
        z = gmg.coarse_inv @ r_flat
    else:
        z = _cycle(gmg, 0, gmg.levels[0].free3 * b3).ravel()
    if gmg.fine_free is not None:
        z = z + (1.0 - gmg.fine_free) * r_flat
    return z


def preconditioner(gmg):
    return lambda r: vcycle(gmg, r)
