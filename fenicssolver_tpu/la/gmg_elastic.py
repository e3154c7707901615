"""Geometric multigrid for P1 VECTOR elasticity on BoxMesh lattices.

The vector companion to ``la/gmg.py`` (scalar diffusion): on Kuhn lattices
the P1 elasticity operator is a 15-offset stencil of constant 3x3 blocks
(for constant Lame parameters), so

- operator apply: 15 shift ops x (3x3) block contraction — pure slicing,
- smoother: damped block-Jacobi with the inverse of the constant 3x3
  center block,
- transfers: the scalar separable linear interpolation per component
  (geometric coarse spaces contain the rigid-body modes exactly, which is
  why GMG needs no near-nullspace machinery — the reference delegates the
  same job to ``petsc_amg`` + ``build_nullspace``, SolverBase.py:643-705),
- coarse level: dense inverse of the masked operator.

Used by the bench's vector-elasticity fast path and validated against the
generic unstructured assembly in ``tests/test_gmg.py``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops.structured import LatticePattern, elasticity_stencil_tables
from .gmg import CENTER_IDX, OFFSETS_T, _shift, prolong3, restrict3


def elastic_box_stencil(hx, hy, hz, mu, lam):
    """(15, 3, 3) constant stencil blocks of P1 elasticity on the lattice."""
    taps = np.zeros((len(OFFSETS_T), 3, 3))
    for oi, ca, Bmu, Blam in elasticity_stencil_tables(
        1, 1, 1, extent=(hx, hy, hz)
    ):
        taps[oi] += mu * Bmu + lam * Blam
    return taps


def elastic_truncated_groups(nx, ny, nz, hx, hy, hz, mu, lam):
    """Per-(offset, row-corner) blocks + separable cube-existence masks.

    The EXACT assembled operator of P1 elasticity on the (nx, ny, nz) Kuhn
    lattice with free (natural) surfaces: element entry groups of
    ``elasticity_stencil_tables`` contribute to row vertex v only when the
    cube at v - ca exists, and cube existence 0 <= v - ca < n is a product
    of three 1D interval indicators.  Interior rows recover the constant
    15-tap stencil; boundary-layer rows get the truncated sums the
    rediscretized-constant-tap hierarchy got WRONG (the round-3 limitation
    that forced fully-clamped boundaries, VERDICT r3 item 7).  Because P1
    lattice spaces are nested, this rediscretization IS the Galerkin coarse
    operator at every level.

    Returns a list of (oi, (wx, wy, wz), B) with 1D float masks of lengths
    (nx+1, ny+1, nz+1)."""
    groups = []
    ns = (nx, ny, nz)
    for oi, ca, Bmu, Blam in elasticity_stencil_tables(
        1, 1, 1, extent=(hx, hy, hz)
    ):
        ws = []
        for ax in range(3):
            N = ns[ax] + 1
            w = np.zeros(N)
            lo, hi = ca[ax], ns[ax] - 1 + ca[ax]  # v-ca in [0, n-1]
            w[lo : hi + 1] = 1.0
            ws.append(w)
        groups.append((oi, tuple(ws), mu * Bmu + lam * Blam))
    return groups


def _groups_center_field(groups, shape3):
    """(Nx, Ny, Nz, 3, 3) center-tap block field from truncated groups."""
    C = np.zeros(shape3 + (3, 3))
    for oi, (wx, wy, wz), B in groups:
        if oi != CENTER_IDX:
            continue
        w = wx[:, None, None] * wy[None, :, None] * wz[None, None, :]
        C += w[..., None, None] * B
    return C


class GMGElasticLevel(NamedTuple):
    coefs: jnp.ndarray  # (15, 3, 3)
    free3: jnp.ndarray  # (Nx, Ny, Nz)
    #: (3, 3) constant (fully-clamped fast path) or (Nx, Ny, Nz, 3, 3)
    #: field (free surfaces: the truncated boundary center blocks differ)
    inv_center: jnp.ndarray
    #: truncated-tap groups ((oi, (wx, wy, wz), B), ...) — empty selects
    #: the constant-tap apply (valid when every boundary row is clamped)
    groups: tuple = ()


class GMGElasticData(NamedTuple):
    levels: tuple
    coarse_inv: jnp.ndarray  # masked inverse (zero on constrained)
    shape3: tuple
    nu: int = 2
    omega: float = 0.6
    #: flat node-major fine free mask (see la/gmg.py GMGData.fine_free)
    fine_free: jnp.ndarray = None


def stencil_apply_vec(x, coefs):
    """x (3, Nx, Ny, Nz), coefs (15, 3, 3) -> y (3, Nx, Ny, Nz).

    The 3x3 block contractions are UNROLLED into scalar-coefficient FMAs:
    an einsum over the size-3 axes would lower to dot_general with the tiny
    dims on (sublane, lane) — the 32x tile-padding blowup that wedges the
    TPU (see MEMORY / CLAUDE.md perf rules)."""

    def add(acc, C, xs):
        for i in range(3):
            t = C[i, 0] * xs[0] + C[i, 1] * xs[1] + C[i, 2] * xs[2]
            acc[i] = t if acc[i] is None else acc[i] + t
        return acc

    acc = add([None] * 3, coefs[CENTER_IDX], [x[0], x[1], x[2]])
    for oi, d in enumerate(OFFSETS_T):
        if oi == CENTER_IDX:
            continue
        xs = [_shift(x[j], d) for j in range(3)]
        acc = add(acc, coefs[oi], xs)
    return jnp.stack(acc)


def stencil_apply_vec_trunc(x, groups):
    """Truncated-tap apply: per (offset, row-corner) group, a separable
    cube-existence mask gates the constant 3x3 block contribution — the
    EXACT free-surface operator at every level (interior rows see the full
    constant stencil; only the boundary layer differs).  Same unrolled
    scalar-FMA structure as :func:`stencil_apply_vec` (no tiny-dim
    contractions on TPU)."""
    shifted = {}
    acc = [None, None, None]
    for oi, (wx, wy, wz), B in groups:
        xs = shifted.get(oi)
        if xs is None:
            if oi == CENTER_IDX:
                xs = [x[0], x[1], x[2]]
            else:
                d = OFFSETS_T[oi]
                xs = [_shift(x[j], d) for j in range(3)]
            shifted[oi] = xs
        w = wx[:, None, None] * wy[None, :, None] * wz[None, None, :]
        for i in range(3):
            t = w * (
                B[i, 0] * xs[0] + B[i, 1] * xs[1] + B[i, 2] * xs[2]
            )
            acc[i] = t if acc[i] is None else acc[i] + t
    return jnp.stack(acc)


def build_gmg_elastic(
    nx, ny, nz, mu, lam, extent=(1.0, 1.0, 1.0), free3=None,
    coarse_max=800, nu=2, omega=0.6, dtype=None,
    identity_on_constrained=True, device=True, boundary="auto",
):
    """``device=False`` keeps the hierarchy numpy (embeds as jit constants,
    zero eager device programs) — see ``la/gmg.py build_gmg``.

    ``boundary``: "clamped" keeps the constant-tap hierarchy (valid only
    when every lattice-boundary row is Dirichlet — the bench fast path);
    "truncated" uses the exact free-surface taps
    (:func:`elastic_truncated_groups` — Galerkin by P1 nesting) so
    cantilever-style cases get mesh-independent V-cycles (VERDICT r3 item
    7); "auto" picks by inspecting ``free3`` on the lattice boundary."""
    from jax.dtypes import canonicalize_dtype

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
    if boundary == "auto":
        bmask = np.zeros(free3.shape, dtype=bool)
        bmask[[0, -1], :, :] = True
        bmask[:, [0, -1], :] = True
        bmask[:, :, [0, -1]] = True
        boundary = "truncated" if bool(free3[bmask].any()) else "clamped"
    truncated = boundary == "truncated"
    shape3 = tuple(int(v) for v in n + 1)
    levels = []
    while (n % 2 == 0).all() and (n >= 4).all() and 3 * int(
        np.prod(n + 1)
    ) > coarse_max:
        taps = elastic_box_stencil(*h, mu, lam)
        if truncated:
            groups_np = elastic_truncated_groups(*(int(v) for v in n),
                                                 *h, mu, lam)
            Cf = _groups_center_field(
                groups_np, tuple(int(v) for v in n + 1)
            )
            inv_center = _as(np.linalg.inv(Cf), dtype=dtype)
            groups = tuple(
                (oi, tuple(_as(w, dtype=dtype) for w in ws), B)
                for oi, ws, B in groups_np
            )
        else:
            inv_center = _as(np.linalg.inv(taps[CENTER_IDX]), dtype=dtype)
            groups = ()
        levels.append(
            GMGElasticLevel(
                coefs=_as(taps, dtype=dtype),
                free3=_as(free3, dtype=dtype),
                inv_center=inv_center,
                groups=groups,
            )
        )
        n = n // 2
        h = h * 2
        free3 = free3[::2, ::2, ::2]
    taps = elastic_box_stencil(*h, mu, lam)
    pat = LatticePattern(*(int(v) for v in n))
    n3 = pat.n
    rows = np.repeat(np.arange(n3), np.diff(pat.indptr))
    # per-entry offset index: rank within the row's present offsets
    oi_of_entry = np.nonzero(pat._present)[1]
    if truncated:
        # position-dependent taps on the coarse lattice (exact assembly)
        groups_c = elastic_truncated_groups(*(int(v) for v in n), *h,
                                            mu, lam)
        tap_field = np.zeros((n3, len(OFFSETS_T), 3, 3))
        for oi, (wx, wy, wz), B in groups_c:
            w = (
                wx[:, None, None] * wy[None, :, None] * wz[None, None, :]
            ).ravel()
            tap_field[:, oi] += w[:, None, None] * B
    D = np.zeros((3 * n3, 3 * n3))
    for e in range(len(rows)):
        r, c, oi = rows[e], pat.indices[e], oi_of_entry[e]
        D[3 * r : 3 * r + 3, 3 * c : 3 * c + 3] = (
            tap_field[r, oi] if truncated else taps[oi]
        )
    fr = np.repeat(free3.ravel().astype(np.float64), 3)
    D = fr[:, None] * D * fr[None, :] + np.diag(1.0 - fr)
    # masked inverse: see la/gmg.py — unmasked identity rows pollute the
    # prolongated correction by the operator scale (~1e11 for elasticity)
    coarse_inv = _as(
        fr[:, None] * np.linalg.inv(D) * fr[None, :], dtype=dtype
    )
    fine_free = None
    if identity_on_constrained:
        f0 = (
            np.asarray(levels[0].free3)
            if levels
            else free3.astype(np.float64)
        )
        fine_free = _as(
            np.repeat(np.asarray(f0).ravel(), 3), dtype=dtype
        )
    return GMGElasticData(
        levels=tuple(levels), coarse_inv=coarse_inv, shape3=shape3,
        nu=nu, omega=omega, fine_free=fine_free,
    )


def _a_free(lv, x):
    if lv.groups:
        return lv.free3 * stencil_apply_vec_trunc(lv.free3 * x, lv.groups)
    return lv.free3 * stencil_apply_vec(lv.free3 * x, lv.coefs)


def _smooth_inc(lv, om, r):
    C = lv.inv_center  # unrolled for the same tile-padding reason
    if C.ndim == 2:  # (3, 3) constant center block (clamped fast path)
        return om * jnp.stack(
            [
                C[i, 0] * r[0] + C[i, 1] * r[1] + C[i, 2] * r[2]
                for i in range(3)
            ]
        )
    # (Nx, Ny, Nz, 3, 3) field: exact truncated boundary blocks
    return om * jnp.stack(
        [
            C[..., i, 0] * r[0] + C[..., i, 1] * r[1] + C[..., i, 2] * r[2]
            for i in range(3)
        ]
    )


def _cycle(gmg, li, b):
    if li == len(gmg.levels):
        z = gmg.coarse_inv @ jnp.moveaxis(b, 0, -1).ravel()
        z3 = z.reshape(b.shape[1:] + (3,))
        return jnp.moveaxis(z3, -1, 0)
    lv = gmg.levels[li]
    om = gmg.omega
    x = _smooth_inc(lv, om, lv.free3 * b)
    for _ in range(gmg.nu - 1):
        x = x + _smooth_inc(lv, om, lv.free3 * (b - _a_free(lv, x)))
    r = lv.free3 * (b - _a_free(lv, x))
    rc = jnp.stack([restrict3(r[j]) for j in range(3)])
    ec = _cycle(gmg, li + 1, rc)
    x = x + lv.free3 * jnp.stack([prolong3(ec[j]) for j in range(3)])
    for _ in range(gmg.nu):
        x = x + _smooth_inc(lv, om, lv.free3 * (b - _a_free(lv, x)))
    return x


def vcycle(gmg, r_flat):
    """One V(nu, nu) cycle on the flat (3 * N^3,) vector (node-major
    (v, comp) dof order, i.e. reshape (N, N, N, 3)).  Zero correction on
    constrained dofs inside the hierarchy; fine identity added when
    built with identity_on_constrained (see la/gmg.py)."""
    b = jnp.moveaxis(r_flat.reshape(gmg.shape3 + (3,)), -1, 0)
    if not gmg.levels:
        z = gmg.coarse_inv @ r_flat
    else:
        z = jnp.moveaxis(
            _cycle(gmg, 0, gmg.levels[0].free3 * b), 0, -1
        ).ravel()
    if gmg.fine_free is not None:
        z = z + (1.0 - gmg.fine_free) * r_flat
    return z
