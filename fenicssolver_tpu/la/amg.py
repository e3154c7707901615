"""Smoothed-aggregation algebraic multigrid.

TPU-native replacement for the reference's PETSc ``petsc_amg`` smoothed
aggregation with Chebyshev/Jacobi smoothing and rigid-body near-nullspace
(``SolverBase.py:643-705``).  The hierarchy build is scipy-free: all
sparse products (smoothed prolongator, Galerkin RAP) run through the
sort/segment-reduce kernels in ``la/sparse_algebra`` (the formulation
that maps onto device sort + segment_sum).  The V-cycle runs on device:
every level's operator, prolongator and restriction live as jnp
CSR/block-ELL arrays and the cycle is a fixed-depth jit-compatible
function used as a CG preconditioner.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .sparse import csr_from_scipy


def _strength_graph(A, theta):
    """Symmetric strength-of-connection filter (scipy-free: one vectorized
    pass over the COO triples, ``la/sparse_algebra``)."""
    from .sparse_algebra import HostCSR, coo_to_csr, csr_rows

    d = np.sqrt(np.abs(A.diagonal()))
    d[d == 0] = 1.0
    rows = csr_rows(A)
    cols = A.indices
    keep = np.abs(A.data) >= theta * d[rows] * d[cols]
    keep |= rows == cols
    return coo_to_csr(
        rows[keep], cols[keep], A.data[keep], A.shape, sum_duplicates=False
    )


def _aggregate(S):
    """Greedy standard aggregation on the strength graph -> agg id per node.

    Native C++ fast path (``native.aggregate``) with a python fallback."""
    from .. import native as _native

    n = S.shape[0]
    out = _native.aggregate(S.indptr, S.indices, n)
    if out is not None:
        return out
    agg = -np.ones(n, dtype=np.int64)
    indptr, indices = S.indptr, S.indices
    n_agg = 0
    for i in range(n):
        if agg[i] >= 0:
            continue
        nbrs = indices[indptr[i] : indptr[i + 1]]
        if (agg[nbrs] >= 0).any():
            continue
        agg[i] = n_agg
        agg[nbrs] = n_agg
        n_agg += 1
    for i in range(n):
        if agg[i] >= 0:
            continue
        nbrs = indices[indptr[i] : indptr[i + 1]]
        cand = agg[nbrs]
        cand = cand[cand >= 0]
        agg[i] = cand[0] if len(cand) else n_agg
        if not len(cand):
            n_agg += 1
    return agg, n_agg


def _tentative_prolongator(agg, n_agg, B):
    """Near-nullspace-preserving tentative P (per-aggregate QR).

    B: (n, k) near-nullspace block (k=1 constants for scalar problems,
    rigid-body modes for elasticity)."""
    from .sparse_algebra import coo_to_csr

    n, k = B.shape
    rows, cols, vals = [], [], []
    Bc = np.zeros((n_agg * k, k))
    order = np.argsort(agg, kind="stable")
    agg_sorted = agg[order]
    bounds = np.searchsorted(agg_sorted, np.arange(n_agg + 1))
    sizes = np.diff(bounds)
    # batch the per-aggregate QRs by aggregate size (vectorized np.linalg.qr)
    Bc3 = Bc.reshape(n_agg, k, k)
    for m in np.unique(sizes):
        a_ids = np.nonzero(sizes == m)[0]
        if m == 0:
            continue
        # (na, m) member table: one fancy gather, no per-aggregate loop
        # (the old per-aggregate list comprehensions were O(n_agg) python
        # iterations — the setup hotspot at >=100k dofs)
        idx = order[bounds[a_ids][:, None] + np.arange(int(m))[None, :]]
        Bblk = B[idx]  # (na, m, k)
        Q, R = np.linalg.qr(Bblk)  # (na, m, kk), (na, kk, k)
        kk = min(int(m), k)
        for j in range(kk):
            rows.append(idx.reshape(-1))
            cols.append(np.repeat(a_ids * k + j, m))
            vals.append(Q[:, :, j].reshape(-1))
        Bc3[a_ids, :kk, :] = R[:, :kk, :]
    P = coo_to_csr(
        np.concatenate(rows),
        np.concatenate(cols),
        np.concatenate(vals),
        (n, n_agg * k),
        sum_duplicates=False,
    )
    return P, Bc


class AMGPreconditioner:
    """V(1,1)-cycle smoothed-aggregation preconditioner."""

    def __init__(
        self,
        A_scipy,
        nullspace=None,
        theta=0.08,
        max_levels=10,
        coarse_size=300,
        omega=4.0 / 3.0,
        presmooth=2,
        postsmooth=2,
        free_mask=None,
        spmv="bell",
        bell_budget_mb=512.0,
        dtype=None,
    ):
        """``free_mask``: 0/1 per dof; constrained (identity) rows are
        excluded from the hierarchy — they would otherwise persist as
        uncoarsenable singleton aggregates on every level.

        ``spmv="bell"`` stores level operators in block-ELL tiles
        (``la/block_ell.py``) so smoothing/residual matvecs stream full
        (8,128) lanes instead of scalar gathers — the TPU hot-path format —
        falling back to CSR per level once ``bell_budget_mb`` of tile
        memory is spent (fill-in is 10-25x CSR).

        ``dtype``: storage dtype of every DEVICE array (level operators,
        transfers, Chebyshev scalings, coarse inverse); defaults to the
        input matrix's dtype.  The host-side setup math (strength,
        prolongator smoothing, RAP, pinv) always runs in f64 — but an
        f32 solve must get an f32 V-cycle: one f64 level array promotes
        the whole preconditioner application, which on TPU means
        X64-split emulation (2x memory, many-x slower) inside every
        Krylov iteration.

        The BUILD path is scipy-free (VERDICT r2 item 7): all sparse
        products (smoothed prolongator, Galerkin RAP, transposes,
        submatrix extraction) run through the sort/segment-reduce kernels
        in ``la/sparse_algebra`` — the formulation that maps directly onto
        the device sort + segment_sum primitives."""
        from .block_ell import BC, BR
        from .sparse_algebra import (
            HostCSR,
            from_scipy,
            l1_row_sums as _l1_row_sums,
            rap,
            sp_add,
            sp_diag_scale,
            sp_matmat,
            sp_submatrix,
            sp_transpose,
        )

        self.presmooth = presmooth
        self.postsmooth = postsmooth
        self._dtype = np.dtype(
            dtype if dtype is not None else A_scipy.data.dtype
        )
        A_full = (
            A_scipy
            if isinstance(A_scipy, HostCSR)
            else from_scipy(A_scipy)
        )
        if free_mask is not None:
            free = np.asarray(free_mask).astype(bool)
            self._free_idx = jnp.asarray(np.nonzero(free)[0])
            self._n_full = A_full.shape[0]
            self._free_np = free
            A = sp_submatrix(A_full, free)
        else:
            self._free_idx = None
            A = A_full
        levels = []
        n = A.shape[0]
        B = (
            np.asarray(nullspace)
            if nullspace is not None
            else np.ones((n, 1))
        )
        if free_mask is not None and nullspace is not None:
            B = B[free]

        def _estimate_l1_lam(M, l1_np):
            """Power-iteration estimate of lam_max(L1^-1 M), clipped to the
            Gershgorin bound 2 (exact for SPD; safety for nonsymmetric)."""
            x = np.sin(np.arange(M.shape[0], dtype=np.float64)) + 0.5
            lam_est = 1.0
            for _ in range(12):
                x = M.matvec(x) / l1_np
                nx = np.linalg.norm(x)
                if nx == 0:
                    break
                lam_est = nx
                x /= nx
            return float(min(1.05 * lam_est, 2.0))

        while A.shape[0] > coarse_size and len(levels) < max_levels - 1:
            S = _strength_graph(A, theta)
            agg, n_agg = _aggregate(S)
            if n_agg * B.shape[1] >= A.shape[0]:
                # coarsening stalled (near-singleton aggregates on a dense
                # coarse operator — the "coarse" level would GROW; observed
                # 960 -> 1527 -> 3813 -> ... -> 290k on a P2 momentum
                # block): stop here and treat A as the coarsest level
                break
            P0, Bc = _tentative_prolongator(agg, n_agg, B)
            # Jacobi-smoothed prolongator: P = (I - omega D^-1 A) P0.
            # Sign-preserving diagonal guard: clamping negative entries to
            # +eps turns a mildly indefinite/nonsymmetric level (e.g. the NS
            # momentum block with advection) into +-inf coarse operators.
            dA = A.diagonal()
            dA = np.where(np.abs(dA) < 1e-300, 1e-300, dA)
            DA = sp_diag_scale(A, d_left=1.0 / dA)
            # estimate spectral radius of D^-1 A with a few power iterations
            x = np.sin(np.arange(A.shape[0], dtype=np.float64))
            lam = 2.0
            for _ in range(8):
                x = DA.matvec(x)
                nx = np.linalg.norm(x)
                if nx == 0:
                    break
                lam = nx if _ == 7 else lam
                x /= nx
            P = sp_add(P0, sp_matmat(DA, P0), 1.0, -(omega / lam))
            Ac = rap(A, P)
            if (not np.isfinite(Ac.data).all()) or Ac.diagonal().min() <= 0:
                # smoothed P degenerated (nonsymmetric/indefinite level):
                # fall back to plain (unsmoothed) aggregation for this level
                P = P0
                Ac = rap(A, P)
            if spmv == "bell" and Ac.shape[0] > 4 * BR * BC:
                # aggregation scrambles the coarse numbering, inflating
                # the block-ELL tile fill K of the NEXT level's operator.
                # A bandwidth-reducing relabel of the COARSE space is free
                # at runtime (P's columns / Bc's rows relabel at setup,
                # R = P^T follows), so pick-best RCM it before descending.
                from .sparse_algebra import (
                    bandwidth_ordering,
                    sp_permute_sym,
                    sp_relabel_cols,
                )

                perm_c, _ = bandwidth_ordering(
                    Ac.indptr, Ac.indices, Ac.shape[0]
                )
                if perm_c is not None:
                    Ac = sp_permute_sym(Ac, perm_c)
                    P = sp_relabel_cols(P, perm_c)
                    Bc = Bc[perm_c]
            A_dev = None
            if spmv == "bell" and bell_budget_mb > 0:
                from .block_ell import BlockELL, build_block_ell

                K, nrb, col_blocks, pos = build_block_ell(
                    A.indptr, A.indices, A.shape[0]
                )
                mb = K * nrb * BR * BC * self._dtype.itemsize / 1e6
                if mb <= bell_budget_mb:
                    # sorted unique scatter-set: pos is injective and host-
                    # static; the naive .at[pos].add lowers to a sort-based
                    # combining scatter with scratch ~ the PADDED tile array
                    # (see block_ell_from_csr)
                    order = np.argsort(pos, kind="stable")
                    tiles = (
                        jnp.zeros(K * nrb * BR * BC, dtype=self._dtype)
                        .at[jnp.asarray(pos[order])]
                        .set(jnp.asarray(A.data[order].astype(self._dtype)),
                             indices_are_sorted=True, unique_indices=True)
                        .reshape(K, nrb, BR, BC)
                    )
                    A_dev = BlockELL(
                        tiles=tiles,
                        col_blocks=jnp.asarray(col_blocks),
                        n=A.shape[0],
                    )
                    bell_budget_mb -= mb
            if A_dev is None:
                A_dev = csr_from_scipy(A)
                A_dev = A_dev._replace(data=A_dev.data.astype(self._dtype))
            _l1 = _l1_row_sums(A)
            P_dev = csr_from_scipy_rect(P)
            R_dev = csr_from_scipy_rect(sp_transpose(P))
            levels.append(
                dict(
                    A=A_dev,
                    diag=jnp.asarray(
                        np.maximum(A.diagonal(), 1e-300).astype(self._dtype)
                    ),
                    P=P_dev._replace(data=P_dev.data.astype(self._dtype)),
                    R=R_dev._replace(data=R_dev.data.astype(self._dtype)),
                    # Chebyshev smoothing on the l1-scaled operator (hypre's
                    # l1-scaling + Chebyshev): row-wise |A| sums guarantee
                    # lam(L1^-1 A) <= 2 by Gershgorin, so smoothing NEVER
                    # diverges — unlike plain omega/D Jacobi, whose fixed
                    # omega=2/3 assumes lam(D^-1 A) <= 2 (P1 M-matrix-like)
                    # and diverges on P2/vector blocks where lam > 3.
                    # lam1 is a power-iteration estimate of lam(L1^-1 A)
                    # (clipped to the Gershgorin bound) for the Chebyshev
                    # interval; Chebyshev beats Jacobi decisively on the
                    # P2 discretizations where Jacobi smoothing contracts
                    # at only ~0.7/cycle.
                    l1=jnp.asarray(_l1.astype(self._dtype)),
                    lam1=_estimate_l1_lam(A, _l1),
                )
            )
            A = Ac
            B = Bc
            if A.shape[0] <= coarse_size:
                break
        if A.shape[0] <= max(coarse_size * 10, 4000):
            self.coarse_dense = jnp.asarray(
                np.linalg.pinv(A.toarray()).astype(self._dtype)
            )  # pinv: robust to the singular all-Neumann coarse limit
            self._coarse_cheb = None
        else:
            # coarsening stalled while the level is still too large to
            # densify: approximate the coarse solve with a fixed Chebyshev
            # sweep on the l1-scaled operator (convergent by Gershgorin;
            # a preconditioner needs spectral equivalence, not exactness)
            self.coarse_dense = None
            _l1c = _l1_row_sums(A)
            Ac_dev = csr_from_scipy(A)
            self._coarse_cheb = dict(
                A=Ac_dev._replace(data=Ac_dev.data.astype(self._dtype)),
                l1=jnp.asarray(_l1c.astype(self._dtype)),
                lam1=_estimate_l1_lam(A, _l1c),
            )
        self.levels = levels

    def __call__(self, b):
        if self._free_idx is None:
            return self._vcycle(0, b).astype(b.dtype)
        bf = b[self._free_idx]
        xf = self._vcycle(0, bf)
        # identity on constrained dofs (astype: never promote the caller's
        # Krylov vectors, whatever dtype the hierarchy holds)
        out = b.at[self._free_idx].set(xf.astype(b.dtype))
        return out

    def _vcycle(self, li, b):
        if li == len(self.levels):
            if self.coarse_dense is not None:
                return self.coarse_dense @ b
            # stalled-coarsening fallback: degree-12 Chebyshev "solve" over
            # the whole l1-scaled spectrum ([lam/30, lam])
            cc = self._coarse_cheb
            return self._smooth(
                dict(A=cc["A"], l1=cc["l1"], lam1=cc["lam1"]), b,
                degree=12, lmin_ratio=1.0 / 30.0,
            )
        lv = self.levels[li]
        x = self._smooth(lv, b, degree=self.presmooth + 1)
        r = b - lv["A"].matvec(x)
        rc = rect_matvec(lv["R"], r)
        ec = self._vcycle(li + 1, rc)
        x = x + rect_matvec(lv["P"], ec)
        x = x + self._smooth(
            lv, b - lv["A"].matvec(x), degree=self.postsmooth + 1
        )
        return x

    def _smooth(self, lv, b, degree, lmin_ratio=0.25):
        """Chebyshev smoothing (x0 = 0) on the l1-scaled level operator,
        targeting [lmin_ratio * lam, lam] (default: the upper part of the
        spectrum — the hypre ``cheby`` smoother analog; the stalled-coarse
        fallback widens the interval to act as an approximate solve)."""
        A, l1, lam = lv["A"], lv["l1"], lv["lam1"]
        lmin = lmin_ratio * lam
        theta = 0.5 * (lam + lmin)
        delta = 0.5 * (lam - lmin)
        sigma = theta / delta
        r = b / l1
        d = r / theta
        x = d
        rho = 1.0 / sigma
        for _ in range(degree - 1):
            r = r - A.matvec(d) / l1
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = rho_new * rho * d + (2.0 * rho_new / delta) * r
            x = x + d
            rho = rho_new
        return x


# rectangular CSR support (prolongators)
from typing import NamedTuple


class RectCSR(NamedTuple):
    indptr: jnp.ndarray
    indices: jnp.ndarray
    rows: jnp.ndarray
    data: jnp.ndarray
    shape: tuple


def csr_from_scipy_rect(S):
    S = S.tocsr()
    rows = np.repeat(
        np.arange(S.shape[0], dtype=np.int32), np.diff(S.indptr)
    )
    return RectCSR(
        indptr=jnp.asarray(S.indptr.astype(np.int32)),
        indices=jnp.asarray(S.indices.astype(np.int32)),
        rows=jnp.asarray(rows),
        data=jnp.asarray(S.data),
        shape=S.shape,
    )


def rect_matvec(M: RectCSR, x):
    import jax

    prod = M.data * x[M.indices]
    return jax.ops.segment_sum(prod, M.rows, num_segments=M.shape[0])


def rigid_body_modes(coords, vdim):
    """Near-nullspace block for elasticity (reference ``build_nullspace``,
    ``SolverBase.py:674-705``): translations + rotations, node-major dofs."""
    n = coords.shape[0]
    if vdim == 2:
        B = np.zeros((n * 2, 3))
        B[0::2, 0] = 1.0
        B[1::2, 1] = 1.0
        B[0::2, 2] = -coords[:, 1]
        B[1::2, 2] = coords[:, 0]
    elif vdim == 3:
        B = np.zeros((n * 3, 6))
        for c in range(3):
            B[c::3, c] = 1.0
        # rotations about z, x, y
        B[0::3, 3] = -coords[:, 1]
        B[1::3, 3] = coords[:, 0]
        B[1::3, 4] = -coords[:, 2]
        B[2::3, 4] = coords[:, 1]
        B[2::3, 5] = coords[:, 2] * 0 + coords[:, 2] * 0  # filled below
        B[0::3, 5] = coords[:, 2]
        B[2::3, 5] = -coords[:, 0]
    else:
        B = np.ones((n, 1))
        return B
    # orthonormalize
    Q, _ = np.linalg.qr(B)
    return Q
