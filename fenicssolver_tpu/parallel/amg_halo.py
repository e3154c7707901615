"""Sharded smoothed-aggregation AMG in the halo layout.

The distributed preconditioner for UNSTRUCTURED meshes — the missing half
of the domain-decomposition story (round-3 VERDICT item 1): the reference
gets ``petsc_amg``/hypre under MPI for ANY mesh
(``FenicsSolver/SolverBase.py:643-672``,
``examples/test_flow_pass_cylinder.py:249-254``); here the box-lattice GMG
(``parallel/lattice.py``) covered structured cases only and everything else
fell to a Jacobi halo CG with O(1/h) iteration growth.

Design: the smoothed-aggregation hierarchy is built ONCE on host (the same
scipy-free sort/segment-reduce kernels the serial ``la/amg.py`` uses), then
every level's operator, restriction and prolongation are SHARDED over the
device mesh in the halo layout of ``parallel/halo.py``:

- level-0 dofs partition by the balanced coordinate-quantile grid;
- coarse dofs follow their aggregates (owner = owner of the aggregate's
  first fine dof), so transfers are rank-local up to a one-deep ghost ring;
- each level has its own offset-grouped ``ppermute`` exchange refreshing
  ghost values (ghost set = columns of the owned operator rows UNION the
  owned restriction rows UNION the finer level's prolongator needs);
- smoothing is l1-scaled Chebyshev (no inner products — fully local apart
  from the operator's ghost exchange), matching the serial AMG;
- the coarsest system gathers with one ``psum`` and solves against a
  replicated dense pseudo-inverse (or a wide Chebyshev sweep when
  coarsening stalled while the level is still large).

The whole preconditioned Krylov solve (CG for SPD, BiCGStab/GMRES/FGMRES
otherwise — reusing the serial ``la/krylov`` algorithms with a psum hook)
runs as ONE ``shard_map`` program; vectors follow the owned-only convention
(ghost slots zero outside the transient exchanges inside the operator), so
plain ``vdot`` + scalar ``psum`` is the exact global inner product.

Per-device memory is O(ndof/n_dev + interface) summed over levels (the
hierarchy adds the usual ~40% operator-complexity overhead).  Local matvecs
run as padded-COO ``segment_sum`` — on the CPU dryrun mesh this is
bandwidth-optimal; the TPU fast path for the fine level can later adopt the
per-rank block-ELL tiles of :class:`parallel.halo.HaloShardedSolver`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import PartitionSpec as P

from .halo import (
    AXIS,
    _LocalIndex,
    _build_exchange_rounds,
    _factor_grid,
    _group_by_rank,
    _row_take,
    quantile_grid_partition,
)


def _first_members(agg, n_agg):
    """Index of the first fine dof of each aggregate (stable order)."""
    order = np.argsort(agg, kind="stable")
    bounds = np.searchsorted(agg[order], np.arange(n_agg + 1))
    return order[bounds[:-1]]


def build_sa_hierarchy(A, B, theta=0.08, max_levels=10, coarse_size=600,
                       omega=4.0 / 3.0):
    """Host smoothed-aggregation setup -> (levels, coarse).

    Mirrors :class:`la.amg.AMGPreconditioner`'s build (strength filter,
    greedy aggregation, near-nullspace tentative P, Jacobi-smoothed
    prolongator with sign-preserving diagonal + degenerate-smoothing
    fallback, Galerkin RAP) but stays entirely on host CSR tuples and
    additionally records each level's aggregate map — the sharded layout
    derives coarse ownership from it.

    Returns ``levels`` = list of dicts with HostCSR ``A``, ``P``, ``R``,
    int array ``agg``, plus ``l1`` (np) / ``lam1`` (float) Chebyshev data
    and ``k`` (nullspace block width), and ``coarse`` = dict with the
    final-level HostCSR ``A`` and its ``l1``/``lam1``.
    """
    from ..la.amg import (
        _aggregate,
        _strength_graph,
        _tentative_prolongator,
    )
    from ..la.sparse_algebra import (
        HostCSR,
        from_scipy,
        l1_row_sums,
        rap,
        sp_add,
        sp_diag_scale,
        sp_matmat,
        sp_transpose,
    )

    if not isinstance(A, HostCSR):
        A = from_scipy(A)
    B = np.asarray(B, dtype=np.float64)

    def _lam1(M, l1_np):
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

    levels = []
    while A.shape[0] > coarse_size and len(levels) < max_levels - 1:
        S = _strength_graph(A, theta)
        agg, n_agg = _aggregate(S)
        if n_agg * B.shape[1] >= A.shape[0]:
            break  # coarsening stalled: stop, treat A as coarsest
        P0, Bc = _tentative_prolongator(agg, n_agg, B)
        dA = A.diagonal()
        dA = np.where(np.abs(dA) < 1e-300, 1e-300, dA)
        DA = sp_diag_scale(A, d_left=1.0 / dA)
        x = np.sin(np.arange(A.shape[0], dtype=np.float64))
        lam = 2.0
        for it in range(8):
            x = DA.matvec(x)
            nx = np.linalg.norm(x)
            if nx == 0:
                break
            lam = nx if it == 7 else lam
            x /= nx
        Pm = sp_add(P0, sp_matmat(DA, P0), 1.0, -(omega / lam))
        Ac = rap(A, Pm)
        if (not np.isfinite(Ac.data).all()) or Ac.diagonal().min() <= 0:
            Pm = P0
            Ac = rap(A, Pm)
        l1 = l1_row_sums(A)
        levels.append(
            dict(
                A=A, P=Pm, R=sp_transpose(Pm), agg=agg, k=B.shape[1],
                l1=l1, lam1=_lam1(A, l1),
            )
        )
        A, B = Ac, Bc
        if A.shape[0] <= coarse_size:
            break
    l1c = l1_row_sums(A)
    coarse = dict(A=A, l1=l1c, lam1=_lam1(A, l1c))
    return levels, coarse


def build_vcycle(static, level_args, pinv_args, l2g_args):
    """Construct the sharded V-cycle closure INSIDE a shard_map program.

    ``static``: host metadata from :meth:`HaloAMGSolver.vcycle_static`;
    ``level_args``: the (already rank-sliced) per-level device arrays from
    :meth:`HaloAMGSolver.level_args`; ``pinv_args``/``l2g_args``: coarse
    solve data ((pinv,), (loc2glob,)) or empty tuples for the Chebyshev
    coarse fallback.

    Returns ``(vcycle, fns)`` where ``vcycle(b)`` maps an owned-only
    level-0 local vector to the V(pre,post) correction, and ``fns[li] =
    (matvec, exchange, smooth)`` per level (level 0's matvec is the sharded
    fine operator — reusable as the Krylov op).
    """
    L = static["L"]
    lay = static["lay"]
    lam1 = static["lam1"]
    pre, post = static["pre"], static["post"]
    nc = static["nc"]
    use_pinv = static["use_pinv"]

    def level_fns(li, args):
        a_rows, a_cols, a_vals, inv_l1, sends, recvs = args
        Lp = lay[li]["Lp"]
        n_own = lay[li]["n_own_max"]
        perms = lay[li]["perms"]
        lam = lam1[li]

        def exchange(x):
            for si in range(len(perms)):
                buf = x[sends[si]]
                rec = jax.lax.ppermute(buf, AXIS, list(perms[si]))
                x = x.at[recvs[si]].set(rec)
            return x

        def matvec(x):
            xg = exchange(x)
            prod = a_vals * xg[a_cols]
            y = jax.ops.segment_sum(
                prod, a_rows, num_segments=n_own + 1
            )[:n_own]
            return jnp.zeros(Lp, dtype=x.dtype).at[:n_own].set(y)

        def smooth(b, degree):
            # l1-Chebyshev, x0 = 0, interval [lam/4, lam] (the serial
            # AMG's smoother; owned-only in/out — no inner products)
            lmin = 0.25 * lam
            theta_ = 0.5 * (lam + lmin)
            delta = 0.5 * (lam - lmin)
            sigma = theta_ / delta
            r = b * inv_l1
            d = r / theta_
            x = d
            rho = 1.0 / sigma
            for _ in range(degree - 1):
                r = r - matvec(d) * inv_l1
                rho_new = 1.0 / (2.0 * sigma - rho)
                d = rho_new * rho * d + (2.0 * rho_new / delta) * r
                x = x + d
                rho = rho_new
            return x

        return matvec, exchange, smooth

    def rect_apply(rows, cols, vals, x, n_row_max, Lp_out):
        prod = vals * x[cols]
        y = jax.ops.segment_sum(
            prod, rows, num_segments=n_row_max + 1
        )[:n_row_max]
        return jnp.zeros(Lp_out, dtype=x.dtype).at[:n_row_max].set(y)

    fns = [level_fns(li, level_args[li][:6]) for li in range(L + 1)]

    def coarse_solve(bL):
        if use_pinv:
            (pinv,) = pinv_args
            (loc2glob,) = l2g_args
            n_ownL = lay[L]["n_own_max"]
            g = (
                jnp.zeros(nc + 1, dtype=bL.dtype)
                .at[loc2glob[:n_ownL]]
                .add(bL[:n_ownL])
            )
            g = jax.lax.psum(g, AXIS)
            y = pinv.astype(bL.dtype) @ g[:nc]
            ypad = jnp.concatenate([y, jnp.zeros(1, dtype=y.dtype)])
            # replicated solution fills owned AND ghost slots directly
            return ypad[loc2glob]
        _, _, smoothL = fns[L]
        return smoothL(bL, 12)

    def vcycle_at(li, bl):
        if li == L:
            return coarse_solve(bl)
        matvec, exchange, smooth = fns[li]
        x = smooth(bl, pre + 1)
        r = bl - matvec(x)
        rg = exchange(r)
        r_rows, r_cols, r_vals, p_rows, p_cols, p_vals = (
            level_args[li][6:12]
        )
        rc = rect_apply(
            r_rows, r_cols, r_vals, rg,
            lay[li + 1]["n_own_max"], lay[li + 1]["Lp"],
        )
        ec = vcycle_at(li + 1, rc)
        _, exch_c, _ = fns[li + 1]
        ecg = exch_c(ec)
        x = x + rect_apply(
            p_rows, p_cols, p_vals, ecg,
            lay[li]["n_own_max"], lay[li]["Lp"],
        )
        x = x + smooth(bl - matvec(x), post + 1)
        return x

    return (lambda b: vcycle_at(0, b)), fns


class HaloAMGSolver:
    """Distributed AMG-preconditioned Krylov solve for assembled systems.

    ``A``: host CSR (scipy or framework ``CSRMatrix``) of the FULL system;
    ``dof_coords``: (ndof, gdim) coordinates (per-dof, components repeated)
    used for partitioning; ``free_mask``: 0/1 per dof — the hierarchy and
    the sharded solve run on the free submatrix (constrained dofs carry
    their Dirichlet values exactly, applied on host); ``nullspace``: near-
    nullspace block over the FULL dof set (e.g. rigid-body modes).

    Reference analog: AMG-preconditioned Krylov under MPI for any mesh
    (``FenicsSolver/SolverBase.py:643-672``).
    """

    def __init__(self, A, dof_coords, free_mask, nullspace=None,
                 devices=None, grid=None, theta=0.08, coarse_size=600,
                 max_levels=10, presmooth=2, postsmooth=2,
                 coarse_dense_limit=6000, owner=None):
        from ..la.sparse_algebra import csr_rows, from_scipy

        if hasattr(A, "to_scipy"):
            A = A.to_scipy()
        A = A.tocsr()
        self._A_full = A
        self.ndof = A.shape[0]
        self.presmooth = presmooth
        self.postsmooth = postsmooth
        free = np.asarray(free_mask) > 0.5
        self._free = free
        nfree = int(free.sum())

        # free submatrix as a COO filter (saved: Newton re-assemblies with
        # the same pattern refresh level-0 values through it)
        Ah = from_scipy(A)
        rows = csr_rows(Ah)
        keep = free[rows] & free[Ah.indices]
        self._keep_idx = np.nonzero(keep)[0]
        newid = np.cumsum(free) - 1
        from ..la.sparse_algebra import coo_to_csr

        Af = coo_to_csr(
            newid[rows[keep]], newid[Ah.indices[keep]], Ah.data[keep],
            (nfree, nfree), sum_duplicates=False,
        )

        coords_f = np.asarray(dof_coords, dtype=np.float64)[free]
        B = None
        if nullspace is not None:
            B = np.asarray(nullspace, dtype=np.float64)[free]
        else:
            B = np.ones((nfree, 1))

        devices = devices if devices is not None else jax.devices()
        nd = len(devices)
        self.n_dev = nd
        self.device_mesh = DeviceMesh(np.array(devices), (AXIS,))
        gdim = coords_f.shape[1]
        grid = grid or _factor_grid(nd, gdim)
        assert int(np.prod(grid)) == nd, (grid, nd)
        self._gc = np.stack(
            np.unravel_index(np.arange(nd), grid), axis=1
        )

        levels, coarse = build_sa_hierarchy(
            Af, B, theta=theta, max_levels=max_levels,
            coarse_size=coarse_size,
        )
        self._levels_host = levels
        self._coarse_host = coarse

        # ---- pass A: per-level partitions ---------------------------------
        # an explicit owner (over FREE dofs) aligns this hierarchy with an
        # enclosing solver's partition (the NS mixed saddle solve embeds
        # the momentum V-cycle and extracts/scatters rank-locally)
        owner0 = (
            np.asarray(owner, dtype=np.int32)
            if owner is not None
            else quantile_grid_partition(coords_f, grid)
        )
        assert owner0.shape[0] == nfree, (owner0.shape, nfree)
        self.owner0 = owner0
        owners = [owner0]
        for lv in levels:
            agg, k = lv["agg"], lv["k"]
            n_agg = lv["P"].shape[1] // k
            first = _first_members(agg, n_agg)
            owners.append(np.repeat(owners[-1][first], k))

        # ---- pass B: per-level layouts, exchanges, local operators --------
        L = len(levels)
        self._nlev = L
        lay = []  # per level: dict(owned, ghosts, l2l, perms, sends, recvs,
        #                           n_own_max, Lp, own_mask)
        # ghost requirements pushed down from the finer level's P
        pending_P_cols = [set() for _ in range(nd)]
        mats = [levels[li]["A"] for li in range(L)] + [coarse["A"]]
        for li in range(L + 1):
            Al = mats[li]
            owner_l = owners[li]
            owned = _group_by_rank(owner_l, nd)
            ghosts = []
            for r in range(nd):
                need = set()
                take, _ = _row_take(Al.indptr, owned[r])
                need.update(Al.indices[take].tolist())
                if li < L:
                    # R rows owned at the COARSE side pull fine columns:
                    # find coarse dofs of level li+1 owned by r, slice R
                    Rl = levels[li]["R"]
                    oc = _group_by_rank(owners[li + 1], nd)[r]
                    taker, _ = _row_take(Rl.indptr, oc)
                    need.update(Rl.indices[taker].tolist())
                need.update(pending_P_cols[r])
                gh = np.setdiff1d(
                    np.fromiter(need, dtype=np.int64, count=len(need)),
                    owned[r],
                )
                ghosts.append(np.sort(gh))
            n_own_max = max((len(o) for o in owned), default=0)
            n_ghost_max = max((len(g) for g in ghosts), default=0)
            Lh = n_own_max + n_ghost_max
            Lp = Lh + 1
            l2l = [
                _LocalIndex(owned[r], ghosts[r], n_own_max, Lh)
                for r in range(nd)
            ]
            perms, sends, recvs = _build_exchange_rounds(
                owner_l, ghosts, l2l, self._gc, nd, Lh
            )
            own_mask = np.zeros((nd, Lp))
            for r in range(nd):
                own_mask[r, : len(owned[r])] = 1.0
            lay.append(
                dict(
                    owned=owned, ghosts=ghosts, l2l=l2l, perms=perms,
                    sends=tuple(sends), recvs=tuple(recvs),
                    n_own_max=n_own_max, Lp=Lp, own_mask=own_mask,
                )
            )
            # record what the NEXT level must expose as ghosts for P
            pending_P_cols = [set() for _ in range(nd)]
            if li < L:
                Pl = levels[li]["P"]
                for r in range(nd):
                    takep, _ = _row_take(Pl.indptr, owned[r])
                    pending_P_cols[r].update(Pl.indices[takep].tolist())
        self._lay = lay

        def local_coo(M, row_ids_per_rank, col_l2l, n_row_max, sacrificial_col):
            """Padded (nd, nnz_max) COO arrays of M's rows per rank, with
            LOCAL row ids (position in row_ids) and LOCAL col slots."""
            rows_l, cols_l, vals_l, takes = [], [], [], []
            for r in range(nd):
                ids = row_ids_per_rank[r]
                take, counts = _row_take(M.indptr, ids)
                takes.append(take)
                rows_l.append(
                    np.repeat(np.arange(len(ids), dtype=np.int64), counts)
                )
                cols_l.append(col_l2l[r](M.indices[take]))
                vals_l.append(M.data[take])
            nnz_max = max((len(v) for v in vals_l), default=0)
            nnz_max = max(nnz_max, 1)
            rows_p = np.full((nd, nnz_max), n_row_max, dtype=np.int32)
            cols_p = np.full((nd, nnz_max), sacrificial_col, dtype=np.int32)
            vals_p = np.zeros((nd, nnz_max))
            for r in range(nd):
                m = len(vals_l[r])
                rows_p[r, :m] = rows_l[r]
                cols_p[r, :m] = cols_l[r]
                vals_p[r, :m] = vals_l[r]
            return rows_p, cols_p, vals_p, takes

        dev = []  # per level: device-side dict
        for li in range(L + 1):
            Al = mats[li]
            ly = lay[li]
            a_rows, a_cols, a_vals, takes = local_coo(
                Al, ly["owned"], ly["l2l"], ly["n_own_max"], ly["Lp"] - 1
            )
            l1_full = (levels[li]["l1"] if li < L else coarse["l1"])
            inv_l1 = np.ones((nd, ly["Lp"]))
            for r in range(nd):
                ids = ly["owned"][r]
                inv_l1[r, : len(ids)] = 1.0 / l1_full[ids]
            d = dict(
                a_rows=a_rows, a_cols=a_cols, a_vals=a_vals,
                inv_l1=inv_l1,
                lam1=float(levels[li]["lam1"] if li < L else coarse["lam1"]),
                sends=ly["sends"], recvs=ly["recvs"],
            )
            if li == 0:
                self._take0 = takes  # for update_values
                self._a0_shape = a_vals.shape
            if li < L:
                # R: rows = next level's owned coarse, cols = this level
                r_rows, r_cols, r_vals, _ = local_coo(
                    levels[li]["R"], lay[li + 1]["owned"], ly["l2l"],
                    lay[li + 1]["n_own_max"], ly["Lp"] - 1,
                )
                # P: rows = this level's owned, cols = next level local
                p_rows, p_cols, p_vals, _ = local_coo(
                    levels[li]["P"], ly["owned"], lay[li + 1]["l2l"],
                    ly["n_own_max"], lay[li + 1]["Lp"] - 1,
                )
                d.update(
                    r_rows=r_rows, r_cols=r_cols, r_vals=r_vals,
                    p_rows=p_rows, p_cols=p_cols, p_vals=p_vals,
                )
            dev.append(d)
        self._dev_levels = dev

        # coarsest-level solve data
        nc = coarse["A"].shape[0]
        self.n_coarse = nc
        lyc = lay[L]
        if nc <= coarse_dense_limit:
            self._coarse_pinv = np.linalg.pinv(coarse["A"].toarray())
            # per-rank local slot -> global coarse id (owned AND ghosts:
            # the replicated solution fills every slot, no exchange needed)
            loc2glob = np.full((nd, lyc["Lp"]), nc, dtype=np.int32)
            for r in range(nd):
                ow, gh = lyc["owned"][r], lyc["ghosts"][r]
                loc2glob[r, : len(ow)] = ow
                loc2glob[
                    r, lyc["n_own_max"] : lyc["n_own_max"] + len(gh)
                ] = gh
            self._coarse_loc2glob = loc2glob
        else:
            self._coarse_pinv = None
            self._coarse_loc2glob = None
        self._own0 = lay[0]["own_mask"]
        self._compiled = {}
        self.operator_complexity = float(
            sum(m.nnz for m in mats) / max(mats[0].nnz, 1)
        )

    # ---- host <-> device redistribution (level 0 = free dofs) -----------
    def _scatter0(self, v_free):
        ly = self._lay[0]
        out = np.zeros((self.n_dev, ly["Lp"]), dtype=np.asarray(v_free).dtype)
        for r in range(self.n_dev):
            ids = ly["owned"][r]
            out[r, : len(ids)] = np.asarray(v_free)[ids]
        return out

    def _gather0(self, v_loc):
        ly = self._lay[0]
        out = np.zeros(
            int(self._free.sum()), dtype=np.asarray(v_loc).dtype
        )
        for r in range(self.n_dev):
            ids = ly["owned"][r]
            out[ids] = np.asarray(v_loc)[r, : len(ids)]
        return out

    def update_values(self, A):
        """Refresh the LEVEL-0 operator from a re-assembled matrix with the
        same pattern (Newton / transient refresh).  Coarse levels and the
        Chebyshev scalings stay frozen — the V-cycle is a preconditioner,
        only the fine operator must be exact."""
        if hasattr(A, "to_scipy"):
            A = A.to_scipy()
        A = A.tocsr()
        self._A_full = A
        data_f = np.asarray(A.data)[self._keep_idx]
        vals = np.zeros(self._a0_shape)
        for r in range(self.n_dev):
            t = self._take0[r]
            vals[r, : len(t)] = data_f[t]
        self._dev_levels[0]["a_vals"] = vals

    # ---- the sharded program ---------------------------------------------
    def vcycle_static(self):
        """Static (host) metadata needed to rebuild the V-cycle closure
        inside ANY shard_map program (e.g. the mixed NS saddle solve embeds
        the momentum-block V-cycle): per-level layout dims + exchange perms
        + Chebyshev data, plus coarse-solve mode."""
        return dict(
            L=self._nlev,
            lay=[
                dict(Lp=ly["Lp"], n_own_max=ly["n_own_max"],
                     perms=ly["perms"])
                for ly in self._lay
            ],
            lam1=[d["lam1"] for d in self._dev_levels],
            pre=self.presmooth,
            post=self.postsmooth,
            nc=self.n_coarse,
            use_pinv=self._coarse_pinv is not None,
        )

    def _build(self, method, tol, maxiter, restart, dtype):
        from ..la import krylov as _krylov

        mesh = self.device_mesh
        L = self._nlev
        static = self.vcycle_static()

        def run(level_args, own0, b, pinv_args, l2g_args):
            vcycle, fns = build_vcycle(
                static, level_args, pinv_args, l2g_args
            )
            matvec0, _, _ = fns[0]

            def M(r):
                return own0 * vcycle(r)

            def op(x):
                return own0 * matvec0(x)

            def psum(v):
                return jax.lax.psum(v, AXIS)

            rhs = own0 * b
            if method == "cg":
                x, it, res = _krylov.cg(
                    op, rhs, M=M, tol=tol, maxiter=maxiter, psum=psum
                )
            elif method == "bicgstab":
                x, it, res = _krylov.bicgstab(
                    op, rhs, M=M, tol=tol, maxiter=maxiter, psum=psum
                )
            elif method == "gmres":
                x, it, res = _krylov.gmres(
                    op, rhs, M=M, tol=tol, restart=restart,
                    maxiter=max(maxiter // restart, 1), psum=psum,
                )
            else:
                x, it, res = _krylov.fgmres(
                    op, rhs, M=M, tol=tol, restart=restart,
                    maxiter=max(maxiter // restart, 1), psum=psum,
                )
            return x, jnp.asarray(it), jnp.asarray(res)

        # shard_map wrapper: build in/out specs matching the arg pytree
        def spec_like_sharded(tree):
            return jax.tree.map(lambda _: P(AXIS), tree)

        def wrap(level_args, own0, b, pinv_args, l2g_args):
            in_specs = (
                spec_like_sharded(level_args),
                P(AXIS),
                P(AXIS),
                jax.tree.map(lambda _: P(), pinv_args),
                spec_like_sharded(l2g_args),
            )

            @partial(
                shard_map,
                mesh=mesh,
                in_specs=in_specs,
                out_specs=(P(AXIS), P(), P()),
                check_vma=False,
            )
            def prog(level_args, own0, b, pinv_args, l2g_args):
                level_args = jax.tree.map(
                    lambda a: a[0], level_args
                )
                l2g_args = jax.tree.map(lambda a: a[0], l2g_args)
                own0 = own0[0]
                b = b[0]
                x, it, res = run(level_args, own0, b, pinv_args, l2g_args)
                return x[None], it, res

            return prog(level_args, own0, b, pinv_args, l2g_args)

        return wrap

    def level_args(self, dtype):
        L = self._nlev
        out = []
        asd = lambda a: jnp.asarray(a, dtype=dtype)
        for li in range(L + 1):
            d = self._dev_levels[li]
            args = [
                jnp.asarray(d["a_rows"]),
                jnp.asarray(d["a_cols"]),
                asd(d["a_vals"]),
                asd(d["inv_l1"]),
                tuple(jnp.asarray(s) for s in d["sends"]),
                tuple(jnp.asarray(r) for r in d["recvs"]),
            ]
            if li < L:
                args += [
                    jnp.asarray(d["r_rows"]),
                    jnp.asarray(d["r_cols"]),
                    asd(d["r_vals"]),
                    jnp.asarray(d["p_rows"]),
                    jnp.asarray(d["p_cols"]),
                    asd(d["p_vals"]),
                ]
            out.append(tuple(args))
        return tuple(out)

    def solve(self, b, u_bc=None, method="cg", tol=1e-10, maxiter=500,
              restart=80):
        """Solve A x = b with Dirichlet values ``u_bc`` on constrained dofs
        (entries where the ctor's ``free_mask`` is 0).  Returns
        (x_full, iterations, rel_residual)."""
        b = np.asarray(b)
        dtype = jnp.asarray(b).dtype
        free = self._free
        if u_bc is None:
            u_bc = np.zeros(self.ndof, dtype=b.dtype)
        ubc_c = np.where(free, 0.0, np.asarray(u_bc))
        rhs_f = (b - self._A_full @ ubc_c)[free]

        key = (method, float(tol), int(maxiter), int(restart), str(dtype))
        fn = self._compiled.get(key)
        if fn is None:
            fn = self._compiled[key] = jax.jit(
                self._build(method, tol, maxiter, restart, dtype)
            )
        if self._coarse_pinv is not None:
            pinv_args = (jnp.asarray(self._coarse_pinv, dtype=dtype),)
            l2g_args = (jnp.asarray(self._coarse_loc2glob),)
        else:
            pinv_args = ()
            l2g_args = ()
        x_loc, it, res = fn(
            self.level_args(dtype),
            jnp.asarray(self._own0, dtype=dtype),
            jnp.asarray(self._scatter0(rhs_f), dtype=dtype),
            pinv_args,
            l2g_args,
        )
        x_f = self._gather0(x_loc)
        x = ubc_c.astype(x_f.dtype).copy()
        x[free] = x_f
        return x, int(np.asarray(it).ravel()[0]), float(
            np.asarray(res).ravel()[0]
        )
