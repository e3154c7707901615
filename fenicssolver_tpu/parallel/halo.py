"""Halo-exchange sharded Krylov solve (ppermute ghosts, O(interface) comms).

The scalable half of the domain-decomposition story (SURVEY.md §5.7-5.8,
replacing dolfin/PETSc's MPI MatMult): dofs are partitioned over the device
mesh by a balanced coordinate-quantile grid, each device stores only its row
block (block-ELL, local column numbering) and a local vector slice
(owned + ghosts).  Every matvec refreshes ghost values with offset-grouped
``lax.ppermute`` exchanges — communication is O(interface), per-device
memory is ~ndof/n_dev + interface, unlike ``sharding.ShardedEllipticSolver``
which replicates the dof vector and psums full-length contributions.

Krylov dot products reduce owned-dof partials with a scalar ``psum``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import PartitionSpec as P

from ..la.block_ell import BC, BR, build_block_ell

AXIS = "dd"


def _factor_grid(n_dev, gdim):
    """Factor n_dev into gdim near-equal factors, largest first."""
    grid = [1] * gdim
    rem = n_dev
    ax = 0
    while rem > 1:
        # smallest prime factor
        f = next(p for p in range(2, rem + 1) if rem % p == 0)
        grid[ax % gdim] *= f
        rem //= f
        ax += 1
    return tuple(sorted(grid, reverse=True))


def quantile_grid_partition(coords, grid):
    """Owner rank per dof: balanced recursive coordinate-quantile grid.

    Splits dofs into equal-count slabs by x, each slab by y, etc., so every
    rank owns within +-1 of ndof/n_dev dofs (the SCOTCH-balance analog)."""
    n = coords.shape[0]
    owner = np.zeros(n, dtype=np.int32)

    def split(idx, axes_grid, base):
        if not axes_grid:
            owner[idx] = base
            return
        parts = axes_grid[0]
        if parts == 1:
            split(idx, axes_grid[1:], base)
            return
        ax = len(grid) - len(axes_grid)
        order = idx[np.argsort(coords[idx, ax], kind="stable")]
        stride = int(np.prod(axes_grid[1:]))
        cuts = np.linspace(0, len(order), parts + 1).astype(np.int64)
        for p in range(parts):
            split(order[cuts[p] : cuts[p + 1]], axes_grid[1:], base + p * stride)

    split(np.arange(n), list(grid), 0)
    return owner


class _LocalIndex:
    """Global-dof -> local-slot lookup for ONE rank: O(n_own + n_ghost)
    memory (sorted keys + searchsorted) instead of a dense ndof-length map.
    Misses resolve to the sacrificial dummy slot ``L`` (never read)."""

    def __init__(self, owned, ghosts, n_own_max, L):
        keys = np.concatenate([owned, ghosts]).astype(np.int64)
        vals = np.concatenate(
            [
                np.arange(len(owned), dtype=np.int64),
                n_own_max + np.arange(len(ghosts), dtype=np.int64),
            ]
        )
        order = np.argsort(keys, kind="stable")
        self._keys = keys[order]
        self._vals = vals[order]
        self.L = L

    def __call__(self, g):
        g = np.asarray(g, dtype=np.int64)
        if len(self._keys) == 0:
            return np.full(g.shape, self.L, dtype=np.int64)
        pos = np.clip(
            np.searchsorted(self._keys, g), 0, len(self._keys) - 1
        )
        hit = self._keys[pos] == g
        return np.where(hit, self._vals[pos], self.L)


def _group_by_rank(keys, nd, order_within=None):
    """Stable group of indices by rank id: returns list of index arrays,
    one per rank, in ascending original order — O(n log n), no per-rank
    scans."""
    order = np.argsort(keys, kind="stable")
    bounds = np.searchsorted(keys, np.arange(nd + 1), sorter=order)
    return [order[bounds[r] : bounds[r + 1]] for r in range(nd)]


def _build_exchange_rounds(owner, ghosts, l2l, gc, nd, L):
    """Offset-grouped ppermute rounds refreshing ghost slots from owners.

    ``l2l``: per-rank :class:`_LocalIndex` lookups (replaces the old dense
    (nd, ndof) map — setup memory is now O(ndof + interface)).
    Returns (perms, sends, recvs): per round, the (src, dst) pairs plus the
    per-rank padded local send/recv index buffers (padding points at the
    sacrificial dummy slot L, never read)."""
    rounds = {}
    for r in range(nd):
        for g_dof_owner in np.unique(owner[ghosts[r]]):
            off = tuple(gc[r] - gc[g_dof_owner])
            rounds.setdefault(off, []).append((int(g_dof_owner), r))
    perms, send_list, recv_list = [], [], []
    for off, pairs in sorted(rounds.items()):
        nbuf = 0
        per_rank_send = [np.zeros(0, np.int64)] * nd
        per_rank_recv = [np.zeros(0, np.int64)] * nd
        for s, r in pairs:
            shared = ghosts[r][owner[ghosts[r]] == s]  # sorted global ids
            per_rank_send[s] = l2l[s](shared)  # owner's local ids
            per_rank_recv[r] = l2l[r](shared)  # receiver's ghost slots
            nbuf = max(nbuf, len(shared))
        send = np.full((nd, nbuf), L, dtype=np.int32)  # dummy slot
        recv = np.full((nd, nbuf), L, dtype=np.int32)
        for rank in range(nd):
            send[rank, : len(per_rank_send[rank])] = per_rank_send[rank]
            recv[rank, : len(per_rank_recv[rank])] = per_rank_recv[rank]
        perms.append(tuple((s, r) for s, r in pairs))
        send_list.append(send)
        recv_list.append(recv)
    return perms, send_list, recv_list


def _row_take(indptr, ids):
    """nnz gather indices for rows ``ids`` IN ``ids`` ORDER (vectorized
    ragged ranges — works for arbitrarily permuted row lists, unlike the
    global-row-order _group_by_rank slices).  Returns (take, counts)."""
    indptr = np.asarray(indptr, dtype=np.int64)
    ids = np.asarray(ids, dtype=np.int64)
    counts = indptr[ids + 1] - indptr[ids]
    ptr = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(counts, out=ptr[1:])
    take = (
        np.repeat(indptr[ids], counts)
        + np.arange(int(ptr[-1]), dtype=np.int64)
        - np.repeat(ptr[:-1], counts)
    )
    return take, counts


def _local_tile_count(cols_local, counts, n_own_max, Lp):
    """K (max distinct 128-col blocks per 8-row block) of one rank's local
    row block — the block-ELL memory/HBM-traffic factor."""
    from ..la.block_ell import BC as _BC, BR as _BR

    rows = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    key = (rows // _BR) * ((Lp // _BC) + 2) + cols_local // _BC
    uniq = np.unique(key)
    if not uniq.size:
        return 0
    rb = uniq // ((Lp // _BC) + 2)
    return int(np.bincount(rb).max())


def _reorder_rank_local(A, ids, gh, n_own_max, Lp):
    """Pick-best local ordering for one rank (ROADMAP item 4: block-ELL
    fill is the halo solvers' device-memory limiter).

    Candidate: RCM over the rank's owned-owned adjacency (via
    ``la.sparse_algebra.bandwidth_ordering``, pure numpy) + ghosts
    clustered by the mean local row they couple to.  Kept only when it
    REDUCES the rank's tile count K — grid-ordered meshes stay on the
    natural order (measured: RCM regresses Kuhn-tet meshes 5->7 while
    fixing Delaunay meshes 21->8)."""
    from ..la.sparse_algebra import bandwidth_ordering

    def cols_local_of(ids_o, gh_o):
        keys = np.concatenate([ids_o, gh_o])
        vals = np.concatenate([
            np.arange(len(ids_o), dtype=np.int64),
            n_own_max + np.arange(len(gh_o), dtype=np.int64),
        ])
        order = np.argsort(keys, kind="stable")
        take, counts = _row_take(A.indptr, ids_o)
        cols = A.indices[take].astype(np.int64)
        pos = np.clip(np.searchsorted(keys[order], cols), 0, len(keys) - 1)
        return vals[order][pos], counts  # every col is owned or ghost

    if len(ids) == 0:
        return ids, gh
    cols0, counts0 = cols_local_of(ids, gh)
    K0 = _local_tile_count(cols0, counts0, n_own_max, Lp)
    if K0 <= 8:
        # already near the per-row-nnz lower bound (lattice-ordered
        # meshes land at K ~ 5-9): the RCM candidate cannot pay for its
        # own setup cost, skip it
        return ids, gh

    S = A[ids][:, ids].tocsr()  # owned-owned adjacency (host scipy slice)
    perm, _ = bandwidth_ordering(S.indptr, S.indices, len(ids))
    if perm is None:
        return ids, gh
    ids2 = ids[perm]
    if len(gh):
        # cluster ghosts by the mean (permuted) owned row touching them
        take, counts = _row_take(A.indptr, ids2)
        cols = A.indices[take].astype(np.int64)
        rows_loc = np.repeat(np.arange(len(ids2), dtype=np.int64), counts)
        order = np.argsort(gh, kind="stable")
        pos = np.clip(np.searchsorted(gh[order], cols), 0, len(gh) - 1)
        isg = gh[order][pos] == cols
        gidx = order[pos[isg]]
        sums = np.bincount(gidx, weights=rows_loc[isg], minlength=len(gh))
        cnts = np.maximum(np.bincount(gidx, minlength=len(gh)), 1)
        gh2 = gh[np.argsort(sums / cnts, kind="stable")]
    else:
        gh2 = gh
    cols1, counts1 = cols_local_of(ids2, gh2)
    K1 = _local_tile_count(cols1, counts1, n_own_max, Lp)
    return (ids2, gh2) if K1 < K0 else (ids, gh)


class HaloShardedSolver:
    """Distributed CG for an assembled SPD system with Dirichlet masking."""

    def __init__(self, A, dof_coords, devices=None, grid=None):
        """``A``: scipy CSR (or framework CSRMatrix) assembled on host;
        ``dof_coords``: (ndof, gdim) coordinates used for partitioning."""
        if hasattr(A, "to_scipy"):
            A = A.to_scipy()
        A = A.tocsr()
        devices = devices if devices is not None else jax.devices()
        nd = len(devices)
        self.n_dev = nd
        self.device_mesh = DeviceMesh(np.array(devices), (AXIS,))
        ndof = A.shape[0]
        self.ndof = ndof
        coords = np.asarray(dof_coords, dtype=np.float64)
        gdim = coords.shape[1]
        grid = grid or _factor_grid(nd, gdim)
        assert int(np.prod(grid)) == nd, (grid, nd)
        self.grid = grid
        owner = quantile_grid_partition(coords, grid)
        self._owner = owner  # dof -> owning rank (momentum-AMG alignment)
        gc = np.stack(np.unravel_index(np.arange(nd), grid), axis=1)  # (nd, gdim)

        # O(ndof log) grouping, no per-rank full scans (VERDICT r2 item 6)
        owned = _group_by_rank(owner, nd)
        n_own_max = max(len(o) for o in owned)

        # per-rank ghost sets (columns of owned rows not owned locally);
        # the rank's nnz slice comes from ONE stable sort of the per-entry
        # row owners (CSR order is preserved within each rank)
        rows_of_nnz = np.repeat(
            np.arange(ndof, dtype=np.int64), np.diff(A.indptr)
        )
        owner_nnz = owner[rows_of_nnz]
        takes = _group_by_rank(owner_nnz, nd)
        ghosts = []
        for r in range(nd):
            cols = np.unique(A.indices[takes[r]])
            ghosts.append(np.setdiff1d(cols, owned[r], assume_unique=False))
        n_ghost_max = max(len(g) for g in ghosts)
        # local layout: [owned (pad to n_own_max) | ghosts (pad) | 1 dummy]
        L = n_own_max + n_ghost_max
        self.Lp = L + 1
        self.n_own_max = n_own_max
        # per-rank pick-best local ordering: shrinks the block-ELL tile
        # count K (the bell format's ~100x fill is the device-memory
        # limiter of this solver, ROADMAP item 4); local slot ids are
        # DEFINED by position in owned[r]/ghosts[r], so reordering these
        # arrays is transparent to l2l/exchange/scatter
        for r in range(nd):
            owned[r], ghosts[r] = _reorder_rank_local(
                A, owned[r], ghosts[r], n_own_max, self.Lp
            )

        # global -> local per rank: O(n_own + n_ghost) sorted lookups, NOT
        # a dense (nd, ndof) map
        l2l = [
            _LocalIndex(owned[r], ghosts[r], n_own_max, L) for r in range(nd)
        ]

        # per-rank local row blocks in block-ELL (uniform K, nrb)
        tiles_list, cb_list = [], []
        K_max = 0
        nrb = (n_own_max + BR - 1) // BR
        ell_parts = []
        takes = []  # rebuilt in (possibly reordered) owned order
        for r in range(nd):
            ids = owned[r]
            if len(ids):
                take, counts = _row_take(A.indptr, ids)
            else:
                take = counts = np.zeros(0, np.int64)
            takes.append(take)
            indptr_r = np.zeros(n_own_max + 1, dtype=np.int64)
            np.cumsum(counts, out=indptr_r[1 : len(ids) + 1])
            indptr_r[len(ids) + 1 :] = indptr_r[len(ids)]
            cols_local = l2l[r](A.indices[take]).astype(np.int32)
            data_r = A.data[take]
            K_r, nrb_r, cb_r, pos_r = build_block_ell(
                indptr_r, cols_local, n_own_max, ncols=self.Lp
            )
            ell_parts.append((K_r, nrb_r, cb_r, pos_r, data_r))
            K_max = max(K_max, K_r)
        for K_r, nrb_r, cb_r, pos_r, data_r in ell_parts:
            tiles = np.zeros(K_max * nrb * BR * BC, dtype=np.float64)
            np.add.at(tiles, pos_r, data_r)
            tiles_list.append(tiles.reshape(K_max, nrb, BR, BC))
            cb = np.zeros((K_max, nrb), dtype=np.int32)
            cb[:K_r] = cb_r
            cb_list.append(cb)
        self.K, self.nrb = K_max, nrb

        # exchange rounds: group (owner -> ghost-holder) pairs by grid offset
        self.perms, send_list, recv_list = _build_exchange_rounds(
            owner, ghosts, l2l, gc, nd, L
        )

        self._owned = owned
        self._ghosts = ghosts
        self._l2l = l2l
        self._local_of = [
            np.concatenate([owned[r], ghosts[r]]) for r in range(nd)
        ]
        own_mask = np.zeros((nd, self.Lp), dtype=np.float64)
        for r in range(nd):
            own_mask[r, : len(owned[r])] = 1.0
        self._dev = dict(
            tiles=np.stack(tiles_list),
            col_blocks=np.stack(cb_list),
            own_mask=own_mask,
            sends=tuple(send_list),
            recvs=tuple(recv_list),
        )
        # kept for update_values (same pattern, new data — Newton loops)
        self._takes = takes
        self._tile_pos = [p for (_, _, _, p, _) in ell_parts]
        self._compiled = None

    def update_values(self, A):
        """Refill the block-ELL tiles from a re-assembled matrix with the
        SAME sparsity pattern (Newton/transient operator refresh); all
        compiled programs and exchange structures are reused."""
        if hasattr(A, "to_scipy"):
            A = A.to_scipy()
        A = A.tocsr()
        tiles = self._dev["tiles"]
        tiles[:] = 0.0
        flat = tiles.reshape(self.n_dev, -1)
        for r in range(self.n_dev):
            np.add.at(flat[r], self._tile_pos[r], A.data[self._takes[r]])

    # -- host <-> device vector redistribution --------------------------------
    def scatter_local(self, v_global):
        """Global (ndof,) -> per-device local (nd, Lp) with ghosts filled.

        Layout per rank: owned at [0, n_own_r), ghosts at
        [n_own_max, n_own_max + n_ghost_r), matching the g2l map."""
        v = np.asarray(v_global)
        out = np.zeros((self.n_dev, self.Lp), dtype=v.dtype)
        for r in range(self.n_dev):
            ow, gh = self._owned[r], self._ghosts[r]
            out[r, : len(ow)] = v[ow]
            out[r, self.n_own_max : self.n_own_max + len(gh)] = v[gh]
        return out

    def gather_global(self, v_local):
        v_local = np.asarray(v_local)
        out = np.zeros(self.ndof, dtype=v_local.dtype)
        for r in range(self.n_dev):
            ids = self._owned[r]
            out[ids] = v_local[r, : len(ids)]
        return out

    # -- device program --------------------------------------------------------
    def _build(self, tol, maxiter, dtype):
        mesh = self.device_mesh
        Lp, n_own_max = self.Lp, self.n_own_max
        K, nrb = self.K, self.nrb
        perms = self.perms
        ncb = (Lp + BC - 1) // BC

        nsr = len(self._dev["sends"])
        in_specs = (
            P(AXIS),  # tiles
            P(AXIS),  # col_blocks
            P(AXIS),  # own_mask
            tuple(P(AXIS) for _ in range(nsr)),  # sends
            tuple(P(AXIS) for _ in range(nsr)),  # recvs
            P(AXIS),  # b_loc
            P(AXIS),  # free_loc
            P(AXIS),  # ubc_loc
        )

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=(P(AXIS), P()),
            check_vma=False,
        )
        def pcg(tiles, col_blocks, own_mask, sends, recvs, b, free, ubc):
            tiles = tiles[0]
            col_blocks = col_blocks[0]
            own_mask = own_mask[0]
            sends = tuple(s[0] for s in sends)
            recvs = tuple(r[0] for r in recvs)
            b = b[0]
            free = free[0]
            ubc = ubc[0]

            def exchange(x):
                # refresh ghost slots from their owners; padded entries point
                # at the sacrificial dummy slot (index Lp-1, never read)
                for si in range(len(perms)):
                    buf = x[sends[si]]
                    rec = jax.lax.ppermute(buf, AXIS, list(perms[si]))
                    x = x.at[recvs[si]].set(rec)
                return x

            def spmv_own(x):
                xp = jnp.zeros(ncb * BC, dtype=x.dtype).at[:Lp].set(x)
                x2 = xp.reshape(ncb, BC)

                def slot(kk, y):
                    xb = x2[col_blocks[kk]]
                    return y + jnp.einsum("rij,rj->ri", tiles[kk], xb)

                y = jax.lax.fori_loop(
                    0, K, slot, jnp.zeros((nrb, BR), x.dtype)
                )
                return y.reshape(-1)[:n_own_max]

            def matvec_raw(x):
                y = jnp.zeros(Lp, dtype=x.dtype).at[:n_own_max].set(spmv_own(x))
                return exchange(y)

            def matvec(x):
                return free * matvec_raw(free * x) + (1 - free) * x

            def dot(a, c):
                return jax.lax.psum(jnp.sum(own_mask * a * c), AXIS)

            diag = _bell_diagonal(tiles, col_blocks, n_own_max)
            diag = jnp.zeros(Lp, dtype=b.dtype).at[:n_own_max].set(diag)
            diag = exchange(diag)
            diag = free * diag + (1 - free)
            inv_d = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 1.0)

            rhs = free * (b - matvec_raw(ubc)) + (1 - free) * ubc
            x0 = jnp.zeros_like(b)
            r0 = rhs - matvec(x0)
            z0 = inv_d * r0
            bnorm = jnp.sqrt(dot(rhs, rhs))
            target = tol * jnp.maximum(bnorm, 1e-30)

            def cond(st):
                x, r, z, p, rz, i = st
                return (jnp.sqrt(dot(r, r)) > target) & (i < maxiter)

            def body(st):
                x, r, z, p, rz, i = st
                Ap = matvec(p)
                alpha = rz / dot(p, Ap)
                x = x + alpha * p
                r = r - alpha * Ap
                z = inv_d * r
                rz_new = dot(r, z)
                p = z + (rz_new / rz) * p
                return (x, r, z, p, rz_new, i + 1)

            x, r, *_, iters = jax.lax.while_loop(
                cond, body, (x0, r0, z0, z0, dot(r0, z0), jnp.array(0))
            )
            return x[None], jnp.asarray(iters)

        return pcg

    def solve(self, b, free_mask, u_bc, tol=1e-10, maxiter=2000):
        dtype = jnp.asarray(b).dtype
        if self._compiled is None:
            self._compiled = jax.jit(self._build(tol, maxiter, dtype))
        d = self._dev
        pad0 = lambda a: jnp.asarray(a, dtype=dtype)
        b_loc = pad0(self.scatter_local(np.asarray(b)))
        # padding/dummy slots must be constrained (identity) rows
        free_np = self.scatter_local(np.asarray(free_mask))
        valid = np.zeros((self.n_dev, self.Lp), dtype=bool)
        for r in range(self.n_dev):
            valid[r, : len(self._owned[r])] = True
            valid[
                r,
                self.n_own_max : self.n_own_max + len(self._ghosts[r]),
            ] = True
        free_np[~valid] = 0.0
        free_loc = pad0(free_np)
        ubc_loc = pad0(self.scatter_local(np.asarray(u_bc)))
        x, iters = self._compiled(
            jnp.asarray(d["tiles"], dtype=dtype),
            jnp.asarray(d["col_blocks"]),
            jnp.asarray(d["own_mask"], dtype=dtype),
            tuple(jnp.asarray(s) for s in d["sends"]),
            tuple(jnp.asarray(r) for r in d["recvs"]),
            b_loc,
            free_loc,
            ubc_loc,
        )
        return self.gather_global(x), int(np.asarray(iters).ravel()[0])

    # -- general (non-SPD) distributed Krylov ------------------------------
    def _build_krylov(self, method, tol, maxiter, restart, dtype,
                      M_build=None, extra_specs=None):
        """Distributed BiCGStab / GMRES / FGMRES in the halo layout.

        Reuses the serial ``la/krylov`` algorithms verbatim inside the
        shard_map program: vectors follow an OWNED-ONLY convention (ghost
        and padding slots held at zero, refreshed transiently inside the
        operator), which makes plain ``vdot`` + scalar ``psum`` the exact
        global inner product.  This is what lets ``distributed: true``
        cover saddle-point / nonsymmetric systems (VERDICT r2 item 3 —
        the reference gets full-solver MPI from PETSc, SolverBase.py:102).

        ``M_build``: optional custom-preconditioner hook replacing the
        Jacobi diagonal — called INSIDE the shard_map program as
        ``M_build(extra_local, helpers) -> M`` where ``extra_local`` is the
        rank-sliced pytree of extra device args and ``helpers`` exposes the
        program's own ``exchange`` / ``spmv_own`` / ``own`` / ``free``
        closures (e.g. the NS fieldsplit preconditioner embeds the sharded
        momentum AMG V-cycle and uses the mixed operator for the
        triangular pressure-to-momentum coupling term).  ``extra_specs``:
        matching pytree of PartitionSpecs for the extra args.
        """
        from ..la import krylov as _krylov

        mesh = self.device_mesh
        Lp, n_own_max = self.Lp, self.n_own_max
        K, nrb = self.K, self.nrb
        perms = self.perms
        ncb = (Lp + BC - 1) // BC
        nsr = len(self._dev["sends"])
        in_specs = (
            P(AXIS),  # tiles
            P(AXIS),  # col_blocks
            P(AXIS),  # own_mask
            tuple(P(AXIS) for _ in range(nsr)),  # sends
            tuple(P(AXIS) for _ in range(nsr)),  # recvs
            P(AXIS),  # b_loc
            P(AXIS),  # free_loc
            P(AXIS),  # ubc_loc (ghost slots filled from host)
            P(AXIS),  # prec diag (owned slots; 1 elsewhere)
            extra_specs if extra_specs is not None else (),
        )

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=(P(AXIS), P(), P()),
            check_vma=False,
        )
        def solve_k(tiles, col_blocks, own_mask, sends, recvs, b, free,
                    ubc, pd, extra):
            tiles = tiles[0]
            col_blocks = col_blocks[0]
            own = own_mask[0]
            sends = tuple(s[0] for s in sends)
            recvs = tuple(r[0] for r in recvs)
            b = b[0]
            free = free[0]
            ubc = ubc[0]
            pd = pd[0]
            if extra_specs is not None:
                # extra is a FLAT tuple of arrays with a matching flat
                # tuple of specs: rank-slice only the sharded leaves
                # (replicated P() leaves arrive unsliced)
                extra = tuple(
                    a[0] if s == P(AXIS) else a
                    for a, s in zip(extra, extra_specs)
                )

            def exchange(x):
                for si in range(len(perms)):
                    buf = x[sends[si]]
                    rec = jax.lax.ppermute(buf, AXIS, list(perms[si]))
                    x = x.at[recvs[si]].set(rec)
                return x

            def spmv_own(x):
                xp = jnp.zeros(ncb * BC, dtype=x.dtype).at[:Lp].set(x)
                x2 = xp.reshape(ncb, BC)

                def slot(kk, y):
                    xb = x2[col_blocks[kk]]
                    return y + jnp.einsum("rij,rj->ri", tiles[kk], xb)

                y = jax.lax.fori_loop(
                    0, K, slot, jnp.zeros((nrb, BR), x.dtype)
                )
                return jnp.zeros(Lp, dtype=x.dtype).at[:n_own_max].set(
                    y.reshape(-1)[:n_own_max]
                )

            def op(x):
                # x owned-only -> refresh ghosts of the masked input, local
                # SpMV, mask the result back to owned slots
                xg = exchange(free * x)
                y = spmv_own(xg)
                return own * (free * y + (1 - free) * x)

            inv_pd = jnp.where(jnp.abs(pd) > 1e-30, 1.0 / pd, 1.0)

            if M_build is not None:
                M = M_build(
                    extra,
                    dict(
                        exchange=exchange, spmv_own=spmv_own, own=own,
                        free=free, inv_pd=inv_pd,
                    ),
                )
            else:
                def M(r):
                    return own * (inv_pd * r)

            def psum(v):
                return jax.lax.psum(v, AXIS)

            # rhs in owned-only form (ubc arrives ghost-filled from host)
            rhs = own * (free * (b - spmv_own(ubc)) + (1 - free) * ubc)
            if method == "bicgstab":
                x, it, res = _krylov.bicgstab(
                    op, rhs, M=M, tol=tol, maxiter=maxiter, psum=psum
                )
            elif method == "gmres":
                x, it, res = _krylov.gmres(
                    op, rhs, M=M, tol=tol, restart=restart,
                    maxiter=max(maxiter // restart, 1), psum=psum,
                )
            else:  # fgmres
                x, it, res = _krylov.fgmres(
                    op, rhs, M=M, tol=tol, restart=restart,
                    maxiter=max(maxiter // restart, 1), psum=psum,
                )
            return x[None], jnp.asarray(it), jnp.asarray(res)

        return solve_k

    def solve_krylov(self, b, free_mask, u_bc, method="bicgstab",
                     prec_diag=None, tol=1e-8, maxiter=2000, restart=100,
                     M_build=None, extra_args=None, extra_specs=None,
                     prec_key=None):
        """Distributed non-SPD solve; ``prec_diag`` optionally overrides
        the Jacobi diagonal (e.g. momentum diag + scaled pressure lumped
        mass for saddle points); ``M_build``/``extra_args``/``extra_specs``
        inject a custom preconditioner built inside the program (see
        ``_build_krylov``; ``prec_key`` must change when the M_build
        closure's STRUCTURE changes so the compile cache misses).
        Returns (x_global, iterations, rel_residual)."""
        dtype = jnp.asarray(b).dtype
        key = (method, float(tol), int(maxiter), int(restart), str(dtype),
               prec_key if M_build is not None else None)
        cache = getattr(self, "_krylov_compiled", None)
        if cache is None:
            cache = self._krylov_compiled = {}
        if key not in cache:
            cache[key] = jax.jit(
                self._build_krylov(
                    method, tol, maxiter, restart, dtype,
                    M_build=M_build, extra_specs=extra_specs,
                )
            )
        d = self._dev
        asd = lambda a: jnp.asarray(a, dtype=dtype)
        b_loc = self.scatter_local(np.asarray(b))
        free_np = self.scatter_local(np.asarray(free_mask))
        valid = np.zeros((self.n_dev, self.Lp), dtype=bool)
        for r in range(self.n_dev):
            valid[r, : len(self._owned[r])] = True
            valid[
                r, self.n_own_max : self.n_own_max + len(self._ghosts[r])
            ] = True
        free_np[~valid] = 0.0
        # owned-only convention: zero the ghost slots of b
        own_np = np.asarray(d["own_mask"])
        b_loc = b_loc * own_np
        if prec_diag is None:
            pd_np = np.ones((self.n_dev, self.Lp))
        else:
            pd_np = self.scatter_local(np.asarray(prec_diag)) * own_np
            pd_np[own_np == 0.0] = 1.0
        x, iters, res = cache[key](
            asd(d["tiles"]),
            jnp.asarray(d["col_blocks"]),
            asd(d["own_mask"]),
            tuple(jnp.asarray(s) for s in d["sends"]),
            tuple(jnp.asarray(r) for r in d["recvs"]),
            asd(b_loc),
            asd(free_np),
            asd(self.scatter_local(np.asarray(u_bc))),
            asd(pd_np),
            extra_args if extra_args is not None else (),
        )
        return (
            self.gather_global(x),
            int(np.asarray(iters).ravel()[0]),
            float(np.asarray(res).ravel()[0]),
        )


class HaloElementSolver:
    """Element-level sharded ASSEMBLY + halo-exchange CG.

    Completes the distributed story past :class:`HaloShardedSolver` (which
    consumes a HOST-assembled global matrix): here each device receives
    every element (cell or boundary-facet batch entry) that touches one of
    its owned dofs — ghost-cell replication, so interface elements are
    re-evaluated by every neighbouring rank and assembly needs NO
    communication — evaluates element matrices/vectors ON DEVICE with the
    given kernels, scatter-adds the rows it owns into its local block-ELL
    tiles, and runs the masked-Dirichlet PCG with offset-grouped
    ``ppermute`` ghost refresh and psum dot products.  Assembly + solve is
    ONE device dispatch; per-device memory and compute are ~1/n_dev.

    ``batches``: list of ``(dofmap, Ae_fn, be_fn, elem_data)`` where
    ``dofmap`` is (ne, k) global dof ids, ``Ae_fn(data_slice) -> (k, k)``
    and ``be_fn(data_slice) -> (k,)`` are per-element kernels (vmapped on
    device), and ``elem_data`` is a pytree with leading axis ne.  Padded
    elements get zero-filled data — kernels must map zero geometry to zero
    contributions (true for detJ/detF-weighted FEM kernels).

    Replaces the reference's MPI rank-local dolfin assembly + PETSc MatMult
    halo (SURVEY.md §2.3, §5.7-5.8; ``SolverBase.py:102-118``)."""

    def __init__(self, batches, dof_coords, ndof, devices=None, grid=None):
        devices = devices if devices is not None else jax.devices()
        nd = len(devices)
        self.n_dev = nd
        self.device_mesh = DeviceMesh(np.array(devices), (AXIS,))
        self.ndof = ndof
        coords = np.asarray(dof_coords, dtype=np.float64)
        gdim = coords.shape[1]
        grid = grid or _factor_grid(nd, gdim)
        assert int(np.prod(grid)) == nd, (grid, nd)
        owner = quantile_grid_partition(coords, grid)
        gc = np.stack(np.unravel_index(np.arange(nd), grid), axis=1)

        owned = _group_by_rank(owner, nd)  # O(ndof log), no per-rank scans
        n_own_max = max(len(o) for o in owned)

        # per-rank element sets: every element touching an owned dof.
        # One sorted unique over (rank, element) pairs per batch replaces
        # the old nd full passes over the element list (VERDICT r2 item 6)
        dofmaps = [np.asarray(b[0], dtype=np.int64) for b in batches]
        sel = []  # sel[bi][r] = element ids of batch bi on rank r
        for dm in dofmaps:
            ne = dm.shape[0]
            eo = owner[dm].astype(np.int64)  # (ne, k) owner per element dof
            pair_keys = np.unique(
                eo * ne + np.arange(ne, dtype=np.int64)[:, None]
            )
            pr, pe = pair_keys // ne, pair_keys % ne
            bounds = np.searchsorted(pr, np.arange(nd + 1))
            sel.append([pe[bounds[r] : bounds[r + 1]] for r in range(nd)])
        # ghosts: dofs referenced by local elements but not owned
        ghosts = []
        for r in range(nd):
            ref = np.unique(
                np.concatenate(
                    [dm[s[r]].ravel() for dm, s in zip(dofmaps, sel)]
                    + [owned[r]]
                )
            )
            ghosts.append(np.setdiff1d(ref, owned[r], assume_unique=False))
        n_ghost_max = max(len(g) for g in ghosts)
        L = n_own_max + n_ghost_max
        self.Lp = L + 1
        self.n_own_max = n_own_max

        # per-rank pick-best local ordering (see HaloShardedSolver): the
        # element path's local ids are DEFINED by position in
        # owned[r]/ghosts[r] and every key below goes through l2l, so
        # reordering the arrays transparently shrinks the block-ELL K;
        # the dof adjacency comes from the element maps themselves
        import scipy.sparse as _sp

        adj_r = np.concatenate(
            [np.repeat(dm, dm.shape[1], axis=1).ravel() for dm in dofmaps]
        )
        adj_c = np.concatenate(
            [np.tile(dm, (1, dm.shape[1])).ravel() for dm in dofmaps]
        )
        A_adj = _sp.csr_matrix(
            (np.ones(len(adj_r)), (adj_r, adj_c)), shape=(ndof, ndof)
        )
        for r in range(nd):
            owned[r], ghosts[r] = _reorder_rank_local(
                A_adj, owned[r], ghosts[r], n_own_max, self.Lp
            )

        # global -> local: per-rank O(local) sorted lookups, no (nd, ndof)
        l2l = [
            _LocalIndex(owned[r], ghosts[r], n_own_max, L) for r in range(nd)
        ]

        # local sparsity (owned rows x local cols) and uniform block-ELL
        K_max, nrb = 0, (n_own_max + BR - 1) // BR
        per_rank = []
        for r in range(nd):
            keys = []
            for dm, s in zip(dofmaps, sel):
                e = dm[s[r]]  # (ner, k)
                k = e.shape[1]
                lr = l2l[r](np.repeat(e, k, axis=1).ravel())
                lc = l2l[r](np.tile(e, (1, k)).ravel())
                ok = lr < len(owned[r])
                keys.append(np.where(ok, lr * self.Lp + lc, 0))
            all_keys = np.concatenate(
                keys
                + [np.arange(len(owned[r]), dtype=np.int64) * self.Lp
                   + np.arange(len(owned[r]))]
            )  # ensure diagonal slots exist (Dirichlet rows)
            # local CSR from row-major keys (np.unique sorts ascending ==
            # CSR order; discarded ghost-row entries were keyed 0 and get
            # re-pointed at the scratch slot below)
            uniq, inv = np.unique(all_keys, return_inverse=True)
            lr_u = (uniq // self.Lp).astype(np.int64)
            lc_u = (uniq % self.Lp).astype(np.int32)
            indptr_r = np.zeros(n_own_max + 1, dtype=np.int64)
            np.add.at(indptr_r[1:], lr_u, 1)
            np.cumsum(indptr_r, out=indptr_r)
            K_r, nrb_r, cb_r, pos_bell = build_block_ell(
                indptr_r, lc_u, n_own_max, ncols=self.Lp
            )
            per_rank.append((inv, pos_bell, cb_r, K_r))
            K_max = max(K_max, K_r)
        self.K, self.nrb = K_max, nrb
        ntile = K_max * nrb * BR * BC
        self._scratch = ntile  # discarded-entry slot (one past the end)

        # per-rank per-batch padded element arrays + entry->tile positions
        self._batches_dev = []
        ne_pad = [max(len(s[r]) for r in range(nd)) for s in sel]
        for bi, (dm, Ae_fn, be_fn, elem_data) in enumerate(batches):
            k = dm.shape[1]
            pos_all = np.full((nd, ne_pad[bi] * k * k), self._scratch,
                              dtype=np.int64)
            ldof_all = np.full((nd, ne_pad[bi], k), L, dtype=np.int32)
            data_all = []
            off = 0
            for r in range(nd):
                inv, pos_bell, cb_r, K_r = per_rank[r]
                ids = sel[bi][r]
                ner = len(ids)
                # recompute this batch's key slice offsets within all_keys
                # (batches were concatenated in order)
                start = sum(len(sel[bj][r]) * dofmaps[bj].shape[1] ** 2
                            for bj in range(bi))
                seg = inv[start : start + ner * k * k]
                e = dm[ids]
                lr = l2l[r](np.repeat(e, k, axis=1).ravel())
                ok = lr < len(owned[r])
                p = np.where(ok, pos_bell[seg], self._scratch)
                pos_all[r, : ner * k * k] = p
                le = l2l[r](e)
                ldof_all[r, :ner] = np.where(le < L, le, L).astype(np.int32)
                data_all.append(
                    jax.tree_util.tree_map(
                        lambda a: _pad_axis0(np.asarray(a)[ids], ne_pad[bi]),
                        elem_data,
                    )
                )
            data_stack = jax.tree_util.tree_map(
                lambda *xs: jnp.asarray(np.stack(xs)), *data_all
            )
            self._batches_dev.append(
                dict(
                    Ae_fn=Ae_fn,
                    be_fn=be_fn,
                    k=k,
                    pos=jnp.asarray(pos_all),
                    ldofs=jnp.asarray(ldof_all),
                    data=data_stack,
                )
            )

        cb_all = np.zeros((nd, K_max, nrb), dtype=np.int32)
        for r in range(nd):
            _, _, cb_r, K_r = per_rank[r]
            cb_all[r, :K_r] = cb_r
        own_mask = np.zeros((nd, self.Lp), dtype=np.float64)
        for r in range(nd):
            own_mask[r, : len(owned[r])] = 1.0
        perms, send_list, recv_list = _build_exchange_rounds(
            owner, ghosts, l2l, gc, nd, L
        )
        self.perms = perms
        self._owned, self._ghosts = owned, ghosts
        self._dev = dict(
            col_blocks=cb_all,
            own_mask=own_mask,
            sends=tuple(send_list),
            recvs=tuple(recv_list),
        )
        self._compiled = None

    def scatter_local(self, v_global):
        v = np.asarray(v_global)
        out = np.zeros((self.n_dev, self.Lp), dtype=v.dtype)
        for r in range(self.n_dev):
            ow, gh = self._owned[r], self._ghosts[r]
            out[r, : len(ow)] = v[ow]
            out[r, self.n_own_max : self.n_own_max + len(gh)] = v[gh]
        return out

    gather_global = HaloShardedSolver.gather_global

    def _build(self, tol, maxiter):
        mesh = self.device_mesh
        Lp, n_own_max = self.Lp, self.n_own_max
        K, nrb = self.K, self.nrb
        perms = self.perms
        ncb = (Lp + BC - 1) // BC
        ntile = K * nrb * BR * BC
        scratch = self._scratch
        nsr = len(self._dev["sends"])
        batches = self._batches_dev

        data_specs = tuple(
            jax.tree_util.tree_map(lambda _: P(AXIS), b["data"])
            for b in batches
        )
        in_specs = (
            P(AXIS),  # col_blocks
            P(AXIS),  # own_mask
            tuple(P(AXIS) for _ in range(nsr)),
            tuple(P(AXIS) for _ in range(nsr)),
            tuple(P(AXIS) for _ in batches),  # pos
            tuple(P(AXIS) for _ in batches),  # ldofs
            data_specs,
            P(AXIS),  # free_loc
            P(AXIS),  # ubc_loc
        )

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=(P(AXIS), P()),
            check_vma=False,
        )
        def assemble_pcg(col_blocks, own_mask, sends, recvs, poss, ldofss,
                         datas, free, ubc):
            col_blocks = col_blocks[0]
            own_mask = own_mask[0]
            sends = tuple(s[0] for s in sends)
            recvs = tuple(r[0] for r in recvs)
            free = free[0]
            ubc = ubc[0]

            # --- sharded assembly: local tiles + local rhs ----------------
            tiles_flat = jnp.zeros(ntile + 1, dtype=free.dtype)
            b = jnp.zeros(Lp, dtype=free.dtype)
            for bd, pos, ldofs, data in zip(batches, poss, ldofss, datas):
                data0 = jax.tree_util.tree_map(lambda a: a[0], data)
                Ae = jax.vmap(bd["Ae_fn"])(data0)  # (ne, k, k)
                be = jax.vmap(bd["be_fn"])(data0)  # (ne, k)
                tiles_flat = tiles_flat.at[pos[0]].add(Ae.reshape(-1))
                b = b.at[ldofs[0].reshape(-1)].add(be.reshape(-1))
            tiles = tiles_flat[:ntile].reshape(K, nrb, BR, BC)
            b = b.at[Lp - 1].set(0.0)

            def exchange(x):  # noqa: E306 - defined before first use below
                for si in range(len(perms)):
                    buf = x[sends[si]]
                    rec = jax.lax.ppermute(buf, AXIS, list(perms[si]))
                    x = x.at[recvs[si]].set(rec)
                return x

            def spmv_own(x):
                xp = jnp.zeros(ncb * BC, dtype=x.dtype).at[:Lp].set(x)
                x2 = xp.reshape(ncb, BC)

                def slot(kk, y):
                    xb = x2[col_blocks[kk]]
                    return y + jnp.einsum("rij,rj->ri", tiles[kk], xb)

                y = jax.lax.fori_loop(
                    0, K, slot, jnp.zeros((nrb, BR), x.dtype)
                )
                return y.reshape(-1)[:n_own_max]

            def matvec_raw(x):
                y = jnp.zeros(Lp, dtype=x.dtype).at[:n_own_max].set(
                    spmv_own(x)
                )
                return exchange(y)

            def matvec(x):
                return free * matvec_raw(free * x) + (1 - free) * x

            def dot(a, c):
                return jax.lax.psum(jnp.sum(own_mask * a * c), AXIS)

            diag = _bell_diagonal(tiles, col_blocks, n_own_max)
            diag = jnp.zeros(Lp, dtype=b.dtype).at[:n_own_max].set(diag)
            diag = exchange(diag)
            diag = free * diag + (1 - free)
            inv_d = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 1.0)

            # local b holds PARTIAL sums in ghost slots (only this rank's
            # elements contributed); owners have the complete rows —
            # refresh ghosts so every vector entering CG is consistent
            b = exchange(b)
            rhs = free * (b - matvec_raw(ubc)) + (1 - free) * ubc
            x0 = jnp.zeros_like(rhs)
            r0 = rhs - matvec(x0)
            z0 = inv_d * r0
            bnorm = jnp.sqrt(dot(rhs, rhs))
            target = tol * jnp.maximum(bnorm, 1e-30)

            def cond(st):
                x, r, z, p, rz, i = st
                return (jnp.sqrt(dot(r, r)) > target) & (i < maxiter)

            def body(st):
                x, r, z, p, rz, i = st
                Ap = matvec(p)
                alpha = rz / dot(p, Ap)
                x = x + alpha * p
                r = r - alpha * Ap
                z = inv_d * r
                rz_new = dot(r, z)
                p = z + (rz_new / rz) * p
                return (x, r, z, p, rz_new, i + 1)

            x, r, *_, iters = jax.lax.while_loop(
                cond, body, (x0, r0, z0, z0, dot(r0, z0), jnp.array(0))
            )
            return x[None], jnp.asarray(iters)

        return assemble_pcg

    def solve(self, free_mask, u_bc, tol=1e-10, maxiter=2000):
        """Assemble on-device (sharded) and CG-solve.  Returns (x, iters)."""
        dtype = jnp.asarray(free_mask).dtype
        if self._compiled is None:
            self._compiled = jax.jit(self._build(tol, maxiter))
        d = self._dev
        free_np = self.scatter_local(np.asarray(free_mask))
        valid = np.zeros((self.n_dev, self.Lp), dtype=bool)
        for r in range(self.n_dev):
            valid[r, : len(self._owned[r])] = True
            valid[
                r,
                self.n_own_max : self.n_own_max + len(self._ghosts[r]),
            ] = True
        free_np[~valid] = 0.0
        x, iters = self._compiled(
            jnp.asarray(d["col_blocks"]),
            jnp.asarray(d["own_mask"], dtype=dtype),
            tuple(jnp.asarray(s) for s in d["sends"]),
            tuple(jnp.asarray(r) for r in d["recvs"]),
            tuple(b["pos"] for b in self._batches_dev),
            tuple(b["ldofs"] for b in self._batches_dev),
            tuple(b["data"] for b in self._batches_dev),
            jnp.asarray(free_np),
            jnp.asarray(self.scatter_local(np.asarray(u_bc))),
        )
        return self.gather_global(x), int(np.asarray(iters).ravel()[0])


def _pad_axis0(a, n):
    """Zero-pad axis 0 to length n."""
    if a.shape[0] == n:
        return a
    pad = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad)


def batches_from_form(form):
    """Convert a finalized AFFINE Form into :class:`HaloElementSolver`
    batches: per element, Ae = jacfwd of the residual kernel at u = 0 and
    be = -kernel(0) (the distributed analog of
    ``assembly.assemble_linear_system``).  Cell terms and boundary-facet
    terms both become element batches — their contexts carry the dof map
    and per-entity geometry with leading entity axis."""
    batches = []
    for term in form.cell_terms + form.facet_terms:
        k = int(term.ctx.cell_dofs.shape[1])
        kern = term.kernel
        ctx_np = jax.tree_util.tree_map(np.asarray, term.ctx)
        if term.aux is not None:
            data = (ctx_np, jax.tree_util.tree_map(np.asarray, term.aux))

            def Ae_fn(d, kern=kern, k=k):
                return jax.jacfwd(kern, argnums=0)(
                    jnp.zeros(k), d[0], d[1]
                )

            def be_fn(d, kern=kern, k=k):
                return -kern(jnp.zeros(k), d[0], d[1])

        else:
            data = (ctx_np,)

            def Ae_fn(d, kern=kern, k=k):
                return jax.jacfwd(kern, argnums=0)(jnp.zeros(k), d[0], None)

            def be_fn(d, kern=kern, k=k):
                return -kern(jnp.zeros(k), d[0], None)

        batches.append(
            (np.asarray(term.ctx.cell_dofs), Ae_fn, be_fn, data)
        )
    return batches


def _bell_diagonal(tiles, col_blocks, n_own):
    """diag[row] for the local row-block: for each row block rb and slot k,
    the diagonal of row r (global col == r) sits at tile col (r % BC) when
    col_blocks[k, rb] == r // BC.  Rows here are LOCAL row ids [0, n_own)."""
    K, nrb, br, bc = tiles.shape
    rows = jnp.arange(nrb * br)
    rb = rows // br
    r_in = rows % br
    want_cb = rows // bc
    c_in = rows % bc
    out = jnp.zeros(nrb * br, dtype=tiles.dtype)
    for k in range(K):
        hit = col_blocks[k][rb] == want_cb
        vals = tiles[k][rb, r_in, c_in]
        out = out + jnp.where(hit, vals, 0.0)
    return out[:n_own]
