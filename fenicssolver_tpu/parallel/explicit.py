"""Node-partitioned halo layout for EXPLICIT nodal update schemes.

The implicit solvers (`parallel/halo.py`) distribute a *solve*; explicit
time integrators (e.g. the density-based compressible NS solver) instead
need a *sharded residual evaluation* inside a `lax.scan` over thousands
of steps.  This module provides the layout:

* nodes are partitioned over the device mesh by the same balanced
  coordinate-quantile grid as `parallel/halo.py` (SCOTCH-balance analog,
  reference: MPI dof ownership in ``FenicsSolver/SolverBase.py:102-118``);
* every element (cell / boundary facet) touching an owned node is
  replicated to that rank (ghost-cell replication), so residual
  evaluation and the element->node scatter-add need NO communication —
  contributions landing on non-owned rows are simply discarded via
  ``own_mask`` (the owning neighbour recomputes them from its own copy
  of the interface element);
* the ONLY communication per residual evaluation is one offset-grouped
  ``lax.ppermute`` ghost refresh of the nodal state (O(interface)
  values), riding ICI inside the jitted scan — zero host round-trips
  for the whole transient.

Local vector layout per rank: ``[owned (pad) | ghosts (pad) | 1 dummy]``
of length ``Lp``.  Unlike the implicit solvers, the dummy slot IS read
here (padded elements gather it), so callers must keep it at a SAFE
state value (e.g. unit density) — `scatter_nodal(pad=...)` seeds it and
the exchange rounds preserve it (padded send/recv entries both point at
the dummy, so it only ever receives another rank's dummy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .halo import (
    AXIS,
    DeviceMesh,
    _build_exchange_rounds,
    _factor_grid,
    _group_by_rank,
    _LocalIndex,
    quantile_grid_partition,
)

__all__ = ["AXIS", "HaloExplicitStepper"]


class HaloExplicitStepper:
    """Partition + replication + exchange tables for explicit updates.

    ``dof_coords``: (ndof, gdim) nodal coordinates (partitioning key).
    ``dofmaps``: list of (ne_i, k_i) global entity->node maps (cells,
    boundary facets, ...).  Entities are replicated to every rank owning
    one of their nodes.
    """

    def __init__(self, dof_coords, dofmaps, devices=None, grid=None):
        devices = devices if devices is not None else jax.devices()
        nd = len(devices)
        self.n_dev = nd
        self.device_mesh = DeviceMesh(np.array(devices), (AXIS,))
        coords = np.asarray(dof_coords, dtype=np.float64)
        self.ndof = coords.shape[0]
        gdim = coords.shape[1]
        grid = grid or _factor_grid(nd, gdim)
        assert int(np.prod(grid)) == nd, (grid, nd)
        owner = quantile_grid_partition(coords, grid)
        gc = np.stack(np.unravel_index(np.arange(nd), grid), axis=1)

        owned = _group_by_rank(owner, nd)
        n_own_max = max(len(o) for o in owned)

        # per-rank entity sets: every entity touching an owned node (one
        # sorted unique over (rank, entity) pairs per dofmap)
        dofmaps = [np.asarray(dm, dtype=np.int64) for dm in dofmaps]
        sel = []
        for dm in dofmaps:
            ne = max(dm.shape[0], 1)
            if dm.shape[0] == 0:
                sel.append([np.zeros(0, np.int64)] * nd)
                continue
            eo = owner[dm].astype(np.int64)
            pair_keys = np.unique(
                eo * ne + np.arange(ne, dtype=np.int64)[:, None]
            )
            pr, pe = pair_keys // ne, pair_keys % ne
            bounds = np.searchsorted(pr, np.arange(nd + 1))
            sel.append([pe[bounds[r] : bounds[r + 1]] for r in range(nd)])
        self.sel = sel

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
        self.L = L
        self.n_own_max = n_own_max
        self._owned, self._ghosts = owned, ghosts

        l2l = [
            _LocalIndex(owned[r], ghosts[r], n_own_max, L) for r in range(nd)
        ]
        self._l2l = l2l

        # localized entity dofmaps, padded per rank (pad rows -> dummy L)
        self.ne_pad = [
            max(max(len(s[r]) for r in range(nd)), 1) for s in sel
        ]
        self.ldofs = []
        for bi, dm in enumerate(dofmaps):
            k = dm.shape[1]
            la = np.full((nd, self.ne_pad[bi], k), L, dtype=np.int32)
            for r in range(nd):
                ids = sel[bi][r]
                if len(ids):
                    la[r, : len(ids)] = l2l[r](dm[ids]).astype(np.int32)
            self.ldofs.append(la)

        self.perms, send_list, recv_list = _build_exchange_rounds(
            owner, ghosts, l2l, gc, nd, L
        )
        self._sends = tuple(np.asarray(s) for s in send_list)
        self._recvs = tuple(np.asarray(r) for r in recv_list)
        own_mask = np.zeros((nd, self.Lp), dtype=np.float64)
        for r in range(nd):
            own_mask[r, : len(owned[r])] = 1.0
        self.own_mask = own_mask

    # -- data movement (host-side setup; numpy in, numpy out) --------------
    def localize(self, bi, a, pad=0.0):
        """Entity array (ne, ...) -> per-rank padded stack (nd, ne_pad, ...)."""
        a = np.asarray(a)
        out = np.full((self.n_dev, self.ne_pad[bi]) + a.shape[1:], pad,
                      dtype=a.dtype)
        for r in range(self.n_dev):
            ids = self.sel[bi][r]
            if len(ids):
                out[r, : len(ids)] = a[ids]
        return out

    def scatter_nodal(self, v, pad=0.0):
        """Nodal array (..., ndof) -> (nd, ..., Lp); owned + ghost slots
        filled from the global vector, every pad slot (incl. the dummy)
        set to ``pad`` (scalar or (...,)-shaped per-component values)."""
        v = np.asarray(v)
        lead = v.shape[:-1]
        out = np.empty((self.n_dev,) + lead + (self.Lp,), dtype=v.dtype)
        pad_arr = np.broadcast_to(np.asarray(pad, dtype=v.dtype), lead)
        out[...] = pad_arr[..., None]  # broadcasts over nd and Lp
        for r in range(self.n_dev):
            ow, gh = self._owned[r], self._ghosts[r]
            out[r][..., : len(ow)] = v[..., ow]
            out[r][..., self.n_own_max : self.n_own_max + len(gh)] = v[..., gh]
        return out

    def gather_nodal(self, v_loc):
        """(nd, ..., Lp) -> (..., ndof) from owned slots."""
        v_loc = np.asarray(v_loc)
        out = np.empty(v_loc.shape[1:-1] + (self.ndof,), dtype=v_loc.dtype)
        for r in range(self.n_dev):
            ow = self._owned[r]
            out[..., ow] = v_loc[r][..., : len(ow)]
        return out

    def comm_arrays(self):
        """(sends, recvs) tuples of (nd, nbuf) buffers — pass them through
        ``shard_map`` with spec P(AXIS) and slice ``[0]`` inside."""
        return self._sends, self._recvs

    def make_exchange(self, sends, recvs):
        """Ghost-refresh closure for use INSIDE shard_map: ``sends`` /
        ``recvs`` are the rank-local (nbuf,) index buffers (already sliced
        ``[0]``).  Works on any (..., Lp)-shaped nodal array."""
        perms = self.perms

        def exchange(x):
            for si in range(len(perms)):
                buf = x[..., sends[si]]
                rec = jax.lax.ppermute(buf, AXIS, list(perms[si]))
                x = x.at[..., recvs[si]].set(rec)
            return x

        return exchange
