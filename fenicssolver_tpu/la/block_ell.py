"""Block-ELL sparse format: the TPU-fast SpMV for unstructured FEM.

XLA TPU gathers of scalars run at ~150M elem/s (measured, MEMORY:
tpu-fem-performance-rules) — 30+ ms per CG iteration at 275k dofs.  This
format densifies the sparsity into (BR x BC) = (8, 128) tiles aligned to the
VPU lanes:

    y.reshape(nrb, 8) = sum_k  T[k] @ x.reshape(-1, 128)[col_block[k]]

so the per-iteration data movement is full-lane ROW gathers + dense batched
einsum — no scalar gathers, no scatters.  Fill-in costs ~10-25x the CSR
memory; the tradeoff wins whenever lane-width streaming beats per-element
gathering (all realistic sizes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

BR = 8  # row-block (sublane)
BC = 128  # col-block (lane width)


class BlockELL(NamedTuple):
    tiles: jnp.ndarray  # (K, nrb, BR, BC)
    col_blocks: jnp.ndarray  # (K, nrb) int32 col-block index per slot
    n: int
    pos: jnp.ndarray = None  # optional: nnz -> flat tile-slot scatter map

    def matvec(self, x):
        n_pad = self.col_blocks.shape[1] * 0 + self.tiles.shape[1] * BR
        ncb = (self.n + BC - 1) // BC
        xp = jnp.zeros(ncb * BC, dtype=x.dtype).at[: self.n].set(x)
        x2 = xp.reshape(ncb, BC)
        xb = x2[self.col_blocks]  # (K, nrb, BC): full-lane row gather
        y = jnp.einsum("krij,krj->ri", self.tiles, xb)  # dense VPU/MXU work
        return y.reshape(-1)[: self.n]

    def __matmul__(self, x):
        return self.matvec(x)


def build_block_ell(indptr, indices, n, ncols=None):
    """Host-side structure build from a CSR pattern.

    Returns (col_blocks (K, nrb), pos (nnz,) mapping CSR entry -> flat index
    into tiles) so device-side assembly is one scatter:
        tiles = zeros(K*nrb*BR*BC).at[pos].add(csr_data_in_pattern_order)

    ``ncols``: column-space size for rectangular row blocks (defaults to n;
    used by the halo-sharded local row blocks whose columns span
    owned+ghost local ids).
    """
    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    ncols = n if ncols is None else ncols
    nrb = (n + BR - 1) // BR
    nnz = indices.shape[0]
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    rb = rows // BR
    r_in = (rows % BR).astype(np.int64)
    cb = indices.astype(np.int64) // BC
    c_in = indices.astype(np.int64) % BC
    # unique (rb, cb) tiles, slot index within each row block
    key = rb * ((ncols // BC) + 2) + cb
    uniq, inverse = np.unique(key, return_inverse=True)
    tile_rb = uniq // ((ncols // BC) + 2)
    tile_cb = uniq % ((ncols // BC) + 2)
    counts = np.bincount(tile_rb, minlength=nrb)
    K = int(counts.max())
    offsets = np.zeros(nrb + 1, dtype=np.int64)
    offsets[1:] = np.cumsum(counts)
    slot_of_tile = np.arange(len(uniq)) - offsets[tile_rb]
    col_blocks = np.zeros((K, nrb), dtype=np.int32)  # pad: block 0, zero tile
    col_blocks[slot_of_tile, tile_rb] = tile_cb.astype(np.int32)
    # nnz -> flat position in tiles (K, nrb, BR, BC)
    t = inverse  # tile id per nnz
    pos = (
        slot_of_tile[t] * (nrb * BR * BC)
        + tile_rb[t] * (BR * BC)
        + r_in * BC
        + c_in
    ).astype(np.int64)
    return K, nrb, col_blocks, pos


def permuted_csr_pattern(indptr, indices, perm):
    """Symmetric permutation of a CSR pattern: rows regrouped in ``perm``
    order, columns relabelled.  Returns (indptr2, indices2, take) where
    ``take`` gathers the matching data (``data2 = data[take]``) — one
    vectorized ragged gather, no python loop."""
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int64)
    n = len(indptr) - 1
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    counts = np.diff(indptr)[perm]
    ip2 = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=ip2[1:])
    nnz = int(counts.sum())
    take = (
        np.repeat(indptr[perm], counts)
        + np.arange(nnz, dtype=np.int64)
        - np.repeat(ip2[:-1], counts)
    )
    return ip2, inv[indices[take]], take


def block_ell_from_csr(A, n=None, perm=None):
    """Convert a CSRMatrix (or scipy csr) to BlockELL (host setup + one
    device scatter).

    ``perm``: optional symmetric permutation (e.g. from
    ``la.sparse_algebra.bandwidth_ordering``) applied to rows AND columns
    before tiling — the returned operator then acts in PERMUTED space
    (``y_p = A_bell @ x_p`` with ``x_p = x[perm]``); the caller permutes
    vectors once outside its Krylov/scan loop.  Bandwidth-reducing perms
    shrink K (distinct 128-column blocks per 8-row block), the direct
    factor on tile memory and per-matvec HBM traffic."""
    if hasattr(A, "pattern"):
        indptr = np.asarray(A.pattern.indptr)
        indices = np.asarray(A.pattern.indices)
        data = jnp.asarray(A.data)
        n = A.pattern.n
    else:
        A = A.tocsr()
        indptr, indices, data = A.indptr, A.indices, jnp.asarray(A.data)
        n = A.shape[0]
    if perm is not None:
        indptr, indices, take = permuted_csr_pattern(indptr, indices, perm)
        data = data[jnp.asarray(take)]
    K, nrb, col_blocks, pos = build_block_ell(indptr, indices, n)
    # tile fill as a SORTED UNIQUE scatter-set: ``pos`` is injective (one
    # slot per CSR entry) and static, so the sort happens ONCE on host and
    # the device op is a linear write.  The naive ``.at[pos].add(data)``
    # lowers on TPU to a sort-based combining scatter whose scratch is a
    # multiple of the PADDED tile array — measured 11.6 GB (HBM OOM) for a
    # 645 MB tile set at 180k P2 velocity dofs.
    order = np.argsort(pos, kind="stable")
    tiles = (
        jnp.zeros(K * nrb * BR * BC, dtype=data.dtype)
        .at[jnp.asarray(pos[order])]
        .set(data[jnp.asarray(order)], indices_are_sorted=True,
             unique_indices=True)
        .reshape(K, nrb, BR, BC)
    )
    return BlockELL(tiles=tiles, col_blocks=jnp.asarray(col_blocks), n=n,
                    pos=jnp.asarray(pos))
