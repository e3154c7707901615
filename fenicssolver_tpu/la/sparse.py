"""TPU-resident CSR sparse matrix.

Replaces PETSc's Mat (SURVEY.md §2.2): static sparsity computed once on the
host from the dof map; runtime values live in a flat jnp ``data`` array so the
matrix is a pytree leaf usable inside jit.  SpMV is a gather + segment-sum —
XLA lowers it to efficient fused gathers; a Pallas row-blocked variant lives
in ``ops.pallas_kernels`` for the TPU hot path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class CSRPattern(NamedTuple):
    """Static sparsity: host-derived, device-resident index arrays."""

    indptr: jnp.ndarray  # (n+1,)
    indices: jnp.ndarray  # (nnz,)
    rows: jnp.ndarray  # (nnz,) row index of each stored entry
    n: int
    nnz: int


class CSRMatrix(NamedTuple):
    pattern: CSRPattern
    data: jnp.ndarray  # (nnz,)

    @property
    def shape(self):
        return (self.pattern.n, self.pattern.n)

    def matvec(self, x):
        return csr_matvec(self, x)

    def __matmul__(self, x):
        return csr_matvec(self, x)

    def diagonal(self):
        return csr_diagonal(self)

    def todense(self):
        p = self.pattern
        A = jnp.zeros((p.n, p.n), dtype=self.data.dtype)
        return A.at[p.rows, p.indices].set(self.data)

    def to_scipy(self):
        import scipy.sparse as sp

        p = self.pattern
        return sp.csr_matrix(
            (np.asarray(self.data), np.asarray(p.indices), np.asarray(p.indptr)),
            shape=(p.n, p.n),
        )


def build_pattern(cell_dofs_list, ndof, ensure_diagonal=True, device=True):
    """Build a CSR pattern from one or more (n_ent, k) dof maps.

    Returns (pattern, positions) where positions[i] maps each (entity, a, b)
    entry of dof map i (flattened) to its nnz slot — the runtime scatter-add
    target for element matrices.  ``ensure_diagonal`` adds a (i, i) slot for
    every dof so constrained/orphan rows (Dirichlet, periodic slaves) always
    have a diagonal to pin.

    ``device=False`` keeps the index arrays numpy: they embed as constants
    when the consumer jits, and host-only setup avoids eager round-trips
    through the axon TPU tunnel, whose per-op latency under congestion is
    seconds-to-minutes (see bench.py / la/gmg.py).
    """
    _as = jnp.asarray if device else (lambda a: np.asarray(a))
    keys = []
    sizes = []
    for cd in cell_dofs_list:
        cd = np.asarray(cd, dtype=np.int64)
        k = cd.shape[1]
        rows = np.repeat(cd, k, axis=1).reshape(-1)
        cols = np.tile(cd, (1, k)).reshape(-1)
        keys.append(rows * ndof + cols)
        sizes.append(rows.size)
    if ensure_diagonal:
        diag = np.arange(ndof, dtype=np.int64)
        keys.append(diag * ndof + diag)
    all_keys = np.concatenate(keys)
    from .. import native as _native

    inverse, indptr, cols_u, rows_u = _native.build_csr_pattern(all_keys, ndof)
    nnz = cols_u.size
    positions = []
    off = 0
    for s in sizes:
        positions.append(_as(inverse[off : off + s]))
        off += s
    pattern = CSRPattern(
        indptr=_as(indptr),
        indices=_as(cols_u),
        rows=_as(rows_u),
        n=int(ndof),
        nnz=int(nnz),
    )
    return pattern, positions


def csr_matvec(A: CSRMatrix, x):
    """y = A @ x via gather + segment_sum over rows (deterministic)."""
    p = A.pattern
    prod = A.data * x[p.indices]
    return jax.ops.segment_sum(prod, p.rows, num_segments=p.n)


def csr_diagonal(A: CSRMatrix):
    p = A.pattern
    is_diag = p.rows == p.indices
    contrib = jnp.where(is_diag, A.data, 0.0)
    return jax.ops.segment_sum(contrib, p.rows, num_segments=p.n)


def csr_from_scipy(S):
    S = S.tocsr()
    n = S.shape[0]
    indptr = np.asarray(S.indptr, dtype=np.int32)
    indices = np.asarray(S.indices, dtype=np.int32)
    rows = np.repeat(np.arange(n, dtype=np.int32), np.diff(indptr))
    pattern = CSRPattern(
        indptr=jnp.asarray(indptr),
        indices=jnp.asarray(indices),
        rows=jnp.asarray(rows),
        n=n,
        nnz=int(S.nnz),
    )
    return CSRMatrix(pattern=pattern, data=jnp.asarray(S.data))
