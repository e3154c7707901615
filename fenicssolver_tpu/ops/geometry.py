"""Per-cell and per-facet geometric contexts for batched element kernels.

The FFC-generated C++ element loop of the reference (SURVEY.md §2.2) becomes:
precompute affine geometry (Jacobian inverse, |detJ|, physical quadrature
points) for the whole cell batch once, then evaluate weak-form kernels as
vmapped pure functions over the batch.  Tables of basis values/gradients at
quadrature points are host constants baked into the jitted kernels.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core import elements


class BasisTables(NamedTuple):
    """Static (host) tabulations for one scalar element at one rule."""

    phi: np.ndarray  # (nq, k)
    dphi: np.ndarray  # (nq, k, tdim)
    qw: np.ndarray  # (nq,)
    qp: np.ndarray  # (nq, tdim)


class CellContext(NamedTuple):
    """Device-resident per-cell geometry for a cell batch."""

    cell_dofs: jnp.ndarray  # (nc, k_total) int32
    Xe: jnp.ndarray  # (nc, nvc, gdim) vertex coords
    detJ: jnp.ndarray  # (nc,) |det J|
    Jinv: jnp.ndarray  # (nc, tdim, gdim): grad_x = Jinv^T grad_ref
    qpx: jnp.ndarray  # (nc, nq, gdim) physical quadrature points


class FacetContext(NamedTuple):
    """Device-resident per-facet geometry for one marked facet batch."""

    cells: jnp.ndarray  # (nf,) owning cell index
    cell_dofs: jnp.ndarray  # (nf, k_total) dofs of owning cell
    local_id: jnp.ndarray  # (nf,) local facet index in owning cell
    detF: jnp.ndarray  # (nf,) |det facet map| (area / ref-volume)
    normal: jnp.ndarray  # (nf, gdim) outward unit normal
    qpx: jnp.ndarray  # (nf, nq, gdim) physical facet quadrature points
    Jinv: jnp.ndarray  # (nf, tdim, gdim) owning cell Jinv
    detJ: jnp.ndarray  # (nf,) owning cell |detJ|


class InteriorFacetContext(NamedTuple):
    """Device-resident per-facet geometry for interior ('+'/'-') facets.

    Because cell vertices are sorted ascending, both adjacent cells see the
    facet through the *same* sorted-vertex barycentric parameterization, so
    quadrature points on the two traces coincide pointwise — no permutation
    table is needed (the dolfin 'shared_facet' machinery analog).
    """

    cell_dofs: jnp.ndarray  # (nf, 2k) dofs of [plus cell | minus cell]
    local_plus: jnp.ndarray  # (nf,)
    local_minus: jnp.ndarray  # (nf,)
    detF: jnp.ndarray  # (nf,)
    normal: jnp.ndarray  # (nf, gdim) out of the plus cell
    qpx: jnp.ndarray  # (nf, nq, gdim)
    Jinv_plus: jnp.ndarray  # (nf, tdim, gdim)
    Jinv_minus: jnp.ndarray
    h_plus: jnp.ndarray  # (nf,) cell sizes for penalty scaling
    h_minus: jnp.ndarray


def build_interior_facet_context(space, facet_ids, quad_degree, coords=None):
    mesh = space.mesh
    coords = mesh.coords if coords is None else np.asarray(coords)
    facet_ids = np.asarray(facet_ids, dtype=np.int32)
    tdim = mesh.tdim
    info = mesh._compute_facets()
    cp = info["facet_cells"][facet_ids, 0]
    cm = info["facet_cells"][facet_ids, 1]
    lp = info["facet_local"][facet_ids, 0]
    lm = info["facet_local"][facet_ids, 1]
    assert (cm >= 0).all(), "interior facet context on a boundary facet"
    fv = info["facet_vertices"][facet_ids]
    X = coords[fv]
    if tdim == 2:
        e = X[:, 1] - X[:, 0]
        area = np.linalg.norm(e, axis=1)
        refvol = 1.0
        n = np.stack([e[:, 1], -e[:, 0]], axis=1)
        n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-300)
    else:
        c = np.cross(X[:, 1] - X[:, 0], X[:, 2] - X[:, 0])
        area = 0.5 * np.linalg.norm(c, axis=1)
        refvol = 0.5
        n = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-300)
    cell_mid = coords[mesh.cells_array[cp]].mean(axis=1)
    fmid = X.mean(axis=1)
    sign = np.sign(np.einsum("fg,fg->f", fmid - cell_mid, n))
    sign[sign == 0] = 1.0
    n = n * sign[:, None]  # out of the plus cell
    _, fpts, _ = elements.facet_quadrature_in_cell(tdim, quad_degree)
    lam_f = np.concatenate([1 - fpts.sum(axis=1, keepdims=True), fpts], axis=1)
    qpx = np.einsum("qv,fvg->fqg", lam_f, X)
    _, detJ_all, Jinv_all = _affine_geometry(coords, mesh.cells_array, tdim)
    h = mesh.cell_sizes()
    return InteriorFacetContext(
        cell_dofs=jnp.asarray(
            np.concatenate([space.cell_dofs[cp], space.cell_dofs[cm]], axis=1)
        ),
        local_plus=jnp.asarray(lp),
        local_minus=jnp.asarray(lm),
        detF=jnp.asarray(area / refvol),
        normal=jnp.asarray(n),
        qpx=jnp.asarray(qpx),
        Jinv_plus=jnp.asarray(Jinv_all[cp]),
        Jinv_minus=jnp.asarray(Jinv_all[cm]),
        h_plus=jnp.asarray(h[cp]),
        h_minus=jnp.asarray(h[cm]),
    )


def basis_tables(tdim, degree, quad_degree):
    qp, qw = elements.quadrature(tdim, quad_degree)
    phi, dphi = elements.tabulate(tdim, degree, qp)
    return BasisTables(phi=phi, dphi=dphi, qw=qw, qp=qp)


def facet_basis_tables(tdim, degree, quad_degree):
    """Tabulate cell basis at facet quadrature points, per local facet.

    Returns (phi (nlf, nq, k), dphi (nlf, nq, k, tdim), qw (nq,),
    cell_pts (nlf, nq, tdim)).
    """
    cell_pts, fpts, fw = elements.facet_quadrature_in_cell(tdim, quad_degree)
    nlf, nq = cell_pts.shape[0], cell_pts.shape[1]
    phis, dphis = [], []
    for lf in range(nlf):
        p, d = elements.tabulate(tdim, degree, cell_pts[lf])
        phis.append(p)
        dphis.append(d)
    return np.stack(phis), np.stack(dphis), fw, cell_pts


def _affine_geometry(coords, cells_arr, tdim):
    """(nc, nvc, gdim) -> detJ (abs), Jinv per cell (numpy, host)."""
    Xe = coords[cells_arr[:, : tdim + 1]]
    J = np.swapaxes(Xe[:, 1:, :] - Xe[:, :1, :], 1, 2)  # (nc, gdim, tdim)
    if J.shape[1] == J.shape[2]:
        detJ = np.abs(np.linalg.det(J))
        Jinv = np.linalg.inv(J)  # (nc, tdim, gdim)
    else:  # manifold cell (topo < geom): pseudo-inverse
        G = np.einsum("cgt,cgs->cts", J, J)
        detJ = np.sqrt(np.abs(np.linalg.det(G)))
        Jinv = np.einsum("cts,cgs->ctg", np.linalg.inv(G), J)
    return Xe, detJ, Jinv


def build_cell_context(space, quad_degree, coords=None, device=True):
    """Build the device cell batch for a space (or mixed space).

    ``device=False`` keeps the batch numpy (host-only setup; the arrays
    embed as constants when the consumer jits — avoids eager round-trips
    through the axon TPU tunnel, see la/sparse.build_pattern)."""
    mesh = space.mesh
    coords = mesh.coords if coords is None else np.asarray(coords)
    tdim = mesh.tdim
    Xe, detJ, Jinv = _affine_geometry(coords, mesh.cells_array, tdim)
    qp, _ = elements.quadrature(tdim, quad_degree)
    lam = np.concatenate([1 - qp.sum(axis=1, keepdims=True), qp], axis=1)  # (nq, nvc)
    qpx = np.einsum("qv,cvg->cqg", lam, Xe)
    _as = jnp.asarray if device else (lambda a: np.asarray(a))
    return CellContext(
        cell_dofs=_as(space.cell_dofs),
        Xe=_as(Xe),
        detJ=_as(detJ),
        Jinv=_as(Jinv),
        qpx=_as(qpx),
    )


def build_facet_context(space, facet_ids, quad_degree, coords=None):
    """Build a device facet batch for the given (exterior) facet ids."""
    mesh = space.mesh
    coords = mesh.coords if coords is None else np.asarray(coords)
    facet_ids = np.asarray(facet_ids, dtype=np.int32)
    tdim = mesh.tdim
    info = mesh._compute_facets()
    cells_of = info["facet_cells"][facet_ids, 0]
    local = info["facet_local"][facet_ids, 0]
    fv = info["facet_vertices"][facet_ids]
    X = coords[fv]  # (nf, tdim, gdim) facet vertex coords
    # area / normal
    if tdim == 1:
        area = np.ones(len(facet_ids))
        refvol = 1.0
        t = None
        n = np.zeros((len(facet_ids), mesh.gdim))
        n[:, 0] = 1.0
    elif tdim == 2:
        e = X[:, 1] - X[:, 0]
        area = np.linalg.norm(e, axis=1)
        refvol = 1.0
        n = np.stack([e[:, 1], -e[:, 0]], axis=1)
        n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-300)
    else:
        c = np.cross(X[:, 1] - X[:, 0], X[:, 2] - X[:, 0])
        area = 0.5 * np.linalg.norm(c, axis=1)
        refvol = 0.5
        n = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-300)
    # orient outward from owning cell
    cell_mid = coords[mesh.cells_array[cells_of]].mean(axis=1)
    fmid = X.mean(axis=1)
    sign = np.sign(np.einsum("fg,fg->f", fmid - cell_mid, n))
    sign[sign == 0] = 1.0
    n = n * sign[:, None]
    detF = area / refvol
    # physical facet quadrature points
    _, fpts, _ = elements.facet_quadrature_in_cell(tdim, quad_degree)
    lam_f = np.concatenate([1 - fpts.sum(axis=1, keepdims=True), fpts], axis=1)
    qpx = np.einsum("qv,fvg->fqg", lam_f, X)
    # owning cell geometry
    _, detJ_all, Jinv_all = _affine_geometry(coords, mesh.cells_array, tdim)
    return FacetContext(
        cells=jnp.asarray(cells_of),
        cell_dofs=jnp.asarray(space.cell_dofs[cells_of]),
        local_id=jnp.asarray(local),
        detF=jnp.asarray(detF),
        normal=jnp.asarray(n),
        qpx=jnp.asarray(qpx),
        Jinv=jnp.asarray(Jinv_all[cells_of]),
        detJ=jnp.asarray(detJ_all[cells_of]),
    )


# -- in-kernel interpolation helpers (jnp, per single cell) -------------------


def phys_grads(dphi, Jinv):
    """Physical basis gradients for one cell: (nq,k,tdim),(tdim,gdim)->(nq,k,gdim)."""
    return jnp.einsum("qkt,tg->qkg", dphi, Jinv)


def interp(phi, ue):
    """(nq,k),(k,...)->(nq,...): works for scalar (k,) and vector (k,v) dofs."""
    return jnp.tensordot(phi, ue, axes=(1, 0))


def interp_grad(dphi_g, ue):
    """(nq,k,gdim),(k,)->(nq,gdim) or (k,v)->(nq,v,gdim)."""
    if ue.ndim == 1:
        return jnp.einsum("qkg,k->qg", dphi_g, ue)
    return jnp.einsum("qkg,kv->qvg", dphi_g, ue)
