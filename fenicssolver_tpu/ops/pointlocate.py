"""Point location and function evaluation at arbitrary points.

Replaces dolfin's BoundingBoxTree point evaluation and
``fenicstools.interpolate_nonmatching_mesh`` (reference:
``SolverBase.py:378-385``) used for checkpoint/restart across meshes.
Host-side numpy (setup/IO path, not in hot loops).
"""

from __future__ import annotations

import numpy as np

from ..core import elements
from ..core.spaces import MixedFunctionSpace, VectorFunctionSpace


def locate_cells(mesh, points, tol=1e-10):
    """For each point, find a containing cell and barycentric coords.

    Returns (cell_ids (np,), bary (np, tdim+1)); cell_id = -1 if not found
    (nearest cell is used with clipped coordinates in that case).
    """
    points = np.asarray(points, dtype=np.float64)
    npts = points.shape[0]
    tdim = mesh.tdim
    Xe = mesh.coords[mesh.cells_array]  # (nc, nvc, gdim)
    x0 = Xe[:, 0, :]
    J = np.swapaxes(Xe[:, 1:, :] - Xe[:, :1, :], 1, 2)  # (nc, gdim, tdim)
    Jinv = np.linalg.inv(J) if J.shape[1] == J.shape[2] else np.linalg.pinv(J)
    cell_ids = np.full(npts, -1, dtype=np.int64)
    bary = np.zeros((npts, tdim + 1))
    # chunk over points; vectorize over cells (fine for host-side use)
    mids = mesh.midpoints("cell")
    for i, p in enumerate(points):
        # candidate cells sorted by midpoint distance, test until hit
        d2 = np.einsum("cg,cg->c", mids - p, mids - p)
        cand = np.argsort(d2)[:64]
        ref = np.einsum("ctg,cg->ct", Jinv[cand], p - x0[cand])  # (ncand, tdim)
        lam0 = 1.0 - ref.sum(axis=1)
        lam = np.concatenate([lam0[:, None], ref], axis=1)
        ok = (lam >= -tol).all(axis=1)
        if ok.any():
            j = int(np.argmax(ok))
            cell_ids[i] = cand[j]
            bary[i] = np.clip(lam[j], 0.0, 1.0)
        else:
            # fall back to the best candidate, clipped (nearest-cell extrapolation)
            j = int(np.argmin(np.maximum(-lam, 0).sum(axis=1)))
            cell_ids[i] = cand[j]
            l = np.clip(lam[j], 0.0, None)
            bary[i] = l / l.sum()
    return cell_ids, bary


def eval_function_at_points(fn, points):
    """Evaluate a Function at (np, gdim) points -> (np, [vdim])."""
    space = fn.space
    if isinstance(space, MixedFunctionSpace):
        raise TypeError("evaluate sub-functions of a mixed function")
    mesh = space.mesh
    cell_ids, bary = locate_cells(mesh, points)
    ref = bary[:, 1:]  # reference coords
    scalar = space.scalar_space if isinstance(space, VectorFunctionSpace) else space
    out = []
    # tabulate basis at each point's reference coords (grouped loop, host)
    phi, _ = _tabulate_pointwise(mesh.tdim, scalar.degree, ref)
    cd = scalar.cell_dofs[cell_ids]  # (np, k)
    if isinstance(space, VectorFunctionSpace):
        vals = fn.values.reshape(-1, space.vdim)[cd]  # (np, k, v)
        return np.einsum("pk,pkv->pv", phi, vals)
    vals = fn.values[cd]
    return np.einsum("pk,pk->p", phi, vals)


def _tabulate_pointwise(tdim, degree, ref_pts):
    return elements.tabulate(tdim, degree, ref_pts)


def interpolate_nonmatching_mesh(fn, target_space):
    """Interpolate a Function onto a space over a different mesh."""
    from ..core.function import Function

    coords = (
        target_space.scalar_space.dof_coords
        if isinstance(target_space, VectorFunctionSpace)
        else target_space.dof_coords
    )
    vals = eval_function_at_points(fn, coords)
    return Function(target_space, np.asarray(vals).reshape(-1))
