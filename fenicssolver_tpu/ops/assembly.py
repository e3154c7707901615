"""Residual-centric batched FEM assembly.

This is the TPU-native replacement for the reference's UFL -> FFC -> dolfin
``assemble`` pipeline (SURVEY.md §2.2).  A *form* is a list of residual
kernels over cell/facet batches:

    kernel(u_e, geom_e, aux_e) -> (k,) per-element residual contribution

* residual  R(u)   : vmap the kernel, scatter-add into the global vector
* Jacobian  J(u)   : ``jax.jacfwd`` of the kernel per element (the Gateaux
  ``derivative(F, u, T)`` of ``ScalarTransportSolver.py:357``), scatter-add
  into a static CSR pattern
* linear problems  : A = J(0), b = -R(0)  (forms are affine in u)

Everything is jit-compatible: sparsity positions, dof gathers and basis
tables are static; only dof values and coefficient arrays are traced.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import elements
from ..core.expression import Constant, Expression
from ..core.function import Function
from ..core.spaces import MixedFunctionSpace, VectorFunctionSpace
from ..la.sparse import CSRMatrix, build_pattern
from . import geometry


@dataclass
class CellTerm:
    kernel: Callable  # (u_e, geom_e, aux_e) -> (k,)
    ctx: geometry.CellContext
    aux: Any = None  # pytree of per-cell arrays (axis 0 = cell)
    pos: Optional[jnp.ndarray] = None  # nnz slots for the (k,k) element matrix


@dataclass
class FacetTerm:
    kernel: Callable  # (u_e, fgeom_e, aux_e) -> (k,)
    ctx: geometry.FacetContext
    aux: Any = None
    pos: Optional[jnp.ndarray] = None


#: monotonically increasing Form token: caches keyed on ``id(form)`` broke
#: when CPython reused the address of a garbage-collected Form between
#: transient steps (a new form silently hit a stale halo solver); every
#: finalize() stamps a process-unique generation instead.
_FORM_GENERATION = 0


@dataclass
class Form:
    """A residual form over one function space."""

    space: Any
    cell_terms: list = field(default_factory=list)
    facet_terms: list = field(default_factory=list)
    pattern: Any = None
    generation: int = 0  # unique token stamped at finalize (cache key)
    aux_version: int = 0  # bumped on in-place term.aux refresh (cache key)

    def finalize(self, device=True):
        """Build the CSR pattern covering all terms and fill slot maps.

        ``device=False`` keeps pattern/slot arrays numpy (host-only setup,
        embedded as jit constants — see la/sparse.build_pattern)."""
        global _FORM_GENERATION
        maps = [np.asarray(t.ctx.cell_dofs) for t in self.cell_terms] + [
            np.asarray(t.ctx.cell_dofs) for t in self.facet_terms
        ]
        self.pattern, positions = build_pattern(
            maps, self.space.ndof, device=device
        )
        for t, pos in zip(self.cell_terms + self.facet_terms, positions):
            t.pos = pos
        _FORM_GENERATION += 1
        self.generation = _FORM_GENERATION
        return self


def _vmap_term(term):
    ctx_axes = type(term.ctx)(*([0] * len(term.ctx._fields)))
    return (0, ctx_axes, 0 if term.aux is not None else None)


def _term_aux(term, aux_update):
    """Term aux with runtime overrides for matching keys (jitted transient
    loops swap per-step history arrays like 'wprev' without rebuilding the
    form; shapes must match the baked aux)."""
    if aux_update is None or term.aux is None:
        return term.aux
    out = dict(term.aux)
    for k, v in aux_update.items():
        if k in out:
            out[k] = v
    return out


def assemble_residual(form, u, aux_update=None):
    """R(u): global residual vector (jit-compatible)."""
    R = jnp.zeros(form.space.ndof, dtype=u.dtype)
    for term in form.cell_terms + form.facet_terms:
        ue = u[term.ctx.cell_dofs]
        r = jax.vmap(term.kernel, in_axes=_vmap_term(term))(
            ue, term.ctx, _term_aux(term, aux_update)
        )
        R = R.at[term.ctx.cell_dofs.reshape(-1)].add(r.reshape(-1))
    return R


def assemble_jacobian(form, u, aux_update=None):
    """J(u) as CSRMatrix via per-element forward-mode autodiff."""
    data = jnp.zeros(form.pattern.nnz, dtype=u.dtype)
    for term in form.cell_terms + form.facet_terms:
        ue = u[term.ctx.cell_dofs]
        jac_k = jax.jacfwd(term.kernel, argnums=0)
        Ae = jax.vmap(jac_k, in_axes=_vmap_term(term))(
            ue, term.ctx, _term_aux(term, aux_update)
        )
        data = data.at[term.pos].add(Ae.reshape(-1))
    return CSRMatrix(pattern=form.pattern, data=data)


def assemble_linear_system(form, dtype=jnp.float64):
    """For affine forms R(u) = A u - b: returns (A, b) assembled at u = 0."""
    u0 = jnp.zeros(form.space.ndof, dtype=dtype)
    A = assemble_jacobian(form, u0)
    b = -assemble_residual(form, u0)
    return A, b


def assemble_functional(kernel, ctx, aux=None, u=None):
    """Sum of a scalar kernel over a cell/facet batch (drag, flux, energy)."""
    if u is not None:
        ue = u[ctx.cell_dofs]
    else:
        ue = jnp.zeros(ctx.cell_dofs.shape)
    axes = (0, type(ctx)(*([0] * len(ctx._fields))), 0 if aux is not None else None)
    vals = jax.vmap(kernel, in_axes=axes)(ue, ctx, aux)
    return jnp.sum(vals)


# ---------------------------------------------------------------------------
# Dirichlet constraints: symmetric elimination via masked operator
# (replaces dolfin DirichletBC row/col elimination, ``SolverBase.py:598-602``)
# ---------------------------------------------------------------------------


class DirichletData:
    """Collected Dirichlet constraints for one space."""

    def __init__(self, ndof, dtype=np.float64):
        self.ndof = ndof
        self._dofs = []
        self._vals = []
        self.dtype = dtype

    def add(self, dofs, values):
        dofs = np.asarray(dofs, dtype=np.int64).reshape(-1)
        values = np.broadcast_to(np.asarray(values, dtype=self.dtype), dofs.shape)
        self._dofs.append(dofs)
        self._vals.append(np.array(values))

    def finalize(self, device=True):
        """``device=False`` keeps the masks numpy (host-only setup)."""
        if self._dofs:
            dofs = np.concatenate(self._dofs)
            vals = np.concatenate(self._vals)
            # later entries win (dolfin applies bcs in order)
            order = np.arange(len(dofs))
            uniq, idx = np.unique(dofs[::-1], return_index=True)
            vals = vals[::-1][idx]
            dofs = uniq
        else:
            dofs = np.zeros(0, dtype=np.int64)
            vals = np.zeros(0, dtype=self.dtype)
        free = np.ones(self.ndof, dtype=self.dtype)
        free[dofs] = 0.0
        ubc = np.zeros(self.ndof, dtype=self.dtype)
        ubc[dofs] = vals
        _as = jnp.asarray if device else (lambda a: a)
        self.free_mask = _as(free)
        self.u_bc = _as(ubc)
        self.dofs = dofs
        return self

    @property
    def any(self):
        return self.dofs.size > 0


def constrained_operator(matvec, free_mask):
    """SPD-preserving constrained operator: identity on fixed dofs."""

    def op(x):
        return free_mask * matvec(free_mask * x) + (1.0 - free_mask) * x

    return op


def constrained_rhs(matvec, b, free_mask, u_bc):
    return free_mask * (b - matvec(u_bc)) + (1.0 - free_mask) * u_bc


def constrain_residual(R, u, free_mask, u_bc):
    """Nonlinear residual with Dirichlet rows replaced by (u - u_bc)."""
    return free_mask * R + (1.0 - free_mask) * (u - u_bc)


def constrain_csr(A: CSRMatrix, free_mask):
    """Zero constrained rows+cols of a CSR and put 1 on their diagonal."""
    p = A.pattern
    fr = free_mask[p.rows]
    fc = free_mask[p.indices]
    keep = fr * fc
    diag_fix = (p.rows == p.indices) * (1.0 - fr)
    return CSRMatrix(pattern=p, data=A.data * keep + diag_fix)


# ---------------------------------------------------------------------------
# Coefficient evaluation at quadrature points
# ---------------------------------------------------------------------------


def coeff_at_qp(value, qpx, t=None, quad_pts=None, mesh=None):
    """Evaluate a material/source coefficient at physical quadrature points.

    ``qpx``: (nbatch, nq, gdim).  Returns a numpy array broadcastable to
    (nbatch, nq, *value_shape), or a plain scalar for numbers.
    Handles numbers, ``Constant``, ``Expression``, tuples/tensors of numbers,
    ``Function`` on the same mesh (needs quad_pts reference coords), numpy
    arrays, and time-callables are resolved by the caller beforehand.
    """
    import numbers

    qpx = np.asarray(qpx)
    nb, nq = qpx.shape[0], qpx.shape[1]
    if isinstance(value, numbers.Number):
        return float(value)
    if isinstance(value, Constant):
        v = value.value
        return float(v) if v.ndim == 0 else np.broadcast_to(v, (nb, nq) + v.shape)
    if isinstance(value, Expression):
        flat = value.eval_at(qpx.reshape(-1, qpx.shape[-1]), t=t)
        return np.asarray(flat).reshape((nb, nq) + value.value_shape)
    if isinstance(value, (tuple, list)):
        arr = np.asarray(value, dtype=np.float64)
        return np.broadcast_to(arr, (nb, nq) + arr.shape)
    if isinstance(value, np.ndarray):
        return value
    if isinstance(value, Function):
        if quad_pts is None:
            raise ValueError("Function coefficient needs reference quad points")
        space = value.space
        if isinstance(space, VectorFunctionSpace):
            sd = space.scalar_space
            phi, _ = elements.tabulate(sd.mesh.tdim, sd.degree, quad_pts)
            ue = value.values.reshape(-1, space.vdim)[sd.cell_dofs]  # (nc,k,v)
            return np.einsum("qk,ckv->cqv", phi, ue)
        phi, _ = elements.tabulate(space.mesh.tdim, space.degree, quad_pts)
        ue = value.values[space.cell_dofs]
        return np.einsum("qk,ck->cq", phi, ue)
    raise TypeError(f"cannot evaluate coefficient of type {type(value)}")


# ---------------------------------------------------------------------------
# L2 projection (dolfin ``project`` parity; consistent mass matrix + CG)
# ---------------------------------------------------------------------------


def l2_project(value, space, quad_degree=None, rhs_values=None):
    """Project a coefficient (or per-cell-qp array) onto a CG space."""
    from ..la.krylov import cg, jacobi_preconditioner

    if isinstance(space, MixedFunctionSpace):
        raise TypeError("project into mixed space unsupported; project per part")
    mesh = space.mesh
    deg = space.degree
    qdeg = quad_degree or (2 * deg + 1)
    scalar = space if not isinstance(space, VectorFunctionSpace) else space.scalar_space
    tab = geometry.basis_tables(mesh.tdim, deg, qdeg)
    ctx = geometry.build_cell_context(space, qdeg)
    qp, _ = elements.quadrature(mesh.tdim, qdeg)
    vdim = getattr(space, "vdim", 1)

    if rhs_values is None:
        vals = coeff_at_qp(value, np.asarray(ctx.qpx), quad_pts=qp)
    else:
        vals = rhs_values  # (nc, nq, ...) given directly
    nc = mesh.num_cells()
    nq = tab.qw.shape[0]
    if np.isscalar(vals):
        vals = np.full((nc, nq) + ((vdim,) if vdim > 1 else ()), float(vals))
    vals = jnp.asarray(vals)

    phi = jnp.asarray(tab.phi)
    qw = jnp.asarray(tab.qw)

    # element mass matrices and rhs
    detJ = ctx.detJ  # (nc,)
    Me_s = jnp.einsum("q,qa,qb->ab", qw, phi, phi)  # scalar mass, shared
    if vdim == 1:
        be = jnp.einsum("q,qa,cq,c->ca", qw, phi, vals, detJ)
        cd = scalar.cell_dofs
        ndof = scalar.ndof
        Me = Me_s
        k = Me_s.shape[0]
    else:
        # block-diagonal vector mass; rhs per component interleaved node-major
        be_nodal = jnp.einsum("q,qa,cqv,c->cav", qw, phi, vals, detJ)
        be = be_nodal.reshape(nc, -1)
        cd = space.cell_dofs
        ndof = space.ndof
        k = scalar.ndof_el * vdim
        Me = jnp.zeros((k, k))
        for c in range(vdim):
            Me = Me.at[c::vdim, c::vdim].set(Me_s)
    pattern, (pos,) = build_pattern([np.asarray(cd)], ndof)
    Ae = Me[None, :, :] * detJ[:, None, None]
    data = jnp.zeros(pattern.nnz).at[pos].add(Ae.reshape(-1))
    A = CSRMatrix(pattern=pattern, data=data)
    b = jnp.zeros(ndof).at[jnp.asarray(cd).reshape(-1)].add(be.reshape(-1))
    M = jacobi_preconditioner(A.diagonal())
    x, it, res = cg(A, b, M=M, tol=1e-12, maxiter=2000)
    return Function(space, np.asarray(x))
