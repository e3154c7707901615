"""Function spaces and dof maps.

Replaces the dolfin FE dofmap machinery (reference usage:
``SolverBase.py:260-275`` ``generate_function_space``).  A space is plain
host-side index arrays: ``cell_dofs`` (num_cells, ndof_per_cell) plus nodal
dof coordinates; vector spaces interleave components node-major
(dof = node*vdim + comp); mixed spaces concatenate subspaces with offsets
(``V.sub(i)`` / component-wise Dirichlet semantics,
``LinearElasticitySolver.py:129,144``).
"""

from __future__ import annotations

import numpy as np

from . import elements
from .mesh import Mesh

__all__ = [
    "FiniteElement",
    "VectorElement",
    "MixedElement",
    "FunctionSpace",
    "VectorFunctionSpace",
    "MixedFunctionSpace",
]


class FiniteElement:
    def __init__(self, family, cell=None, degree=1, quad_scheme=None):
        self.family = family
        self.cell = cell
        self.degree = degree

    def __repr__(self):
        return f"FiniteElement({self.family}, degree={self.degree})"


class VectorElement(FiniteElement):
    def __init__(self, family, cell=None, degree=1, dim=None):
        super().__init__(family, cell, degree)
        self.dim = dim


class MixedElement:
    def __init__(self, elements_):
        self.sub_elements = list(elements_)


class _SpaceBase:
    """Common API shared by scalar/vector/mixed spaces."""

    mesh: Mesh

    def num_dofs(self):
        return self.ndof

    def dim(self):
        return self.ndof

    # dolfin API parity
    def mesh_(self):
        return self.mesh

    def ufl_element(self):
        return self.element

    @property
    def _ufl_element(self):
        class _E:
            def __init__(s, deg, fam):
                s._deg, s._fam = deg, fam

            def degree(s):
                return s._deg

            def family(s):
                return s._fam

        return _E(self.degree, getattr(self, "family", "CG"))


class FunctionSpace(_SpaceBase):
    """Scalar Lagrange space, CG (continuous) or DG (discontinuous)."""

    def __init__(self, mesh, family="CG", degree=1, constrained_domain=None):
        if isinstance(family, FiniteElement):
            degree = family.degree
            family = family.family
        self.mesh = mesh
        self.family = "CG" if family in ("CG", "Lagrange", "P") else "DG"
        self.degree = int(degree)
        self.value_shape = ()
        self.vdim = 1
        tdim = mesh.tdim
        self.ndof_el = (
            elements.num_dofs(tdim, max(self.degree, 1))
            if not (self.family == "DG" and self.degree == 0)
            else 1
        )
        if self.family == "CG":
            if self.degree == 1:
                self.cell_dofs = mesh.cells_array.copy()
                self.ndof = mesh.num_vertices()
                self.dof_coords = mesh.coords.copy()
            elif self.degree == 2:
                nv = mesh.num_vertices()
                ce = mesh.cell_edges()
                self.cell_dofs = np.concatenate(
                    [mesh.cells_array, nv + ce], axis=1
                ).astype(np.int32)
                self.ndof = nv + mesh.num_edges()
                ev = mesh.edges()
                edge_mid = 0.5 * (mesh.coords[ev[:, 0]] + mesh.coords[ev[:, 1]])
                self.dof_coords = np.concatenate([mesh.coords, edge_mid], axis=0)
            elif self.degree == 3:
                # dofs: [vertices | 2 per edge (near lower vertex first —
                # cell vertices are sorted ascending, so local edge (a, b)
                # orientation is globally consistent and no flip table is
                # needed) | face bubble (3D) / cell bubble (2D/1D)]
                nv = mesh.num_vertices()
                nc = mesh.num_cells()
                if tdim == 1:
                    ne = nc
                    ce = np.arange(nc, dtype=np.int64)[:, None]
                    ev = mesh.cells_array
                    bub = np.zeros((nc, 0), dtype=np.int64)
                    nb = 0
                    bub_coords = np.zeros((0, mesh.gdim))
                else:
                    ce = mesh.cell_edges()
                    ne = mesh.num_edges()
                    ev = mesh.edges()
                    if tdim == 3:
                        bub = mesh.cell_facets().astype(np.int64)
                        nb = mesh.num_facets()
                        fverts = mesh.facets()
                        bub_coords = mesh.coords[fverts].mean(axis=1)
                    else:
                        bub = np.arange(nc, dtype=np.int64)[:, None]
                        nb = nc
                        bub_coords = mesh.coords[mesh.cells_array].mean(axis=1)
                edge_pair = np.stack(
                    [nv + 2 * ce, nv + 2 * ce + 1], axis=2
                ).reshape(len(ce), -1)
                self.cell_dofs = np.concatenate(
                    [mesh.cells_array, edge_pair, nv + 2 * ne + bub], axis=1
                ).astype(np.int32)
                self.ndof = nv + 2 * ne + nb
                e3 = np.empty((2 * ne, mesh.gdim))
                e3[0::2] = (2 * mesh.coords[ev[:, 0]] + mesh.coords[ev[:, 1]]) / 3.0
                e3[1::2] = (mesh.coords[ev[:, 0]] + 2 * mesh.coords[ev[:, 1]]) / 3.0
                self.dof_coords = np.concatenate(
                    [mesh.coords, e3, bub_coords], axis=0
                )
            else:
                raise ValueError("only P1/P2/P3 CG supported")
        else:  # DG
            nc = mesh.num_cells()
            if self.degree == 0:
                self.cell_dofs = np.arange(nc, dtype=np.int32)[:, None]
                self.ndof = nc
                self.dof_coords = mesh.midpoints("cell")
            else:
                k = elements.num_dofs(tdim, self.degree)
                self.cell_dofs = np.arange(nc * k, dtype=np.int32).reshape(nc, k)
                self.ndof = nc * k
                ref = elements.dof_reference_coords(tdim, self.degree)
                X = mesh.coords[mesh.cells_array]  # (nc, nv, gdim)
                lam = np.concatenate(
                    [1 - ref.sum(axis=1, keepdims=True), ref], axis=1
                )  # (k, nv)
                self.dof_coords = np.einsum("kv,cvg->ckg", lam, X).reshape(-1, mesh.gdim)
        self.constrained_domain = constrained_domain
        self._periodic_master = None
        self.periodic_slaves = np.zeros(0, dtype=np.int64)
        if constrained_domain is not None:
            self._build_periodic_map(constrained_domain)
            # enforce the constraint structurally: element dofs reference the
            # master, so assembly accumulates periodic pairs together; slave
            # rows become orphans fixed post-solve (u[slave] = u[master])
            self.cell_dofs = self._periodic_master[self.cell_dofs].astype(
                np.int32
            )
            self.periodic_slaves = np.nonzero(
                self._periodic_master != np.arange(self.ndof)
            )[0]
        self.element = FiniteElement(self.family, mesh.ufl_cell(), self.degree)

    # -- periodic constraint (SolverBase.py:264 constrained_domain) ----------
    def _build_periodic_map(self, domain):
        """Map slave dofs onto master dofs via the domain's ``map`` method."""
        master = np.arange(self.ndof, dtype=np.int32)
        coords = self.dof_coords
        inside = domain._eval_points(coords, np.ones(len(coords), bool))
        slave_candidates = np.nonzero(~inside)[0]
        # ask the domain to map each point; match to a master dof by position
        from scipy.spatial import cKDTree

        master_idx = np.nonzero(inside)[0]
        if master_idx.size:
            tree = cKDTree(coords[master_idx])
            for s in slave_candidates:
                y = np.zeros(self.mesh.gdim)
                try:
                    domain.map(coords[s], y)
                except Exception:
                    continue
                d, j = tree.query(y)
                if d < 1e-10:
                    master[s] = master_idx[j]
        self._periodic_master = master

    # -- boundary/facet dofs ---------------------------------------------------
    def facet_dofs(self, facet_ids):
        """All dofs living on the given facets (vertices + facet-edge dofs
        for P2/P3 + the facet bubble for 3D P3)."""
        mesh = self.mesh
        fv = mesh.facets()[facet_ids]
        dofs = [np.unique(fv.ravel())]
        if self.family == "CG" and self.degree >= 2 and mesh.tdim >= 2:
            edge_lookup = self._edge_lookup()
            nvert = fv.shape[1]
            eids = []
            for a in range(nvert):
                for b in range(a + 1, nvert):
                    key = np.stack(
                        [np.minimum(fv[:, a], fv[:, b]), np.maximum(fv[:, a], fv[:, b])],
                        axis=1,
                    )
                    eids.append(edge_lookup(key))
            eu = np.unique(np.concatenate(eids))
            nv = mesh.num_vertices()
            if self.degree == 2:
                dofs.append(nv + eu)
            else:  # P3: two dofs per edge + 3D facet bubble
                dofs.append(np.stack([nv + 2 * eu, nv + 2 * eu + 1], 1).ravel())
                if mesh.tdim == 3:
                    dofs.append(
                        nv + 2 * mesh.num_edges()
                        + np.asarray(facet_ids, dtype=np.int64)
                    )
        if self.family == "DG":
            raise NotImplementedError("Dirichlet on DG handled weakly")
        return np.unique(np.concatenate(dofs)).astype(np.int32)

    def _edge_lookup(self):
        if not hasattr(self, "_edge_dict"):
            ev = self.mesh.edges()
            key = ev[:, 0].astype(np.int64) * self.mesh.num_vertices() + ev[:, 1]
            order = np.argsort(key)
            self._edge_keys_sorted = key[order]
            self._edge_ids_sorted = order.astype(np.int32)
            self._edge_dict = True

        def lookup(pairs):
            k = pairs[:, 0].astype(np.int64) * self.mesh.num_vertices() + pairs[:, 1]
            pos = np.searchsorted(self._edge_keys_sorted, k)
            return self._edge_ids_sorted[pos]

        return lookup

    def vertex_dofs(self, vertex_ids):
        return np.asarray(vertex_ids, dtype=np.int32)

    def component_dofs(self, dofs, component=None):
        return np.asarray(dofs, dtype=np.int32)

    def sub(self, i):
        if i != 0:
            raise IndexError("scalar space has a single component")
        return self

    @property
    def num_sub_spaces(self):
        return 0

    def collapse(self):
        return self

    def tabulate_dof_coordinates(self):
        return self.dof_coords

    def __repr__(self):
        return f"<FunctionSpace {self.family}{self.degree} ndof={self.ndof}>"


class _SubspaceView(_SpaceBase):
    """View of one component/block of a parent space (dolfin ``V.sub(i)``)."""

    def __init__(self, parent, index, kind):
        self.parent = parent
        self.index = index
        self.kind = kind  # 'component' (of vector) or 'block' (of mixed)
        self.mesh = parent.mesh

    def global_dofs(self, local_dofs):
        """Map subspace-local scalar dof ids to parent global dof ids."""
        if self.kind == "component":
            return np.asarray(local_dofs) * self.parent.vdim + self.index
        off = self.parent.sub_offsets[self.index]
        return off + np.asarray(local_dofs)

    def sub(self, j):
        if self.kind == "block":
            inner = self.parent.subspaces[self.index]
            if isinstance(inner, VectorFunctionSpace):
                return _NestedComponentView(self.parent, self.index, j)
        raise IndexError("no further subspaces")

    def collapse(self):
        if self.kind == "block":
            return self.parent.subspaces[self.index]
        return self.parent.scalar_space


class _NestedComponentView:
    """W.sub(block).sub(component) for mixed-of-vector spaces."""

    def __init__(self, mixed, block, comp):
        self.mixed = mixed
        self.block = block
        self.comp = comp

    def global_dofs(self, local_dofs):
        sub = self.mixed.subspaces[self.block]
        off = self.mixed.sub_offsets[self.block]
        return off + np.asarray(local_dofs) * sub.vdim + self.comp


class VectorFunctionSpace(_SpaceBase):
    """Vector Lagrange space; components interleaved node-major."""

    def __init__(self, mesh, family="CG", degree=1, dim=None, constrained_domain=None):
        self.scalar_space = FunctionSpace(mesh, family, degree, constrained_domain)
        self.mesh = mesh
        self.family = self.scalar_space.family
        self.degree = self.scalar_space.degree
        self.vdim = dim if dim is not None else mesh.gdim
        self.value_shape = (self.vdim,)
        s = self.scalar_space
        self.ndof = s.ndof * self.vdim
        self.ndof_el = s.ndof_el * self.vdim
        # node-major flattened: dof(node i, comp c) = sd*vdim + c
        cd = s.cell_dofs  # (nc, k) — already periodic-remapped if constrained
        self.cell_dofs = (
            (cd[:, :, None] * self.vdim) + np.arange(self.vdim)[None, None, :]
        ).reshape(cd.shape[0], -1).astype(np.int32)
        self.periodic_slaves = (
            (s.periodic_slaves[:, None] * self.vdim)
            + np.arange(self.vdim)[None, :]
        ).reshape(-1)
        if s._periodic_master is not None:
            self._periodic_master = (
                (s._periodic_master[:, None] * self.vdim)
                + np.arange(self.vdim)[None, :]
            ).reshape(-1)
        else:
            self._periodic_master = None
        self.dof_coords = np.repeat(s.dof_coords, self.vdim, axis=0)
        self.element = VectorElement(
            self.family, mesh.ufl_cell(), self.degree, dim=self.vdim
        )

    def facet_dofs(self, facet_ids, component=None):
        sd = self.scalar_space.facet_dofs(facet_ids)
        if component is None:
            return (
                (sd[:, None] * self.vdim) + np.arange(self.vdim)[None, :]
            ).ravel().astype(np.int32)
        return (sd * self.vdim + component).astype(np.int32)

    def sub(self, i):
        if not 0 <= i < self.vdim:
            raise IndexError(i)
        return _SubspaceView(self, i, "component")

    @property
    def num_sub_spaces(self):
        return self.vdim

    def tabulate_dof_coordinates(self):
        return self.dof_coords

    def __repr__(self):
        return (
            f"<VectorFunctionSpace {self.family}{self.degree} vdim={self.vdim} "
            f"ndof={self.ndof}>"
        )


class MixedFunctionSpace(_SpaceBase):
    """Concatenation of subspaces over one mesh (Taylor-Hood etc.).

    Global dofs: subspace k's dofs occupy [offset_k, offset_k + ndof_k).
    """

    def __init__(self, subspaces):
        self.subspaces = list(subspaces)
        self.mesh = self.subspaces[0].mesh
        self.degree = max(s.degree for s in self.subspaces)
        self.sub_offsets = np.cumsum([0] + [s.ndof for s in self.subspaces])[:-1]
        self.ndof = int(sum(s.ndof for s in self.subspaces))
        self.ndof_el = int(sum(s.ndof_el for s in self.subspaces))
        parts = [
            s.cell_dofs + off for s, off in zip(self.subspaces, self.sub_offsets)
        ]
        self.cell_dofs = np.concatenate(parts, axis=1).astype(np.int32)
        self.value_shape = ("mixed",)
        self.vdim = 1
        self.element = MixedElement([s.element for s in self.subspaces])

    def sub(self, i):
        return _SubspaceView(self, i, "block")

    @property
    def dof_coords(self):
        """Concatenated subspace dof coordinates (the geometric partition
        key for the distributed halo solvers: u and p dofs at the same
        point land on the same rank)."""
        return np.concatenate([s.dof_coords for s in self.subspaces], axis=0)

    @property
    def num_sub_spaces(self):
        return len(self.subspaces)

    def slice_of(self, i):
        off = self.sub_offsets[i]
        return slice(int(off), int(off + self.subspaces[i].ndof))

    def split_array(self, x):
        return [x[self.slice_of(i)] for i in range(len(self.subspaces))]

    def __repr__(self):
        return f"<MixedFunctionSpace {self.subspaces} ndof={self.ndof}>"
