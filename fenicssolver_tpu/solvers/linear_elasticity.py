"""Small-strain linear elasticity solver.

Mirrors ``FenicsSolver/LinearElasticitySolver.py``: vector Lagrange space
named 'displacement' (``:56``), Hooke stress ``sigma = 2 mu sym(grad u)
+ lambda div(u) I`` (``:62-69``), thermal stress
``E/(1-2nu) alpha (T-Tref) I`` (``:78-85``), von Mises post-processing
(``:71-76``), per-component Dirichlet with ``None`` = unconstrained
(``:122-134``), force / pressure / stress boundaries (``:165-196``),
AMG-class solve for 3D (``:247-253``), modal analysis (``solve_modal``,
``:270-312`` — completed here with the mass matrix the reference left
missing), ``displacement()``/``velocity()`` accessors for FSI (``:255-268``).

Sign conventions are the standard ones (the reference's ``F += traction``
with dolfin lhs/rhs extraction silently negates applied loads — an
eyeball-verified quirk, SURVEY.md §2.6): positive 'stress'/'force' pulls
along the given vector, positive 'pressure' compresses along -n.
"""

from __future__ import annotations

import numbers

import jax.numpy as jnp
import numpy as np

from ..core.expression import Constant, Expression
from ..core.function import Function
from ..core.spaces import FunctionSpace
from ..ops import assembly, geometry
from .solver_base import SolverBase, SolverError


class LinearElasticitySolver(SolverBase):
    def __init__(self, case_settings):
        case_settings["vector_name"] = "displacement"
        SolverBase.__init__(self, case_settings)
        self.solving_modal = False
        self.solving_dynamics = False

    # -- material ------------------------------------------------------------
    def lame_parameters(self):
        E = float(self.material["elastic_modulus"])
        nu = float(self.material["poisson_ratio"])
        mu = E / (2.0 * (1.0 + nu))
        lmbda = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
        return mu, lmbda

    # -- post-processing -------------------------------------------------------
    def sigma_at_qp(self, u, quad_degree=2):
        """Cauchy stress at quadrature points: (nc, nq, d, d)."""
        V = self.function_space
        mu, lmbda = self.lame_parameters()
        tab = geometry.basis_tables(self.mesh.tdim, V.degree, quad_degree)
        ctx = geometry.build_cell_context(V, quad_degree)
        dphi = jnp.asarray(tab.dphi)
        kd = V.scalar_space.ndof_el
        d = V.vdim
        U = jnp.asarray(u.values).reshape(-1, d)[
            np.asarray(V.scalar_space.cell_dofs)
        ]  # (nc, k, d)
        dphig = jnp.einsum("qkt,ctg->cqkg", dphi, ctx.Jinv)
        gradU = jnp.einsum("cqkg,ckv->cqvg", dphig, U)
        eps = 0.5 * (gradU + jnp.swapaxes(gradU, 2, 3))
        tr = jnp.trace(eps, axis1=2, axis2=3)
        I = jnp.eye(d)
        return 2 * mu * eps + lmbda * tr[:, :, None, None] * I

    def von_Mises(self, u):
        """Project the von Mises stress onto P1 (reference ``:71-76``)."""
        d = self.dimension
        qdeg = max(2 * (self.function_space.degree - 1), 1)
        s = self.sigma_at_qp(u, qdeg)
        tr = jnp.trace(s, axis1=2, axis2=3)
        dev = s - tr[:, :, None, None] * jnp.eye(d) / 3.0
        vm = jnp.sqrt(1.5 * jnp.sum(dev * dev, axis=(2, 3)))  # (nc, nq)
        V1 = FunctionSpace(self.mesh, "P", 1)
        return assembly.l2_project(None, V1, quad_degree=qdeg, rhs_values=vm)

    def strain_energy(self, u):
        """Total strain energy 1/2 int sigma:eps dx (fixes the reference's
        broken ``strain_energy`` at ``:87-93``)."""
        V = self.function_space
        qdeg = max(2 * (V.degree - 1), 1)
        from ..core import elements

        s = self.sigma_at_qp(u, qdeg)
        mu, lmbda = self.lame_parameters()
        # eps from sigma: reuse sigma_at_qp pieces cheaply
        tab = geometry.basis_tables(self.mesh.tdim, V.degree, qdeg)
        ctx = geometry.build_cell_context(V, qdeg)
        dphi = jnp.asarray(tab.dphi)
        U = jnp.asarray(u.values).reshape(-1, V.vdim)[
            np.asarray(V.scalar_space.cell_dofs)
        ]
        dphig = jnp.einsum("qkt,ctg->cqkg", dphi, ctx.Jinv)
        gradU = jnp.einsum("cqkg,ckv->cqvg", dphig, U)
        eps = 0.5 * (gradU + jnp.swapaxes(gradU, 2, 3))
        dens = 0.5 * jnp.sum(s * eps, axis=(2, 3))
        qw = jnp.asarray(tab.qw)
        return float(jnp.sum(jnp.einsum("q,cq,c->c", qw, dens, ctx.detJ)))

    def get_flux(self, u, mag_vector):
        """Pass-through traction hook; LargeDeformation overrides with the
        Nanson push-forward (reference ``:95-97``)."""
        return mag_vector

    # -- form ------------------------------------------------------------------
    def generate_form(self, time_iter_, u, v, u_current, u_prev):
        V = self.function_space
        mesh = self.mesh
        mu, lmbda = self.lame_parameters()
        deg = V.degree
        qdeg = max(2 * (deg - 1), 1) + 1
        tab = geometry.basis_tables(mesh.tdim, deg, qdeg)
        ctx = geometry.build_cell_context(V, qdeg)
        qpx_np = np.asarray(ctx.qpx)

        phi = jnp.asarray(tab.phi)
        dphi = jnp.asarray(tab.dphi)
        qw = jnp.asarray(tab.qw)
        d = V.vdim
        ks = V.scalar_space.ndof_el
        I = jnp.eye(d)

        aux = {}
        # thermal stress coefficient field (reference ``:230-239``)
        therm_arr = None
        td = self.settings.get("temperature_distribution")
        if td is None and hasattr(self, "temperature_distribution"):
            td = self.temperature_distribution
        if td is not None:
            self.temperature_distribution = td
            E = float(self.material["elastic_modulus"])
            nu = float(self.material["poisson_ratio"])
            tec = float(self.material["thermal_expansion_coefficient"])
            Tref = float(self.reference_values.get("temperature", 293))
            Tv = self.translate_value(td)
            T_arr = assembly.coeff_at_qp(Tv, qpx_np, quad_pts=tab.qp)
            coeff = E / (1.0 - 2.0 * nu) * tec
            if isinstance(T_arr, float):
                therm_arr = ("scalar", coeff * (T_arr - Tref))
            else:
                aux["thermT"] = jnp.asarray(coeff * (np.asarray(T_arr) - Tref))
                therm_arr = ("array", None)

        # body source vector (gravity etc.)
        bs = self.get_body_source()
        body_kind = None
        if bs is not None:
            b_arr = assembly.coeff_at_qp(bs, qpx_np, quad_pts=tab.qp)
            b_arr = np.asarray(b_arr, dtype=np.float64)
            if b_arr.ndim == 1:  # constant vector
                body_kind = ("const", jnp.asarray(b_arr))
            else:
                aux["body"] = jnp.asarray(b_arr)
                body_kind = ("array", None)

        # transient dynamics: explicit inertia from acceleration history
        # (reference ``:216-220``)
        inertia = None
        if (
            self.transient_settings["transient"]
            and self.solving_dynamics
            and time_iter_ >= 1
        ):
            rho = float(self.material["density"])
            accel = self.get_acceleration(time_iter_)  # (ndof,)
            aux["accel"] = jnp.asarray(accel)[ctx.cell_dofs]
            inertia = rho

        def cell_kernel(ue, geom, aux_e):
            U = ue.reshape(ks, d)
            dphig = geometry.phys_grads(dphi, geom.Jinv)  # (nq,k,g)
            gradU = jnp.einsum("qkg,kv->qvg", dphig, U)
            eps = 0.5 * (gradU + jnp.swapaxes(gradU, 1, 2))
            sig = 2 * mu * eps + lmbda * jnp.trace(eps, axis1=1, axis2=2)[
                :, None, None
            ] * I
            if therm_arr is not None:
                if therm_arr[0] == "scalar":
                    sig = sig - therm_arr[1] * I
                else:
                    sig = sig - aux_e["thermT"][:, None, None] * I
            wdet = qw * geom.detJ
            r = jnp.einsum("q,qvg,qkg->kv", wdet, sig, dphig)
            if body_kind is not None:
                bq = body_kind[1] if body_kind[0] == "const" else aux_e["body"]
                bq = jnp.broadcast_to(bq, (phi.shape[0], d))
                r = r - jnp.einsum("q,qv,qk->kv", wdet, bq, phi)
            if inertia is not None:
                acc_e = aux_e["accel"].reshape(ks, d)
                acc_q = jnp.einsum("qk,kv->qv", phi, acc_e)
                r = r + inertia * jnp.einsum("q,qv,qk->kv", wdet, acc_q, phi)
            return r.reshape(-1)

        form = assembly.Form(space=V)
        form.cell_terms.append(
            assembly.CellTerm(kernel=cell_kernel, ctx=ctx, aux=aux or None)
        )

        dirichlet = self.update_boundary_conditions(time_iter_, form, qdeg)
        form.finalize()
        return form, dirichlet

    # -- boundary conditions ----------------------------------------------------
    def update_boundary_conditions(self, time_iter_, form, qdeg):
        V = self.function_space
        dirichlet = assembly.DirichletData(V.ndof)

        ss = self.settings.get("surface_source")
        if ss:
            gS = self.translate_value(ss["value"])
            fids = self.mesh.exterior_facets()
            if ss.get("direction"):
                self._add_traction(form, fids, vector=ss["direction"], scale=gS,
                                   qdeg=qdeg)
            else:
                self._add_traction(form, fids, normal_scale=gS, qdeg=qdeg)

        for name, bc_settings in self.boundary_conditions.items():
            i = bc_settings["boundary_id"]
            bc = self.get_boundary_variable(bc_settings, "displacement")
            btype = bc["type"]
            fids = self.boundary_facet_ids(i)
            if btype in ("Dirichlet", "displacement"):
                self._add_vector_dirichlet(dirichlet, fids, bc["value"])
            elif btype == "force":
                value = bc["value"]
                if isinstance(value, Constant) and value.value.ndim == 1:
                    value = tuple(np.asarray(value.value))
                areas = self.mesh.facet_areas()[fids]
                area = float(areas.sum())
                if isinstance(value, (tuple, list)) and len(value) == self.dimension:
                    tvec = np.asarray(value, dtype=np.float64) / area
                    self._add_traction(form, fids, vector=tvec, qdeg=qdeg)
                else:
                    g = float(self.translate_value(value)) / area
                    if bc.get("direction"):
                        self._add_traction(form, fids, vector=bc["direction"],
                                           scale=g, qdeg=qdeg)
                    else:
                        self._add_traction(form, fids, normal_scale=g, qdeg=qdeg)
            elif btype == "pressure":
                p = self.translate_value(bc["value"])
                if bc.get("direction"):
                    self._add_traction(form, fids, vector=bc["direction"],
                                       scale=-1.0 * float(p), qdeg=qdeg)
                else:
                    # positive pressure compresses: traction = -p n
                    self._add_traction(form, fids, normal_scale=-float(p), qdeg=qdeg)
            elif btype == "stress":
                g = bc["value"]
                if (
                    isinstance(g, tuple)
                    and len(g) == 2
                    and g[0] == "vertex_tensor_field"
                ):
                    # FSI path: per-vertex stress tensors mapped from the
                    # fluid (FSISolver.update_solid_interface)
                    self._add_tensor_field_traction(form, fids, g[1], qdeg)
                    continue
                if isinstance(g, Constant):
                    g = np.asarray(g.value)
                else:
                    g = np.asarray(self.translate_value(g) if not isinstance(
                        g, (tuple, list, np.ndarray)) else g, dtype=np.float64)
                if g.ndim == 2:  # stress tensor: traction = sigma . n
                    self._add_traction(form, fids, tensor=g, qdeg=qdeg)
                else:
                    self._add_traction(form, fids, vector=g, qdeg=qdeg)
            elif btype in ("Neumann", "symmetry"):
                raise SolverError(f"boundary type `{btype}` is not supported")
            else:
                raise SolverError(f"boundary type `{btype}` is not supported")
        return dirichlet.finalize()

    def _add_vector_dirichlet(self, dirichlet, fids, bv):
        """Full-vector or per-component (None = free) displacement constraint."""
        if len(fids) == 0:
            return
        V = self.function_space
        if isinstance(bv, (tuple, list)) and len(bv) == self.dimension:
            comps = list(bv)
            full_vec = all(isinstance(c, numbers.Number) for c in comps)
            if not full_vec:
                for axis_i, disp in enumerate(comps):
                    if disp is None:
                        continue
                    dofs = V.facet_dofs(fids, component=axis_i)
                    val = self.translate_value(disp)
                    dirichlet.add(dofs, self._scalar_vals(val, dofs))
                return
            bv = Constant(tuple(float(c) for c in comps))
        val = self.translate_value(bv)
        scalar_dofs = V.scalar_space.facet_dofs(fids)
        coords = V.scalar_space.dof_coords[scalar_dofs]
        if isinstance(val, Expression):
            vals = val.eval_at(coords, t=self.get_current_time())  # (n, d)
        elif isinstance(val, Constant):
            vals = np.broadcast_to(
                np.atleast_1d(val.value), (len(scalar_dofs), V.vdim)
            )
        elif isinstance(val, Function):
            vals = val.values.reshape(-1, V.vdim)[scalar_dofs]
        else:
            vals = np.broadcast_to(np.asarray(val), (len(scalar_dofs), V.vdim))
        for c in range(V.vdim):
            dirichlet.add(scalar_dofs * V.vdim + c, vals[:, c])

    def _scalar_vals(self, val, dofs):
        if isinstance(val, Expression):
            coords = self.function_space.dof_coords[dofs]
            return val.eval_at(coords, t=self.get_current_time())
        if isinstance(val, Constant):
            return float(val.value)
        if isinstance(val, Function):
            return val.values[dofs]
        return float(val)

    def _add_traction(
        self, form, fids, vector=None, tensor=None, normal_scale=None,
        scale=None, qdeg=2,
    ):
        """R -= integral t . v ds with t a vector, sigma.n, or s*n."""
        if len(fids) == 0:
            return
        V = self.function_space
        fctx = geometry.build_facet_context(V, fids, qdeg)
        fphi_tab, _, fw, _ = geometry.facet_basis_tables(
            self.mesh.tdim, V.degree, qdeg
        )
        fphi = jnp.asarray(fphi_tab)
        fwj = jnp.asarray(fw)
        d = V.vdim
        ks = V.scalar_space.ndof_el
        aux = None
        if vector is not None:
            vec = np.asarray(
                vector.value if isinstance(vector, Constant) else vector,
                dtype=np.float64,
            )
            if np.isscalar(scale) or isinstance(scale, numbers.Number):
                vec = vec * float(scale if scale is not None else 1.0)
            tvec = jnp.asarray(vec)

            def kernel(ue, geom, aux_e):
                phif = fphi[geom.local_id]  # (nq, ks)
                r = -jnp.einsum("q,v,qk->kv", fwj * geom.detF,
                                tvec, phif)
                return r.reshape(-1)

        elif tensor is not None:
            Tt = jnp.asarray(tensor)

            def kernel(ue, geom, aux_e):
                phif = fphi[geom.local_id]
                t = Tt @ geom.normal  # (d,)
                r = -jnp.einsum("q,v,qk->kv", fwj * geom.detF, t, phif)
                return r.reshape(-1)

        else:  # normal traction: t = s * n
            s = float(normal_scale)

            def kernel(ue, geom, aux_e):
                phif = fphi[geom.local_id]
                t = s * geom.normal
                r = -jnp.einsum("q,v,qk->kv", fwj * geom.detF, t, phif)
                return r.reshape(-1)

        form.facet_terms.append(
            assembly.FacetTerm(kernel=kernel, ctx=fctx, aux=aux)
        )

    def _add_tensor_field_traction(self, form, fids, sigma_vertex, qdeg):
        """Traction from a P1 per-vertex stress tensor field: t = sigma . n
        evaluated at facet quadrature points (FSI coupling)."""
        if len(fids) == 0:
            return
        V = self.function_space
        mesh = self.mesh
        d = V.vdim
        ks = V.scalar_space.ndof_el
        fctx = geometry.build_facet_context(V, fids, qdeg)
        fphi_tab, _, fw, _ = geometry.facet_basis_tables(mesh.tdim, V.degree, qdeg)
        fphi = jnp.asarray(fphi_tab)
        fwj = jnp.asarray(fw)
        # interpolate vertex tensors to facet quadrature points (P1 on facet)
        from ..core import elements

        fv = mesh.facets()[np.asarray(fids)]
        _, fpts, _ = elements.facet_quadrature_in_cell(mesh.tdim, qdeg)
        lam = np.concatenate([1 - fpts.sum(axis=1, keepdims=True), fpts], axis=1)
        sig_q = np.einsum("qv,fvab->fqab", lam, sigma_vertex[fv])  # (nf,nq,d,d)
        n = np.asarray(fctx.normal)
        t_q = np.einsum("fqab,fb->fqa", sig_q, n)  # (nf, nq, d)
        aux = {"t": jnp.asarray(t_q)}

        def kernel(ue, geom, aux_e):
            phif = fphi[geom.local_id]
            r = -jnp.einsum("q,qv,qk->kv", fwj * geom.detF, aux_e["t"], phif)
            return r.reshape(-1)

        form.facet_terms.append(assembly.FacetTerm(kernel=kernel, ctx=fctx, aux=aux))

    # -- solve -------------------------------------------------------------------
    def solve_form(self, F, u_, bcs):
        sp = self._solver_params()
        if sp.get("distributed"):
            # distributed routing happens inside solve_static (sharded
            # vector lattice GMG on BoxMesh, halo CG otherwise) — do not
            # divert to the serial AMG path
            return self.solve_linear_problem(F, u_, bcs, spd=True)
        if self.dimension == 3 and self.function_space.ndof > 6000:
            return self.solve_amg(F, u_, bcs)
        return self.solve_linear_problem(F, u_, bcs, spd=True)

    # -- accessors (FSI) ----------------------------------------------------------
    def displacement(self):
        if self.is_mixed_function_space:
            raise SolverError("mixed-space subclass must override displacement()")
        return self.w_current

    def velocity(self):
        dt = self.get_time_step(self.current_step)
        if self.is_mixed_function_space:
            raise SolverError("mixed-space subclass must override velocity()")
        return Function(
            self.function_space, (self.w_current.values - self.w_prev.values) / dt
        )

    # -- modal analysis (reference ``:270-312``; mass matrix completed) -----------
    def solve_modal(self, n_modes=6):
        """Generalized eigenproblem K x = lambda M x; returns (freqs_hz, modes).

        The reference's SLEPc path lacked the mass matrix (its ``:271`` TODO);
        here K and M are assembled consistently and the smallest modes are
        found with a shift-invert Lanczos (host scipy fallback; LOBPCG on
        device planned)."""
        self.init_solver()
        self.current_step = 0
        self.current_time = 0.0
        form, dirichlet = self.generate_form(0, None, None, self.w_current, self.w_prev)
        A, _ = assembly.assemble_linear_system(form)
        # consistent mass matrix via a mass-kernel form
        V = self.function_space
        rho = float(self.material["density"])
        qdeg = 2 * V.degree
        tab = geometry.basis_tables(self.mesh.tdim, V.degree, qdeg)
        ctx = geometry.build_cell_context(V, qdeg)
        phi = jnp.asarray(tab.phi)
        qw = jnp.asarray(tab.qw)
        ks, d = V.scalar_space.ndof_el, V.vdim

        def mass_kernel(ue, geom, aux_e):
            U = ue.reshape(ks, d)
            uq = jnp.einsum("qk,kv->qv", phi, U)
            r = rho * jnp.einsum("q,qv,qk->kv", qw * geom.detJ, uq, phi)
            return r.reshape(-1)

        mform = assembly.Form(space=V)
        mform.cell_terms.append(assembly.CellTerm(kernel=mass_kernel, ctx=ctx))
        mform.finalize()
        M = assembly.assemble_jacobian(mform, jnp.zeros(V.ndof))

        K_s = A.to_scipy()
        M_s = M.to_scipy()
        free = np.asarray(dirichlet.free_mask).astype(bool)
        Kf = K_s[free][:, free].tocsr()
        Mf = M_s[free][:, free].tocsr()
        backend = self._solver_params().get("modal_backend", "lobpcg")
        vals = vecs = None
        if backend == "lobpcg":
            try:
                vals, vecs = self._modal_lobpcg(Kf, Mf, free, n_modes)
            except Exception as e:
                self.logger.warning(
                    "device LOBPCG failed (%s); scipy shift-invert fallback", e
                )
        if vals is None:
            import scipy.sparse.linalg as spl

            vals, vecs = spl.eigsh(
                Kf.tocsc(), k=n_modes, M=Mf.tocsc(), sigma=0, which="LM"
            )
        freqs = np.sqrt(np.maximum(vals, 0)) / (2 * np.pi)
        modes = []
        for j in range(n_modes):
            full = np.zeros(V.ndof)
            full[free] = vecs[:, j]
            modes.append(Function(V, full))
        return freqs, modes

    def _modal_lobpcg(self, Kf, Mf, free, n_modes, tol=1e-6):
        """Device LOBPCG with an AMG V-cycle preconditioner (the SLEPc
        replacement running on TPU, VERDICT r1 item 10)."""
        from ..la.amg import AMGPreconditioner, rigid_body_modes
        from ..la.lobpcg import lobpcg
        from ..la.sparse import csr_from_scipy

        V = self.function_space
        B = rigid_body_modes(V.scalar_space.dof_coords, V.vdim)
        amg = AMGPreconditioner(Kf, nullspace=B[free])
        Kd = csr_from_scipy(Kf)
        Md = csr_from_scipy(Mf)
        nf = Kf.shape[0]
        X0 = jnp.asarray(
            np.random.default_rng(0).standard_normal((nf, n_modes))
        )
        vals, X, res, it = lobpcg(
            Kd.matvec, Md.matvec, X0, T=amg, tol=tol, maxiter=300
        )
        if not bool(jnp.all(res < 1e-5)):
            raise RuntimeError(
                f"LOBPCG stagnated (max rel res {float(res.max()):.2e} "
                f"after {it} iterations)"
            )
        self.logger.info("LOBPCG modal: %d iterations", it)
        return np.asarray(vals), np.asarray(X)
