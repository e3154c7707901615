"""Transient large-deformation (finite-strain) solver on a mixed
(displacement, velocity, pressure) space.

Mirrors ``FenicsSolver/LargeDeformationSolver.py``: MixedElement([V, V, Q])
(``:46-56``), incompressible/compressible neo-Hookean 1st Piola-Kirchhoff
stress + mass-balance constraint (``stress()`` ``:93-110`` including the
nu = 0.5 singular branch), theta = 0.5 Crank-Nicolson two-equation system F1
(du/dt = v) + F2 (momentum) (``:112-127``), Nanson push-forward of boundary
tractions ``det(F) inv(F)^T t`` (``get_flux`` ``:73-76``), Newton solve
(``:149-152``), quadrature degree 4 (``:42-44``), transient-only (``:116``).
External work terms use the physically-standard sign (loads act along their
given direction; see SURVEY.md §2.6 on the reference's sign quirks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.expression import Constant, Expression
from ..core.function import Function
from ..core.spaces import (
    FunctionSpace,
    MixedFunctionSpace,
    VectorFunctionSpace,
)
from ..ops import assembly, geometry
from .nonlinear_elasticity import NonlinearElasticitySolver
from .solver_base import SolverError


class LargeDeformationSolver(NonlinearElasticitySolver):
    def __init__(self, s):
        self.degree_bump = 0
        NonlinearElasticitySolver.__init__(self, s)

    def generate_function_space(self, periodic_boundary=None):
        self.is_mixed_function_space = True
        deg = self.settings["fe_degree"]
        fam = self.settings["fe_family"]
        Vv = VectorFunctionSpace(self.mesh, fam, deg)
        Vv2 = VectorFunctionSpace(self.mesh, fam, deg)
        Q = FunctionSpace(self.mesh, fam, deg)
        self.function_space = MixedFunctionSpace([Vv, Vv2, Q])

    # -- traction push-forward (reference ``:73-76``) --------------------------
    def get_flux(self, gradU, mag_vector):
        d = gradU.shape[-1]
        F = jnp.eye(d) + gradU
        J = jnp.linalg.det(F)
        return J * jnp.linalg.inv(F).T @ mag_vector

    def generate_form(self, time_iter_, w_trial, w_test, w_current, w_prev):
        if not self.transient_settings["transient"]:
            raise SolverError("large deformation solver must be solved transiently")
        W = self.function_space
        mesh = self.mesh
        E = float(self.material["elastic_modulus"])
        nu = float(self.material["poisson_ratio"])
        mu = E / (2.0 * (1.0 + nu))
        incompressible = abs(nu - 0.5) < 1e-12
        lmbd = None if incompressible else E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))

        d = mesh.gdim
        Vu, Vv, Q = W.subspaces
        ku = Vu.scalar_space.ndof_el
        kp = Q.ndof_el
        deg = Vu.degree
        qdeg = 4
        tab_u = geometry.basis_tables(mesh.tdim, deg, qdeg)
        tab_p = geometry.basis_tables(mesh.tdim, Q.degree, qdeg)
        ctx = geometry.build_cell_context(W, qdeg)
        phi_u = jnp.asarray(tab_u.phi)
        dphi_u = jnp.asarray(tab_u.dphi)
        phi_p = jnp.asarray(tab_p.phi)
        qw = jnp.asarray(tab_u.qw)

        dt = self.get_time_step(time_iter_)
        q_theta = 0.5  # Crank-Nicolson (reference ``:122``)
        I = jnp.eye(d)

        nu_off = ku * d
        np_off = 2 * ku * d

        def split_w(we):
            U = we[:nu_off].reshape(ku, d)
            V = we[nu_off:np_off].reshape(ku, d)
            P = we[np_off:]
            return U, V, P

        def stress(gradU, p_q):
            """1st Piola-Kirchhoff stress + mass balance (reference :93-110)."""
            F = I + gradU
            J = jnp.linalg.det(F)
            B = F @ F.T
            T = -p_q * I + mu * (B - I)
            S = J * T @ jnp.linalg.inv(F).T
            if incompressible:
                pp = J - 1.0
            else:
                pp = p_q / lmbd + (J * J - 1.0)
            return S, pp

        stress_q = jax.vmap(stress)

        bs = self.get_body_source()
        body_vec = None
        if bs is not None:
            b_arr = assembly.coeff_at_qp(bs, np.asarray(ctx.qpx), quad_pts=tab_u.qp)
            body_vec = jnp.asarray(np.asarray(b_arr, dtype=np.float64))

        aux = {"wprev": jnp.asarray(w_prev.values)[ctx.cell_dofs]}

        def cell_kernel(we, geom, aux_e):
            U, V, P = split_w(we)
            U0, V0, P0 = split_w(aux_e["wprev"])
            dphig = geometry.phys_grads(dphi_u, geom.Jinv)  # (nq,ku,g)
            wdet = qw * geom.detJ

            u_q = jnp.einsum("qk,kv->qv", phi_u, U)
            u0_q = jnp.einsum("qk,kv->qv", phi_u, U0)
            v_q = jnp.einsum("qk,kv->qv", phi_u, V)
            v0_q = jnp.einsum("qk,kv->qv", phi_u, V0)
            p_q = phi_p @ P
            p0_q = phi_p @ P0
            gU = jnp.einsum("qkg,kv->qvg", dphig, U)
            gU0 = jnp.einsum("qkg,kv->qvg", dphig, U0)

            S, pp = stress_q(gU, p_q)
            S0, pp0 = stress_q(gU0, p0_q)

            # F1: (u - u0)/dt - (q v + (1-q) v0), tested with _u
            f1 = (u_q - u0_q) / dt - (q_theta * v_q + (1 - q_theta) * v0_q)
            r_u = jnp.einsum("q,qv,qk->kv", wdet, f1, phi_u)

            # F2 momentum: (v - v0)/dt _v + theta-weighted S : grad(_v)
            f2t = (v_q - v0_q) / dt
            r_v = jnp.einsum("q,qv,qk->kv", wdet, f2t, phi_u)
            S_mix = q_theta * S + (1 - q_theta) * S0
            r_v = r_v + jnp.einsum("q,qvg,qkg->kv", wdet, S_mix, dphig)
            if body_vec is not None:
                bq = jnp.broadcast_to(
                    aux_e["body"] if (aux_e is not None and "body" in aux_e)
                    else body_vec,
                    v_q.shape,
                )
                r_v = r_v - jnp.einsum("q,qv,qk->kv", wdet, bq, phi_u)

            # mass balance tested with _p
            pp_mix = q_theta * pp + (1 - q_theta) * pp0
            r_p = jnp.einsum("q,q,qk->k", wdet, pp_mix, phi_p)
            return jnp.concatenate([r_u.reshape(-1), r_v.reshape(-1), r_p])

        form = assembly.Form(space=W)
        form.cell_terms.append(assembly.CellTerm(kernel=cell_kernel, ctx=ctx, aux=aux))

        dirichlet = self._mixed_boundary_conditions(time_iter_, form, qdeg)
        form.finalize()
        return form, dirichlet

    # -- boundary conditions on the mixed space --------------------------------
    def _mixed_boundary_conditions(self, time_iter_, form, qdeg):
        W = self.function_space
        Vu, Vv, Q = W.subspaces
        dirichlet = assembly.DirichletData(W.ndof)
        for name, bc_settings in self.boundary_conditions.items():
            i = bc_settings["boundary_id"]
            fids = self.boundary_facet_ids(i)
            if len(fids) == 0:
                continue
            bc = bc_settings
            if "values" in bc_settings:
                items = (
                    bc_settings["values"]
                    if isinstance(bc_settings["values"], list)
                    else list(bc_settings["values"].values())
                )
            else:
                items = [bc_settings]
            for it in items:
                btype = it["type"]
                variable = it.get("variable", "displacement")
                if btype in ("Dirichlet", "displacement"):
                    block = {"displacement": 0, "velocity": 1, "pressure": 2}[
                        variable
                    ]
                    self._add_block_dirichlet(dirichlet, fids, block, it["value"])
                elif btype == "force":
                    value = it["value"]
                    value = self.translate_value(value) if callable(value) else value
                    if isinstance(value, Constant):
                        value = tuple(np.atleast_1d(value.value))
                    area = float(self.mesh.facet_areas()[fids].sum())
                    tvec = np.asarray(value, dtype=np.float64) / area
                    self._add_pushforward_traction(form, fids, tvec, qdeg)
                elif btype == "pressure":
                    p = float(self.translate_value(it["value"]))
                    self._add_pushforward_traction(form, fids, None, qdeg,
                                                   normal_scale=-p)
                elif btype == "stress":
                    g = it["value"]
                    if (
                        isinstance(g, tuple)
                        and len(g) == 2
                        and g[0] == "vertex_tensor_field"
                    ):
                        # FSI path: per-vertex Cauchy stress mapped from the
                        # fluid (FSISolver.update_solid_interface) — pulled
                        # back to the reference surface by Nanson's formula
                        self._add_tensor_field_traction(form, fids, g[1], qdeg)
                        continue
                    g = np.asarray(
                        g.value if isinstance(g, Constant) else g,
                        dtype=np.float64,
                    )
                    self._add_pushforward_traction(form, fids, g, qdeg)
                else:
                    raise SolverError(f"boundary type `{btype}` unsupported")
        return dirichlet.finalize()

    def _add_block_dirichlet(self, dirichlet, fids, block, bv):
        W = self.function_space
        sub = W.subspaces[block]
        off = int(W.sub_offsets[block])
        if block == 2:  # pressure scalar
            dofs = off + sub.facet_dofs(fids)
            dirichlet.add(dofs, float(self.translate_value(bv)))
            return
        sdofs = sub.scalar_space.facet_dofs(fids)
        coords = sub.scalar_space.dof_coords[sdofs]
        d = sub.vdim
        if isinstance(bv, (tuple, list)) and len(bv) == d and any(
            c is None for c in bv
        ):
            for axis_i, comp in enumerate(bv):
                if comp is None:
                    continue
                dofs = off + sdofs * d + axis_i
                dirichlet.add(dofs, float(self.translate_value(comp)))
            return
        val = self.translate_value(bv)
        if isinstance(val, Expression):
            vals = val.eval_at(coords, t=self.get_current_time())
        elif isinstance(val, Constant):
            vals = np.broadcast_to(np.atleast_1d(val.value), (len(sdofs), d))
        else:
            vals = np.broadcast_to(np.asarray(val, dtype=np.float64),
                                   (len(sdofs), d))
        for c in range(d):
            dirichlet.add(off + sdofs * d + c, vals[:, c])

    def _add_pushforward_traction(self, form, fids, tvec, qdeg, normal_scale=None):
        """R_v -= integral (det F inv(F)^T t) . _v ds — follower load."""
        W = self.function_space
        mesh = self.mesh
        Vu = W.subspaces[0]
        d = Vu.vdim
        ku = Vu.scalar_space.ndof_el
        fctx = geometry.build_facet_context(W, fids, qdeg)
        fphi_tab, fdphi_tab, fw, _ = geometry.facet_basis_tables(
            mesh.tdim, Vu.degree, qdeg
        )
        fphi = jnp.asarray(fphi_tab)
        fdphi = jnp.asarray(fdphi_tab)
        fwj = jnp.asarray(fw)
        nu_off = ku * d
        tv = None if tvec is None else jnp.asarray(tvec)
        ns = None if normal_scale is None else float(normal_scale)
        I = jnp.eye(d)

        def kernel(we, geom, aux_e):
            U = we[:nu_off].reshape(ku, d)
            phif = fphi[geom.local_id]  # (nq, ku)
            dphif = fdphi[geom.local_id]  # (nq, ku, tdim)
            dphig = jnp.einsum("qkt,tg->qkg", dphif, geom.Jinv)
            gU = jnp.einsum("qkg,kv->qvg", dphig, U)  # (nq,v,g)

            def push(gradU):
                F = I + gradU
                J = jnp.linalg.det(F)
                t_ref = tv if tv is not None else ns * geom.normal
                return J * jnp.linalg.inv(F).T @ t_ref

            t_q = jax.vmap(push)(gU)  # (nq, d)
            r_v = -jnp.einsum("q,qv,qk->kv", fwj * geom.detF, t_q, phif)
            r = jnp.zeros(we.shape[0], dtype=we.dtype)
            r = r.at[nu_off : 2 * nu_off].set(r_v.reshape(-1))
            return r

        form.facet_terms.append(assembly.FacetTerm(kernel=kernel, ctx=fctx))

    def _add_tensor_field_traction(self, form, fids, sigma_vertex, qdeg):
        """Traction from a P1 per-vertex Cauchy stress field (FSI coupling):
        force = int_cur sigma n da = int_ref J sigma F^-T N dA (Nanson), so
        the reference-surface traction is J sigma F^-T N with F = I + grad U
        traced from the current displacement — the large-deformation analog
        of ``LinearElasticitySolver._add_tensor_field_traction``."""
        if len(fids) == 0:
            return
        W = self.function_space
        mesh = self.mesh
        Vu = W.subspaces[0]
        d = Vu.vdim
        ku = Vu.scalar_space.ndof_el
        nu_off = ku * d
        fctx = geometry.build_facet_context(W, fids, qdeg)
        fphi_tab, fdphi_tab, fw, _ = geometry.facet_basis_tables(
            mesh.tdim, Vu.degree, qdeg
        )
        fphi = jnp.asarray(fphi_tab)
        fdphi = jnp.asarray(fdphi_tab)
        fwj = jnp.asarray(fw)
        from ..core import elements

        fv = mesh.facets()[np.asarray(fids)]
        _, fpts, _ = elements.facet_quadrature_in_cell(mesh.tdim, qdeg)
        lam = np.concatenate(
            [1 - fpts.sum(axis=1, keepdims=True), fpts], axis=1
        )
        sig_q = np.einsum("qv,fvab->fqab", lam, sigma_vertex[fv])
        aux = {"sig": jnp.asarray(sig_q)}
        I = jnp.eye(d)

        def kernel(we, geom, aux_e):
            U = we[:nu_off].reshape(ku, d)
            phif = fphi[geom.local_id]
            dphig = jnp.einsum("qkt,tg->qkg", fdphi[geom.local_id], geom.Jinv)
            gU = jnp.einsum("qkg,kv->qvg", dphig, U)

            def push(gradU, sig):
                F = I + gradU
                J = jnp.linalg.det(F)
                return J * sig @ (jnp.linalg.inv(F).T @ geom.normal)

            t_q = jax.vmap(push)(gU, aux_e["sig"])  # (nq, d)
            r_v = -jnp.einsum("q,qv,qk->kv", fwj * geom.detF, t_q, phif)
            r = jnp.zeros(we.shape[0], dtype=we.dtype)
            r = r.at[nu_off : 2 * nu_off].set(r_v.reshape(-1))
            return r

        form.facet_terms.append(
            assembly.FacetTerm(kernel=kernel, ctx=fctx, aux=aux)
        )

    def solve_form(self, F, w_, bcs):
        return self.solve_nonlinear_problem(F, w_, bcs, spd=False)

    # -- accessors --------------------------------------------------------------
    def displacement(self):
        return self.w_current.sub(0)

    def velocity(self):
        dt = self.get_time_step(self.current_step)
        W = self.function_space
        du = self.w_current.values[W.slice_of(0)] - self.w_prev.values[W.slice_of(0)]
        return Function(W.subspaces[0], du / dt)

    def plot_result(self):
        from ..utils import plotting

        plotting.plot(self.displacement())
