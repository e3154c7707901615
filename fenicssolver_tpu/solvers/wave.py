"""Scalar wave propagation (acoustics / membrane dynamics).

The reference PROMISES wave propagation and never ships it
(``/root/reference/Readme.md:41`` "Solvers under development: ... wave
propagation").  Delivered here for the scalar wave equation

    u_tt = c^2 div(grad u) + f,

time-integrated with the IMPLICIT Newmark average-acceleration scheme
(beta = 1/4, gamma = 1/2 in u-form — trapezoidal, unconditionally stable,
O(dt^2)):

    M (u^{n+1} - 2 u^n + u^{n-1}) / dt^2
        + c^2 K (u^{n+1} + 2 u^n + u^{n-1}) / 4 = f^{n+1/2 avg}

The fictitious pre-state u^{-1} = u^0 - dt v^0 + dt^2/2 a^0 is built from
the configured initial velocity and the consistent initial acceleration
(one mass solve of a^0 = c^2 div grad u^0 + f), keeping the start
second-order.  Dirichlet boundaries via the standard taxonomy; natural
(reflecting, du/dn = 0) elsewhere.

Material: ``wave_speed`` (or ``speed_of_sound``).  Initial values:
``amplitude`` and optional ``amplitude_velocity``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.function import Function
from ..ops import assembly, geometry
from .solver_base import SolverBase, SolverError


class WavePropagationSolver(SolverBase):
    def __init__(self, s):
        s.setdefault("scalar_name", "amplitude")
        SolverBase.__init__(self, s)
        if not self.transient_settings.get("transient"):
            raise SolverError("WavePropagationSolver is inherently transient")

    def wave_speed(self):
        m = self.material
        c = m.get("wave_speed", m.get("speed_of_sound"))
        if c is None:
            raise SolverError(
                "material needs 'wave_speed' (or 'speed_of_sound')"
            )
        return float(self.get_material_value(c))

    # -- spatial operators ----------------------------------------------------
    def _tabulate(self):
        V = self.function_space
        mesh = self.mesh
        qdeg = 2 * V.degree
        tab = geometry.basis_tables(mesh.tdim, V.degree, qdeg)
        ctx = geometry.build_cell_context(V, qdeg)
        return tab, ctx

    def init_solver(self):
        SolverBase.init_solver(self)
        # u^{-1} from v0 and the CONSISTENT initial acceleration
        V = self.function_space
        dt = self.get_time_step(0)
        c = self.wave_speed()
        u0 = jnp.asarray(self.w_current.values)
        v0_spec = self.initial_values.get("amplitude_velocity", 0.0)
        if isinstance(v0_spec, np.ndarray) and v0_spec.size == V.ndof:
            v0 = jnp.asarray(v0_spec.reshape(-1))
        else:
            from ..core.function import interpolate

            v0 = (
                jnp.full(V.ndof, float(v0_spec))
                if np.isscalar(v0_spec)
                else jnp.asarray(
                    interpolate(self._as_interp(v0_spec), V).values
                )
            )
        # a0 = M^{-1} (f - c^2 K u0) with lumped mass (start-up only)
        tab, ctx = self._tabulate()
        phi = jnp.asarray(tab.phi)
        dphi = jnp.asarray(tab.dphi)
        qw = jnp.asarray(tab.qw)
        dphig = jnp.einsum("qkt,ctg->cqkg", dphi, ctx.Jinv)
        wdet = qw[None, :] * ctx.detJ[:, None]
        ue = u0[ctx.cell_dofs]
        gu = jnp.einsum("cqkg,ck->cqg", dphig, ue)
        Ku_e = jnp.einsum("cq,cqg,cqkg->ck", wdet, gu, dphig)
        Ku = (
            jnp.zeros(V.ndof)
            .at[ctx.cell_dofs.reshape(-1)]
            .add(Ku_e.reshape(-1))
        )
        fvec = jnp.zeros(V.ndof)
        bs = self.get_body_source()
        if bs is not None:
            b_arr = assembly.coeff_at_qp(
                bs, np.asarray(ctx.qpx), quad_pts=tab.qp
            )
            fe = jnp.einsum(
                "cq,qk->ck", wdet * jnp.asarray(np.asarray(b_arr)), phi
            )
            fvec = fvec.at[ctx.cell_dofs.reshape(-1)].add(fe.reshape(-1))
        # consistent mass solve M a0 = f - c^2 K u0 (row-sum lumping is
        # INVALID for P2 triangles: vertex basis integrals vanish)
        Me = jnp.einsum("cq,qa,qb->cab", wdet, phi, phi)
        mdiag = (
            jnp.zeros(V.ndof)
            .at[ctx.cell_dofs.reshape(-1)]
            .add(jnp.einsum("caa->ca", Me).reshape(-1))
        )
        cd = ctx.cell_dofs

        def M_mv(x):
            xe = x[cd]
            ye = jnp.einsum("cab,cb->ca", Me, xe)
            return (
                jnp.zeros(V.ndof).at[cd.reshape(-1)].add(ye.reshape(-1))
            )

        from ..la import krylov

        a0, _, _ = krylov.cg(
            M_mv,
            fvec - c * c * Ku,
            M=krylov.jacobi_preconditioner(mdiag),
            tol=1e-12,
            maxiter=500,
        )
        self.w_pp.values[:] = np.asarray(
            u0 - dt * v0 + 0.5 * dt * dt * a0
        )
        self.w_prev.values[:] = np.asarray(u0)

    def generate_form(self, time_iter_, trial, test, u_current, u_prev):
        """Newmark u-form residual for u^{n+1}; u^n = w_current (latest),
        u^{n-1} = w_prev (SolverBase rotates history post-solve)."""
        V = self.function_space
        dt = self.get_time_step(time_iter_)
        c = self.wave_speed()
        tab, ctx = self._tabulate()
        phi = jnp.asarray(tab.phi)
        dphi = jnp.asarray(tab.dphi)
        qw = jnp.asarray(tab.qw)
        un = jnp.asarray(self.w_current.values)
        unm1 = jnp.asarray(
            self.w_prev.values
            if time_iter_ >= 1
            else self.w_pp.values  # start-up: the fictitious u^{-1}
        )
        aux = {
            "Tprev": un[ctx.cell_dofs],
            "Tpp": unm1[ctx.cell_dofs],
        }
        body = None
        bs = self.get_body_source()
        if bs is not None:
            b_arr = assembly.coeff_at_qp(
                bs, np.asarray(ctx.qpx), quad_pts=tab.qp
            )
            body = jnp.asarray(np.asarray(b_arr, dtype=np.float64))
            aux["f"] = body

        inv_dt2 = 1.0 / (dt * dt)
        c2 = c * c

        def kernel(ue, geom, aux_e):
            dphig = geometry.phys_grads(dphi, geom.Jinv)
            wdet = qw * geom.detJ
            u_q = phi @ ue
            up_q = phi @ aux_e["Tprev"]
            upp_q = phi @ aux_e["Tpp"]
            # inertia: (u - 2 u^n + u^{n-1}) / dt^2
            r = inv_dt2 * jnp.einsum(
                "q,q,qk->k", wdet, u_q - 2.0 * up_q + upp_q, phi
            )
            # stiffness on the Newmark average (u + 2 u^n + u^{n-1}) / 4
            gu = geometry.interp_grad(dphig, ue)
            gp = geometry.interp_grad(dphig, aux_e["Tprev"])
            gpp = geometry.interp_grad(dphig, aux_e["Tpp"])
            gavg = 0.25 * (gu + 2.0 * gp + gpp)
            r = r + c2 * jnp.einsum("q,qg,qkg->k", wdet, gavg, dphig)
            if "f" in aux_e:
                r = r - jnp.einsum("q,q,qk->k", wdet, aux_e["f"], phi)
            return r

        form = assembly.Form(space=V)
        form.cell_terms.append(
            assembly.CellTerm(kernel=kernel, ctx=ctx, aux=aux)
        )
        form.finalize()

        # Dirichlet taxonomy (variable 'amplitude')
        dd = assembly.DirichletData(V.ndof)
        for key, boundary in self.boundary_conditions.items():
            fids = self.boundary_facet_ids(boundary["boundary_id"])
            values = boundary.get("values", [boundary])
            if isinstance(values, dict):
                values = list(values.values())
            for bc in values:
                if bc.get("type") == "Dirichlet":
                    val = self.translate_value(bc["value"])
                    dofs = V.facet_dofs(fids)
                    if callable(val):
                        dd.add(dofs, np.asarray(
                            [val(x) for x in V.dof_coords[dofs]]
                        ))
                    else:
                        dd.add(dofs, float(val))
        dd.finalize()
        return form, dd

    def solve_form(self, F, u_, bcs):
        return self.solve_linear_problem(F, u_, bcs, spd=True)

    def energy(self, u=None, u_prev=None, dt=None):
        """Discrete energy 1/2 ||v||_M^2 + c^2/2 ||grad u_mid||^2 with
        v = (u - u_prev)/dt at the half step (conserved by Newmark)."""
        u = jnp.asarray((u if u is not None else self.w_current).values)
        up = jnp.asarray(
            (u_prev if u_prev is not None else self.w_prev).values
        )
        dt = dt or self.get_time_step(self.current_step)
        c = self.wave_speed()
        tab, ctx = self._tabulate()
        phi = jnp.asarray(tab.phi)
        dphi = jnp.asarray(tab.dphi)
        qw = jnp.asarray(tab.qw)
        wdet = qw[None, :] * ctx.detJ[:, None]
        dphig = jnp.einsum("qkt,ctg->cqkg", dphi, ctx.Jinv)
        v_e = ((u - up) / dt)[ctx.cell_dofs]
        um_e = (0.5 * (u + up))[ctx.cell_dofs]
        v_q = jnp.einsum("qk,ck->cq", phi, v_e)
        g_q = jnp.einsum("cqkg,ck->cqg", dphig, um_e)
        ke = 0.5 * jnp.sum(wdet * v_q * v_q)
        pe = 0.5 * c * c * jnp.sum(wdet * jnp.sum(g_q * g_q, axis=-1))
        return float(ke + pe)
