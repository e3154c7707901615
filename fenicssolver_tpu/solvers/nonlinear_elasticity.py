"""Hyperelastic (compressible neo-Hookean) solver.

Mirrors ``FenicsSolver/NonlinearElasticitySolver.py``: strain-energy density
``psi = mu/2 (Ic - 3) - mu ln J + lambda/2 (ln J)^2`` (``:59-67``), total
potential ``Pi = psi dx - body/boundary work`` (``:70-89``), residual
``F = derivative(Pi, u, v)`` and Jacobian ``J = derivative(F, u, du)``
(``:92-93``) — realized literally: the element residual is ``jax.grad`` of
the element energy and the Newton Jacobian its ``jax.jacfwd`` (Hessian), so
the energy-minimization structure of the reference carries over exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.mesh import MeshFunction
from ..ops import assembly, geometry
from .linear_elasticity import LinearElasticitySolver


def obstacle_gap(obstacle):
    """Signed-distance gap function of a rigid obstacle: ``gap(y) >= 0``
    separated, ``< 0`` penetrating, for a batch ``y`` of shape (nq, d).

    ``obstacle`` is a dict (``{"type": "plane", "point": .., "normal": ..}``
    with the normal pointing from the obstacle INTO the body, or
    ``{"type": "sphere", "center": .., "radius": ..}`` for contact on the
    outside of a rigid ball) or any jax-traceable callable y -> (nq,).
    Beyond parity: the reference has no contact mechanics at all
    (``Readme.md`` scope ends at FSI)."""
    if callable(obstacle):
        return obstacle
    typ = obstacle.get("type", "plane")
    if typ == "plane":
        p = jnp.asarray(np.asarray(obstacle["point"], dtype=np.float64))
        n = np.asarray(obstacle["normal"], dtype=np.float64)
        n = jnp.asarray(n / np.linalg.norm(n))
        return lambda y: (y - p) @ n
    if typ == "sphere":
        c = jnp.asarray(np.asarray(obstacle["center"], dtype=np.float64))
        r = float(obstacle["radius"])
        return lambda y: jnp.linalg.norm(y - c, axis=-1) - r
    raise ValueError(f"unknown obstacle type {typ!r}")


class NonlinearElasticitySolver(LinearElasticitySolver):
    def __init__(self, s):
        LinearElasticitySolver.__init__(self, s)
        self.settings["mixed_variable"] = ("displacement", "velocity", "pressure")

    def strain_energy_density(self, mu, lmbda, d):
        """psi(grad_u) at one quadrature point; override for other laws."""

        def psi(gradU):
            F = jnp.eye(d) + gradU
            C = F.T @ F
            Ic = jnp.trace(C)
            J = jnp.linalg.det(F)
            lnJ = jnp.log(J)
            return (mu / 2) * (Ic - d) - mu * lnJ + (lmbda / 2) * lnJ**2

        return psi

    def generate_form(self, time_iter_, u, v, u_current, u_prev):
        V = self.function_space
        mesh = self.mesh
        mu, lmbda = self.lame_parameters()
        deg = V.degree
        qdeg = 4  # reference sets form_compiler quadrature_degree 4 (:50-51)
        tab = geometry.basis_tables(mesh.tdim, deg, qdeg)
        ctx = geometry.build_cell_context(V, qdeg)
        phi = jnp.asarray(tab.phi)
        dphi = jnp.asarray(tab.dphi)
        qw = jnp.asarray(tab.qw)
        d = V.vdim
        ks = V.scalar_space.ndof_el
        psi = self.strain_energy_density(mu, lmbda, d)
        psi_q = jax.vmap(psi)

        bs = self.get_body_source()
        body_vec = None
        if bs is not None:
            b_arr = assembly.coeff_at_qp(bs, np.asarray(ctx.qpx), quad_pts=tab.qp)
            b_arr = np.asarray(b_arr, dtype=np.float64)
            body_vec = jnp.asarray(b_arr)  # (d,) or (nc, nq, d)

        def element_energy(ue, geom, aux_e):
            U = ue.reshape(ks, d)
            dphig = geometry.phys_grads(dphi, geom.Jinv)
            gradU = jnp.einsum("qkg,kv->qvg", dphig, U)
            wdet = qw * geom.detJ
            E = jnp.sum(wdet * psi_q(gradU))
            if body_vec is not None:
                uq = jnp.einsum("qk,kv->qv", phi, U)
                bq = aux_e["body"] if (aux_e is not None and "body" in aux_e) else body_vec
                bq = jnp.broadcast_to(bq, uq.shape)
                E = E - jnp.sum(wdet * jnp.einsum("qv,qv->q", bq, uq))
            return E

        aux = None
        if body_vec is not None and body_vec.ndim == 3:
            aux = {"body": body_vec}
            body_vec = jnp.zeros(d)  # placeholder; aux path used

        cell_kernel = jax.grad(element_energy, argnums=0)

        form = assembly.Form(space=V)
        form.cell_terms.append(
            assembly.CellTerm(kernel=cell_kernel, ctx=ctx, aux=aux)
        )
        # boundary tractions are dead loads: same facet terms as the linear
        # solver (they are constant contributions to the residual)
        dirichlet = self.update_boundary_conditions(time_iter_, form, qdeg)
        self._add_contact_terms(form, qdeg)
        form.finalize()
        return form, dirichlet

    def _add_contact_terms(self, form, qdeg):
        """Frictionless penalty contact against a rigid obstacle (beyond
        parity — no contact exists anywhere in ``/root/reference``).

        ``settings["contact_settings"] = {"boundary": SubDomain | None
        (None = every exterior facet), "obstacle": see
        :func:`obstacle_gap`, "penalty": k}`` adds the facet energy

            E_c = integral_Gamma  k/2 * min(0, gap(X + u))^2  dA

        over the REFERENCE surface measure (small-sliding penalty;
        standard for node/qp-to-rigid-surface contact).  The residual is
        ``jax.grad`` of the energy — the contact force is k * penetration
        along the obstacle's local normal (grad of the signed distance) —
        and the Newton Jacobian picks up the active-set stiffness through
        the same per-element ``jacfwd`` as every other term.  At
        equilibrium the integral of k * <gap>_- over the contact patch
        balances the applied load exactly (global equilibrium), which is
        what the tests anchor."""
        cs = self.settings.get("contact_settings")
        if not cs:
            return
        mesh = self.mesh
        V = self.function_space
        sub = cs.get("boundary")
        ext = mesh.exterior_facet_mask()
        if sub is not None:
            mf = MeshFunction("size_t", mesh, mesh.tdim - 1)
            mf.set_all(0)
            sub.mark(mf, 1)
            fids = mf.where_equal(1)
            fids = fids[ext[fids]].astype(np.int32)
        else:
            fids = np.flatnonzero(ext).astype(np.int32)
        if len(fids) == 0:
            raise ValueError("contact_settings.boundary marked no facets")
        gap = obstacle_gap(cs["obstacle"])
        k_pen = float(cs["penalty"])
        fctx = geometry.build_facet_context(V, fids, qdeg)
        fphi_tab, _, fw, _ = geometry.facet_basis_tables(
            mesh.tdim, V.degree, qdeg
        )
        fphi = jnp.asarray(fphi_tab)
        fwj = jnp.asarray(fw)
        d = V.vdim
        ks = V.scalar_space.ndof_el

        def facet_energy(ue, geom, aux_e):
            U = ue.reshape(ks, d)
            phif = fphi[geom.local_id]  # (nq, ks)
            uq = jnp.einsum("qk,kv->qv", phif, U)
            pen = jnp.minimum(gap(geom.qpx + uq), 0.0)
            return jnp.sum(fwj * geom.detF * 0.5 * k_pen * pen**2)

        form.facet_terms.append(
            assembly.FacetTerm(
                kernel=jax.grad(facet_energy, argnums=0), ctx=fctx
            )
        )
        self._contact_info = dict(
            fctx=fctx, gap=gap, k=k_pen, fphi=fphi, fw=fwj, ks=ks, d=d
        )

    def contact_force(self, u_values=None):
        """Total contact force vector: integral of k * <gap>_- times the
        obstacle normal (gradient of the signed distance) over the contact
        patch — equals the applied load at equilibrium."""
        ci = getattr(self, "_contact_info", None)
        if ci is None:
            raise RuntimeError("no contact_settings configured")
        u = jnp.asarray(
            self.w_current.values if u_values is None else u_values
        )
        fctx, gap = ci["fctx"], ci["gap"]
        ue = u[fctx.cell_dofs]  # (nf, k_total)

        def per_facet(ue_f, local_id, detF, qpx):
            U = ue_f.reshape(ci["ks"], ci["d"])
            phif = ci["fphi"][local_id]
            y = qpx + jnp.einsum("qk,kv->qv", phif, U)
            g = gap(y)
            nrm = jax.vmap(jax.grad(lambda p: gap(p[None, :])[0]))(y)
            pen = jnp.minimum(g, 0.0)
            return jnp.einsum(
                "q,qv->v", ci["fw"] * detF * (-ci["k"] * pen), nrm
            )

        f = jax.vmap(per_facet)(
            ue, fctx.local_id, fctx.detF, fctx.qpx
        )
        return np.asarray(jnp.sum(f, axis=0))

    def solve_form(self, F, u_, bcs):
        # Hessian can be indefinite far from equilibrium: dense LU / GMRES
        return self.solve_nonlinear_problem(F, u_, bcs, spd=False)
