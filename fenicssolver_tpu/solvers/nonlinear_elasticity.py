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

from ..ops import assembly, geometry
from .linear_elasticity import LinearElasticitySolver


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
        form.finalize()
        return form, dirichlet

    def solve_form(self, F, u_, bcs):
        # Hessian can be indefinite far from equilibrium: dense LU / GMRES
        return self.solve_nonlinear_problem(F, u_, bcs, spd=False)
