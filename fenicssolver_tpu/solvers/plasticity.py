"""Small-strain J2 (von Mises) plasticity with linear isotropic hardening.

The reference only PROMISES this solver — "plasticity will be implemented
in PlasticitySolver" (``FenicsSolver/LinearElasticitySolver.py:38``) and
``examples/run_all_tests.py:14`` excludes the absent ``test_plasticity.py``
— so this goes beyond reference parity, built the TPU-native way:

- the radial-return map runs AT QUADRATURE POINTS inside the residual
  kernel (vmapped over cells, jit-compiled);
- the CONSISTENT algorithmic tangent comes from per-element ``jax.jacfwd``
  of the mapped stress — no hand-derived C_ep, the autodiff of the return
  map IS the algorithmic tangent;
- state (plastic strain tensor, equivalent plastic strain) lives in
  per-cell-per-qp aux arrays, committed after each converged load step.

Plane-strain 2D and full 3D share one implementation: strains are embedded
in 3x3 tensors (the out-of-plane plastic flow of plane-strain J2 is then
automatic).

Settings: ``material`` adds ``yield_strength`` (initial flow stress) and
``hardening_modulus`` (linear isotropic hardening H; 0 = perfect
plasticity).  Load stepping uses the standard transient loop as the
quasi-static driver (one load increment per step), like the reference's
quasi-static elasticity transients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import assembly, geometry
from .linear_elasticity import LinearElasticitySolver


def radial_return(eps3, epsp, alpha, mu, kappa, sig_y, H):
    """J2 radial return for one quadrature point (all 3x3 tensors).

    Returns (sigma, epsp_new, alpha_new).  Written with ``jnp.where`` so it
    is differentiable and branch-free (jit/vmap-safe); autodiff through it
    yields the consistent algorithmic tangent.
    """
    I3 = jnp.eye(3)
    eps_e = eps3 - epsp
    tr = jnp.trace(eps_e)
    s_tr = 2.0 * mu * (eps_e - (tr / 3.0) * I3)
    p = kappa * tr
    norm_s = jnp.sqrt(jnp.sum(s_tr * s_tr) + 1e-300)
    f = norm_s - jnp.sqrt(2.0 / 3.0) * (sig_y + H * alpha)
    dgamma = jnp.maximum(f, 0.0) / (2.0 * mu + 2.0 / 3.0 * H)
    n = s_tr / norm_s
    s = s_tr - 2.0 * mu * dgamma * n
    sigma = s + p * I3
    epsp_new = epsp + dgamma * n
    alpha_new = alpha + jnp.sqrt(2.0 / 3.0) * dgamma
    return sigma, epsp_new, alpha_new


class PlasticitySolver(LinearElasticitySolver):
    def __init__(self, case_input):
        LinearElasticitySolver.__init__(self, case_input)
        self._init_plastic_state()

    def _init_plastic_state(self):
        V = self.function_space
        deg = V.degree
        qdeg = max(2 * (deg - 1), 1) + 1
        self._qdeg = qdeg
        from ..core import elements

        nq = elements.quadrature(self.mesh.tdim, qdeg)[1].shape[0]
        nc = self.mesh.num_cells()
        self._epsp = jnp.zeros((nc, nq, 3, 3))
        self._alpha = jnp.zeros((nc, nq))

    def _cached_form_eligible(self):
        """Never cache the transient form: the residual bakes the plastic
        state (``epsp``/``alpha`` aux, reassigned by ``_commit_state`` each
        load step), which is NOT step-invariant — a cached form would freeze
        the step-1 state and silently degenerate to elastic response."""
        return False

    def _material_constants(self):
        E = float(self.material["elastic_modulus"])
        nu = float(self.material["poisson_ratio"])
        mu = E / (2.0 * (1.0 + nu))
        kappa = E / (3.0 * (1.0 - 2.0 * nu))
        sig_y = float(self.material["yield_strength"])
        H = float(self.material.get("hardening_modulus", 0.0))
        return mu, kappa, sig_y, H

    def _strain3_at_qp(self, dphig, U):
        """(nq, k, d) grads x (k, d) dofs -> (nq, 3, 3) embedded strains."""
        d = U.shape[1]
        gradU = jnp.einsum("qkg,kv->qvg", dphig, U)
        eps = 0.5 * (gradU + jnp.swapaxes(gradU, 1, 2))
        nq = eps.shape[0]
        eps3 = jnp.zeros((nq, 3, 3))
        return eps3.at[:, :d, :d].set(eps)

    # -- form ------------------------------------------------------------------
    def generate_form(self, time_iter_, u, v, u_current, u_prev):
        V = self.function_space
        mesh = self.mesh
        mu, kappa, sig_y, H = self._material_constants()
        deg = V.degree
        qdeg = self._qdeg
        tab = geometry.basis_tables(mesh.tdim, deg, qdeg)
        ctx = geometry.build_cell_context(V, qdeg)
        phi = jnp.asarray(tab.phi)
        dphi = jnp.asarray(tab.dphi)
        qw = jnp.asarray(tab.qw)
        d = V.vdim
        ks = V.scalar_space.ndof_el

        aux = {"epsp": self._epsp, "alpha": self._alpha}
        bs = self.get_body_source()
        body_vec = None
        if bs is not None:
            b_arr = assembly.coeff_at_qp(
                bs, np.asarray(ctx.qpx), quad_pts=tab.qp
            )
            body_vec = jnp.asarray(np.asarray(b_arr, dtype=np.float64))

        rr = jax.vmap(radial_return, in_axes=(0, 0, 0, None, None, None, None))

        def cell_kernel(ue, geom, aux_e):
            U = ue.reshape(ks, d)
            dphig = geometry.phys_grads(dphi, geom.Jinv)
            eps3 = self._strain3_at_qp(dphig, U)
            sig3, _, _ = rr(
                eps3, aux_e["epsp"], aux_e["alpha"], mu, kappa, sig_y, H
            )
            sig = sig3[:, :d, :d]
            wdet = qw * geom.detJ
            r = jnp.einsum("q,qvg,qkg->kv", wdet, sig, dphig)
            if body_vec is not None:
                bq = jnp.broadcast_to(body_vec, (phi.shape[0], d))
                r = r - jnp.einsum("q,qv,qk->kv", wdet, bq, phi)
            return r.reshape(-1)

        form = assembly.Form(space=V)
        form.cell_terms.append(
            assembly.CellTerm(kernel=cell_kernel, ctx=ctx, aux=aux)
        )
        dirichlet = self.update_boundary_conditions(time_iter_, form, qdeg)
        form.finalize()
        self._ctx = ctx
        self._tab = tab
        return form, dirichlet

    # -- solve: Newton + state commit ------------------------------------------
    def solve_form(self, F, u_, bcs):
        u_ = self.solve_nonlinear_problem(F, u_, bcs, spd=False)
        self._commit_state(u_)
        return u_

    def _commit_state(self, u_):
        mu, kappa, sig_y, H = self._material_constants()
        ctx, tab = self._ctx, self._tab
        d = self.function_space.vdim
        ks = self.function_space.scalar_space.ndof_el
        dphi = jnp.asarray(tab.dphi)
        Ue = jnp.asarray(u_.values)[ctx.cell_dofs].reshape(-1, ks, d)
        rr = jax.vmap(
            jax.vmap(radial_return, in_axes=(0, 0, 0, None, None, None, None)),
            in_axes=(0, 0, 0, None, None, None, None),
        )

        def strain_cell(U, Jinv):
            dphig = geometry.phys_grads(dphi, Jinv)
            return self._strain3_at_qp(dphig, U)

        eps3 = jax.vmap(strain_cell)(Ue, ctx.Jinv)
        _, self._epsp, self._alpha = rr(
            eps3, self._epsp, self._alpha, mu, kappa, sig_y, H
        )

    # -- post-processing ---------------------------------------------------------
    def cauchy_stress_qp(self, u_=None):
        """Mapped (elastoplastic) Cauchy stress at quadrature points,
        (nc, nq, 3, 3) — NOT the parent's elastic formula."""
        u_ = u_ or self.w_current
        mu, kappa, sig_y, H = self._material_constants()
        ctx, tab = self._ctx, self._tab
        d = self.function_space.vdim
        ks = self.function_space.scalar_space.ndof_el
        dphi = jnp.asarray(tab.dphi)
        Ue = jnp.asarray(u_.values)[ctx.cell_dofs].reshape(-1, ks, d)
        rr = jax.vmap(
            jax.vmap(radial_return, in_axes=(0, 0, 0, None, None, None, None)),
            in_axes=(0, 0, 0, None, None, None, None),
        )

        def strain_cell(U, Jinv):
            dphig = geometry.phys_grads(dphi, Jinv)
            return self._strain3_at_qp(dphig, U)

        eps3 = jax.vmap(strain_cell)(Ue, ctx.Jinv)
        sig3, _, _ = rr(eps3, self._epsp, self._alpha, mu, kappa, sig_y, H)
        return sig3

    def equivalent_plastic_strain(self):
        """Accumulated equivalent plastic strain per cell/qp (nc, nq)."""
        return self._alpha
