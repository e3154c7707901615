"""PDE-constrained inverse problem via the adjoint method — a capability
the reference cannot offer at all (every solve is an opaque PETSc call;
there is no differentiation through a solution anywhere in
``/root/reference``).  Here the solution map is a ``jax.custom_vjp``
(``ops/adjoint.py``), so ``jax.value_and_grad`` of a data-mismatch
functional costs ONE forward and ONE adjoint solve regardless of the
number of parameters.

Scenario: steady heat conduction on the unit square, homogeneous
Dirichlet walls, uniform unit source.  The "true" thermal conductivity
has a square high-conductivity inclusion (kappa = 3 inside, 1 outside).
Temperature "measurements" are the full true field.  Starting from a
uniform guess, Adam on the adjoint gradient (with a log-parameterization
keeping kappa positive) must recover the inclusion: final mismatch tiny,
mean recovered conductivity inside/outside the inclusion within a few
percent of truth.
"""

import numpy as np

from config import is_interactive

interactively = is_interactive()

import jax
import jax.numpy as jnp


def test():
    import optax

    from fenicssolver_tpu.core.mesh import UnitSquareMesh
    from fenicssolver_tpu.core.spaces import FunctionSpace
    from fenicssolver_tpu.ops import assembly, geometry
    from fenicssolver_tpu.ops.adjoint import make_implicit_solver

    nx = 24
    mesh = UnitSquareMesh(nx, nx)
    V = FunctionSpace(mesh, "CG", 1)
    tab = geometry.basis_tables(mesh.tdim, 1, 2)
    dphi, qw, phi = (jnp.asarray(tab.dphi), jnp.asarray(tab.qw),
                     jnp.asarray(tab.phi))

    def kern(ue, geom, aux):
        dphig = geometry.phys_grads(dphi, geom.Jinv)
        g = geometry.interp_grad(dphig, ue)
        diff = aux["kappa"] * jnp.einsum("q,qg,qig->i", qw, g, dphig)
        src = jnp.einsum("q,qi->i", qw, phi)
        return (diff - src) * geom.detJ

    ctx = geometry.build_cell_context(V, 2)
    nc = mesh.num_cells()
    form = assembly.Form(space=V)
    form.cell_terms.append(assembly.CellTerm(
        kernel=kern, ctx=ctx, aux={"kappa": jnp.ones(nc)}))
    form.finalize()

    bdofs = np.asarray(V.facet_dofs(mesh.exterior_facets()))
    d = assembly.DirichletData(V.ndof)
    d.add(bdofs, np.zeros(len(bdofs)))
    d.finalize()

    solver = make_implicit_solver(form, d, linear=True, spd=True)

    # ground truth: square inclusion kappa=3 in [0.35,0.65]^2
    cc = np.asarray(mesh.coords[mesh.cells_array]).mean(axis=1)
    inside = ((np.abs(cc[:, 0] - 0.5) < 0.15)
              & (np.abs(cc[:, 1] - 0.5) < 0.15))
    kappa_true = jnp.asarray(np.where(inside, 3.0, 1.0))
    u_meas = solver({"kappa": kappa_true})

    # Tikhonov-free recovery with a log parameterization (kappa > 0)
    def loss(log_kappa):
        u = solver({"kappa": jnp.exp(log_kappa)})
        return jnp.sum((u - u_meas) ** 2) / jnp.sum(u_meas ** 2)

    vg = jax.jit(jax.value_and_grad(loss))
    theta = jnp.zeros(nc)  # kappa = 1 everywhere
    opt = optax.adam(0.25)
    state = opt.init(theta)
    l0 = float(loss(theta))
    for i in range(200):
        l, g = vg(theta)
        upd, state = opt.update(g, state)
        theta = optax.apply_updates(theta, upd)
        if interactively and i % 20 == 0:
            print(f"iter {i:3d}  mismatch {float(l):.3e}")
    lN = float(loss(theta))
    kappa_rec = np.asarray(jnp.exp(theta))

    print(f"adjoint inverse problem: mismatch {l0:.3e} -> {lN:.3e} "
          f"({nc} parameters, 200 Adam steps)")
    mean_in = float(kappa_rec[inside].mean())
    mean_out = float(kappa_rec[~inside].mean())
    print(f"recovered kappa: inclusion {mean_in:.3f} (true 3.0), "
          f"background {mean_out:.3f} (true 1.0)")

    assert lN < 1e-3 * l0, (l0, lN)
    # conductivity identifiability is imperfect (flux nulls), so bound the
    # MEANS, not pointwise values
    assert abs(mean_out - 1.0) < 0.05, mean_out
    assert mean_in > 2.0, mean_in

    if interactively:
        try:
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(1, 2, figsize=(9, 4))
            for a, k, t in ((0, np.asarray(kappa_true), "true"),
                            (1, kappa_rec, "recovered")):
                sc = ax[a].scatter(cc[:, 0], cc[:, 1], c=k, s=8,
                                   vmin=0.8, vmax=3.2)
                ax[a].set_title(f"kappa ({t})")
            fig.colorbar(sc, ax=ax[1])
            plt.show()
        except Exception:
            pass

    print("test_adjoint_inverse: OK")


if __name__ == "__main__":
    test()
