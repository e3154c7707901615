"""Sharded assembly + Krylov over a jax device mesh.

The TPU-native replacement for dolfin's MPI/SCOTCH domain decomposition
(SURVEY.md §2.3, §5.7-5.8): cells are partitioned geometrically and the
element batch is sharded over the device mesh with ``shard_map``.  The
operator is applied matrix-free (partial assembly): per-device gather ->
batched small matmul (element stiffness x element dofs) -> scatter-add ->
``psum`` over the device axis replaces PETSc's halo exchange + allreduce.
Krylov dot products reduce with the same ``psum`` (vectors are replicated,
contributions sharded).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import PartitionSpec as P

from ..ops import geometry
from .partition import partition_cells

AXIS = "dd"  # domain-decomposition axis


class ShardedEllipticSolver:
    """Distributed SPD solve  K u = b  with Dirichlet constraints.

    Element stiffness matrices are computed per shard with the same
    residual-kernel + ``jacfwd`` machinery as the serial path, then the
    whole (assemble -> PCG) step runs as one jitted SPMD program.
    """

    def __init__(self, space, kernel, devices=None, aux=None, quad_degree=2):
        self.space = space
        mesh = space.mesh
        devices = devices if devices is not None else jax.devices()
        self.n_dev = len(devices)
        self.device_mesh = DeviceMesh(np.array(devices), (AXIS,))
        _, parts = partition_cells(mesh, self.n_dev)  # (n_dev, pad) cells, -1 pad
        self.parts = parts
        pad_mask = parts >= 0
        safe = np.where(pad_mask, parts, 0)

        ctx = geometry.build_cell_context(space, quad_degree)
        # per-shard element geometry (padded entries get zero weight)
        cd = np.asarray(ctx.cell_dofs)[safe]  # (n_dev, pad, k)
        detJ = np.asarray(ctx.detJ)[safe] * pad_mask
        Jinv = np.asarray(ctx.Jinv)[safe]
        qpx = np.asarray(ctx.qpx)[safe]
        Xe = np.asarray(ctx.Xe)[safe]
        self._shard_ctx = geometry.CellContext(
            cell_dofs=jnp.asarray(cd),
            Xe=jnp.asarray(Xe),
            detJ=jnp.asarray(detJ),
            Jinv=jnp.asarray(Jinv),
            qpx=jnp.asarray(qpx),
        )
        self._aux = aux
        self.kernel = kernel
        self.ndof = space.ndof
        self._compiled = None

    def _build_step(self, tol, maxiter):
        ndof = self.ndof
        kernel = self.kernel
        mesh = self.device_mesh
        k = self._shard_ctx.cell_dofs.shape[-1]

        ctx_spec = geometry.CellContext(
            *([P(AXIS)] * len(geometry.CellContext._fields))
        )
        aux_spec = None if self._aux is None else P(AXIS)

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(ctx_spec, aux_spec, P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        def spmd_step(ctx, aux, b, free_mask, u_bc):
            # drop the leading device axis on the sharded operands; the
            # replicated vectors (b, masks) arrive at full shape
            ctx = geometry.CellContext(*[a[0] for a in ctx])
            aux_l = None if aux is None else jax.tree.map(lambda a: a[0], aux)

            # per-element stiffness via jacfwd of the residual kernel
            u0 = jnp.zeros((ctx.cell_dofs.shape[0], k), dtype=b.dtype)
            jac = jax.vmap(
                jax.jacfwd(kernel, argnums=0),
                in_axes=(
                    0,
                    geometry.CellContext(
                        *([0] * len(geometry.CellContext._fields))
                    ),
                    0 if aux_l is not None else None,
                ),
            )
            Ae = jac(u0, ctx, aux_l)  # (ncd, k, k)
            # struct-of-arrays for the hot loop: cell axis last so TPU tiling
            # pads the small k axes ~1x (see MEMORY: tpu-fem-performance-rules)
            Ae_T = jnp.transpose(Ae, (1, 2, 0))  # (k, k, ncd)
            dofs = ctx.cell_dofs
            dofs_T = dofs.T  # (k, ncd)

            def matvec_raw(x):
                xe = x[dofs_T]  # (k, ncd)
                # unrolled k x k FMA (k is small and static): elementwise on
                # (ncd,)-trailing slices, no dot_general layout traps
                ye = [
                    sum(Ae_T[i, j] * xe[j] for j in range(k))
                    for i in range(k)
                ]
                y = jnp.zeros(ndof, dtype=x.dtype).at[dofs_T.reshape(-1)].add(
                    jnp.stack(ye).reshape(-1)
                )
                return jax.lax.psum(y, AXIS)

            def matvec(x):
                return free_mask * matvec_raw(free_mask * x) + (1 - free_mask) * x

            rhs = free_mask * (b - matvec_raw(u_bc)) + (1 - free_mask) * u_bc

            # Jacobi diagonal (assembled the same sharded way)
            diag_e = jnp.einsum("cii->ci", Ae)
            diag = jnp.zeros(ndof, dtype=b.dtype).at[dofs.reshape(-1)].add(
                diag_e.reshape(-1)
            )
            diag = jax.lax.psum(diag, AXIS)
            diag = free_mask * diag + (1 - free_mask)
            inv_d = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 1.0)

            # PCG (vectors replicated; reductions are plain dots since every
            # device owns the full vector after the psum above)
            x0 = jnp.zeros_like(b)
            r0 = rhs - matvec(x0)
            z0 = inv_d * r0
            bnorm = jnp.sqrt(jnp.vdot(rhs, rhs))
            target = tol * jnp.maximum(bnorm, 1e-30)

            def cond(st):
                x, r, z, p, rz, i = st
                return (jnp.sqrt(jnp.vdot(r, r)) > target) & (i < maxiter)

            def body(st):
                x, r, z, p, rz, i = st
                Ap = matvec(p)
                alpha = rz / jnp.vdot(p, Ap)
                x = x + alpha * p
                r = r - alpha * Ap
                z = inv_d * r
                rz_new = jnp.vdot(r, z)
                p = z + (rz_new / rz) * p
                return (x, r, z, p, rz_new, i + 1)

            x, r, *_, iters = jax.lax.while_loop(
                cond, body, (x0, r0, z0, z0, jnp.vdot(r0, z0), jnp.array(0))
            )
            return x, jnp.asarray(iters)

        return jax.jit(spmd_step)

    def solve(self, b, free_mask, u_bc, tol=1e-8, maxiter=2000):
        if self._compiled is None:
            self._compiled = self._build_step(tol, maxiter)
        b = jnp.asarray(b)
        x, iters = self._compiled(
            self._shard_ctx,
            self._aux,
            b,
            jnp.asarray(free_mask, dtype=b.dtype),
            jnp.asarray(u_bc, dtype=b.dtype),
        )
        return x, int(np.asarray(iters).ravel()[0])
