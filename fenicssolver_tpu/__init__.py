"""fenicssolver_tpu — a TPU-native multiphysics FEM framework.

A from-scratch rebuild of the capabilities of qingfengxia/FenicsSolver
(reference: /root/reference) in idiomatic JAX/XLA/Pallas:

* UFL symbolic weak forms       -> jit-traced numeric residual kernels,
                                   differentiated per-element with jax.jacfwd /
                                   jax.grad (replaces UFL ``derivative``)
* FFC JIT C++ element kernels   -> vmapped / Pallas batched element assembly
* dolfin C++ assembly           -> static-sparsity scatter-add into BCSR/CSR
* PETSc Krylov + preconditioners-> TPU-resident CG/BiCGStab/GMRES in
                                   ``lax.while_loop`` with Jacobi/Chebyshev/AMG
* dolfin NewtonSolver           -> autodiff Newton driver
* MPI + SCOTCH partitioning     -> ``shard_map`` over a ``jax.sharding.Mesh``
                                   with psum reductions (ICI collectives)

The public solver classes and the JSON case-settings schema mirror the
reference (``FenicsSolver/SolverBase.py:73-88``) so existing cases run with an
import swap.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401  (sets up x64 policy before any jax use)

# Re-export the solver surface lazily to keep import light.
_SOLVER_EXPORTS = {
    "SolverBase": "fenicssolver_tpu.solvers.solver_base",
    "SolverError": "fenicssolver_tpu.solvers.solver_base",
    "ScalarTransportSolver": "fenicssolver_tpu.solvers.scalar_transport",
    "ScalarTransportDGSolver": "fenicssolver_tpu.solvers.scalar_transport_dg",
    "LinearElasticitySolver": "fenicssolver_tpu.solvers.linear_elasticity",
    "NonlinearElasticitySolver": "fenicssolver_tpu.solvers.nonlinear_elasticity",
    "LargeDeformationSolver": "fenicssolver_tpu.solvers.large_deformation",
    "CoupledNavierStokesSolver": "fenicssolver_tpu.solvers.navier_stokes",
    "CompressibleNSSolver": "fenicssolver_tpu.solvers.compressible_ns",
    "PlasticitySolver": "fenicssolver_tpu.solvers.plasticity",
    "MaxwellEMSolver": "fenicssolver_tpu.solvers.maxwell",
    "WavePropagationSolver": "fenicssolver_tpu.solvers.wave",
    "CoupledSolver": "fenicssolver_tpu.solvers.fsi",
    "FSISolver": "fenicssolver_tpu.solvers.fsi",
    "main": "fenicssolver_tpu.main",
    "load_settings": "fenicssolver_tpu.main",
}


def __getattr__(name):
    mod = _SOLVER_EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module 'fenicssolver_tpu' has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(mod), name)
