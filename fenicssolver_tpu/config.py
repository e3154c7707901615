"""Global numeric policy.

The reference framework inherits float64 from dolfin/PETSc everywhere; the
accuracy target (1e-8 rel-L2, BASELINE.json) requires f64 for verification.
On TPU, f64 is emulated and slow, so benchmarks may opt into f32 via the
``FST_X32=1`` environment variable *before* importing the package.
"""

import os

import jax

if os.environ.get("FST_X32", "0") != "1":
    jax.config.update("jax_enable_x64", True)

# NaN-checking mode (SURVEY.md §5.2: the functional-purity analog of the
# reference's absent sanitizers): FST_DEBUG_NANS=1 makes jax raise at the
# first NaN-producing op inside any solve.
if os.environ.get("FST_DEBUG_NANS", "0") == "1":
    jax.config.update("jax_debug_nans", True)


def default_float():
    import jax.numpy as jnp

    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def default_int():
    import jax.numpy as jnp

    return jnp.int32
