"""``python -m fenicssolver_tpu case.json`` (reference parity:
``FenicsSolver/__init__.py:9-13``).

The JSON CLI is the f64 verification path: it defaults to the CPU backend
(f64 dense/Krylov solves; TPU f64 is emulated and lacks LU).  Set
``FST_DEVICE=tpu`` to run on the accelerator in f32.
"""

import os
import sys

if os.environ.get("FST_DEVICE", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    os.environ.setdefault("FST_X32", "1")

from .main import main  # noqa: E402

main(sys.argv)
