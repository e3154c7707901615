"""Shared example configuration (reference parity: ``examples/config.py``).

``is_interactive()`` is False under pytest or when BATCH/FENICSSOLVER_BATCH
is set, so examples run headless in CI.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# examples validate in f64 on CPU (TPU runs use the solvers directly)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def is_interactive():
    if "pytest" in sys.modules:
        return False
    if os.environ.get("BATCH") or os.environ.get("FENICSSOLVER_BATCH"):
        return False
    return sys.stdout.isatty()
