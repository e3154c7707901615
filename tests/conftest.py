"""Test configuration: force CPU with 8 virtual devices and float64.

Correctness tests validate at 1e-8 rel-L2 (BASELINE.md), which needs f64 —
emulated and slow on TPU — so tests run on the CPU backend with a virtual
8-device mesh for the sharding tests (SURVEY.md §4 "multi-device tests via
jax device mesh").  The env must be set before jax initializes backends;
the axon sitecustomize re-exports JAX_PLATFORMS, so we override here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

REFERENCE_DATA = "/root/reference/data"


def reference_data_available():
    return os.path.exists(os.path.join(REFERENCE_DATA, "mesh.xml"))
