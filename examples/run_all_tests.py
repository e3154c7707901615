"""Run every example end-to-end (reference parity:
``examples/run_all_tests.py`` — which exec()'d a hard-coded subset; here all
examples run and failures propagate)."""

import os
import subprocess
import sys
import time

os.environ["FENICSSOLVER_BATCH"] = "1"

EXAMPLES = [
    "test_heat_transfer.py",
    "test_electrostatics.py",
    "test_customized_case_settings.py",
    "test_linear_elasticity.py",
    "test_nonlinear_elasticity.py",
    "test_large_deformation.py",
    "test_cfd_solver.py",
    "test_flow_pass_cylinder.py",
    "test_fsi.py",
    "test_plasticity.py",
    "test_maxwell_em.py",
    "test_compressible_flow.py",
    "test_adjoint_inverse.py",
    "test_dg_flow.py",
    "test_contact_mechanics.py",
]

here = os.path.dirname(os.path.abspath(__file__))
failures = []
for ex in EXAMPLES:
    t0 = time.time()
    print(f"=== {ex} ===", flush=True)
    r = subprocess.run([sys.executable, os.path.join(here, ex)], cwd=here)
    print(f"    -> exit {r.returncode} in {time.time() - t0:.1f}s", flush=True)
    if r.returncode != 0:
        failures.append(ex)

if failures:
    print("FAILED:", failures)
    sys.exit(1)
print("all examples passed")
