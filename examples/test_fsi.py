"""FSI example — channel flow over an elastic wall (the reference ships no
FSI script, SURVEY.md §4; this exercises the full segregated coupling)."""

import os
import sys

import numpy as np

from config import is_interactive

interactively = is_interactive()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from fenicssolver_tpu.solvers.fsi import FSISolver


def test():
    from tests.test_fsi import make_fsi_settings  # reuse the case definition

    fsi = FSISolver(make_fsi_settings())
    fsi.solve()
    moved = np.abs(
        fsi.fluid_solver.mesh.coords - fsi.original_fluid_coords
    ).max()
    print("max fluid mesh displacement:", moved)
    assert np.isfinite(fsi.fluid_solver.w_current.values).all()
    if interactively:
        fsi.plot_result()


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    test()
    print("test_fsi: OK")
