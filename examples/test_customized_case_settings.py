"""JSON-driven case example (ported from the reference's
``examples/test_customized_case_settings.py``: runs the bundled
``TestHeatTransfer.json`` case through the dict/JSON CLI API)."""

import os

import numpy as np

from config import is_interactive

interactively = is_interactive()

from fenicssolver_tpu.main import load_settings, main

HERE = os.path.dirname(os.path.abspath(__file__))
CASES = [
    os.path.join(HERE, "..", "data", "TestHeatTransfer.json"),
    "/root/reference/data/TestHeatTransfer.json",
]


def test():
    case = next((c for c in CASES if os.path.exists(c)), None)
    if case is None:
        print("no JSON case file found; skipping")
        return
    settings = load_settings(case)
    settings["report_settings"] = {
        "plotting_freq": 0, "saving_freq": 0,
        "plotting_interactive": False, "logging_level": 40,
    }
    solver = main(settings)
    T = solver.result
    coords = solver.function_space.dof_coords
    zmax = coords[:, 2].max()
    T_exact = 350 - 50 * coords[:, 2] / zmax
    err = np.linalg.norm(T.values - T_exact) / np.linalg.norm(T_exact)
    print("rel L2 error vs analytic:", err)
    assert err < 1e-8


if __name__ == "__main__":
    test()
    print("test_customized_case_settings: OK")
