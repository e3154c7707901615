"""CLI / JSON case API (reference parity: ``FenicsSolver/main.py:65-107``).

``main(case_input)`` dispatches on ``settings['solver_name']`` and runs the
solve; ``load_settings`` accepts a dict or a JSON file path.
``python -m fenicssolver_tpu case.json`` works via ``__main__.py``.
"""

from __future__ import annotations

import json
import os.path
import sys


def load_settings(case_input):
    if isinstance(case_input, dict):
        return case_input
    if isinstance(case_input, str) and os.path.exists(case_input):
        with open(case_input, encoding="utf-8") as f:
            settings = json.load(f)
        # mesh paths are relative to the case file (reference behavior:
        # ``data/TestHeatTransfer.json`` uses ``../data/mesh.xml``)
        base = os.path.dirname(os.path.abspath(case_input))
        m = settings.get("mesh")
        if isinstance(m, str) and not os.path.isabs(m):
            cand = os.path.normpath(os.path.join(base, m))
            if os.path.exists(cand):
                settings["mesh"] = cand
        return settings
    raise ValueError(f"{case_input} should be a settings dict or a JSON file")


def main(case_input):
    if isinstance(case_input, (list, tuple)):  # argv style
        if len(case_input) < 2:
            print(__doc__)
            return None
        case_input = case_input[1]
    settings = load_settings(case_input)
    solver_name = settings["solver_name"]
    if solver_name in ("CoupledNavierStokesSolver", "NavierStokesSolver"):
        from .solvers.navier_stokes import CoupledNavierStokesSolver

        solver = CoupledNavierStokesSolver(settings)
    elif solver_name in ("ScalarTransportSolver", "ScalarEquationSolver"):
        from .solvers.scalar_transport import ScalarTransportSolver

        solver = ScalarTransportSolver(settings)
    elif solver_name == "ScalarTransportDGSolver":
        from .solvers.scalar_transport_dg import ScalarTransportDGSolver

        solver = ScalarTransportDGSolver(settings)
    elif solver_name == "NSDGSolver":
        from .solvers.navier_stokes_dg import NSDGSolver

        solver = NSDGSolver(settings)
    elif solver_name == "LinearElasticitySolver":
        from .solvers.linear_elasticity import LinearElasticitySolver

        solver = LinearElasticitySolver(settings)
    elif solver_name == "NonlinearElasticitySolver":
        from .solvers.nonlinear_elasticity import NonlinearElasticitySolver

        solver = NonlinearElasticitySolver(settings)
    elif solver_name == "LargeDeformationSolver":
        from .solvers.large_deformation import LargeDeformationSolver

        solver = LargeDeformationSolver(settings)
    elif solver_name == "PlasticitySolver":
        from .solvers.plasticity import PlasticitySolver

        solver = PlasticitySolver(settings)
    elif solver_name == "FSISolver":
        from .solvers.fsi import FSISolver

        solver = FSISolver(settings)
    elif solver_name == "MaxwellEMSolver":
        from .solvers.maxwell import MaxwellEMSolver

        solver = MaxwellEMSolver(settings)
    elif solver_name == "WavePropagationSolver":
        from .solvers.wave import WavePropagationSolver

        solver = WavePropagationSolver(settings)
    elif solver_name == "CompressibleNSSolver":
        from .solvers.compressible_ns import CompressibleNSSolver

        solver = CompressibleNSSolver(settings)
    else:
        raise NotImplementedError(f"solver {solver_name} is not supported")
    import time as _time

    t0 = _time.perf_counter()
    solver.solve()
    wall = _time.perf_counter() - t0
    # one-line run summary so batch/CLI use is auditable (the reference
    # prints solve progress and results throughout, FenicsSolver/main.py:84-95)
    ndof = getattr(getattr(solver, "function_space", None), "ndof", None)
    iters = getattr(solver, "last_iterations", None)
    if iters is None:
        iters = getattr(solver, "_last_outer_iters", None)
    saved = getattr(solver, "_last_saved_path", None)
    iter_txt = (
        "direct solve" if iters == "direct"
        else f"{iters if iters is not None else 'n/a'} iterations"
    )
    print(
        f"[fenicssolver_tpu] {solver_name}: solved "
        f"{ndof if ndof is not None else '?'} dofs, "
        f"{iter_txt}, {wall:.3f} s, result: "
        f"{saved or '(not saved; set report_settings.saving_freq)'}"
    )
    if settings.get("report_settings", {}).get("plotting_interactive"):
        try:
            solver.plot()
        except Exception:
            pass
    return solver


if __name__ == "__main__":
    main(sys.argv)
