"""Per-phase profile of the bench stencil solve (VERDICT r3 item 4).

Times the components of one PCG iteration of the flagship stencil solve
SEPARATELY on the real TPU — fine-level variable-coef stencil matvec, GMG
V-cycle, reduction (dot) — via the SLOPE method: each phase runs as a
lax.scan chain of k dependent applications inside ONE dispatch, timed at
two chain lengths (k_lo, k_hi); the per-application cost is the slope
(t_hi - t_lo) / (k_hi - k_lo).  The slope cancels every per-dispatch
constant — the ~26 ms axon tunnel round-trip, executable launch, the
scalar result fetch — which a single-k measurement divides by k and
misreports as per-step cost (measured: a TRIVIAL elementwise scan step
"cost" 1.4 ms/step single-k; the slope shows the real matvec at ~0.1 ms,
i.e. AT the HBM roofline).  The cancelled constant is reported separately
as ``dispatch_ms``.

Axon hazards handled: distinct scalar seed per timed dispatch (the
executor dedups repeated (executable, inputs) pairs), scalar-only host
fetches (a full-field fetch adds ~130 ms of tunnel transfer), hierarchy
passed as jit-traced args, run in a timeout-guarded subprocess upstream
(bench.py BENCH_PROFILE=1).
"""

import json
import os
import time

os.environ.setdefault("FST_X32", "1")

import numpy as np


def profile_stencil(n=104, k_lo=8, k_hi=40):
    import jax
    import jax.numpy as jnp

    from fenicssolver_tpu.la import gmg
    from fenicssolver_tpu.la.gmg import CENTER_IDX, OFFSETS_T, _shift

    N = n + 1
    free3_np = np.zeros((N, N, N), dtype=np.float32)
    free3_np[1:-1, 1:-1, 1:-1] = 1.0
    G = gmg.build_gmg(n, n, n, device=False, dtype=np.float32)

    # realistic coef fields: the constant P1 stencil + a small smooth
    # perturbation (the timing needs the SHAPE/traffic, not the exact
    # assembled values — assembly has its own timer in bench)
    taps = np.asarray(
        gmg.p1_box_stencil(1.0 / n, 1.0 / n, 1.0 / n), dtype=np.float32
    )
    rng = np.random.default_rng(1)
    coef_np = (
        taps[:, None, None, None]
        * (1.0 + 0.05 * rng.random((15, N, N, N))).astype(np.float32)
    )
    free3 = free3_np

    def apply3(coef, x3):
        y = coef[CENTER_IDX] * x3
        for oi, d in enumerate(OFFSETS_T):
            if oi != CENTER_IDX:
                y = y + coef[oi] * _shift(x3, d)
        return y

    def matvec(coef, x3):
        return free3 * apply3(coef, free3 * x3) + (1 - free3) * x3

    def chain(fn, x0, s, k):
        """k dependent applications of fn, seeded by the distinct scalar
        ``s`` (axon dedups identical dispatches) and normalized each step
        so the chain neither explodes nor denormalizes.  Returns a SCALAR
        (host fetch of a full field costs ~130 ms over the tunnel)."""

        x0 = x0 * (1.0 + s * 1e-6)

        def body(x, _):
            y = fn(x)
            y = y / jnp.maximum(
                jnp.max(jnp.abs(y)).astype(jnp.float32), 1e-30
            ).astype(y.dtype)
            return y, jnp.max(y)

        _, outs = jax.lax.scan(body, x0, None, length=k)
        return outs[-1]

    seed_np = np.random.default_rng(0).random((N, N, N)).astype(np.float32)

    coef = jnp.asarray(coef_np)
    coef.block_until_ready()
    x0 = jnp.asarray(seed_np)
    x0.block_until_ready()

    phases = {
        "matvec": lambda v: matvec(coef, v),
        "vcycle": lambda v: gmg.vcycle(G, v.ravel()).reshape(v.shape),
        "dot": lambda v: v
        * (
            jnp.vdot(v.ravel(), v.ravel())
            / jnp.maximum(jnp.vdot(v.ravel(), v.ravel()), 1e-30)
        ),
    }

    seed_counter = [0.0]

    def timed(prog, trials=3):
        """min-of-trials wall for ONE dispatch, distinct seed per call."""
        best = float("inf")
        for _ in range(trials):
            seed_counter[0] += 1.0
            s = jnp.float32(seed_counter[0])
            t0 = time.perf_counter()
            r = prog(x0, s)
            float(np.asarray(r))  # scalar host fetch forces completion
            best = min(best, time.perf_counter() - t0)
        return best

    out = {
        "n": n,
        "ndof": int(N**3),
        "k_lo": k_lo,
        "k_hi": k_hi,
        "method": "slope (two chain lengths; constants cancelled)",
    }
    dispatch = []
    for name, fn in phases.items():
        prog_lo = jax.jit(lambda x, s, fn=fn: chain(fn, x, s, k_lo))
        prog_hi = jax.jit(lambda x, s, fn=fn: chain(fn, x, s, k_hi))
        # warm-up compiles (first call includes remote compile)
        timed(prog_lo, trials=1)
        timed(prog_hi, trials=1)
        t_lo = timed(prog_lo)
        t_hi = timed(prog_hi)
        slope = (t_hi - t_lo) / (k_hi - k_lo)
        out[f"t_{name}_ms"] = slope * 1e3
        dispatch.append((t_lo - slope * k_lo) * 1e3)
    # per-dispatch constant the slope cancelled (tunnel RTT + launch +
    # scalar fetch) — the latency floor any SINGLE dependent dispatch pays
    out["dispatch_ms"] = float(np.median(dispatch))
    # PCG iteration = 1 matvec + 1 V-cycle (M) + 3 dots + axpys
    out["per_iter_est_ms"] = (
        out["t_matvec_ms"] + out["t_vcycle_ms"] + 3 * out["t_dot_ms"]
    )
    # bandwidth sanity: bytes per matvec (15 coef + x read + y write, f32)
    field_mb = (N**3) * 4 / 1e6
    out["field_mb"] = round(field_mb, 3)
    out["matvec_gbps"] = 17 * field_mb / max(out["t_matvec_ms"], 1e-9)
    return out


if __name__ == "__main__":
    n = int(os.environ.get("PROF_N", "104"))
    res = profile_stencil(n)
    print(json.dumps(res))
