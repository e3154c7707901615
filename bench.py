"""Benchmark: assembly + PCG solve throughput on the flagship workload.

Problem: 3D P1 tetrahedral Poisson (heat conduction) at >= 1M DOFs — the
BASELINE.json scale target.

Two device formats (BENCH_FORMAT env):

- ``stencil`` (default): the structured-lattice fast path.  On BoxMesh
  Kuhn lattices the P1 sparsity is a fixed 15-offset stencil, so global
  assembly is 96 static SLICE-ADDS of per-cell element entries into
  per-vertex stencil coefficient fields — zero scatters/gathers — and the
  PCG operator is a 15-tap stencil apply (pure shifts, full HBM
  bandwidth).  Measured on v5e: scalar scatters run ~90M entries/s while
  slice/shift ops stream at bandwidth, so this path turns the 280 ms
  element->CSR scatter (the old wall-clock dominator) into ~3 ms.
- ``bell``: the generic unstructured path — batched element-stiffness
  evaluation + one scatter into block-ELL tiles, SpMV as full-lane row
  gathers + dense einsum (``la/block_ell.py``).  This is what general
  meshes use; kept measurable for comparison.

Both are preconditioned by the same geometric-multigrid V-cycle
(``la/gmg.py`` — mesh-independent ~7 iterations).

A VECTOR P1 elasticity variant (ROADMAP perf item 3) runs after the
primary metric when time permits (BENCH_ELAS=0 to disable): slice-add
stencil assembly from per-cube (mu, lam) material fields, 3x3-block
stencil PCG, vector geometric multigrid (``la/gmg_elastic.py``) — recorded
under detail["elasticity3d"] with its own CPU mirror baseline.

Baseline: the same problem solved with the SAME algorithm (same format,
same GMG-PCG) in numpy/scipy on CPU — the stand-in for the reference's
FEniCS/PETSc-with-AMG stack, which is not installed in this image
(BASELINE.md: baseline is *measured*).  Same algorithm on both sides, so
``vs_baseline`` measures hardware + implementation, not iteration counts.

Prints the result as a JSON line {"metric", "value", "unit",
"vs_baseline"} — EMITTED PROGRESSIVELY (round-5 artifact hardening; the
round-4 run measured a ~100M dofs/s headline and then lost it to a
driver kill because the single print sat at the very end): the full
record is printed immediately after the primary measurement with a
cached CPU mirror, re-printed once the same-size mirror is measured,
and re-printed after each optional pass lands — in RECORD-VALUE order
(upgrade-to-2.9M first, then unstructured, profile, elasticity), so a
deadline or kill costs the least-valuable tail, never the headline.
The driver keeps the LAST parseable line, so
every re-print strictly enriches the record.  A SIGTERM/SIGINT handler
flushes the best-so-far record before dying, and one global deadline
(BENCH_DEADLINE, default 1500 s) gates every optional pass.
"""

import json
import os
import signal
import sys
import time

os.environ.setdefault("FST_X32", "1")  # f32 on TPU; accuracy is tested in f64

import numpy as np


def _log(msg):
    sys.stderr.write(f"[bench] {msg}\n")
    sys.stderr.flush()


# --- artifact-proofing state (round-5 VERDICT items 1/5/8) ---------------
_RESULT = None  # best-so-far record; _emit() prints it as one JSON line
_T0 = time.perf_counter()
_DEADLINE_S = float(os.environ.get("BENCH_DEADLINE", "1500"))


def _left():
    """Seconds remaining before the global deadline."""
    return _DEADLINE_S - (time.perf_counter() - _T0)


def _emit(tag=""):
    """Print the current best-so-far record as one JSON line.  Called
    after every pass that lands; the driver keeps the last parseable
    line, so each emission strictly enriches the previous one."""
    if _RESULT is not None:
        sys.stdout.write(json.dumps(_RESULT) + "\n")
        sys.stdout.flush()
        if tag:
            _log(f"record emitted ({tag})")


def _install_flush_handlers():
    """SIGTERM/SIGINT/SIGHUP: flush the best-so-far record, then die.
    The round-4 artifact was empty because a driver kill landed between
    the (successful) primary measurement and the end-of-process print."""

    def h(signum, frame):
        sys.stderr.write(
            f"[bench] signal {signum}: flushing best-so-far record\n"
        )
        sys.stderr.flush()
        _emit("signal flush")
        os._exit(0)

    for s in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
        try:
            signal.signal(s, h)
        except (ValueError, OSError):
            pass


def _timed_best_of(steps_fn, reps):
    """BEST-OF-K timed dispatches (min over K, default 3), each running
    ``reps`` seed-distinct solves inside one dispatch: the ~26 ms tunnel
    round-trip amortizes 1/reps and the min rejects cross-tenant noise on
    the shared chip (measured 11.5 vs 15.9 ms/rep for the SAME binary on
    different days).  Marginal cost ~K dispatch walls.  Seeds stay
    distinct across dispatches (executor input-dedup trap, CLAUDE.md).

    Returns (dt_per_rep, umax, its_dev, rs_dev) from the fastest dispatch."""
    best = None
    for k in range(int(os.environ.get("BENCH_TIMED_DISPATCHES", "3"))):
        t0 = time.perf_counter()
        umaxes, its, rs = steps_fn(np.float32((k + 1) * reps))
        u_last = float(np.asarray(umaxes)[-1])  # host fetch forces sync
        dt_k = (time.perf_counter() - t0) / reps
        if best is None or dt_k < best[0]:
            best = (dt_k, u_last, its, rs)
    return best


def _parse_n3(v):
    """Lattice size spec -> (nx, ny, nz): int or "NX" = cube, "AxBxC" =
    box.  Non-cubic boxes exist for TPU tiling: only the TRAILING two
    array dims pad to the (8, 128) VREG grid, so (224,112,112) keeps the
    n=104 cube's 1.2x padding efficiency at 2.9M dofs while N=129 cubes
    pad the 128-lane dim to 256 (measured 2.6x slower per dof)."""
    if isinstance(v, (tuple, list)):
        t = tuple(int(x) for x in v)
    else:
        s = str(v)
        t = tuple(int(x) for x in s.split("x")) if "x" in s \
            else (int(s),) * 3
    assert len(t) == 3, t
    return t


def _n3_str(n3):
    nx, ny, nz = n3
    return str(nx) if nx == ny == nz else f"{nx}x{ny}x{nz}"


# same-size same-algorithm CPU mirror measured in round 3
# (BENCH_r03.json, cpu_scipy_gmg at n=128): the provisional vs_baseline
# anchor printed with the FIRST emission, replaced by a freshly measured
# same-size mirror as soon as it completes
_CACHED_CPU_MIRROR = {
    "128": dict(ndof=2146689, wall_s=84.8037, pcg_iters=7,
                u_max=0.05620760176173512),
    # measured on this box 2026-08-20 (round 5), factored assembly:
    "224x112x112": dict(ndof=2873025, wall_s=21.174, pcg_iters=7,
                        u_max=0.07173536781970619),
}


def build_problem(n, dtype=np.float32):
    """Host-side setup via the structured lattice fast paths
    (``ops/structured.py``): O(ndof) vectorized, no global sorts.  The
    arrays produced are byte-identical to the generic unstructured setup
    (asserted in tests/test_gmg.py) — only the setup is structure-aware;
    the device program consumes the same inputs either way."""
    from fenicssolver_tpu.la.block_ell import build_block_ell
    from fenicssolver_tpu.ops.structured import (
        LatticePattern,
        box_cells,
        box_tet_geometry,
    )

    t0 = time.perf_counter()
    ndof = (n + 1) ** 3
    pat = LatticePattern(n, n, n)
    cd = box_cells(n, n, n)  # (nc, 4) == V.cell_dofs
    Jinv, detJ = box_tet_geometry(n, n, n, dtype=dtype)
    free = np.ones(ndof, dtype=dtype)
    free[pat.boundary_vertices()] = 0.0
    _log(f"lattice setup {time.perf_counter() - t0:.1f}s (ndof={ndof})")

    t1 = time.perf_counter()
    rows = np.repeat(cd, 4, axis=1).ravel()
    cols = np.tile(cd, (1, 4)).ravel()
    slots = pat.entry_slots(rows, cols)  # element entry -> CSR slot
    K, nrb, col_blocks, pos_bell = build_block_ell(
        pat.indptr, pat.indices, ndof
    )
    pos = pos_bell[slots]  # element entry -> flat tile slot
    if pos.max() < 2**31:
        pos = pos.astype(np.int32)  # halves the scatter-index HBM traffic
    _log(f"sparsity setup {time.perf_counter() - t1:.1f}s (K={K}, nrb={nrb})")
    return dict(
        ndof=ndof,
        cd=cd,
        Jinv=Jinv,
        detJ=detJ,
        free=free,
        K=K,
        nrb=nrb,
        col_blocks=col_blocks,
        pos=pos,
    )


def tpu_run(n, tol, maxiter):
    import jax
    import jax.numpy as jnp
    from fenicssolver_tpu.la import gmg
    from fenicssolver_tpu.la.block_ell import BC, BR

    t_setup0 = time.perf_counter()
    prob = build_problem(n)
    ndof = prob["ndof"]
    free = jnp.asarray(prob["free"])
    # TPU layout: keep the huge cell axis LAST so (8,128) tiling pads the
    # small dof/space axes by ~1x instead of 32x (struct-of-arrays)
    cd = prob["cd"]
    k = cd.shape[1]
    dofs_T = jnp.asarray(cd.T.copy())  # (4, nc)
    JinvT = jnp.asarray(np.ascontiguousarray(np.moveaxis(prob["Jinv"], 0, -1)))
    detJ_T = jnp.asarray(prob["detJ"])  # (nc,)
    K, nrb = prob["K"], prob["nrb"]
    pos = jnp.asarray(prob["pos"].reshape(-1, k * k).T.copy())  # (16, nc)
    col_blocks = jnp.asarray(prob["col_blocks"])
    ncb = (ndof + BC - 1) // BC
    gref_np = np.array(
        [[-1.0, -1, -1], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float32
    )
    # GMG preconditioner data: small (few MB) -> safe as closure constants;
    # the big index/tile arrays stay jit ARGS (axon tunnel: >100MB closure
    # constants overload remote compile, see MEMORY)
    t_gmg = time.perf_counter()
    use_gmg = os.environ.get("BENCH_PC", "gmg") == "gmg"
    G = gmg.build_gmg(n, n, n) if use_gmg else None
    _log(f"gmg setup {time.perf_counter() - t_gmg:.1f}s "
         f"(levels={len(G.levels) if G else 0})")

    # element-stiffness evaluation: Pallas VMEM kernel (measured 17% faster
    # than the XLA unrolled FMAs at 5.3M cells on v5e: 29.3 vs 35.2 ms) with
    # the XLA path selectable for comparison / non-TPU backends
    use_pallas = os.environ.get(
        "BENCH_ASSEMBLY", "pallas" if jax.default_backend() == "tpu" else "xla"
    ) == "pallas"
    gref_dev = jnp.asarray(gref_np)

    @jax.jit
    def step(dofs_T, JinvT, detJ, pos, col_blocks):
        # element assembly (closed-form P1 stiffness — the jacfwd of the
        # Poisson kernel written out; all arrays (small..., nc)).
        # The k/g contractions are unrolled into elementwise ops on (nc,)
        # slices: einsum would lower to dot_general with (sublane,lane) on
        # the SMALL axes -> 32x tile-padding blowup (10GB at 5.3M cells).
        if use_pallas:
            from fenicssolver_tpu.ops.pallas_kernels import p1_stiffness_kernel

            Ae = p1_stiffness_kernel(JinvT, detJ, gref_dev)  # (4,4,nc)
        else:
            g = [
                [
                    sum(float(gref_np[a, t]) * JinvT[t, d] for t in range(3))
                    for d in range(3)
                ]
                for a in range(4)
            ]
            scale = detJ / 6.0
            Ae = jnp.stack(
                [
                    jnp.stack(
                        [
                            (g[a][0] * g[b][0] + g[a][1] * g[b][1]
                             + g[a][2] * g[b][2]) * scale
                            for b in range(4)
                        ]
                    )
                    for a in range(4)
                ]
            )  # (4,4,nc)
        be = jnp.broadcast_to(detJ / 24.0, (4, detJ.shape[0]))  # f = 1
        b = jnp.zeros(ndof, dtype=jnp.float32).at[dofs_T.reshape(-1)].add(
            be.reshape(-1)
        )
        # global assembly: single scatter into the block-ELL structure
        tiles = (
            jnp.zeros(K * nrb * BR * BC, dtype=jnp.float32)
            .at[pos.reshape(-1)]
            .add(Ae.reshape(k * k, -1).reshape(-1))
            .reshape(K, nrb, BR, BC)
        )

        def matvec_raw(x):
            xp = jnp.zeros(ncb * BC, dtype=x.dtype).at[:ndof].set(x)
            x2 = xp.reshape(ncb, BC)

            # sequential over the K tile slots: peak transient is one
            # (nrb, BC) gather instead of K of them (HBM headroom)
            def slot(kk, y):
                xb = x2[col_blocks[kk]]  # (nrb, BC) full-lane row gather
                return y + jnp.einsum("rij,rj->ri", tiles[kk], xb)

            y = jax.lax.fori_loop(0, K, slot, jnp.zeros((nrb, BR), x.dtype))
            return y.reshape(-1)[:ndof]

        def matvec(x):
            return free * matvec_raw(free * x) + (1 - free) * x

        rhs = free * b
        if use_gmg:
            M = lambda r: gmg.vcycle(G, r)
        else:
            diag_e = jnp.einsum("iic->ic", Ae)
            diag = jnp.zeros(ndof, dtype=jnp.float32).at[
                dofs_T.reshape(-1)
            ].add(diag_e.reshape(-1))
            diag = free * diag + (1 - free)
            inv_d = jnp.where(jnp.abs(diag) > 1e-30, 1.0 / diag, 1.0)
            M = lambda r: inv_d * r

        r = rhs
        z = M(r)
        p = z
        rz = jnp.vdot(r, z)
        bnorm = jnp.sqrt(jnp.vdot(rhs, rhs))

        def cond(st):
            x, r, z, p, rz, i = st
            return (jnp.sqrt(jnp.vdot(r, r)) > tol * bnorm) & (i < maxiter)

        def body(st):
            x, r, z, p, rz, i = st
            Ap = matvec(p)
            alpha = rz / jnp.vdot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = M(r)
            rz_new = jnp.vdot(r, z)
            p = z + (rz_new / rz) * p
            return (x, r, z, p, rz_new, i + 1)

        x0 = jnp.zeros(ndof, dtype=jnp.float32)
        x, r, *_, iters = jax.lax.while_loop(
            cond, body, (x0, r, z, p, rz, jnp.array(0))
        )
        res = jnp.sqrt(jnp.vdot(r, r)) / bnorm
        return x, iters, res

    setup_s = time.perf_counter() - t_setup0
    # compile (index arrays passed as arguments: large closure constants get
    # baked into the HLO and overload the axon remote-compile tunnel)
    t_c = time.perf_counter()
    x, iters, res = step(dofs_T, JinvT, detJ_T, pos, col_blocks)
    x.block_until_ready()
    _log(f"compile+first run {time.perf_counter() - t_c:.1f}s "
         f"(iters={int(iters)}, res={float(res):.2e})")
    reps = 3
    # distinct detJ per rep: the axon executor deduplicates repeated
    # (executable, inputs) pairs, which would fake the timing loop
    detJs = [
        jax.device_put(detJ_T * (1.0 + 1e-6 * (i + 1))) for i in range(reps)
    ]
    jax.block_until_ready(detJs)
    t0 = time.perf_counter()
    for i in range(reps):
        x, iters, res = step(dofs_T, JinvT, detJs[i], pos, col_blocks)
        x.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    return ndof, dt, int(iters), float(res), np.asarray(x), setup_s


def tpu_run_stencil(n, tol, maxiter, bf16=False):
    """Structured-lattice fast path: element stiffness evaluation, then
    global assembly as 96 static slice-adds into per-vertex 15-tap stencil
    coefficient fields (``ops/structured.stencil_entry_table``), PCG with
    the masked stencil operator + GMG V-cycle.  No scatters or gathers
    anywhere on the device hot path.

    Timing: REPS distinct solves run inside ONE dispatch via ``lax.scan``
    (distinct detJ per reap defeats the axon executor's input dedup); the
    measured 26 ms host<->TPU tunnel round-trip is amortized 1/REPS
    instead of polluting every solve (round-2's per-dispatch loop paid it
    per rep — ~half the recorded wall at 0.91M dofs).

    ``bf16=True``: mixed-precision variant — the stencil fields, PCG
    vectors and GMG V-cycle run in bfloat16 with f32 scalars/reductions,
    wrapped in f32 iterative refinement (recompute the TRUE f32 residual,
    re-solve, add) until the f32 residual meets ``tol``.  Same u_max
    check as f32."""
    import jax
    import jax.numpy as jnp
    from fenicssolver_tpu.la import gmg
    from fenicssolver_tpu.la.gmg import CENTER_IDX, OFFSETS_T, _shift
    from fenicssolver_tpu.ops.structured import (
        TET_PATHS,
        box_tet_geometry,
        stencil_entry_table,
    )

    t_setup0 = time.perf_counter()
    nx, ny, nz = _parse_n3(n)
    # uniform cell size h = 1/min(n): a cube when nx==ny==nz, otherwise a
    # [0,Lx]x[0,Ly]x[0,Lz] box of IDENTICAL cubic cells (the factored
    # stencil tables and the GMG stencils stay exact; only the domain
    # grows).  Chosen so trailing dims tile the (8,128) VREG grid.
    h = 1.0 / min(nx, ny, nz)
    Ls = (nx * h, ny * h, nz * h)
    NX, NY, NZ = nx + 1, ny + 1, nz + 1
    ndof = NX * NY * NZ
    ncub = nx * ny * nz
    # Setup is PURE HOST NUMPY and all device work happens inside the ONE
    # jitted program below.  Under the axon tunnel every eager device op
    # (asarray / broadcast_to / device_put) compiles its own tiny program
    # remotely, 30-400 s APIECE under congestion — the former eager setup
    # measured 394 s of "gmg setup" at n=104 and timed the child out.  The
    # per-cell geometry arrays are still materialized on device from the 6
    # per-type constants (host->device of the full (3,3,nc) arrays is
    # ~500 MB through the tunnel), just inside the jit.
    Jinv1, det1 = box_tet_geometry(1, 1, 1, extent=(h,) * 3,
                                   dtype=np.float32)  # (6,3,3), (6,)
    Jinv1T = np.ascontiguousarray(np.moveaxis(Jinv1, 0, -1))  # (3,3,6)
    det1 = np.asarray(det1, dtype=np.float32)
    free3_np = np.zeros((NX, NY, NZ), dtype=np.float32)
    free3_np[1:-1, 1:-1, 1:-1] = 1.0
    free3 = free3_np  # numpy: embeds as a constant at trace time
    t_gmg = time.perf_counter()
    G = gmg.build_gmg(nx, ny, nz, extent=Ls, device=False,
                      dtype=np.float32)
    _log(
        f"gmg setup (host) {time.perf_counter() - t_gmg:.1f}s "
        f"(levels={len(G.levels)})"
    )
    table = stencil_entry_table()
    gref_np = np.array(
        [[-1.0, -1, -1], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float32
    )
    mode = os.environ.get(
        "BENCH_ASSEMBLY",
        "factored" if jax.default_backend() == "tpu" else "xla",
    )
    gref_dev = gref_np  # converted at trace time inside the jit
    bf = jnp.bfloat16
    f32 = jnp.float32
    inner_iters = int(os.environ.get("BENCH_BF16_INNER", "4"))
    from fenicssolver_tpu.ops.pallas_kernels import SYM10

    # group the 96 stencil-entry contributions by target offset field so
    # each of the 15 coef fields is ONE fused sum of zero-padded blocks —
    # the former sequential .at[].add slice-adds serialized into ~96
    # kernels and dominated assembly wall (~25 ms of the 64 ms total at
    # 2.1M dofs); padded sums fuse to one kernel per field
    by_oi = {}
    for t, a, b, oi, ca in table:
        by_oi.setdefault(oi, []).append((SYM10[a][b], (a, b), t, ca))

    def _pad_block(blk, ca):
        return jnp.pad(
            blk,
            ((ca[0], 1 - ca[0]), (ca[1], 1 - ca[1]), (ca[2], 1 - ca[2])),
        )

    # factored structured assembly (ops/structured.scalar_stencil_tables):
    # on the box lattice Ae = G_t * (detJ_e / det_t), so global assembly is
    # 46 zero-pads of 60 weighted per-type coefficient-field terms instead
    # of 96 element-entry slice-adds over a materialized (10, nc) Gram.
    # The per-cell VARIABLE field (detJ scale / diffusivity) is still an
    # input every rep — this is the textbook constant-geometry structured
    # optimization, not a degenerate constant fold.
    if mode == "factored":
        from fenicssolver_tpu.ops.structured import scalar_stencil_tables

        tabs_f = scalar_stencil_tables(nx, ny, nz, extent=Ls)  # h uniform
        by_oi_f = {}
        for oi, ca, w in tabs_f:
            terms = [(t, np.float32(w[t])) for t in range(6)
                     if abs(w[t]) > 1e-14]
            if terms:  # some corner groups cancel exactly (w == 0)
                by_oi_f.setdefault(oi, []).append((ca, terms))
        inv_det1 = (1.0 / det1).astype(np.float32)  # (6,)

    def assemble(JinvT, detJ):
        if mode == "factored":
            s = detJ.reshape(6, nx, ny, nz) * inv_det1[:, None, None, None]
            detJ6 = detJ.reshape(6, nx, ny, nz)
            coef = jnp.stack(
                [
                    sum(
                        _pad_block(
                            sum(wt * s[t] for t, wt in terms), ca
                        )
                        for ca, terms in by_oi_f[oi]
                    )
                    if oi in by_oi_f
                    # corner-diagonal taps cancel identically on the Kuhn
                    # lattice (w == 0 for every tet type)
                    else jnp.zeros((NX, NY, NZ), dtype=detJ.dtype)
                    for oi in range(len(OFFSETS_T))
                ]
            )
            b3 = sum(
                _pad_block(detJ6[t] / 24.0, ca)
                for t, path in enumerate(TET_PATHS)
                for ca in path
            )
            return coef, b3
        if mode == "pallas-sym":
            from fenicssolver_tpu.ops.pallas_kernels import (
                p1_stiffness_sym_kernel,
            )

            Ae = p1_stiffness_sym_kernel(JinvT, detJ)  # (10, nc) packed
            Ae6 = Ae.reshape(10, 6, nx, ny, nz)
            pick = lambda si, ab, t: Ae6[si, t]
        elif mode == "pallas":
            from fenicssolver_tpu.ops.pallas_kernels import p1_stiffness_kernel

            Ae = p1_stiffness_kernel(JinvT, detJ, gref_dev)  # (4,4,nc)
            Ae6 = Ae.reshape(4, 4, 6, nx, ny, nz)
            pick = lambda si, ab, t: Ae6[ab[0], ab[1], t]
        else:
            g = [
                [
                    sum(float(gref_np[a, t]) * JinvT[t, d] for t in range(3))
                    for d in range(3)
                ]
                for a in range(4)
            ]
            scale = detJ / 6.0
            Ae = jnp.stack(
                [
                    jnp.stack(
                        [
                            (g[a][0] * g[b][0] + g[a][1] * g[b][1]
                             + g[a][2] * g[b][2]) * scale
                            for b in range(4)
                        ]
                    )
                    for a in range(4)
                ]
            )
            Ae6 = Ae.reshape(4, 4, 6, nx, ny, nz)
            pick = lambda si, ab, t: Ae6[ab[0], ab[1], t]
        detJ6 = detJ.reshape(6, nx, ny, nz)
        coef = jnp.stack(
            [
                sum(
                    _pad_block(pick(si, ab, t), ca)
                    for si, ab, t, ca in by_oi[oi]
                )
                for oi in range(len(OFFSETS_T))
            ]
        )
        b3 = sum(
            _pad_block(detJ6[t] / 24.0, ca)
            for t, path in enumerate(TET_PATHS)
            for ca in path
        )
        return coef, b3

    # fused pallas flat-stencil matvec (one HBM pass over the 15 coef
    # fields, zero tile waste) vs the XLA 14-pad-temp formulation.
    # MEASURED-AND-REJECTED (round 4, v5e): end-to-end n=104 solve
    # 45.3 ms pallas vs 28.3 ms XLA (identical 7 iters / umax); slope
    # microbench put the XLA var-coef apply AT the HBM roofline
    # (0.102 ms/apply = 16 fields x 6 MB at ~820 GB/s), i.e. XLA already
    # fuses the shift temps and the round-3 "15 ms shift-temp traffic"
    # hypothesis was wrong.  BENCH_PALLAS_MATVEC=1 re-measures.
    use_pallas_mv = (
        jax.default_backend() == "tpu"
        and os.environ.get("BENCH_PALLAS_MATVEC", "0") == "1"
    )

    def make_apply(coef, fr):
        if use_pallas_mv:
            from fenicssolver_tpu.ops.pallas_kernels import (
                stencil_flat_apply,
            )

            def apply3(x3):
                # operand is pre-masked by ``fr`` (zero boundary shell),
                # the flat-shift exactness condition
                return stencil_flat_apply(x3, coef, interpret=False)

        else:

            def apply3(x3):
                y = coef[CENTER_IDX] * x3
                for oi, d in enumerate(OFFSETS_T):
                    if oi != CENTER_IDX:
                        y = y + coef[oi] * _shift(x3, d)
                return y

        def matvec(x3):
            return fr * apply3(fr * x3) + (1 - fr) * x3

        return matvec

    def dot(a, c):
        return jnp.vdot(a.ravel().astype(f32), c.ravel().astype(f32))

    def solve_f32(coef, b3):
        matvec = make_apply(coef, free3)
        rhs = free3 * b3

        def M(r3):
            return gmg.vcycle(G, r3.ravel()).reshape(r3.shape)

        r = rhs
        z = M(r)
        p = z
        rz = dot(r, z)
        bnorm = jnp.sqrt(dot(rhs, rhs))

        def cond(st):
            x, r, z, p, rz, i = st
            return (jnp.sqrt(dot(r, r)) > tol * bnorm) & (i < maxiter)

        def body(st):
            x, r, z, p, rz, i = st
            Ap = matvec(p)
            alpha = rz / dot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = M(r)
            rz_new = dot(r, z)
            p = z + (rz_new / rz) * p
            return (x, r, z, p, rz_new, i + 1)

        x0 = jnp.zeros((NX, NY, NZ), dtype=jnp.float32)
        x, r, *_, iters = jax.lax.while_loop(
            cond, body, (x0, r, z, p, rz, jnp.array(0))
        )
        res = jnp.sqrt(dot(r, r)) / bnorm
        return x, iters, res

    def solve_bf16(coef, b3):
        """bf16 STORAGE + f32 COMPUTE, wrapped in f32 iterative
        refinement.  True-bf16 arithmetic diverges here: the 15-tap
        stencil apply of a smooth field cancels to ~h^2 of the operand
        magnitudes, so bf16's 8-bit mantissa loses the entire result (the
        first full-bf16 attempt hit res=5.0 on real TPU while CPU bf16
        EMULATION, which upcasts internally, hid it).  Instead the coef
        fields and PCG carries are stored bf16 (halving their HBM
        traffic) and every product/sum upcasts to f32 in registers; the
        refinement recomputes the TRUE residual with the exact f32
        operator each pass."""
        coef_bf = coef.astype(bf)
        matvec_f32 = make_apply(coef, free3)

        def matvec_bf(x_bf):
            # bf16-stored operands, f32 arithmetic
            x32 = free3 * x_bf.astype(f32)
            y = coef_bf[CENTER_IDX].astype(f32) * x32
            for oi, d in enumerate(OFFSETS_T):
                if oi != CENTER_IDX:
                    y = y + coef_bf[oi].astype(f32) * _shift(x32, d)
            return (free3 * y + (1 - free3) * x_bf.astype(f32)).astype(bf)

        def M_bf(r3):
            # V-cycle in f32 on the upcast residual (the smoothing
            # recurrences cancel too); carry returned in bf16
            z = gmg.vcycle(G, r3.astype(f32).ravel()).reshape(r3.shape)
            return z.astype(bf)

        def inner(rhs_bf):
            r = rhs_bf
            z = M_bf(r)
            p = z
            rz = dot(r, z)

            def body(i, st):
                x, r, z, p, rz = st
                Ap = matvec_bf(p)
                alpha = (rz / dot(p, Ap)).astype(bf)
                x = x + alpha * p
                r = r - alpha * Ap
                z = M_bf(r)
                rz_new = dot(r, z)
                beta = (rz_new / rz).astype(bf)
                return (x, r, z, p * beta + z, rz_new)

            x0 = jnp.zeros((NX, NY, NZ), dtype=bf)
            x, *_ = jax.lax.fori_loop(
                0, inner_iters, body, (x0, r, z, p, rz)
            )
            return x

        rhs = free3 * b3
        bnorm = jnp.sqrt(dot(rhs, rhs))

        # stop on tol OR when the TRUE-residual recomputation stalls: the
        # f32 cancellation floor (~eps_f32 * cond) sits above tol at large
        # n, and further passes cannot pass it (the f32 path's 1e-6 is a
        # RECURRENCE residual — a more optimistic quantity); solution
        # quality is checked via u_max against the f32 run instead
        def cond(st):
            x, r, res_prev, passes = st
            res = jnp.sqrt(dot(r, r))
            improving = res < 0.5 * res_prev
            return (res > tol * bnorm) & (passes < 8) & improving

        def body(st):
            x, r, res_prev, passes = st
            rn = jnp.sqrt(dot(r, r))
            d = inner((r / rn).astype(bf)).astype(f32) * rn
            x = x + free3 * d
            r = rhs - matvec_f32(x)
            return (x, r, rn, passes + 1)

        x0 = jnp.zeros((NX, NY, NZ), dtype=f32)
        x, r, _, passes = jax.lax.while_loop(
            cond, body, (x0, rhs, jnp.asarray(jnp.inf, f32), jnp.array(0))
        )
        res = jnp.sqrt(dot(r, r)) / bnorm
        # "iterations" = total bf16 PCG iterations across passes
        return x, passes * inner_iters, res

    solve_one = solve_bf16 if bf16 else solve_f32

    def one(JinvT, detJ):
        coef, b3 = assemble(JinvT, detJ)
        return solve_one(coef, b3)

    # 16 reps/dispatch: tunnel round-trip (~26 ms) amortizes to
    # ~1.6 ms/rep instead of 6.5 at the former 4 (dispatch wall at
    # n=128 stays ~0.4 s)
    reps = int(os.environ.get("BENCH_REPS", "16"))

    @jax.jit
    def steps(seed):
        """REPS assembly+solves in ONE dispatch (lax.scan over reps with
        seed-distinct detJ perturbations): tunnel latency amortized, the
        axon executor's (executable, inputs) dedup defeated by the seed
        arg, and the geometry fields materialized on device INSIDE the
        program (struct-of-arrays, huge cell axis last)."""
        JinvT = jnp.broadcast_to(
            jnp.asarray(Jinv1T)[:, :, :, None], (3, 3, 6, ncub)
        ).reshape(3, 3, 6 * ncub)
        det_base = jnp.broadcast_to(
            jnp.asarray(det1)[:, None], (6, ncub)
        ).reshape(6 * ncub)

        def body(_, i):
            detJ = det_base * (1.0 + 1e-6 * (seed + i + 1.0))
            x, iters, res = one(JinvT, detJ)
            return 0.0, (jnp.max(x), iters, res)

        _, (umaxes, its, rs) = jax.lax.scan(
            body, 0.0, jnp.arange(reps, dtype=jnp.float32)
        )
        return umaxes, its, rs

    # phase split (VERDICT r3 item 4): time assembly and solve SEPARATELY,
    # each as REPS seed-distinct executions inside one dispatch.  The
    # assembly scan forces materialization with a cheap reduction; the
    # solve scan takes the assembled (coef, b3) as ARGS and runs on a
    # seed-scaled rhs per rep (a pure scaling — identical PCG iterate
    # path, defeats the executor dedup).  Headline dt stays END-TO-END
    # (assembly+solve, the BASELINE.json metric); the split lands in the
    # child result for the detail record.
    @jax.jit
    def steps_assembly(seed):
        JinvT = jnp.broadcast_to(
            jnp.asarray(Jinv1T)[:, :, :, None], (3, 3, 6, ncub)
        ).reshape(3, 3, 6 * ncub)
        det_base = jnp.broadcast_to(
            jnp.asarray(det1)[:, None], (6, ncub)
        ).reshape(6 * ncub)

        def body(_, i):
            detJ = det_base * (1.0 + 1e-6 * (seed + i + 1.0))
            coef, b3 = assemble(JinvT, detJ)
            # consume EVERY coef field (a center-only reduction would let
            # XLA dead-code-eliminate the other 14 fields' assembly)
            return 0.0, (jnp.max(jnp.abs(coef)) + jnp.max(b3))

        _, outs = jax.lax.scan(
            body, 0.0, jnp.arange(reps, dtype=jnp.float32)
        )
        return outs

    @jax.jit
    def assemble_once(seed):
        JinvT = jnp.broadcast_to(
            jnp.asarray(Jinv1T)[:, :, :, None], (3, 3, 6, ncub)
        ).reshape(3, 3, 6 * ncub)
        det_base = jnp.broadcast_to(
            jnp.asarray(det1)[:, None], (6, ncub)
        ).reshape(6 * ncub)
        return assemble(JinvT, det_base * (1.0 + 1e-6 * (seed + 1.0)))

    @jax.jit
    def steps_solve(seed, coef, b3):
        def body(_, i):
            x, iters, res = solve_one(coef, b3 * (1.0 + 1e-3 * (seed + i)))
            return 0.0, (jnp.max(x), iters, res)

        _, (umaxes, its, rs) = jax.lax.scan(
            body, 0.0, jnp.arange(reps, dtype=jnp.float32)
        )
        return umaxes, its, rs

    setup_s = time.perf_counter() - t_setup0
    t_c = time.perf_counter()
    umaxes, its, rs = steps(np.float32(0.0))
    # np.asarray = pure device->host transfer forcing completion; indexing
    # the device array ([-1]) would compile ANOTHER tiny program remotely
    iters, res = int(np.asarray(its)[-1]), float(np.asarray(rs)[-1])
    _log(
        f"compile+warm ({reps} solves) {time.perf_counter() - t_c:.1f}s "
        f"(iters={iters}, res={res:.2e})"
    )
    dt, umax, its, rs = _timed_best_of(steps, reps)
    # --- phase split (warm each, then time; device-resident coef/b3) ---
    assembly_ms = solve_ms = None
    if os.environ.get("BENCH_PHASES", "1") == "1":
        try:
            float(np.asarray(steps_assembly(np.float32(0.0)))[-1])  # warm
            t_a = time.perf_counter()
            float(np.asarray(steps_assembly(np.float32(2 * reps)))[-1])
            assembly_ms = (time.perf_counter() - t_a) / reps * 1e3
            coef_d, b3_d = assemble_once(np.float32(0.0))
            coef_d.block_until_ready()
            _u, _i, _r = steps_solve(np.float32(0.0), coef_d, b3_d)  # warm
            float(np.asarray(_u)[-1])
            t_s = time.perf_counter()
            _u, _i, _r = steps_solve(np.float32(3 * reps), coef_d, b3_d)
            float(np.asarray(_u)[-1])
            solve_ms = (time.perf_counter() - t_s) / reps * 1e3
            _log(
                f"phase split: assembly {assembly_ms:.1f} ms, solve "
                f"{solve_ms:.1f} ms (end-to-end {dt * 1e3:.1f} ms/rep)"
            )
        except Exception as e:  # phases are evidence, never a blocker
            sys.stderr.write(f"phase split failed: {e}\n")
    x_like = np.array([umax], dtype=np.float32)  # umax is the check value
    return (ndof, dt, int(np.asarray(its)[-1]), float(np.asarray(rs)[-1]),
            x_like, setup_s, assembly_ms, solve_ms)


# ---------------------------------------------------------------------------
# CPU baseline: scipy assembly + GMG-PCG in pure numpy (same algorithm as the
# TPU side so the comparison measures hardware/implementation, not iteration
# counts).  Kept jax-free: it runs in the parent process.
# ---------------------------------------------------------------------------


class _NumpyGMG:
    """numpy mirror of la/gmg.py's V-cycle (same taps, transfers, smoother)."""

    def __init__(self, n, omega=0.8, nu=2, coarse_max=800):
        from fenicssolver_tpu.la.gmg import CENTER_IDX, p1_box_stencil
        from fenicssolver_tpu.ops.structured import OFFSETS, LatticePattern

        self.OFFSETS = [tuple(int(v) for v in o) for o in OFFSETS]
        self.CENTER = CENTER_IDX
        self.omega, self.nu = omega, nu
        nn = np.array(_parse_n3(n))
        # uniform h = 1/min(n) (box of identical cubic cells; mirrors
        # tpu_run_stencil)
        h = np.full(3, 1.0 / nn.min())
        free3 = np.zeros(tuple(nn + 1), dtype=bool)
        free3[1:-1, 1:-1, 1:-1] = True
        self.levels = []
        while (nn % 2 == 0).all() and (nn >= 4).all() and np.prod(nn + 1) > coarse_max:
            coefs = p1_box_stencil(*h)
            self.levels.append((coefs, free3.astype(np.float64)))
            nn = nn // 2
            h = h * 2
            free3 = free3[::2, ::2, ::2]
        coefs = p1_box_stencil(*h)
        pat = LatticePattern(*(int(v) for v in nn))
        vals = np.broadcast_to(coefs, pat._present.shape)[pat._present]
        D = np.zeros((pat.n, pat.n))
        rows = np.repeat(np.arange(pat.n), np.diff(pat.indptr))
        D[rows, pat.indices] = vals
        fr = free3.ravel().astype(np.float64)
        D = fr[:, None] * D * fr[None, :] + np.diag(1.0 - fr)
        # masked inverse (mirrors la/gmg.py): identity rows would return
        # constrained-row residual at unit scale
        self.coarse_inv = fr[:, None] * np.linalg.inv(D) * fr[None, :]
        self.shape3 = tuple(int(v) + 1 for v in _parse_n3(n))

    def _shift(self, x, d):
        out = np.zeros_like(x)
        src, dst = [], []
        for ax, dd in enumerate(d):
            m = x.shape[ax]
            if dd >= 0:
                src.append(slice(dd, m))
                dst.append(slice(0, m - dd))
            else:
                src.append(slice(0, m + dd))
                dst.append(slice(-dd, m))
        out[tuple(dst)] = x[tuple(src)]
        return out

    def _apply(self, x3, coefs):
        y = coefs[self.CENTER] * x3
        for oi, d in enumerate(self.OFFSETS):
            if oi != self.CENTER:
                y += coefs[oi] * self._shift(x3, d)
        return y

    def _restrict(self, x):
        for ax in range(3):
            x = np.moveaxis(x, ax, 0)
            xp = np.pad(x, ((1, 1),) + ((0, 0),) * (x.ndim - 1))
            x = np.moveaxis(
                0.5 * xp[0:-2:2] + xp[1:-1:2] + 0.5 * xp[2::2], 0, ax
            )
        return x

    def _prolong(self, x):
        for ax in range(3):
            x = np.moveaxis(x, ax, 0)
            odd = 0.5 * (x[:-1] + x[1:])
            body = np.stack([x[:-1], odd], axis=1).reshape(
                (-1,) + x.shape[1:]
            )
            x = np.moveaxis(np.concatenate([body, x[-1:]], axis=0), 0, ax)
        return x

    def _cycle(self, li, b3):
        if li == len(self.levels):
            return (self.coarse_inv @ b3.ravel()).reshape(b3.shape)
        coefs, fr = self.levels[li]
        om, c0 = self.omega, coefs[self.CENTER]
        A = lambda x: fr * self._apply(fr * x, coefs)
        x = om / c0 * (fr * b3)
        for _ in range(self.nu - 1):
            x = x + om / c0 * fr * (b3 - A(x))
        ec = self._cycle(li + 1, self._restrict(fr * (b3 - A(x))))
        x = x + fr * self._prolong(ec)
        for _ in range(self.nu):
            x = x + om / c0 * fr * (b3 - A(x))
        return x

    def __call__(self, r):
        fr0 = self.levels[0][1] if self.levels else None
        b3 = r.reshape(self.shape3)
        if not self.levels:
            return self.coarse_inv @ r
        z = self._cycle(0, fr0 * b3).ravel()
        # fine identity on constrained dofs (mirrors la/gmg.vcycle)
        return z + (1.0 - fr0.ravel()) * r


def cpu_baseline(n, tol, maxiter):
    """scipy.sparse assembly + GMG-PCG (numpy V-cycle) on the same problem."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl

    from fenicssolver_tpu.ops.structured import (
        LatticePattern,
        box_cells,
        box_tet_geometry,
    )

    ndof = (n + 1) ** 3
    cells = box_cells(n, n, n)
    pat = LatticePattern(n, n, n)
    bd = pat.boundary_vertices()
    free = np.ones(ndof, bool)
    free[bd] = False
    fr = free.astype(np.float64)

    t0 = time.perf_counter()
    Jinv, detJ = box_tet_geometry(n, n, n, dtype=np.float64)
    gref = np.array([[-1.0, -1, -1], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    g = np.einsum("kt,ctg->ckg", gref, Jinv)  # (nc,4,3)
    Ae = np.einsum("cig,cjg,c->cij", g, g, detJ / 6.0)
    rows = np.repeat(cells, 4, axis=1).ravel()
    cols = np.tile(cells, (1, 4)).ravel()
    A = sp.coo_matrix((Ae.ravel(), (rows, cols)), shape=(ndof, ndof)).tocsr()
    b = np.zeros(ndof)
    np.add.at(b, cells.ravel(), np.repeat(detJ / 6.0 / 4.0, 4))
    M = _NumpyGMG(n)

    def matvec(x):
        return fr * (A @ (fr * x)) + (1 - fr) * x

    rhs = fr * b
    Aop = spl.LinearOperator((ndof, ndof), matvec=matvec)
    Mop = spl.LinearOperator((ndof, ndof), matvec=M)
    niter = [0]
    xf, info = spl.cg(
        Aop, rhs, rtol=tol, maxiter=maxiter, M=Mop,
        callback=lambda xk: niter.__setitem__(0, niter[0] + 1),
    )
    dt = time.perf_counter() - t0
    return ndof, dt, niter[0], xf


def _unstructured_problem(nbox):
    """Host setup of the genuinely UNSTRUCTURED record (VERDICT r3 item
    5): perturbed-geometry, scrambled-numbering tets
    (``core/meshgen.perturbed_tet_box`` — no lattice_info, no constant
    cell geometry, no banded ordering), generic scipy COO->CSR assembly,
    box-face Dirichlet.  This is the path the reference's own meshes
    (``data/mesh.xml`` gmsh tets) take."""
    import scipy.sparse as sp

    from fenicssolver_tpu.core.meshgen import perturbed_tet_box

    mesh = perturbed_tet_box(nbox)
    coords = np.asarray(mesh.coords, dtype=np.float64)
    cells = np.asarray(mesh.cells_array)
    ndof = coords.shape[0]
    p = coords[cells]  # (nc, 4, 3)
    J = np.swapaxes(p[:, 1:] - p[:, :1], 1, 2)  # (nc, 3, 3) columns e_i
    detJ = np.abs(np.linalg.det(J))
    gref = np.array([[-1.0, -1, -1], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    g = np.einsum("kt,ctg->ckg", gref, np.linalg.inv(J))  # (nc, 4, 3)
    Ae = np.einsum("cig,cjg,c->cij", g, g, detJ / 6.0)
    rows = np.repeat(cells, 4, axis=1).ravel()
    cols = np.tile(cells, (1, 4)).ravel()
    A = sp.coo_matrix(
        (Ae.ravel(), (rows, cols)), shape=(ndof, ndof)
    ).tocsr()
    b = np.zeros(ndof)
    np.add.at(b, cells.ravel(), np.repeat(detJ / 24.0, 4))
    eps = 1e-12
    on_face = (
        (coords < eps) | (coords > 1.0 - eps)
    ).any(axis=1)
    free = ~on_face
    return A, b, free


def _unstr_hierarchy(A, free):
    """Free-submatrix SA-AMG hierarchy (the same host build the serial and
    sharded AMG preconditioners use) -> flat per-level arrays."""
    from fenicssolver_tpu.la.sparse_algebra import csr_rows, from_scipy
    from fenicssolver_tpu.parallel.amg_halo import build_sa_hierarchy

    Af = A[free][:, free].tocsr()
    levels, coarse = build_sa_hierarchy(
        from_scipy(Af), np.ones((Af.shape[0], 1))
    )

    def mat_arrays(M):
        return (
            csr_rows(M).astype(np.int32),
            M.indices.astype(np.int32),
            M.data,
            M.shape[0],
        )

    out = []
    for lv in levels:
        out.append(
            dict(
                A=mat_arrays(lv["A"]),
                R=mat_arrays(lv["R"]),
                P=mat_arrays(lv["P"]),
                l1=lv["l1"],
                lam1=float(lv["lam1"]),
            )
        )
    cA = mat_arrays(coarse["A"])
    pinv = np.linalg.pinv(coarse["A"].toarray())
    return Af, out, cA, pinv


def _make_unstr_solver(levels, pinv_shape, nf, tol, maxiter, dtype):
    """One jitted functional AMG-PCG: every hierarchy array is an ARGUMENT
    (a >100 MB jit closure constant can wedge the axon remote compiler —
    CLAUDE.md hazards).  Matvecs are gather + segment_sum — the generic
    unstructured path, no stencil structure anywhere."""
    import jax
    import jax.numpy as jnp

    Ls = [lv["A"][3] for lv in levels]  # static level sizes
    lam1s = [lv["lam1"] for lv in levels]

    def seg_mv(rows, colsx, data, x, nrow):
        return jax.ops.segment_sum(
            data * x[colsx], rows, num_segments=nrow
        )

    def solve(fineA, lvl_args, pinv, b):
        rows0, cols0, data0 = fineA

        def matvec(x):
            return seg_mv(rows0, cols0, data0, x, nf)

        def smooth(li, bvec, degree):
            (ar, ac, ad, l1) = lvl_args[li][0]
            lam = lam1s[li]
            inv_l1 = 1.0 / l1
            lmin = 0.25 * lam
            theta = 0.5 * (lam + lmin)
            delta = 0.5 * (lam - lmin)
            sigma = theta / delta
            r = bvec * inv_l1
            dvec = r / theta
            x = dvec
            rho = 1.0 / sigma
            for _ in range(degree - 1):
                r = r - seg_mv(ar, ac, ad, dvec, Ls[li]) * inv_l1
                rho_new = 1.0 / (2.0 * sigma - rho)
                dvec = rho_new * rho * dvec + (2.0 * rho_new / delta) * r
                x = x + dvec
                rho = rho_new
            return x

        def vcycle(li, bvec):
            if li == len(Ls):
                return pinv @ bvec
            (ar, ac, ad, _), (rr, rc, rd), (pr, pc, pd) = lvl_args[li]
            x = smooth(li, bvec, 3)
            r = bvec - seg_mv(ar, ac, ad, x, Ls[li])
            nrc = Ls[li + 1] if li + 1 < len(Ls) else pinv.shape[0]
            rcv = seg_mv(rr, rc, rd, r, nrc)
            ec = vcycle(li + 1, rcv)
            x = x + seg_mv(pr, pc, pd, ec, Ls[li])
            x = x + smooth(li, bvec - seg_mv(ar, ac, ad, x, Ls[li]), 3)
            return x

        def M(r):
            return vcycle(0, r)

        f32 = jnp.float32

        def dot(a, c):
            return jnp.vdot(a.astype(f32), c.astype(f32))

        r = b
        z = M(r)
        p = z
        rz = dot(r, z)
        bnorm = jnp.sqrt(dot(b, b))

        def cond(st):
            x, r, z, p, rz, i = st
            return (jnp.sqrt(dot(r, r)) > tol * bnorm) & (i < maxiter)

        def body(st):
            x, r, z, p, rz, i = st
            Ap = matvec(p)
            alpha = (rz / dot(p, Ap)).astype(b.dtype)
            x = x + alpha * p
            r = r - alpha * Ap
            z = M(r)
            rz_new = dot(r, z)
            p = z + (rz_new / rz).astype(b.dtype) * p
            return (x, r, z, p, rz_new, i + 1)

        x0 = jnp.zeros(nf, dtype=b.dtype)
        x, r, *_, iters = jax.lax.while_loop(
            cond, body, (x0, r, z, p, rz, jnp.array(0))
        )
        res = jnp.sqrt(dot(r, r)) / bnorm
        return x, iters, res

    return jax.jit(solve)


def tpu_run_unstructured(nbox, tol, maxiter):
    """Unstructured-path throughput at >= 1M dofs (VERDICT r3 item 5):
    generic gather/segment-sum SpMV + SA-AMG V-cycle PCG on a perturbed,
    scrambled tet mesh — the number that corresponds to the reference's
    actual (gmsh/unstructured) case surface, complementing the
    box-lattice stencil headline."""
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    A, b, free = _unstructured_problem(nbox)
    ndof = A.shape[0]
    _log(f"unstructured setup: assembled {ndof} dofs "
         f"in {time.perf_counter() - t0:.1f}s")
    t1 = time.perf_counter()
    Af, levels, cA, pinv = _unstr_hierarchy(A, free)
    nf = Af.shape[0]
    _log(
        f"unstructured SA hierarchy {time.perf_counter() - t1:.1f}s "
        f"(levels={[lv['A'][3] for lv in levels]} coarse={cA[3]})"
    )
    setup_s = time.perf_counter() - t0
    dtype = np.float32

    solve = _make_unstr_solver(levels, pinv.shape, nf, tol, maxiter, dtype)

    def lvl_args_dev():
        out = []
        for lv in levels:
            ar, ac, ad, _ = lv["A"]
            rr, rc, rd, _ = lv["R"]
            pr, pc, pd, _ = lv["P"]
            out.append(
                (
                    (
                        jnp.asarray(ar), jnp.asarray(ac),
                        jnp.asarray(ad.astype(dtype)),
                        jnp.asarray(lv["l1"].astype(dtype)),
                    ),
                    (jnp.asarray(rr), jnp.asarray(rc),
                     jnp.asarray(rd.astype(dtype))),
                    (jnp.asarray(pr), jnp.asarray(pc),
                     jnp.asarray(pd.astype(dtype))),
                )
            )
        return tuple(out)

    from fenicssolver_tpu.la.sparse_algebra import csr_rows, from_scipy

    Afh = from_scipy(Af)
    fine = (
        jnp.asarray(csr_rows(Afh).astype(np.int32)),
        jnp.asarray(Afh.indices.astype(np.int32)),
        jnp.asarray(Afh.data.astype(dtype)),
    )
    la_dev = lvl_args_dev()
    pinv_dev = jnp.asarray(pinv.astype(dtype))
    bf = b[free].astype(dtype)
    # warm-up compile on one rhs, then time a DISTINCT rhs (axon executor
    # dedups identical (executable, inputs) dispatches — CLAUDE.md trap)
    x1, it1, res1 = solve(fine, la_dev, pinv_dev, jnp.asarray(bf))
    float(np.asarray(res1))
    b2 = jnp.asarray(bf * np.float32(2.0))
    t2 = time.perf_counter()
    x2, it2, res2 = solve(fine, la_dev, pinv_dev, b2)
    umax = float(np.max(np.asarray(x2))) / 2.0  # host fetch forces sync
    dt = time.perf_counter() - t2
    return ndof, dt, int(np.asarray(it2)), float(np.asarray(res2)), umax, \
        round(setup_s, 1)


def cpu_baseline_unstructured(nbox, tol, maxiter):
    """Same mesh, same hierarchy, same Chebyshev/V-cycle/PCG in numpy —
    the same-algorithm CPU mirror for the unstructured record."""
    import scipy.sparse as sp

    t0 = time.perf_counter()
    A, b, free = _unstructured_problem(nbox)
    ndof = A.shape[0]
    Af, levels, cA, pinv = _unstr_hierarchy(A, free)
    nf = Af.shape[0]
    Ls = [lv["A"][3] for lv in levels]

    def as_scipy(m, ncols):
        rows, cols, data, nrow = m
        return sp.csr_matrix(
            (data, (rows, cols)), shape=(nrow, ncols)
        )

    sp_levels = []
    for li, lv in enumerate(levels):
        ncol_A = Ls[li]
        ncol_next = Ls[li + 1] if li + 1 < len(Ls) else pinv.shape[0]
        sp_levels.append(
            dict(
                A=as_scipy(lv["A"], ncol_A),
                R=as_scipy(lv["R"], ncol_A),
                P=as_scipy(lv["P"], ncol_next),
            )
        )

    def seg_mv(m, x, nrow):
        return m @ x

    def smooth(li, bvec, degree):
        l1 = levels[li]["l1"]
        lam = levels[li]["lam1"]
        lmin = 0.25 * lam
        theta = 0.5 * (lam + lmin)
        delta = 0.5 * (lam - lmin)
        sigma = theta / delta
        r = bvec / l1
        dv = r / theta
        x = dv.copy()
        rho = 1.0 / sigma
        for _ in range(degree - 1):
            r = r - seg_mv(sp_levels[li]["A"], dv, Ls[li]) / l1
            rho_new = 1.0 / (2.0 * sigma - rho)
            dv = rho_new * rho * dv + (2.0 * rho_new / delta) * r
            x = x + dv
            rho = rho_new
        return x

    def vcycle(li, bvec):
        if li == len(Ls):
            return pinv @ bvec
        x = smooth(li, bvec, 3)
        r = bvec - seg_mv(sp_levels[li]["A"], x, Ls[li])
        nrc = Ls[li + 1] if li + 1 < len(Ls) else pinv.shape[0]
        rc = seg_mv(sp_levels[li]["R"], r, nrc)
        ec = vcycle(li + 1, rc)
        x = x + seg_mv(sp_levels[li]["P"], ec, Ls[li])
        return x + smooth(
            li, bvec - seg_mv(sp_levels[li]["A"], x, Ls[li]), 3
        )

    Afs = Af  # scipy csr
    bf = b[free]
    t1 = time.perf_counter()
    x = np.zeros(nf)
    r = bf.copy()
    z = vcycle(0, r)
    p = z.copy()
    rz = r @ z
    bnorm = np.linalg.norm(bf)
    it = 0
    while np.linalg.norm(r) > tol * bnorm and it < maxiter:
        Ap = Afs @ p
        alpha = rz / (p @ Ap)
        x += alpha * p
        r -= alpha * Ap
        z = vcycle(0, r)
        rz_new = r @ z
        p = z + (rz_new / rz) * p
        rz = rz_new
        it += 1
    dt = time.perf_counter() - t1
    xg = np.zeros(ndof)
    xg[free] = x
    return ndof, dt, it, xg


def tpu_run_elasticity(n, tol, maxiter):
    """Vector P1 elasticity fast path at 3 (n+1)^3 dofs: slice-add stencil
    assembly from per-cube (mu, lam) MATERIAL FIELDS (variable-coefficient
    path, ~120 shift-multiply-adds, no scatters), PCG on the 15-offset
    3x3-block stencil operator, vector geometric multigrid preconditioner
    (``la/gmg_elastic.py`` — geometric coarse spaces carry the rigid-body
    modes, replacing the reference's petsc_amg + build_nullspace,
    ``SolverBase.py:643-705``)."""
    import jax
    import jax.numpy as jnp
    from fenicssolver_tpu.la import gmg_elastic
    from fenicssolver_tpu.la.gmg import CENTER_IDX, OFFSETS_T, _shift
    from fenicssolver_tpu.ops.structured import (
        TET_PATHS,
        box_tet_geometry,
        elasticity_stencil_tables,
    )

    t_setup0 = time.perf_counter()
    N = n + 1
    ndof = 3 * N**3
    MU, LAM = 1.0, 1.5
    # pure-host setup; ALL device work happens inside the one jitted
    # program (each eager op is a separate remote compile through the axon
    # tunnel — the former eager setup burned 435 s at n=80 and timed the
    # child out; see tpu_run_stencil)
    groups = elasticity_stencil_tables(n, n, n)
    Jinv1, det1 = box_tet_geometry(1, 1, 1, extent=(1.0 / n,) * 3,
                                   dtype=np.float64)
    det6 = np.asarray(det1, dtype=np.float64)  # (6,) per-type |detJ|
    free3_np = np.zeros((N, N, N), dtype=np.float32)
    free3_np[1:-1, 1:-1, 1:-1] = 1.0
    free3 = free3_np  # numpy: embeds as a constant at trace time
    t_gmg = time.perf_counter()
    G = gmg_elastic.build_gmg_elastic(
        n, n, n, MU, LAM, device=False, dtype=np.float32
    )
    _log(f"gmg-elastic setup (host) {time.perf_counter() - t_gmg:.1f}s "
         f"(levels={len(G.levels)})")
    Bmu_c = [Bmu.astype(np.float32) for _, _, Bmu, _ in groups]
    Blam_c = [Blam.astype(np.float32) for _, _, _, Blam in groups]

    by_oi = {}
    for gi, (oi, ca, _, _) in enumerate(groups):
        by_oi.setdefault(oi, []).append((gi, ca))

    def _pad5(blk, ca):
        # zero-pad the trailing (n, n, n) dims of a (3, 3, n, n, n) block
        return jnp.pad(
            blk,
            ((0, 0), (0, 0), (ca[0], 1 - ca[0]), (ca[1], 1 - ca[1]),
             (ca[2], 1 - ca[2])),
        )

    @jax.jit
    def step(mu3, lam3):
        # assembly: each of the 15 offset fields is ONE fused sum of
        # zero-padded material-weighted blocks (sequential .at[].add
        # slice-adds serialized into per-group kernels and dominated the
        # assembly wall, as in the scalar path)
        coef = jnp.stack(
            [
                sum(
                    _pad5(
                        mu3[None, None]
                        * Bmu_c[gi][:, :, None, None, None]
                        + lam3[None, None]
                        * Blam_c[gi][:, :, None, None, None],
                        ca,
                    )
                    for gi, ca in by_oi[oi]
                )
                for oi in range(len(OFFSETS_T))
            ]
        )
        # rhs: body force (0, 0, -1) -> b_z[v] = -sum detJ/24 over incident
        # tets (one fused padded sum)
        bz = sum(
            jnp.pad(
                jnp.full((n, n, n), det6[t] / 24.0, dtype=jnp.float32),
                ((ca[0], 1 - ca[0]), (ca[1], 1 - ca[1]), (ca[2], 1 - ca[2])),
            )
            for t, path in enumerate(TET_PATHS)
            for ca in path
        )
        b = jnp.stack([jnp.zeros_like(bz), jnp.zeros_like(bz), -bz])

        def apply3(x):
            # unrolled 3x3 block FMAs (einsum on the tiny axes would hit
            # the 32x tile-padding blowup; see MEMORY)
            def add(acc, oi, xs):
                for i in range(3):
                    t = (coef[oi, i, 0] * xs[0] + coef[oi, i, 1] * xs[1]
                         + coef[oi, i, 2] * xs[2])
                    acc[i] = t if acc[i] is None else acc[i] + t
                return acc

            acc = add([None] * 3, CENTER_IDX, [x[0], x[1], x[2]])
            for oi, d in enumerate(OFFSETS_T):
                if oi == CENTER_IDX:
                    continue
                xs = [_shift(x[j], d) for j in range(3)]
                acc = add(acc, oi, xs)
            return jnp.stack(acc)

        def matvec(x):
            return free3 * apply3(free3 * x) + (1 - free3) * x

        rhs = free3 * b

        def M(r):
            # gmg_elastic.vcycle expects node-major (v, comp) flat order
            z = gmg_elastic.vcycle(
                G, jnp.moveaxis(r, 0, -1).ravel()
            )
            return jnp.moveaxis(z.reshape((N, N, N, 3)), -1, 0)

        def dot(a, c):
            return jnp.vdot(a.ravel(), c.ravel())

        r = rhs
        z = M(r)
        p = z
        rz = dot(r, z)
        bnorm = jnp.sqrt(dot(rhs, rhs))

        def cond(st):
            x, r, z, p, rz, i = st
            return (jnp.sqrt(dot(r, r)) > tol * bnorm) & (i < maxiter)

        def body(st):
            x, r, z, p, rz, i = st
            Ap = matvec(p)
            alpha = rz / dot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = M(r)
            rz_new = dot(r, z)
            p = z + (rz_new / rz) * p
            return (x, r, z, p, rz_new, i + 1)

        x0 = jnp.zeros((3, N, N, N), dtype=jnp.float32)
        x, r, *_, iters = jax.lax.while_loop(
            cond, body, (x0, r, z, p, rz, jnp.array(0))
        )
        res = jnp.sqrt(dot(r, r)) / bnorm
        return x, iters, res

    # 16 reps/dispatch: tunnel round-trip (~26 ms) amortizes to
    # ~1.6 ms/rep instead of 6.5 at the former 4 (dispatch wall at
    # n=128 stays ~0.4 s)
    reps = int(os.environ.get("BENCH_REPS", "16"))

    @jax.jit
    def steps(seed):
        """REPS assembly+solves in ONE dispatch (scan over seed-distinct
        mu fields, materialized inside the program): the ~26 ms tunnel
        round-trip is amortized 1/REPS and the executor dedup defeated."""
        lam3 = jnp.full((n, n, n), LAM, dtype=jnp.float32)

        def body(_, i):
            mu3 = jnp.full((n, n, n), MU, dtype=jnp.float32) * (
                1.0 + 1e-6 * (seed + i + 1.0)
            )
            x, iters, res = step(mu3, lam3)
            return 0.0, (jnp.max(jnp.abs(x)), iters, res)

        _, (umaxes, its, rs) = jax.lax.scan(
            body, 0.0, jnp.arange(reps, dtype=jnp.float32)
        )
        return umaxes, its, rs

    setup_s = time.perf_counter() - t_setup0
    t_c = time.perf_counter()
    umaxes, its, rs = steps(np.float32(0.0))
    # np.asarray = transfer-only host fetch (indexing the device array
    # would remote-compile a tiny slice program; see tpu_run_stencil)
    _log(f"elasticity compile+warm ({reps} solves) "
         f"{time.perf_counter() - t_c:.1f}s "
         f"(iters={int(np.asarray(its)[-1])}, "
         f"res={float(np.asarray(rs)[-1]):.2e})")
    dt, umax, its, rs = _timed_best_of(steps, reps)
    x_like = np.array([umax], dtype=np.float32)
    return (ndof, dt, int(np.asarray(its)[-1]), float(np.asarray(rs)[-1]),
            x_like, setup_s)


def cpu_baseline_elasticity(n, tol, maxiter):
    """numpy mirror of the elasticity fast path (same algorithm)."""
    import scipy.sparse.linalg as spl

    from fenicssolver_tpu.la.gmg_elastic import elastic_box_stencil
    from fenicssolver_tpu.ops.structured import (
        TET_PATHS,
        box_tet_geometry,
        elasticity_stencil_tables,
    )

    N = n + 1
    ndof = 3 * N**3
    MU, LAM = 1.0, 1.5
    t0 = time.perf_counter()
    mu3 = np.full((n, n, n), MU)
    lam3 = np.full((n, n, n), LAM)
    coef = np.zeros((15, 3, 3, N, N, N))
    for oi, ca, Bmu, Blam in elasticity_stencil_tables(n, n, n):
        coef[oi, :, :, ca[0]:ca[0] + n, ca[1]:ca[1] + n, ca[2]:ca[2] + n] += (
            mu3[None, None] * Bmu[:, :, None, None, None]
            + lam3[None, None] * Blam[:, :, None, None, None]
        )
    _, det1 = box_tet_geometry(1, 1, 1, extent=(1.0 / n,) * 3,
                               dtype=np.float64)
    bz = np.zeros((N, N, N))
    for t, path in enumerate(TET_PATHS):
        for ca in path:
            bz[ca[0]:ca[0] + n, ca[1]:ca[1] + n, ca[2]:ca[2] + n] += (
                det1[t] / 24.0
            )
    b = np.stack([np.zeros_like(bz), np.zeros_like(bz), -bz])
    free3 = np.zeros((N, N, N))
    free3[1:-1, 1:-1, 1:-1] = 1.0
    gm = _NumpyGMG(n)  # reuse its shift/transfer helpers

    def apply3(x):
        y = np.zeros_like(x)
        for oi, d in enumerate(gm.OFFSETS):
            xs = (x if oi == gm.CENTER
                  else np.stack([gm._shift(x[j], d) for j in range(3)]))
            y += np.einsum("ijabc,jabc->iabc", coef[oi], xs)
        return y

    # vector GMG mirror: constant taps per level, block-Jacobi smoothing
    levels = []
    nn, h = n, 1.0 / n
    fr = free3.copy()
    while nn % 2 == 0 and nn >= 4 and 3 * (nn + 1) ** 3 > 800:
        taps = elastic_box_stencil(h, h, h, MU, LAM)
        levels.append((taps, np.linalg.inv(taps[gm.CENTER]), fr))
        nn //= 2
        h *= 2
        fr = fr[::2, ::2, ::2]
    taps_c = elastic_box_stencil(h, h, h, MU, LAM)
    from fenicssolver_tpu.ops.structured import LatticePattern

    pat = LatticePattern(nn, nn, nn)
    rows = np.repeat(np.arange(pat.n), np.diff(pat.indptr))
    oi_of = np.nonzero(pat._present)[1]
    D = np.zeros((3 * pat.n, 3 * pat.n))
    for e in range(len(rows)):
        D[3 * rows[e]: 3 * rows[e] + 3,
          3 * pat.indices[e]: 3 * pat.indices[e] + 3] = taps_c[oi_of[e]]
    frv = np.repeat(fr.ravel(), 3)
    D = frv[:, None] * D * frv[None, :] + np.diag(1.0 - frv)
    coarse_inv = frv[:, None] * np.linalg.inv(D) * frv[None, :]

    def lvl_apply(x, taps):
        y = np.zeros_like(x)
        for oi, d in enumerate(gm.OFFSETS):
            xs = (x if oi == gm.CENTER
                  else np.stack([gm._shift(x[j], d) for j in range(3)]))
            y += np.einsum("ij,jabc->iabc", taps[oi], xs)
        return y

    om, nu = 0.6, 2

    def cycle(li, bb):
        if li == len(levels):
            z = coarse_inv @ np.moveaxis(bb, 0, -1).ravel()
            return np.moveaxis(z.reshape(bb.shape[1:] + (3,)), -1, 0)
        taps, invC, frl = levels[li]
        A = lambda x: frl * lvl_apply(frl * x, taps)
        sm = lambda r: om * np.einsum("ij,jabc->iabc", invC, r)
        x = sm(frl * bb)
        for _ in range(nu - 1):
            x = x + sm(frl * (bb - A(x)))
        r = frl * (bb - A(x))
        rc = np.stack([gm._restrict(r[j]) for j in range(3)])
        ec = cycle(li + 1, rc)
        x = x + frl * np.stack([gm._prolong(ec[j]) for j in range(3)])
        for _ in range(nu):
            x = x + sm(frl * (bb - A(x)))
        return x

    def M(rf):
        r = np.moveaxis(rf.reshape(N, N, N, 3), -1, 0)
        z = cycle(0, levels[0][2] * r) if levels else coarse_inv @ rf
        return np.moveaxis(z, 0, -1).ravel() if levels else z

    def matvec(xf):
        x = np.moveaxis(xf.reshape(N, N, N, 3), -1, 0)
        y = free3 * apply3(free3 * x) + (1 - free3) * x
        return np.moveaxis(y, 0, -1).ravel()

    rhs = np.moveaxis(free3 * b, 0, -1).ravel()
    Aop = spl.LinearOperator((ndof, ndof), matvec=matvec)
    Mop = spl.LinearOperator((ndof, ndof), matvec=M)
    niter = [0]
    xf, info = spl.cg(
        Aop, rhs, rtol=tol, maxiter=maxiter, M=Mop,
        callback=lambda xk: niter.__setitem__(0, niter[0] + 1),
    )
    dt = time.perf_counter() - t0
    return ndof, dt, niter[0], xf


def cpu_baseline_stencil(n, tol, maxiter):
    """numpy mirror of the stencil fast path: same slice-add assembly, same
    masked stencil operator, same GMG V-cycle preconditioner."""
    import scipy.sparse.linalg as spl

    from fenicssolver_tpu.ops.structured import (
        TET_PATHS,
        box_tet_geometry,
        stencil_entry_table,
    )

    nx, ny, nz = _parse_n3(n)
    h = 1.0 / min(nx, ny, nz)
    Ls = (nx * h, ny * h, nz * h)
    NX, NY, NZ = nx + 1, ny + 1, nz + 1
    ndof = NX * NY * NZ
    factored = os.environ.get("BENCH_ASSEMBLY", "factored") == "factored"
    t0 = time.perf_counter()
    Jinv, detJ = box_tet_geometry(nx, ny, nz, extent=Ls, dtype=np.float64)
    if not factored:
        gref = np.array([[-1.0, -1, -1], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
        g = np.einsum("kt,ctg->ckg", gref, Jinv)  # (nc,4,3)
        Ae = np.einsum("cig,cjg,c->ijc", g, g, detJ / 6.0)  # (4,4,nc)
        Ae6 = Ae.reshape(4, 4, 6, nx, ny, nz)
    detJ6 = detJ.reshape(6, nx, ny, nz)
    t_m0 = time.perf_counter()
    M = _NumpyGMG(n)  # preconditioner SETUP (mirrors the TPU side's
    # host gmg build, which sits in setup_s outside the timed phases)
    t_asm0 = time.perf_counter()
    OFF = M.OFFSETS
    coef = np.zeros((len(OFF), NX, NY, NZ))
    if factored:
        # same factored algorithm as the TPU side (BENCH_ASSEMBLY default)
        from fenicssolver_tpu.ops.structured import scalar_stencil_tables

        _, det_t = box_tet_geometry(1, 1, 1, extent=(h,) * 3,
                                    dtype=np.float64)
        s6 = detJ6 / det_t[:, None, None, None]
        for oi, ca, w in scalar_stencil_tables(nx, ny, nz, extent=Ls):
            blk = sum(w[t] * s6[t] for t in range(6) if abs(w[t]) > 1e-14)
            coef[
                oi, ca[0] : ca[0] + nx, ca[1] : ca[1] + ny,
                ca[2] : ca[2] + nz
            ] += blk
    else:
        for t, a, b, oi, ca in stencil_entry_table():
            coef[
                oi, ca[0] : ca[0] + nx, ca[1] : ca[1] + ny,
                ca[2] : ca[2] + nz
            ] += Ae6[a, b, t]
    b3 = np.zeros((NX, NY, NZ))
    for t, path in enumerate(TET_PATHS):
        for ca in path:
            b3[
                ca[0] : ca[0] + nx, ca[1] : ca[1] + ny, ca[2] : ca[2] + nz
            ] += detJ6[t] / 24.0
    free3 = np.zeros((NX, NY, NZ))
    free3[1:-1, 1:-1, 1:-1] = 1.0

    def apply3(x3):
        y = coef[M.CENTER] * x3
        for oi, d in enumerate(OFF):
            if oi != M.CENTER:
                y = y + coef[oi] * M._shift(x3, d)
        return y

    def matvec(x):
        x3 = x.reshape(NX, NY, NZ)
        y = free3 * apply3(free3 * x3) + (1 - free3) * x3
        return y.ravel()

    rhs = (free3 * b3).ravel()
    t_solve0 = time.perf_counter()
    Aop = spl.LinearOperator((ndof, ndof), matvec=matvec)
    Mop = spl.LinearOperator((ndof, ndof), matvec=M)
    niter = [0]
    xf, info = spl.cg(
        Aop, rhs, rtol=tol, maxiter=maxiter, M=Mop,
        callback=lambda xk: niter.__setitem__(0, niter[0] + 1),
    )
    t_end = time.perf_counter()
    dt = t_end - t0
    # mirror of the TPU phase split (assembly | solve; the _NumpyGMG setup
    # window is excluded from both, like the TPU side's host gmg build)
    cpu_baseline_stencil.last_phases = (
        round(((t_m0 - t0) + (t_solve0 - t_asm0)) * 1e3, 1),
        round((t_end - t_solve0) * 1e3, 1),
    )
    return ndof, dt, niter[0], xf


def _child_main(n, tol, bf16=False):
    """Run the TPU measurement in a child process (crash/hang isolation:
    the axon TPU tunnel occasionally wedges; the parent retries smaller)."""
    fmt = os.environ.get("BENCH_FORMAT", "stencil")
    if bf16:
        ndof, dt, iters, res, x, setup_s, a_ms, s_ms = tpu_run_stencil(
            n, tol, maxiter=3000, bf16=True
        )
    elif fmt == "stencil":
        ndof, dt, iters, res, x, setup_s, a_ms, s_ms = tpu_run_stencil(
            n, tol, maxiter=3000
        )
    else:
        ndof, dt, iters, res, x, setup_s = tpu_run(n, tol, maxiter=3000)
        a_ms = s_ms = None
    rec = dict(ndof=ndof, dt=dt, iters=iters, res=res,
               umax=float(np.max(x)), setup_s=round(setup_s, 1))
    if a_ms is not None and s_ms is not None:
        rec["assembly_ms"] = round(a_ms, 2)
        rec["solve_ms"] = round(s_ms, 2)
        rec["solve_dofs_per_sec"] = round(ndof / (s_ms * 1e-3), 1)
    print("CHILD_RESULT " + json.dumps(rec))


def _run_child(arg, n, timeout_s):
    """One guarded TPU child run; returns the CHILD_RESULT dict or None."""
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), arg,
             _n3_str(n) if isinstance(n, (tuple, list)) else str(n)],
            capture_output=True,
            timeout=timeout_s,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        sys.stderr.write(out.stderr)
        for line in out.stdout.splitlines():
            if line.startswith("CHILD_RESULT "):
                return json.loads(line[len("CHILD_RESULT "):])
        sys.stderr.write(f"bench child {arg} n={n} failed (rc={out.returncode})\n")
    except subprocess.TimeoutExpired as e:
        if e.stderr:
            sys.stderr.write(
                e.stderr.decode() if isinstance(e.stderr, bytes) else e.stderr
            )
        sys.stderr.write(f"bench child {arg} n={n} timed out\n")
    return None


def _tunnel_probe(timeout_s=120):
    """Trivial jit in a guarded subprocess: distinguishes a WEDGED axon
    tunnel (even backend init / 8-element jit hangs — observed lasting
    1h+) from a merely-slow one.  On a wedged tunnel the fallback ladder
    is pointless: every rung burns its full timeout."""
    import subprocess

    code = (
        "import jax, jax.numpy as jnp;"
        "print(float(jax.jit(lambda v: (v*2).sum())(jnp.arange(8.))))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True,
            timeout=timeout_s,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _run_tpu_with_fallback(sizes, tol, timeout_s=540):
    for i, n in enumerate(sizes):
        # generous budget for the target size (a cold axon remote compile
        # can take minutes); tighter for the fallback sizes so a wedged
        # tunnel still yields a record
        d = _run_child("--tpu-child", n, timeout_s if i == 0 else 240)
        if d is not None:
            return d, n
        if i + 1 < len(sizes):
            sys.stderr.write("retrying smaller\n")
    return None, None


def _run_elas_child(n, tol, timeout_s=480):
    return _run_child("--tpu-child-elas", n, timeout_s)


def main():
    tol = 1e-6
    if len(sys.argv) >= 3 and sys.argv[1] == "--tpu-child":
        _child_main(_parse_n3(sys.argv[2]) if "x" in sys.argv[2]
                    else int(sys.argv[2]), tol)
        return
    if len(sys.argv) >= 3 and sys.argv[1] == "--tpu-child-bf16":
        _child_main(_parse_n3(sys.argv[2]) if "x" in sys.argv[2]
                    else int(sys.argv[2]), tol, bf16=True)
        return
    if len(sys.argv) >= 3 and sys.argv[1] == "--tpu-child-elas":
        n = int(sys.argv[2])
        ndof, dt, iters, res, x, setup_s = tpu_run_elasticity(
            n, tol, maxiter=3000
        )
        print(
            "CHILD_RESULT "
            + json.dumps(
                dict(ndof=ndof, dt=dt, iters=iters, res=res,
                     umax=float(np.abs(x).max()), setup_s=round(setup_s, 1))
            )
        )
        return
    if len(sys.argv) >= 3 and sys.argv[1] == "--tpu-child-unstr":
        n = int(sys.argv[2])
        ndof, dt, iters, res, umax, setup_s = tpu_run_unstructured(
            n, tol, maxiter=500
        )
        print(
            "CHILD_RESULT "
            + json.dumps(
                dict(ndof=ndof, dt=dt, iters=iters, res=res, umax=umax,
                     setup_s=setup_s)
            )
        )
        return

    global _RESULT
    _install_flush_handlers()
    fmt = os.environ.get("BENCH_FORMAT", "stencil")
    # RECORD-FIRST sizing (round-2 lesson: the n=128 primary burned its
    # whole 540 s budget on a slow tunnel, fell back to 0.91M and the
    # overrun then starved the elasticity child — losing BOTH headline
    # numbers from the driver artifact).  The primary is now a known-good
    # >= 1M size (n=104 -> 1.158M dofs); n=128 (2.1M) runs LAST as an
    # optional upgrade pass with its own bounded budget.
    n_tpu = int(os.environ.get("BENCH_N", "104" if fmt == "stencil" else "96"))
    sizes = sorted({n_tpu, 96, 64, 48}, reverse=True)
    sizes = [s for s in sizes if s <= n_tpu]
    tunnel_ok = _tunnel_probe()
    if not tunnel_ok:
        # wedged tunnel: one primary attempt only (the 540 s budget
        # doubles as recovery-wait time), no smaller rungs — each would
        # burn its whole timeout against the same wedge
        sys.stderr.write(
            "tunnel probe failed (trivial jit hung): wedged axon tunnel; "
            "single primary attempt, then CPU fallback\n"
        )
        sizes = sizes[:1]
    d, n_used = _run_tpu_with_fallback(sizes, tol)
    if d is not None:
        tunnel_ok = True  # recovered mid-run: resume the full plan
    if d is None:
        # last resort: measure the same jitted program on the CPU backend so
        # the driver still records a data point
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        if fmt == "stencil":
            ndof, dt, iters, res, x, setup_s, _a, _s = tpu_run_stencil(
                48, tol, maxiter=3000
            )
        else:
            ndof, dt, iters, res, x, setup_s = tpu_run(48, tol, maxiter=3000)
        d = dict(ndof=ndof, dt=dt, iters=iters, res=res,
                 umax=float(np.max(x)), setup_s=setup_s)
        d["note"] = "TPU unavailable: measured on CPU backend"
        n_used = 48
    ndof, dt, iters, res = d["ndof"], d["dt"], d["iters"], d["res"]
    umax_tpu_val = d["umax"]
    tpu_dofs_per_sec = ndof / dt
    cpu_run = cpu_baseline_stencil if fmt == "stencil" else cpu_baseline

    def _headline(dd, mirror, vs, vs_note=None):
        r = {
            "metric": (
                "poisson3d_p1_assembly+pcg_throughput_at_%.2gMdof"
                % (dd["ndof"] / 1e6)
            ),
            "value": round(dd["ndof"] / dd["dt"], 1),
            "unit": "dofs/sec",
            "vs_baseline": round(vs, 3),
            "detail": {
                "format": fmt,
                "preconditioner": os.environ.get("BENCH_PC", "gmg"),
                "assembly_kernel": os.environ.get(
                    "BENCH_ASSEMBLY", "factored"
                ),
                "tpu": {
                    "ndof": dd["ndof"],
                    "wall_s": round(dd["dt"], 4),
                    "pcg_iters": dd["iters"],
                    "rel_res": dd["res"],
                    "u_max": dd["umax"],
                    "setup_s": dd.get("setup_s"),
                },
                "cpu_scipy_gmg": mirror,
            },
        }
        if vs_note:
            r["detail"]["vs_baseline_note"] = vs_note
        if dd.get("assembly_ms") is not None:
            r["detail"]["phases"] = {
                "what": (
                    "assembly | solve, each timed as %s seed-distinct reps "
                    "in ONE dispatch; the two phase chains each pay their "
                    "own dispatch/materialization overhead so they sum to "
                    "MORE than the end-to-end headline dt, which fuses "
                    "both (assembly+solve, the BASELINE.json metric)"
                    % os.environ.get("BENCH_REPS", "16")
                ),
                "tpu_assembly_ms": dd["assembly_ms"],
                "tpu_solve_ms": dd["solve_ms"],
                "tpu_solve_dofs_per_sec": dd.get("solve_dofs_per_sec"),
            }
        if fmt == "stencil":
            # self-describing retirement note (VERDICT r3 weak-5: the
            # artifact must show bf16 was measured-and-rejected)
            r["detail"]["bf16"] = {
                "status": "measured-and-retired (round 3)",
                "reason": (
                    "native-bf16 arithmetic loses the cancelled 15-tap "
                    "stencil sums entirely (residual diverged to 5.0 on "
                    "real TPU); the correct f32-compute/bf16-storage "
                    "fallback halves operand bytes but is not faster on "
                    "this VMEM-resident, latency-bound path"
                ),
                "opt_in": "BENCH_BF16=1 re-measures the f32-refined variant",
            }
        if "note" in dd:
            r["detail"]["note"] = dd["note"]
        return r

    # ---- FIRST emission: primary + cached mirror (survives any kill
    # from here on; VERDICT r4 item 1) ----
    cm = _CACHED_CPU_MIRROR.get("128")
    if fmt == "stencil" and cm is not None:
        mirror0 = dict(cm)
        mirror0["mirror"] = "cached(round3, n=128, same algorithm)"
        vs0 = tpu_dofs_per_sec / (cm["ndof"] / cm["wall_s"])
        note0 = (
            "provisional: cached round-3 CPU mirror (n=128); replaced by "
            "a freshly measured same-size mirror below"
            if n_used != 128 else None
        )
    else:
        mirror0 = {"mirror": "pending"}
        vs0 = 0.0
        note0 = "provisional: CPU mirror pending"
    _RESULT = _headline(d, mirror0, vs0, note0)
    _emit("primary")

    # ---- measured same-size CPU mirror (same algorithm, same dof count
    # -> vs_baseline is a direct hardware+implementation ratio) ----
    n_cpu = int(os.environ.get("BENCH_N_CPU", str(n_used)))
    ndof_c, dt_c, iters_c, x_c = cpu_run(n_cpu, tol, maxiter=3000)
    mirror = {
        "ndof": ndof_c,
        "wall_s": round(dt_c, 4),
        "pcg_iters": iters_c,
        "u_max": float(np.max(x_c)),
    }
    _RESULT = _headline(d, mirror, tpu_dofs_per_sec / (ndof_c / dt_c))
    cpu_ph = getattr(cpu_run, "last_phases", None)
    if d.get("assembly_ms") is not None and cpu_ph is not None:
        ph = _RESULT["detail"]["phases"]
        ph["cpu_assembly_ms"] = cpu_ph[0]
        ph["cpu_solve_ms"] = cpu_ph[1]
        if d.get("solve_dofs_per_sec"):
            ph["solve_vs_baseline"] = round(
                d["solve_dofs_per_sec"] / (ndof_c / (cpu_ph[1] * 1e-3)), 3
            )
    _emit("cpu mirror")

    # ---- optional passes: each gated on the global deadline, each
    # re-emitting the enriched record as soon as it lands ----

    # optional UPGRADE pass: with the >= 1M record already emitted, try
    # the ~2.9M-dof size; on success it replaces the headline (cached
    # same-size mirror first, freshly measured mirror if time still
    # permits), on timeout the emitted records are untouched.  Default
    # size (224,112,112): the TRAILING two array dims tile the (8,128)
    # VREG grid at the n=104 cube's 1.2x padding efficiency — the n=128
    # cube's N=129 pads the 128-lane dim to 256 and measured 2.6x slower
    # per dof (79.1M vs 171.7M dofs/s, same day, same protocol).
    n_up = _parse_n3(os.environ.get("BENCH_N_UPGRADE", "224x112x112"))
    ndof_up = (n_up[0] + 1) * (n_up[1] + 1) * (n_up[2] + 1)
    if (
        os.environ.get("BENCH_UPGRADE", "1") == "1"
        and fmt == "stencil"
        and "note" not in d
        and ndof_up > ndof
        and _left() > 240
    ):
        d_up = _run_child("--tpu-child", n_up,
                          min(540, max(120, _left() - 60)))
        if d_up is not None and (
            # replace the headline only when the larger size holds
            # >= 100M dofs/s (the scaling target) or beats the primary
            # outright; otherwise the primary stays and the point lands
            # as detail
            d_up["ndof"] / d_up["dt"] < min(100e6, tpu_dofs_per_sec)
        ):
            # bigger but materially slower per dof: keep the primary
            # headline, record the scaling point as detail instead
            _RESULT["detail"]["scale_point"] = {
                "what": (
                    "larger-size scaling sample (did not replace the "
                    "headline: lower dofs/s than the primary)"
                ),
                "tpu": d_up,
                "dofs_per_sec": round(d_up["ndof"] / d_up["dt"], 1),
            }
            _emit("scale point")
            d_up = None
        if d_up is not None:
            detail_prev = _RESULT["detail"]
            cm_up = _CACHED_CPU_MIRROR.get(_n3_str(n_up))
            if cm_up is not None:
                mirror_up = dict(cm_up)
                mirror_up["mirror"] = (
                    "cached(same size+algorithm, measured on this machine "
                    "in an earlier round)"
                )
                vs_up = (d_up["ndof"] / d_up["dt"]) / (
                    cm_up["ndof"] / cm_up["wall_s"]
                )
            else:
                mirror_up, vs_up = mirror, (d_up["ndof"] / d_up["dt"]) / (
                    ndof_c / dt_c
                )
            new = _headline(d_up, mirror_up, vs_up)
            # carry the already-landed extras forward
            for key in ("unstructured", "elasticity3d", "profile", "bf16"):
                if key in detail_prev:
                    new["detail"][key] = detail_prev[key]
            new["detail"]["upgrade_pass"] = "landed n=%s" % _n3_str(n_up)
            new["detail"]["previous_headline"] = {
                "ndof": ndof, "dofs_per_sec": round(tpu_dofs_per_sec, 1),
            }
            _RESULT = new
            d, n_used = d_up, n_up
            umax_tpu_val = d["umax"]
            tpu_dofs_per_sec = d["ndof"] / d["dt"]
            _emit("upgrade (cached mirror)")
            if _left() > 150:
                ndof_c, dt_c, iters_c, x_c = cpu_run(n_up, tol, maxiter=3000)
                _RESULT["detail"]["cpu_scipy_gmg"] = {
                    "ndof": ndof_c,
                    "wall_s": round(dt_c, 4),
                    "pcg_iters": iters_c,
                    "u_max": float(np.max(x_c)),
                }
                _RESULT["vs_baseline"] = round(
                    tpu_dofs_per_sec / (ndof_c / dt_c), 3
                )
                cpu_ph = getattr(cpu_run, "last_phases", None)
                if d.get("assembly_ms") is not None and cpu_ph is not None:
                    ph = _RESULT["detail"].get("phases")
                    if ph is not None:
                        ph["cpu_assembly_ms"] = cpu_ph[0]
                        ph["cpu_solve_ms"] = cpu_ph[1]
                        if d.get("solve_dofs_per_sec"):
                            ph["solve_vs_baseline"] = round(
                                d["solve_dofs_per_sec"]
                                / (ndof_c / (cpu_ph[1] * 1e-3)), 3
                            )
                _emit("upgrade (measured mirror)")

    # UNSTRUCTURED record (VERDICT r3 item 5 / r4 item 5): the generic
    # gather/segment-sum + SA-AMG path on a >= 1M-dof perturbed tet mesh
    # — the number the reference's actual (gmsh) meshes correspond to
    if (
        os.environ.get("BENCH_UNSTR", "1") == "1"
        and fmt == "stencil"
        and tunnel_ok
        and _left() > 240
    ):
        n_u = int(os.environ.get("BENCH_N_UNSTR", "100"))  # 1.03M dofs
        d_u = _run_child("--tpu-child-unstr", n_u,
                         min(900, max(120, _left() - 120)))
        if d_u is None and _left() > 240:
            n_u = 64  # 274k fallback so SOME generic-path number records
            d_u = _run_child("--tpu-child-unstr", n_u,
                             min(480, max(120, _left() - 90)))
        if d_u is not None:
            # same-size mirror when time permits; smaller mirror + note
            # otherwise (the mirror must never cost the record)
            n_uc = int(os.environ.get(
                "BENCH_N_UNSTR_CPU", str(n_u if _left() > 300 else 64)
            ))
            ndof_cu, dt_cu, it_cu, x_cu = cpu_baseline_unstructured(
                n_uc, tol, maxiter=500
            )
            umax_cu = float(np.max(x_cu))
            unstr = {
                "metric": "poisson3d_p1_UNSTRUCTURED_amg_pcg_solve",
                "mesh": "perturbed+permuted tets (no lattice structure)",
                "dofs_per_sec": round(d_u["ndof"] / d_u["dt"], 1),
                "vs_baseline": round(
                    (d_u["ndof"] / d_u["dt"]) / (ndof_cu / dt_cu), 3
                ),
                "tpu": d_u,
                "cpu_numpy_amg": {
                    "ndof": ndof_cu,
                    "wall_s": round(dt_cu, 4),
                    "pcg_iters": it_cu,
                    "u_max": umax_cu,
                },
            }
            if n_uc == n_u:
                unstr["umax_rel_diff_vs_cpu"] = round(
                    abs(d_u["umax"] - umax_cu) / max(abs(umax_cu), 1e-30), 6
                )
            else:
                unstr["mirror_note"] = (
                    "CPU mirror at smaller size (deadline guard); "
                    "vs_baseline compares dofs/s across sizes"
                )
            _RESULT["detail"]["unstructured"] = unstr
            _emit("unstructured")

    # per-phase PROFILE of the headline solve (VERDICT r4 item 8): the
    # slope-method decomposition (matvec / V-cycle / dot per-apply costs +
    # the dispatch constant) — the driver-visible roofline evidence
    if (
        os.environ.get("BENCH_PROFILE", "1") == "1"
        and fmt == "stencil"
        and tunnel_ok
        and _left() > 180
    ):
        import subprocess

        try:
            pr = subprocess.run(
                [
                    sys.executable,
                    os.path.join(
                        os.path.dirname(os.path.abspath(__file__)),
                        "bench_profile.py",
                    ),
                ],
                capture_output=True,
                timeout=min(420, max(120, _left() - 60)),
                text=True,
                # profile the PRIMARY (cubic) size: the decomposition
                # (matvec/V-cycle/dot slopes + dispatch constant) is the
                # point, and bench_profile's parser is cubic-only
                env={**os.environ, "PROF_N": str(
                    n_used if isinstance(n_used, int) else 104
                )},
            )
            profile = None
            for line in pr.stdout.splitlines():
                if line.startswith("{"):
                    profile = json.loads(line)
            if profile is not None:
                _RESULT["detail"]["profile"] = profile
                _emit("profile")
        except subprocess.TimeoutExpired:
            sys.stderr.write("bench profile child timed out\n")
        except Exception as e:  # profile is evidence, never a blocker
            sys.stderr.write(f"bench profile child failed: {e}\n")

    # vector-elasticity variant (ROADMAP perf item 3)
    if (
        os.environ.get("BENCH_ELAS", "1") == "1"
        and fmt == "stencil"
        and tunnel_ok  # wedged tunnel: don't burn budget on more children
        and _left() > 200
    ):
        n_e = int(os.environ.get("BENCH_N_ELAS", "80"))  # 3*81^3 = 1.59M dofs
        d_e = _run_elas_child(n_e, tol,
                              timeout_s=min(480, max(120, _left() - 90)))
        if d_e is None and _left() > 200:  # one smaller retry
            n_e = 64
            d_e = _run_elas_child(n_e, tol,
                                  timeout_s=min(240, max(90, _left() - 60)))
        if d_e is not None:
            # deadline-guarded mirror (VERDICT r4 weak-1: un-deadlined CPU
            # mirrors ran the round-4 tail into the driver's kill) — a
            # smaller mirror + note, never the record's ransom
            n_ec = int(os.environ.get(
                "BENCH_N_ELAS_CPU", str(n_e if _left() > 240 else 48)
            ))
            ndof_ce, dt_ce, it_ce, x_ce = cpu_baseline_elasticity(
                n_ec, tol, maxiter=3000,
            )
            _RESULT["detail"]["elasticity3d"] = {
                "metric": "elasticity3d_p1_assembly+pcg_throughput",
                "dofs_per_sec": round(d_e["ndof"] / d_e["dt"], 1),
                "vs_baseline": round(
                    (d_e["ndof"] / d_e["dt"]) / (ndof_ce / dt_ce), 3
                ),
                "tpu": d_e,
                "cpu_numpy_gmg": {
                    "ndof": ndof_ce,
                    "wall_s": round(dt_ce, 4),
                    "pcg_iters": it_ce,
                    "u_max": float(np.abs(x_ce).max()),
                },
            }
            if n_ec != n_e:
                _RESULT["detail"]["elasticity3d"]["mirror_note"] = (
                    "CPU mirror at smaller size (deadline guard); "
                    "vs_baseline compares dofs/s across sizes"
                )
            _emit("elasticity")

    # bf16 mixed-precision variant (opt-in; measured-and-retired round 3)
    if (
        os.environ.get("BENCH_BF16", "0") == "1"
        and fmt == "stencil"
        and "note" not in d
        and _left() > 200
    ):
        d_bf = _run_child("--tpu-child-bf16", n_used,
                          min(420, max(120, _left() - 60)))
        if d_bf is not None and (
            abs(d_bf["umax"] - umax_tpu_val) / max(abs(umax_tpu_val), 1e-30)
            > 1e-3
        ):
            sys.stderr.write(
                "bf16 variant failed the u_max check; not recorded\n"
            )
            d_bf = None
        if d_bf is not None:
            _RESULT["detail"]["bf16"] = {
                "dofs_per_sec": round(d_bf["ndof"] / d_bf["dt"], 1),
                "speedup_vs_f32": round(
                    (d_bf["ndof"] / d_bf["dt"]) / tpu_dofs_per_sec, 3
                ),
                # same-solution check: u_max agreement with the f32 run
                "umax_rel_diff_vs_f32": round(
                    abs(d_bf["umax"] - umax_tpu_val)
                    / max(abs(umax_tpu_val), 1e-30),
                    9,
                ),
                "tpu": d_bf,
            }
            _emit("bf16")

    _emit("final")


if __name__ == "__main__":
    main()
