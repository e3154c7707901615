"""Compressible Navier-Stokes (ideal gas, laminar): explicit density-based
solver.

The reference PROMISES this solver and never ships it — its example suite
does ``from FenicsSolver import CompressibleNSSolver``
(``/root/reference/examples/test_cfd_solver.py:164-165``) and
``CoupledNavierStokesSolver`` carries a ``self.compressible = False`` flag
plus dead branches "used by compressible NS solver"
(``FenicsSolver/CoupledNavierStokesSolver.py:72,403,464``), but no
``CompressibleNSSolver.py`` exists upstream.  Delivered here.

Formulation (TPU-first, deliberately NOT the reference's implicit mixed
pattern): conservative variables U = (rho, m_1..m_d, E) as nodal P1
fields, ideal-gas EOS p = (gamma - 1)(E - |m|^2 / (2 rho)), discretized
with the GROUP finite-element method — the flux F(U) is interpolated in
the same P1 basis, so with constant P1 gradients every element integral
collapses to dense per-element tensor contractions:

    int_e grad(phi_a) . F_h dV = |e|/(d+1) * sum_b grad(phi_a) . F(U_b)

No quadrature loop, no scatter inside the stage evaluation except the one
element->node add; the whole right-hand side is a fixed-shape batched
kernel that XLA fuses, and time integration is strong-stability-preserving
RK2 driven by ``lax.scan`` — thousands of steps in ONE device dispatch,
zero per-step host round-trips (the implicit reference pattern would
serialize a host Newton solve per step).

Stabilization: elementwise Rusanov-type first-order viscosity scaled by a
normalized density-gradient shock sensor (smooth regions keep ~zero
artificial dissipation), applied as a component-wise Laplacian on U —
conservative by construction (P1 partition of unity).  Physical viscous
stresses (Stokes hypothesis), heat conduction k = mu cp / Pr, and the
boundary flux integral (lumped facet quadrature) complete the residual.

Mass is conserved to round-off on closed domains (sum_a grad(phi_a) = 0
per element, and wall fluxes vanish nodally); total energy likewise with
adiabatic SLIP walls (the slip projection touches only momentum).  Both
are pinned by tests/test_compressible.py::test_closed_box_conservation.

Boundary conditions (strong, nodal, reapplied after every RK stage):
``values`` taxonomy as the incompressible solver (variable = velocity /
temperature / pressure, type Dirichlet); bc type ``symmetry`` (or value
type ``slip``) removes the normal momentum component with area-averaged
nodal normals.  Pressure Dirichlet resets E from the ideal-gas law at the
node (subsonic outlet); temperature Dirichlet does the same via cv T.

Material keys: ``dynamic_viscosity`` or ``kinematic_viscosity`` (* density),
``specific_heat_ratio`` gamma (default 1.4), ``gas_constant`` R (default
287.05 J/kg/K), ``prandtl_number`` (default 0.72).  ``viscous: False`` or
zero viscosity gives the Euler equations.

Initial values: ``velocity`` (tuple), ``pressure``, ``temperature`` —
scalars, python callables ``f(x) -> value``, or nodal arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.function import Function
from ..core.spaces import FunctionSpace, VectorFunctionSpace
from ..ops import geometry
from .solver_base import SolverBase, SolverError


class CompressibleNSSolver(SolverBase):
    """Explicit compressible ideal-gas flow solver (module docstring)."""

    def __init__(self, s):
        s.setdefault("scalar_name", "density")
        s.setdefault("fe_degree", 1)
        SolverBase.__init__(self, s)
        if self.settings.get("fe_degree", 1) != 1:
            raise SolverError(
                "CompressibleNSSolver: the group-FEM/lumped-mass scheme is "
                "P1 (fe_degree=1)"
            )
        m = self.material
        self.gamma = float(m.get("specific_heat_ratio", 1.4))
        self.R_gas = float(m.get("gas_constant", 287.05))
        self.Pr = float(m.get("prandtl_number", 0.72))
        self.cv = self.R_gas / (self.gamma - 1.0)
        self.cp = self.gamma * self.cv
        rho_ref = float(m.get("density", 1.0))
        if "dynamic_viscosity" in m:
            self.mu = float(m["dynamic_viscosity"])
        elif "kinematic_viscosity" in m:
            self.mu = float(m["kinematic_viscosity"]) * rho_ref
        else:
            self.mu = 0.0
        if self.settings.get("viscous") is False:
            self.mu = 0.0
        #: artificial-viscosity scaling (Rusanov constant); 0 disables
        self.c_av = float(
            self.solver_settings.get("artificial_viscosity", 0.5)
        )
        self._prepared = False

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------
    def _nodal_value(self, spec, default, ncomp=None):
        """Nodal array from a scalar / callable(x) / array spec."""
        V = self.function_space
        X = np.asarray(V.dof_coords if hasattr(V, "dof_coords") else
                       self.mesh.coords)
        n = V.ndof
        if ncomp is None:
            if spec is None:
                return np.full(n, float(default))
            if callable(spec):
                return np.array([float(spec(x)) for x in X])
            a = np.asarray(spec, dtype=np.float64)
            return a.reshape(-1) if a.size == n else np.full(n, float(a))
        out = np.zeros((ncomp, n))
        if spec is None:
            spec = default
        if callable(spec):
            for i, x in enumerate(X):
                out[:, i] = np.asarray(spec(x), dtype=np.float64)
        else:
            a = np.asarray(spec, dtype=np.float64)
            if a.shape == (ncomp, n):
                out = a
            else:
                out[:] = a.reshape(ncomp, 1)
        return out

    def _initial_state(self):
        """U0 (d+2, ndof) from initial velocity/pressure/temperature."""
        d = self.dimension
        iv = self.initial_values or {}
        p0 = self._nodal_value(iv.get("pressure"), 1.0e5)
        T0 = self._nodal_value(iv.get("temperature"), 293.15)
        u0 = self._nodal_value(iv.get("velocity"), (0.0,) * d, ncomp=d)
        rho = p0 / (self.R_gas * T0)
        m = rho[None, :] * u0
        E = p0 / (self.gamma - 1.0) + 0.5 * rho * (u0**2).sum(axis=0)
        return np.concatenate([rho[None], m, E[None]], axis=0)

    def _boundary_plan(self):
        """Parse the bc taxonomy into nodal masks/values (numpy, static).

        Returns dict of arrays used by the jitted ``_apply_bcs``:
        velocity Dirichlet (mask + (d, ndof) values), temperature and
        pressure Dirichlet (mask + values), slip (mask + unit normals).
        """
        V = self.function_space
        mesh = self.mesh
        d = self.dimension
        n = V.ndof
        vel_mask = np.zeros(n)
        vel_val = np.zeros((d, n))
        T_mask = np.zeros(n)
        T_val = np.zeros(n)
        p_mask = np.zeros(n)
        p_val = np.zeros(n)
        slip_mask = np.zeros(n)
        normals = np.zeros((d, n))
        fn_all = np.asarray(mesh.facet_normals())
        fa_all = np.asarray(mesh.facet_areas())
        for key, bc in (self.boundary_conditions or {}).items():
            fids = self.boundary_facet_ids(bc["boundary_id"])
            if fids.size == 0:
                continue
            dofs = np.unique(np.asarray(V.facet_dofs(fids)).reshape(-1))
            btype = bc.get("type")
            if btype in ("symmetry", "slip"):
                slip_mask[dofs] = 1.0
                # area-weighted nodal normals over the marked facets
                fv = mesh._compute_facets()["facet_vertices"][fids]
                for f, verts in enumerate(fv):
                    normals[:, verts] += fa_all[fids[f]] * fn_all[fids[f], :d, None]
                continue
            values = bc.get("values", [])
            if isinstance(values, dict):
                values = list(values.values())
            for sv in values:
                var = sv.get("variable")
                vtype = sv.get("type", "Dirichlet")
                if vtype not in ("Dirichlet", "fixedValue"):
                    continue  # natural/flux types are out of this taxonomy
                val = sv.get("value")
                if var == "velocity":
                    vel_mask[dofs] = 1.0
                    v = np.asarray(val, dtype=np.float64).reshape(-1)
                    vel_val[:, dofs] = v[:d, None]
                elif var == "temperature":
                    T_mask[dofs] = 1.0
                    T_val[dofs] = float(val)
                elif var == "pressure":
                    p_mask[dofs] = 1.0
                    p_val[dofs] = float(val)
        nrm = np.linalg.norm(normals, axis=0)
        nz = nrm > 1e-30
        normals[:, nz] /= nrm[nz]
        return dict(
            vel_mask=vel_mask, vel_val=vel_val, T_mask=T_mask, T_val=T_val,
            p_mask=p_mask, p_val=p_val, slip_mask=slip_mask, normals=normals,
        )

    def _prepare(self):
        """Host-side geometry/connectivity tables (numpy: they embed as
        constants in the jitted step — zero eager device ops, the axon
        tunnel rule; see bench.py)."""
        if self._prepared:
            return
        V = self.function_space
        mesh = self.mesh
        d = self.dimension
        cd = np.asarray(V.cell_dofs)  # (nc, k) == vertices for P1
        Xe = np.asarray(mesh.coords)[cd]  # (nc, k, d)
        J = np.swapaxes(Xe[:, 1:, :] - Xe[:, :1, :], 1, 2)
        detJ = np.abs(np.linalg.det(J)) if d > 1 else np.abs(J[:, 0, 0])
        Jinv = (np.linalg.inv(J) if d > 1
                else 1.0 / J)
        fact = {1: 1.0, 2: 2.0, 3: 6.0}[d]
        vol = detJ / fact  # |e|
        gref = np.concatenate(
            [-np.ones((1, d)), np.eye(d)], axis=0
        )  # (k, d) reference gradients
        dphig = np.einsum("kt,ctg->ckg", gref, Jinv)  # (nc, k, d)
        h_e = vol ** (1.0 / d)
        # exterior boundary facets: (nf, kf) facet dofs, areas, normals
        ext = np.asarray(mesh.exterior_facets())
        info = mesh._compute_facets()
        bfv = info["facet_vertices"][ext]  # (nf, kf)
        bfa = np.asarray(mesh.facet_areas())[ext]
        bfn = np.asarray(mesh.facet_normals())[ext][:, :d]
        self._tables = dict(
            cd=cd, vol=vol, dphig=dphig, h_e=h_e,
            bfv=bfv, bfa=bfa, bfn=bfn,
        )
        # lumped P1 mass: m_a = sum_e |e| / (d+1)
        k = cd.shape[1]
        ml = np.zeros(V.ndof)
        np.add.at(ml, cd.reshape(-1), np.repeat(vol / k, k))
        self._tables["mlump"] = ml
        self._bplan = self._boundary_plan()
        self._prepared = True

    # ------------------------------------------------------------------
    # jitted physics
    # ------------------------------------------------------------------
    def _primitives(self, U):
        d = self.dimension
        rho = U[0]
        m = U[1 : 1 + d]
        E = U[1 + d]
        u = m / rho
        p = (self.gamma - 1.0) * (E - 0.5 * (m * u).sum(axis=0))
        return rho, m, E, u, p

    def _apply_bcs(self, U, b=None):
        """Strong nodal BCs on conservative variables (jit-traceable).

        ``b``: the boundary plan dict (defaults to the serial
        ``self._bplan``; the distributed path passes rank-local arrays)."""
        d = self.dimension
        b = self._bplan if b is None else b
        gamma, cv = self.gamma, self.cv
        rho = U[0]
        m = U[1 : 1 + d]
        E = U[1 + d]
        # slip: remove normal momentum
        sm, nrm = b["slip_mask"], b["normals"]
        mn = (m * nrm).sum(axis=0)
        m = m - sm * mn * nrm
        # velocity Dirichlet: m = rho u_bc (kinetic energy re-synced below)
        vm = b["vel_mask"]
        ke_old = 0.5 * (m * m).sum(axis=0) / rho
        m = (1.0 - vm) * m + vm * rho * b["vel_val"]
        ke_new = 0.5 * (m * m).sum(axis=0) / rho
        E = E + (ke_new - ke_old)  # keep internal energy through the reset
        # temperature Dirichlet: E = rho cv T + ke
        tm = b["T_mask"]
        E = (1.0 - tm) * E + tm * (rho * cv * b["T_val"] + ke_new)
        # pressure Dirichlet (subsonic outlet): E = p/(gamma-1) + ke
        pm = b["p_mask"]
        E = (1.0 - pm) * E + pm * (b["p_val"] / (gamma - 1.0) + ke_new)
        return jnp.concatenate([rho[None], m, E[None]], axis=0)

    def _rhs(self, U, t=None):
        """dU/dt = M_lump^{-1} R(U): group-FEM flux + viscous + artificial
        viscosity + boundary flux.  Shapes: U (d+2, ndof).

        ``t``: geometry/connectivity table dict (defaults to the serial
        ``self._tables``; the distributed path passes rank-local padded
        tables, where padded entities carry zero volume/area and index
        the safe dummy slot)."""
        d = self.dimension
        t = self._tables if t is None else t
        cd, vol, dphig, h_e = t["cd"], t["vol"], t["dphig"], t["h_e"]
        k = cd.shape[1]
        gamma, mu, Pr, cp = self.gamma, self.mu, self.Pr, self.cp
        nvar = d + 2
        ndof = U.shape[1]

        rho, m, E, u, p = self._primitives(U)
        c = jnp.sqrt(gamma * jnp.maximum(p, 1e-30) / rho)  # sound speed
        # nodal flux tensor F (nvar, d, ndof)
        Fr = m  # (d, ndof)
        Fm = (u[:, None, :] * m[None, :, :]
              + p * jnp.eye(d)[:, :, None])  # (d, d, ndof)
        FE = (E + p) * u  # (d, ndof)
        F = jnp.concatenate([Fr[None], Fm, FE[None]], axis=0)

        Ue = U[:, cd]  # (nvar, nc, k)
        Fe = F[:, :, cd]  # (nvar, d, nc, k)
        # Galerkin (group) term: R_a += |e|/k * sum_b dphig_a . F_b
        Fbar = Fe.mean(axis=3)  # (nvar, d, nc)
        Rgal = jnp.einsum("vgc,ckg,c->vck", Fbar, dphig, vol)

        # artificial viscosity: Rusanov scale * density-gradient sensor
        if self.c_av > 0.0:
            lam_e = (jnp.sqrt((u[:, cd] ** 2).sum(axis=0)) + c[cd]).max(axis=1)
            grho = jnp.einsum("ck,ckg->cg", rho[cd], dphig)
            sens = jnp.clip(
                h_e * jnp.sqrt((grho**2).sum(axis=1)) / rho[cd].mean(axis=1),
                0.0, 1.0,
            )
            eps_e = self.c_av * h_e * lam_e * sens  # (nc,)
            gU = jnp.einsum("vck,ckg->vcg", Ue, dphig)  # (nvar, nc, d)
            Rgal = Rgal - jnp.einsum(
                "vcg,ckg,c->vck", gU, dphig, eps_e * vol
            )

        # physical viscous stresses + heat conduction
        if mu > 0.0:
            ue = u[:, cd]  # (d, nc, k)
            gradu = jnp.einsum("icj,cjg->cig", ue, dphig)  # (nc, d, d)
            divu = jnp.einsum("cii->c", gradu)
            tau = mu * (gradu + jnp.swapaxes(gradu, 1, 2))
            tau = tau - (2.0 * mu / 3.0) * divu[:, None, None] * jnp.eye(d)
            # momentum: -int grad(phi_a) . tau
            Rgal = Rgal.at[1 : 1 + d].add(
                -jnp.einsum("cig,ckg,c->ick", tau, dphig, vol)
            )
            # energy: -int grad(phi_a) . (tau . u_bar - q),  q = -kappa grad T
            Te = p[cd] / (self.R_gas * rho[cd])  # nodal T on elements
            gT = jnp.einsum("ck,ckg->cg", Te, dphig)
            kappa = mu * cp / Pr
            ubar = ue.mean(axis=2)  # (d, nc)
            work = jnp.einsum("cig,ic->cg", tau, ubar) + kappa * gT
            Rgal = Rgal.at[1 + d].add(
                -jnp.einsum("cg,ckg,c->ck", work, dphig, vol)
            )

        R = (
            jnp.zeros((nvar, ndof))
            .at[:, cd.reshape(-1)]
            .add(Rgal.reshape(nvar, -1))
        )

        # boundary flux: -sum_f |f|/kf * F(U_a) . n  (lumped facet quadrature)
        bfv, bfa, bfn = t["bfv"], t["bfa"], t["bfn"]
        if bfv.size:
            kf = bfv.shape[1]
            Ff = F[:, :, bfv]  # (nvar, d, nf, kf)
            Fn = jnp.einsum("vgfk,fg->vfk", Ff, bfn)  # (nvar, nf, kf)
            w = (bfa / kf)[None, :, None]
            R = R.at[:, bfv.reshape(-1)].add(-(w * Fn).reshape(nvar, -1))
        return R / t["mlump"]

    # ------------------------------------------------------------------
    # driver
    # ------------------------------------------------------------------
    def cfl_time_step(self, U=None, cfl=0.4):
        """Explicit stability bound dt = cfl * min_e h_e / max(|u| + c),
        capped by the viscous limit h^2/(2 d nu) when viscous."""
        self._prepare()
        U = self._initial_state() if U is None else np.asarray(U)
        d = self.dimension
        rho = U[0]
        u = U[1 : 1 + d] / rho
        p = (self.gamma - 1.0) * (
            U[1 + d] - 0.5 * rho * (u**2).sum(axis=0)
        )
        c = np.sqrt(self.gamma * np.maximum(p, 1e-30) / rho)
        lam = (np.sqrt((u**2).sum(axis=0)) + c).max()
        h = self._tables["h_e"].min()
        dt = cfl * h / max(lam, 1e-30)
        if self.mu > 0.0:
            nu = self.mu / rho.min()
            dt = min(dt, cfl * h * h / (2.0 * d * nu))
        return float(dt)

    def step_function(self, dt):
        """(U -> U) one SSP-RK2 step with BCs after each stage (jittable)."""

        def stage(U):
            return self._apply_bcs(U + dt * self._rhs(U))

        def step(U):
            U1 = stage(U)
            U2 = stage(U1)
            return 0.5 * U + 0.5 * U2

        return step

    def _march_distributed(self, U0, dt, nsteps):
        """Sharded transient: halo exchange INSIDE the ``lax.scan``.

        The reference gets full-solver MPI parallelism for free from
        dolfin/PETSc (``FenicsSolver/SolverBase.py:102-118``); here the
        explicit update is sharded with `parallel/explicit.py`'s
        node-partition + ghost-cell-replication layout — per RK stage the
        only communication is one offset-grouped ``ppermute`` ghost
        refresh (O(interface) values over ICI), and the WHOLE transient
        stays one device dispatch.  Returns the gathered global final
        state (numpy)."""
        from functools import partial

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from ..parallel.explicit import AXIS, HaloExplicitStepper

        t = self._tables
        d = self.dimension
        st = HaloExplicitStepper(
            np.asarray(self.mesh.coords), [t["cd"], t["bfv"]]
        )
        tloc = dict(
            cd=st.ldofs[0],
            vol=st.localize(0, t["vol"]),
            dphig=st.localize(0, t["dphig"]),
            h_e=st.localize(0, t["h_e"]),
            bfv=st.ldofs[1],
            bfa=st.localize(1, t["bfa"]),
            bfn=st.localize(1, t["bfn"]),
            mlump=st.scatter_nodal(t["mlump"], pad=1.0),
        )
        bploc = {k: st.scatter_nodal(v) for k, v in self._bplan.items()}
        # dummy/pad slots hold a safe thermodynamic state (rho = 1, E = 1)
        # — padded elements gather them, then multiply by zero volume
        safe = np.zeros(d + 2)
        safe[0] = safe[-1] = 1.0
        U0_loc = st.scatter_nodal(np.asarray(U0), pad=safe)
        sends, recvs = st.comm_arrays()
        own = st.own_mask

        nsr = len(sends)
        in_specs = (
            P(AXIS),  # tables (tree prefix)
            P(AXIS),  # boundary plan (tree prefix)
            P(AXIS),  # own_mask
            tuple(P(AXIS) for _ in range(nsr)),
            tuple(P(AXIS) for _ in range(nsr)),
            P(AXIS),  # U0
        )

        @partial(
            shard_map,
            mesh=st.device_mesh,
            in_specs=in_specs,
            out_specs=P(AXIS),
            check_vma=False,
        )
        def march(tabs, bp, own_m, snds, rcvs, U):
            tabs = jax.tree_util.tree_map(lambda a: a[0], tabs)
            bp = jax.tree_util.tree_map(lambda a: a[0], bp)
            own_m = own_m[0]
            snds = tuple(s[0] for s in snds)
            rcvs = tuple(r[0] for r in rcvs)
            U = U[0]
            exchange = st.make_exchange(snds, rcvs)

            def stage(U):
                Ux = exchange(U)  # refresh ghosts from owners
                Un = Ux + dt * (own_m * self._rhs(Ux, tabs))
                return self._apply_bcs(Un, bp)

            def body(U, _):
                U1 = stage(U)
                U2 = stage(U1)
                return 0.5 * U + 0.5 * U2, 0.0

            U, _ = jax.lax.scan(body, U, None, length=nsteps)
            return U[None]

        U_loc = jax.jit(march)(tloc, bploc, own, sends, recvs, U0_loc)
        return st.gather_nodal(np.asarray(U_loc))

    def solve(self):
        """March transient_settings.[starting_time, ending_time] with fixed
        ``time_step`` (or a CFL-derived one), all steps inside ONE
        ``lax.scan`` dispatch."""
        self._prepare()
        ts = self.transient_settings
        if not ts.get("transient"):
            raise SolverError(
                "CompressibleNSSolver is explicit/transient: set "
                "transient_settings.transient = True"
            )
        t0 = float(ts.get("starting_time", 0.0))
        t1 = float(ts["ending_time"])
        dt = ts.get("time_step")
        if dt is None:
            dt = self.cfl_time_step(cfl=float(ts.get("cfl", 0.4)))
        dt = float(dt)
        nsteps = max(int(round((t1 - t0) / dt)), 1)
        dt = (t1 - t0) / nsteps
        U0 = jnp.asarray(self._apply_bcs(jnp.asarray(self._initial_state())))
        sp = self.solver_settings.get("solver_parameters") or {}
        if sp.get("distributed") and len(jax.devices()) > 1:
            Uh = self._march_distributed(np.asarray(U0), dt, nsteps)
        else:
            if sp.get("distributed"):
                self.logger.warning(
                    "distributed solve requested but only one device is "
                    "visible; falling back to the serial path"
                )
            step = self.step_function(dt)

            @jax.jit
            def march(U):
                def body(U, _):
                    return step(U), 0.0

                U, _ = jax.lax.scan(body, U, None, length=nsteps)
                return U

            Uh = np.asarray(march(U0))
        if not np.isfinite(Uh).all():
            raise SolverError(
                f"CompressibleNSSolver diverged (non-finite state after "
                f"{nsteps} steps of dt={dt:g}; reduce time_step / check bcs)"
            )
        self.state = Uh
        self.current_time = t1
        self.current_step = nsteps
        V = self.function_space
        self.result = Function(V, name="density")
        self.result.values[:] = Uh[0]
        self.w_current = self.result
        return self.result

    # -- post-processing ---------------------------------------------------
    def velocity(self):
        d = self.dimension
        Vv = VectorFunctionSpace(self.mesh, "CG", 1)
        f = Function(Vv, name="velocity")
        u = self.state[1 : 1 + d] / self.state[0]
        f.values[:] = u.T.reshape(-1)  # node-major (v, comp)
        return f

    def _pressure_np(self):
        d = self.dimension
        rho = self.state[0]
        m = self.state[1 : 1 + d]
        return (self.gamma - 1.0) * (
            self.state[1 + d] - 0.5 * (m**2).sum(axis=0) / rho
        )

    def pressure(self):
        f = Function(self.function_space, name="pressure")
        f.values[:] = self._pressure_np()
        return f

    def temperature(self):
        f = Function(self.function_space, name="temperature")
        f.values[:] = self._pressure_np() / (self.R_gas * self.state[0])
        return f

    def mach(self):
        d = self.dimension
        rho = self.state[0]
        u = self.state[1 : 1 + d] / rho
        c = np.sqrt(self.gamma * self._pressure_np() / rho)
        f = Function(self.function_space, name="mach")
        f.values[:] = np.sqrt((u**2).sum(axis=0)) / c
        return f

    def totals(self):
        """(mass, momentum_i..., energy) integrals via the lumped mass."""
        ml = self._tables["mlump"]
        return (self.state * ml[None, :]).sum(axis=1)
