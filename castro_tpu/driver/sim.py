"""Single-level simulation driver: the Castro advance loop, TPU-style.

Reference orchestration: `Castro::advance` / `do_advance_ctu` / retry
(`Source/driver/Castro_advance.cpp:20`, `Castro_advance_ctu.cpp:16,404,504`)
and the coarse-timestep loop in `main()` (`Source/driver/main.cpp:118-214`).

TPU-first: one jitted step function advances the whole level; retry and dt
control are host-side decisions on reduced scalars fetched from the device
(the reference's advance_status pattern). The state `u` always carries its
ghost zones; ghosts are (re)filled at the start of each step.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from castro_tpu.config import Params
from castro_tpu.driver import clean as clean_mod
from castro_tpu.driver.timestep import estdt_burning, estdt_cfl
from castro_tpu.eos import make_eos
from castro_tpu.geometry import geometry_from_params
from castro_tpu.network import make_network
from castro_tpu.ops.advection_util import ctoprim, src_to_prim
from castro_tpu.ops.ctu import HydroConfig, ctu_hydro
from castro_tpu.ops.fill import fill_ghosts
from castro_tpu.state import layout_from_params
from castro_tpu.ops.stencil import interior_slice


def _ctx_tolerant(fn):
    """Wrap a source callable that predates the ctx protocol so the driver
    can always pass ctx= (user ext_src hooks)."""
    import inspect

    try:
        sig = inspect.signature(fn.__call__ if not inspect.isfunction(fn)
                                and not inspect.ismethod(fn) else fn)
        params = sig.parameters
        if "ctx" in params or any(p.kind == p.VAR_KEYWORD
                                  for p in params.values()):
            return fn
    except (TypeError, ValueError):
        pass

    def wrapped(sim, u, q, qaux, t, dt, ctx=None):
        return fn(sim, u, q, qaux, t, dt)

    wrapped.name = getattr(fn, "name", getattr(fn, "__name__", "ext"))
    return wrapped


class StepCtx:
    """Execution context for one step: how to fill ghosts, how to reduce
    globally, and the (possibly shard-local) geometry.

    The default context is the single-device whole-domain one; the sharded
    path (`castro_tpu/parallel/decomp.py`) substitutes halo-exchange fills,
    collective reductions, and a shard-local geometry view so the SAME
    `_step_impl` runs under `shard_map` (the reference achieves this with
    ubiquitous `ParallelDescriptor` calls — SURVEY.md §2.8 P1/P2)."""

    __slots__ = ("fill", "pmin", "pany", "psum", "geom", "axis_names",
                 "grav_bc", "point_mass", "fill_b", "fill_rad")

    def __init__(self, fill, pmin, pany, psum, geom, axis_names=(),
                 grav_bc=None, point_mass=None, fill_b=None, fill_rad=None):
        self.fill = fill
        self.pmin = pmin
        self.pany = pany
        self.psum = psum
        self.geom = geom
        self.axis_names = axis_names
        # MHD face-field ghost fill (halo exchange under shard_map);
        # None = the solver's own single-device _fill_b
        self.fill_b = fill_b
        # radiation-field 1-ghost fill for the Er advection (halo
        # exchange under shard_map); None = the physical-BC fill
        self.fill_rad = fill_rad
        # composite AMR gravity: (bvl, bvh) Dirichlet phi values on the
        # window boundary faces, interpolated from the coarse-level solve
        # (reference Gravity.cpp:418-487 level solve with coarse boundary
        # registers). None = isolated-domain multipole/periodic BCs.
        self.grav_bc = grav_bc
        # runtime point mass (accretion bookkeeping overrides the static
        # castro.point_mass; Castro_pointmass.cpp:155)
        self.point_mass = point_mass


@dataclass
class StepStatus:
    min_rho: float
    has_nan: bool
    burn_fail: bool = False

    @property
    def success(self) -> bool:
        return (not self.has_nan) and self.min_rho > 0.0 and not self.burn_fail


class Simulation:
    """Owns params, layout, geometry, EOS/network, the state, and the
    jit-compiled step/dt programs."""

    def __init__(self, params: Params, problem_init: Optional[Callable] = None,
                 problem_fill: Optional[Callable] = None,
                 source_fns: Optional[List[Callable]] = None,
                 ext_src: Optional[Callable] = None,
                 geom=None,
                 problem_checkpoint: Optional[Callable] = None,
                 problem_restart: Optional[Callable] = None,
                 problem_diagnostics: Optional[Callable] = None,
                 problem_derives: Optional[dict] = None):
        """`geom` overrides the params-derived geometry — AMR fine-level
        windows pass a `local_view` of the full fine-level geometry so dx
        (and everything derived from it: estdt, diffusion stencils, the
        Poisson solve) is the true fine dx, not domain_extent/window_shape.

        Problem hooks beyond init/fill (reference `Source/problems/*.H`
        header-injection points): `problem_checkpoint(sim) -> dict` extra
        state into checkpoint metadata; `problem_restart(sim, dict)` on
        restore; `problem_diagnostics(sim, u_int, sums) -> dict` merged
        into the integral diagnostics; `problem_derives` name->fn added
        to the derived-field registry (Problem_Derives.H)."""
        self.problem_checkpoint = problem_checkpoint
        self.problem_restart = problem_restart
        self.problem_diagnostics = problem_diagnostics
        self.problem_derives = dict(problem_derives or {})
        self.params = params
        self.network = make_network(params)
        import dataclasses as _dc

        # the network defines the species list; layout follows it
        params = _dc.replace(params, network=_dc.replace(
            params.network, nspec=self.network.nspec,
            spec_names=self.network.spec_names,
            aux_names=self.network.aux_names))
        self.params = params
        self.layout = layout_from_params(params)
        self.dtype = jnp.float64 if params.tpu.dtype == "float64" else jnp.float32
        self.geom = geom if geom is not None else \
            geometry_from_params(params, self.dtype)
        self.eos = make_eos(params, self.network)
        self.problem_init = problem_init
        self.problem_fill = problem_fill
        # each source fn: (sim, u, q, qaux, t, dt) -> src[NVAR, grid]
        from castro_tpu.sources import build_sources

        self.source_fns = list(source_fns or [])
        self.source_fns += build_sources(
            params, self.geom, self.layout, self.layout.ngrow,
            ext_src=ext_src)

        # radiation (gray/MG FLD; reference final_radiation_call,
        # Castro_advance.cpp:109)
        self.rad = None
        self.u_rad = None
        if params.castro.do_radiation:
            from castro_tpu.radiation.fld import FLDRadiation

            self.rad = FLDRadiation(params, self.geom, self.layout)
            self.rad.geom_metric()  # build the curvilinear metric eagerly
            self._jit_rad_step = jax.jit(self._rad_step_impl)

        # ideal MHD inside the main driver (reference: MHD is Castro with
        # USE_MHD=TRUE — do_advance_ctu swaps construct_ctu_hydro_source
        # for construct_ctu_mhd_source, Source/mhd/Castro_mhd.cpp — and
        # keeps the whole sources/retry/IO machinery)
        self.mhd = None
        self.u_b = None
        if params.castro.do_mhd:
            from castro_tpu.mhd.solver import MhdSolver

            self.mhd = MhdSolver(self)
            self._jit_mhd_step = jax.jit(self._mhd_step_impl)
            self._jit_mhd_estdt = jax.jit(self._mhd_estdt_impl)

        # Strang reaction coupling (reference Castro_react.cpp; SDC modes
        # use their own coupling)
        self.reactor = None
        tim = params.castro.time_integration_method
        if params.castro.do_react and self.network.reactive and tim == 0:
            from castro_tpu.reactions.strang import StrangReactor

            self.reactor = StrangReactor(params, self.network, self.eos,
                                         self.layout)

        # SDC time integration (reference Castro_advance_sdc.cpp /
        # simplified-SDC react_state)
        self.sdc = None
        self.sdc_simplified = None
        if tim == 2:
            from castro_tpu.sdc import TrueSDC2, TrueSDC4, TrueSDC4Radau

            if int(params.castro.sdc_order) >= 4:
                self.sdc = (TrueSDC4Radau(self)
                            if params.castro.sdc_quadrature == 1
                            else TrueSDC4(self))
            else:
                self.sdc = TrueSDC2(self)
            self._jit_sdc_step = jax.jit(
                lambda u, dt, t: self.sdc.advance(u, dt, t))
        elif tim == 3 and params.castro.do_react and self.network.reactive:
            from castro_tpu.sdc import SimplifiedSDC

            self.sdc_simplified = SimplifiedSDC(self)
            self._jit_ssdc_step = jax.jit(self._ssdc_step_impl)

        c = params.castro
        self.ng = self.layout.ngrow
        self.cfg = HydroConfig(
            use_flattening=bool(c.use_flattening),
            difmag=c.difmag,
            riemann_solver=c.riemann_solver,
            small_dens=max(c.small_dens, 1e-200),
            small_pres=max(c.small_pres, 1e-200),
            small_ener=1e-200,
            transverse_reset_density=bool(c.transverse_reset_density),
            transverse_reset_rhoe=bool(c.transverse_reset_rhoe),
            ppm_type=c.ppm_type,
            use_shock_var=bool(c.use_shock_var),
            shock_threshold=c.shock_detection_threshold,
            hybrid_riemann=bool(c.hybrid_riemann),
            use_pslope=bool(c.use_pslope),
            plm_iorder=c.plm_limiter,
            pslope_cutoff_density=c.pslope_cutoff_density,
            use_pallas=(jax.default_backend() == "tpu"
                        and params.tpu.dtype != "float64"),
            hybrid_hydro=bool(c.hybrid_hydro) and self.layout.hybrid_momentum,
            limit_fluxes_on_small_dens=bool(c.limit_fluxes_on_small_dens),
            speed_limit=c.speed_limit,
            cfl=c.cfl,
            lo_bc=tuple(c.lo_bc[: self.layout.dim]),
            hi_bc=tuple(c.hi_bc[: self.layout.dim]),
            ng=self.ng,
        )

        # The fused face kernels hold two full grid axes per VMEM block;
        # above the (configurable) in-block-area cap they shrink the tile
        # width toward 1 to stay inside VMEM (see ctu_face_pallas); an
        # explicit cap forces the plain-XLA fallback instead.
        if c.transverse_use_eos:
            # the EOS re-evaluation rides the XLA trans path
            self.cfg = self.cfg._replace(use_pallas=False)
        gs = self.grown_shape()
        cap = params.tpu.pallas_max_inblock_area
        if cap > 0 and self.cfg.use_pallas and self.layout.dim == 3:
            pairs = [gs[0] * gs[2], gs[1] * gs[2], gs[0] * gs[1]]
            if max(pairs) > cap:
                self.cfg = self.cfg._replace(use_pallas=False)

        # fused ctoprim+divu kernel path: 3D, arithmetic EOS, no radiation
        self._use_fused_prim = (self.cfg.use_pallas and self.layout.dim == 3
                                and getattr(self.eos, "pallas_safe", False)
                                and self.rad is None)

        self.t = 0.0
        self.step_count = 0
        self.dt = None
        self.u = None
        self.num_zones_advanced = 0  # FOM accounting (main.cpp:169-214)
        self.keep_fluxes = False  # AMR refluxing needs the face fluxes
        # lagged momentum dS/dt for source_term_predictor=1 (zero-start,
        # like the reference's source_corrector)
        self._src_pred = None
        # runtime point mass with accretion (Castro_pointmass.cpp:155)
        self.point_mass = float(c.point_mass)
        self._pm_fix = bool(c.use_point_mass and c.point_mass_fix_solution)
        if self._pm_fix:
            self._jit_pm_fix = jax.jit(self._pointmass_fix_impl)

        # default single-device context; psum is the cross-shard elementwise
        # sum — identity with one shard
        self._default_ctx = StepCtx(
            fill=self._fill, pmin=jnp.min, pany=lambda b: b,
            psum=lambda x: x, geom=self.geom, axis_names=())
        self.source_fns = [_ctx_tolerant(fn) for fn in self.source_fns]

        self._jit_step = jax.jit(self._step_impl)
        self._jit_estdt = jax.jit(self._estdt_impl)
        self._jit_clean_fill = jax.jit(self._clean_fill_impl)

    # -- allocation & init -------------------------------------------------
    def grown_shape(self):
        return tuple(n + 2 * self.ng for n in self.geom.n_cell)

    def allocate(self):
        shape = (self.layout.NVAR,) + self.grown_shape()
        return jnp.zeros(shape, dtype=self.dtype)

    def init_data(self):
        """Fill the state from the problem hook (reference Castro::initData,
        Castro.cpp:934) then clean and fill ghosts. MHD problem hooks take
        (sim, u, b) and return (u, b) (reference
        problem_initialize_mhd_data.H); the magnetic energy is folded into
        UEDEN afterwards (Castro::add_magnetic_e, Castro.H:823-850)."""
        u = self.allocate()
        if self.mhd is not None:
            L = self.layout
            b = tuple(jnp.zeros(self.grown_shape(), self.dtype)
                      for _ in range(3))
            if self.problem_init is not None:
                u, b = self.problem_init(self, u, b)
            # canonicalize dtypes FIRST: problem hooks fill with weak
            # python floats that promote to f64 under x64, and the clean's
            # scatter (u.at[UTEMP].set) must not mix dtypes
            b = tuple(jnp.asarray(bb, self.dtype) for bb in b)
            u = jnp.asarray(u, self.dtype)
            bc = self.mhd.cell_b(b)
            pb = 0.5 * sum(bb * bb for bb in bc)
            u = u.at[L.UEDEN].add(pb)
            u = self.mhd._clean(u, b)
            self.u_b = tuple(jnp.asarray(self.mhd._fill_b(bb, d),
                                         self.dtype)
                             for d, bb in enumerate(b))
            self.u = jnp.asarray(u, self.dtype)
            return self.u
        if self.problem_init is not None:
            u = self.problem_init(self, u)
        # enforce consistent total energy at init: UEDEN = UEINT + KE
        # (reference Castro::enforce_consistent_e called from initData,
        # Castro.cpp:1302,2952; the MHD path folds the magnetic term via
        # add_magnetic_e above)
        L = self.layout
        rho_i = jnp.maximum(u[L.URHO], 1e-300)
        ke = 0.5 * (u[L.UMX] ** 2 + u[L.UMY] ** 2 + u[L.UMZ] ** 2) / rho_i
        u = u.at[L.UEDEN].set(u[L.UEINT] + ke)
        c = self.params.castro
        if c.do_scf_initial_model:
            # Hachisu SCF relaxation replaces the problem's density field
            # with the rotating-equilibrium model (reference post_init ->
            # scf_relaxation, scf_relax.cpp:10)
            from castro_tpu.ops.stencil import interior_slice as _isl
            from castro_tpu.scf import scf_relaxation

            inner = _isl(self.ng, L.dim)
            T0 = float(jnp.max(u[(L.UTEMP,) + inner[1:]]))
            rho_i, phi_i, w = scf_relaxation(
                self.params, self.geom, self.layout, self.eos,
                c.scf_maximum_density, c.scf_equatorial_radius,
                (c.scf_polar_radius if c.scf_polar_radius > 0 else None),
                T=T0, tol=c.scf_relax_tol, n_iters=c.scf_max_iterations)
            es = self.eos.rt(rho=rho_i, T=jnp.full_like(rho_i, T0))
            u = u.at[(L.URHO,) + inner[1:]].set(rho_i)
            for comp in (L.UMX, L.UMY, L.UMZ):
                u = u.at[(comp,) + inner[1:]].set(0.0)
            u = u.at[(L.UEINT,) + inner[1:]].set(rho_i * es.e)
            u = u.at[(L.UEDEN,) + inner[1:]].set(rho_i * es.e)
            u = u.at[(L.UTEMP,) + inner[1:]].set(es.T)
            u = u.at[(L.UFS,) + inner[1:]].set(rho_i)
            self.scf_omega = float(w)
        if self.cfg.hybrid_hydro:
            # seed the (authoritative) hybrid momenta from the problem's
            # linear momenta (reference initData -> linear_to_hybrid_momentum,
            # Castro.cpp:1154); clean_fill then syncs the other direction
            u = clean_mod.update_hybrid_momenta(u, self.layout, self.geom,
                                                self.ng)
        self.u = self._jit_clean_fill(u)
        if self.rad is not None and self.u_rad is None:
            # default: radiation in equilibrium with matter (problems may
            # overwrite via sim.u_rad after init_data)
            from castro_tpu.utils import constants as C

            Ti = self.u[(self.layout.UTEMP,) + interior_slice(self.ng, self.layout.dim)[1:]]
            if self.layout.ngroups > 1 and self.rad.nugroup is not None:
                # split aT^4 over groups by Planck weight (cast: the
                # group structure is f64 under x64 and must not promote
                # an f32 run's radiation state)
                self.u_rad = (self.rad.planck_weights(Ti) *
                              (C.a_rad * Ti**4)[None]).astype(u.dtype)
            else:
                self.u_rad = C.a_rad * Ti**4
        return self.u

    def _clean_fill_impl(self, u, ctx: Optional[StepCtx] = None, t=0.0):
        c = self.params.castro
        if ((ctx is None or ctx is self._default_ctx)
                and self._use_fused_prim
                and not self.layout.hybrid_momentum
                and self.problem_fill is None and c.speed_limit <= 0.0):
            # fused pointwise clean + ghost fill, one VMEM pass
            from castro_tpu.ops.pallas_kernels import clean_fill_pallas

            return clean_fill_pallas(
                u, self.layout, self.eos, self.cfg.lo_bc, self.cfg.hi_bc,
                self.ng, self.cfg.small_dens, max(c.small_temp, 1e-200),
                c.dual_energy_eta2, bool(c.normalize_species))
        ctx = ctx or self._default_ctx
        u = clean_mod.clean_state(
            u, self.layout, self.eos,
            small_dens=self.cfg.small_dens, small_temp=max(c.small_temp, 1e-200),
            dual_energy_eta2=c.dual_energy_eta2,
            do_normalize_species=bool(c.normalize_species),
            speed_limit=c.speed_limit)
        if self.layout.hybrid_momentum:
            if self.cfg.hybrid_hydro:
                # hybrid momenta are authoritative (advected with their
                # own fluxes): rebuild the linear momenta from them
                # (Castro_hybrid.cpp hybrid_to_linear_momentum)
                from castro_tpu.ops.hybrid import sync_linear_from_hybrid

                u = sync_linear_from_hybrid(u, ctx.geom, self.layout,
                                            self.ng)
            else:
                u = clean_mod.update_hybrid_momenta(u, self.layout,
                                                    ctx.geom, self.ng)
        u = ctx.fill(u, t)
        return u

    def _fill(self, u, t=0.0):
        return fill_ghosts(u, self.layout, self.cfg.lo_bc, self.cfg.hi_bc,
                           self.ng, problem_fill=self.problem_fill, t=t)

    # -- dt ------------------------------------------------------------------
    def _estdt_impl(self, u, Er=None):
        c = self.params.castro
        L = self.layout
        dt = estdt_cfl(u, L, self.eos, self.geom, self.ng, c.cfl)
        dt_b = estdt_burning(u, L, self.eos, self.network, self.ng,
                             c.dtnuc_e, c.dtnuc_X, c.dtnuc_X_threshold)
        dt = jnp.minimum(dt, dt_b)
        diff_src = next((s for s in self.source_fns
                         if getattr(s, "name", "") == "diff"), None)
        if diff_src is not None:
            from castro_tpu.driver.timestep import estdt_temp_diffusion

            dt = jnp.minimum(dt, estdt_temp_diffusion(
                u, L, self.eos, self.geom, self.ng, diff_src))
        if self.rad is not None and Er is not None:
            # matter-radiation coupling limiter (reference estdt_rad,
            # timestep.cpp:499 / Radiation::EstTimeStep)
            inner = interior_slice(self.ng, L.dim)
            ui = u[inner]
            rho = ui[L.URHO]
            e = ui[L.UEINT] / rho
            xn = ui[L.UFS: L.UFS + L.nspec] / rho[None]
            es = self.eos.re(rho=rho, e=e, xn=xn)
            Er_tot = jnp.sum(Er, axis=0) if Er.ndim > L.dim else Er
            dt = jnp.minimum(dt, self.rad.estdt(Er_tot, rho, e, es.cv, es.T))
        return dt

    def estimate_dt(self) -> float:
        c = self.params.castro
        if c.fixed_dt > 0:
            return c.fixed_dt
        if self.mhd is not None:
            dt = float(self._jit_mhd_estdt(self.u, self.u_b))
        elif self.rad is not None and self.u_rad is not None:
            dt = float(self._jit_estdt(self.u, self.u_rad))
        else:
            dt = float(self._jit_estdt(self.u))
        if self.step_count == 0:
            if c.initial_dt > 0:
                dt = c.initial_dt
            else:
                dt = dt * c.init_shrink
        elif self.dt is not None:
            dt = min(dt, c.change_max * self.dt)
        return min(dt, c.max_dt)

    # -- the step --------------------------------------------------------------
    def _step_impl(self, u, dt, t, ctx: Optional[StepCtx] = None,
                   src_pred=None, point_mass=None, phase="all"):
        """One CTU step with Strang-free source handling (reference
        do_advance_ctu, Castro_advance_ctu.cpp:16): old-time sources are
        applied and traced into interface states; new-time sources apply a
        time-centered corrector 0.5*dt*(S_new - S_old)
        (do_old_sources/do_new_sources, Castro_sources.cpp:123,185).
        Returns (u_new, min_rho_raw, nan_flag).

        src_pred (castro.source_term_predictor=1): the lagged momentum
        dS/dt from the previous step (create_source_corrector,
        Castro.cpp:3780-3836); the old-time source becomes
        S^n + dt/2 dS/dt ~ S^{n+1/2} for tracing and application, and the
        step additionally returns the new dS/dt for the next step.

        phase: "all" traces the whole step into one program; "burn"
        traces just a half-dt Strang burn + clean/fill and returns
        (u, burn_fail); "mid" traces everything between the two burn
        halves and returns (u_new, min_rho, nan_flag, ...). Splitting a
        full-physics step into burn/mid/burn programs jitted separately
        compiles the burner ONCE (reused for both halves) and keeps each
        XLA module small — monolithic full-physics modules take many
        minutes of cold CPU compile (XLA compile time is superlinear in
        program size)."""
        # invariant: on the default (single-device) path the state is always
        # ghost-filled on entry — init_data and every step exit run
        # clean+fill — and physical BC fills are t-independent unless a
        # problem_fill hook exists, so the defensive head fill is redundant
        # (saves a full-array gather pass per step). Sharded/AMR contexts
        # pass ctx explicitly and always fill (halo/fillpatch data is stale).
        skip_head_fill = ctx is None and self.problem_fill is None
        ctx = ctx or self._default_ctx
        if point_mass is not None:
            ctx = StepCtx(ctx.fill, ctx.pmin, ctx.pany, ctx.psum, ctx.geom,
                          ctx.axis_names, ctx.grav_bc, point_mass,
                          ctx.fill_b, ctx.fill_rad)
        L = self.layout
        c = self.params.castro
        cfg = self.cfg
        if any(n is not None for n in ctx.axis_names):
            # sharded: wall-face masks must know the shard's mesh position
            cfg = cfg._replace(mesh_axes=tuple(ctx.axis_names))
        if not skip_head_fill:
            u = ctx.fill(u, t)

        burn_fail = jnp.asarray(False)
        if phase in ("all", "burn") and self.reactor is not None:
            shk = u[L.USHK] if L.shock_var else None
            u, _, _, bf = self.reactor.react(u, 0.5 * dt, shk)
            burn_fail = burn_fail | bf
            u = self._clean_fill_impl(u, ctx, t)
        if phase == "burn":
            return u, ctx.pany(burn_fail)

        div_node = None
        courant = None
        fold_courant = (self._use_fused_prim and c.do_hydro
                        and bool(c.check_cfl_violation)
                        and self.problem_fill is None)
        if self._use_fused_prim:
            from castro_tpu.ops.pallas_kernels import prim_aux_pallas

            res = prim_aux_pallas(
                u, L, self.eos, self.cfg.small_dens,
                max(c.small_temp, 1e-200), ctx.geom.dx,
                courant_dt=dt if fold_courant else None)
            if fold_courant:
                q, qaux, div_node, courant = res
            else:
                q, qaux, div_node = res
        else:
            q, qaux = ctoprim(u, L, self.eos, self.cfg.small_dens,
                              max(c.small_temp, 1e-200))

        # old-time sources S(U^n); per-fn terms kept so the corrector pass
        # can subtract them without re-tracing the source (for gravity a
        # re-trace is a whole extra multigrid solve in the program)
        src_old = None
        src_old_terms = {}
        if self.source_fns:
            src_old = jnp.zeros_like(u)
            for fn in self.source_fns:
                term = fn(self, u, q, qaux, t, dt, ctx=ctx)
                src_old_terms[id(fn)] = term
                src_old = src_old + term
        src_eff = src_old
        if (src_pred is not None and c.source_term_predictor == 1
                and src_old is not None):
            # lagged predictor: S^{n+1/2} = S^n + (dt/2) dS/dt (momentum
            # rows only; src_pred is pre-masked)
            src_eff = src_old + 0.5 * dt * src_pred
        srcQ = None if src_eff is None else src_to_prim(q, qaux, src_eff, L)

        if c.do_hydro:
            # ctu_hydro folds the conservative update u + dt*hsrc into its
            # last pass (identical math; saves a full-array XLA add)
            u_new, fluxes, qes, shk = ctu_hydro(
                u, q, qaux, srcQ, dt, ctx.geom, L, cfg,
                div_node=div_node, fold_update_dt=dt,
                trans_eos=self.eos if c.transverse_use_eos else None)
        else:  # source-only evolution (reference castro.do_hydro=0)
            fluxes = [jnp.zeros_like(u) for _ in range(L.dim)]
            qes, shk = None, None
            u_new = u
        if src_eff is not None:
            u_new = u_new + dt * src_eff

        # validity checks on the raw state (reference density/NaN checks,
        # Castro_advance_ctu.cpp:64-68,168-216; CFL-violation check,
        # Castro_hydro.cpp:234 — a courant number > 1 invalidates the CTU
        # characteristic tracing, so the step must be retried)
        use_fused_cf = (ctx is self._default_ctx and self._use_fused_prim
                        and not L.hybrid_momentum
                        and self.problem_fill is None
                        and c.speed_limit <= 0.0)
        if use_fused_cf:
            # min-rho/NaN reductions ride the clean+fill kernel (computed
            # on the pre-clean state, as the reference does)
            from castro_tpu.ops.pallas_kernels import clean_fill_pallas

            u_new, min_rho, nan_flag = clean_fill_pallas(
                u_new, L, self.eos, self.cfg.lo_bc, self.cfg.hi_bc,
                self.ng, self.cfg.small_dens, max(c.small_temp, 1e-200),
                c.dual_energy_eta2, bool(c.normalize_species),
                with_status=True)
        else:
            inner = interior_slice(self.ng, L.dim)
            min_rho = ctx.pmin(u_new[inner][L.URHO])
            nan_flag = ctx.pany(~jnp.isfinite(jnp.sum(u_new[inner])))
            u_new = self._clean_fill_impl(u_new, ctx, t + dt)
        if c.do_hydro and c.check_cfl_violation:
            if courant is None:
                from castro_tpu.ops.advection_util import max_courant

                courant = max_courant(q, qaux, dt, ctx.geom, L, self.ng,
                                      whole_grid=self.problem_fill is None)
            nan_flag = nan_flag | ctx.pany(courant > 1.0)

        # new-time source corrector. Sources that define a `.corrector`
        # hook (e.g. rotation with implicit_rotation_update) compute their
        # own full correction from (u_old, u_new) — their generic
        # 0.5*dt*(S_new - S_old) term is replaced by dt*corr, matching the
        # reference's corrsrc pattern (rotation_sources.cpp:186+).
        pred_out = None
        if self.source_fns:
            if self._use_fused_prim:
                from castro_tpu.ops.pallas_kernels import prim_aux_pallas

                q2, qaux2 = prim_aux_pallas(
                    u_new, L, self.eos, self.cfg.small_dens,
                    max(c.small_temp, 1e-200), ctx.geom.dx, with_divu=False)
            else:
                q2, qaux2 = ctoprim(u_new, L, self.eos, self.cfg.small_dens,
                                    max(c.small_temp, 1e-200))
            src_new = jnp.zeros_like(u)
            corr = None
            src_old_generic = src_old
            for fn in self.source_fns:
                if hasattr(fn, "corrector"):
                    cfn = fn.corrector(self, u, u_new, t, dt, ctx=ctx,
                                       fluxes=fluxes)
                    corr = cfn if corr is None else corr + cfn
                    # remove this fn's old-time term from the generic pair
                    src_old_generic = src_old_generic - src_old_terms[id(fn)]
                else:
                    src_new = src_new + fn(self, u_new, q2, qaux2, t + dt,
                                           dt, ctx=ctx)
            u_new = u_new + 0.5 * dt * (src_new - src_old_generic)
            if corr is not None:
                u_new = u_new + dt * corr
            if c.source_term_predictor == 1:
                # store 2/dt x (new-time source term) = lagged dS/dt for
                # the next step, momentum rows only (Castro.cpp:3815-3818)
                newtime = 0.5 * (src_new - src_old_generic)
                if corr is not None:
                    newtime = newtime + corr
                pred_out = jnp.zeros_like(u)
                for comp in (L.UMX, L.UMY, L.UMZ):
                    pred_out = pred_out.at[comp].set(
                        2.0 * newtime[comp] / dt)
            u_new = self._clean_fill_impl(u_new, ctx, t + dt)

        if phase == "all" and self.reactor is not None:
            shk2 = u_new[L.USHK] if L.shock_var else None
            u_new, self_wdot, _, bf2 = self.reactor.react(u_new, 0.5 * dt, shk2)
            burn_fail = burn_fail | bf2
            u_new = self._clean_fill_impl(u_new, ctx, t + dt)

        burn_fail = ctx.pany(burn_fail)
        extra = ()
        if c.source_term_predictor == 1:
            extra = (pred_out if pred_out is not None
                     else jnp.zeros_like(u),)
        if self.keep_fluxes:
            # interior-face slices for the flux registers: along d faces
            # [ng..ng+n] (n+1 values), other axes interior cells
            ng, dim = self.ng, L.dim
            fint = []
            for d in range(dim):
                idx = [slice(None)] + [slice(ng, -ng)] * dim
                idx[1 + d] = slice(ng, u.shape[1 + d] - ng + 1)
                fint.append(fluxes[d][tuple(idx)])
            return (u_new, min_rho, nan_flag | burn_fail, fint) + extra
        return (u_new, min_rho, nan_flag | burn_fail) + extra

    def _fill_rad(self, Er, ngr=None):
        """Grow interior Er [ng, n...] by ngr ghost cells (default the
        hydro ghost width): periodic wrap or edge clamp per the hydro
        BCs."""
        L = self.layout
        ng = self.ng if ngr is None else ngr
        out = Er
        for d in range(L.dim):
            mode = "wrap" if self.params.castro.lo_bc[d] == 0 else "edge"
            pads = [(0, 0)] * out.ndim
            pads[1 + d] = (ng, ng)
            out = jnp.pad(out, pads, mode=mode)
        return out

    def _rad_lambda_grown(self, u_g, Er_g):
        """Flux limiter lambda on the grown grid from the grown state."""
        from castro_tpu.radiation.fld import fld_lambda

        L = self.layout
        rho = u_g[L.URHO]
        T = u_g[L.UTEMP]
        lam = []
        for g in range(L.ngroups):
            kr = self.rad.kappa_r(rho, jnp.maximum(T, 1e-10))
            g2 = 0.0
            for d in range(L.dim):
                from castro_tpu.ops.stencil import shifted as _sh

                g2 = g2 + ((_sh(Er_g[g], 1, d) - _sh(Er_g[g], -1, d)) /
                           (2 * self.geom.dx[d])) ** 2
            R = jnp.sqrt(g2) / jnp.maximum(
                kr * jnp.maximum(Er_g[g], 1e-30), 1e-30)
            lam.append(fld_lambda(R, self.rad.limiter))
        lam = jnp.stack(lam)
        fT = self.params.radiation.filter_lambda_T
        if fT > 0:
            # Purser low-pass on the limiter (reference filter_lambda_T)
            from castro_tpu.radiation.filter import apply_filter

            lam = apply_filter(lam, fT, axes=range(1, lam.ndim))
        return lam

    def _inelastic_sct(self, Er_g, rho, e_new, T_new, dt):
        """Compton group-to-group exchange after the implicit multigroup
        update (Radiation::inelastic_scattering, MGFLD.cpp:1655-1685,
        called from Castro_radiation.cpp:38): kappa_s = max(kappa_r -
        kappa_p, 0) at nu_0 (MGFLD_compute_scattering, MGFLD.cpp:1554),
        one implicit LLPS85 Kompaneets step, and the net radiation-energy
        gain comes out of the gas internal energy."""
        rp = self.params.radiation
        if not rp.do_inelastic_scattering or self.layout.ngroups <= 1:
            return Er_g, e_new
        from castro_tpu.radiation import compton

        # host-side index: jnp indexing under the trace would emit a
        # gather and hand float() a tracer
        nu0 = float(np.asarray(self.rad.nugroup)[0])
        ks = jnp.maximum(self.rad.kappa_r(rho, T_new, nu0)
                         - self.rad.kappa_p(rho, T_new, nu0), 0.0)
        ks = jnp.broadcast_to(jnp.asarray(ks, Er_g.dtype), rho.shape)
        Er_g, dEr = compton.apply_inelastic_scattering(
            Er_g, T_new, ks, dt, self.rad.nugroup, self.rad.xnu,
            self.rad.dlognu)
        return Er_g, e_new - dEr / rho

    def _rad_ctu_step_impl(self, u, Er, dt, t, ctx=None, rad_bc=None,
                           rad_rhs_extra=None, keep_rad_flux=False):
        """Characteristic rad-hydro step (any dim): radiation in the CTU
        eigensystem (reference trace_ppm_rad + the RADIATION transverse
        branches of trans.cpp + ctu_rad_consup) followed by the implicit
        FLD matter coupling (final_radiation_call).

        AMR plumbing (the reference runs rad_hydro_combined per level
        under the Amr recursion): `ctx` = window step context, `rad_bc` =
        coarse-Er window Dirichlet data for the implicit solve,
        `rad_rhs_extra` = deferred-sync rhs; keep_rad_flux returns the
        radiation register fluxes (advective, from ctu_rad_consup's flux
        set, PLUS the implicit diffusion fluxes) and the gas fluxes."""
        from castro_tpu.ops.advection_util import ctoprim as _ctoprim
        from castro_tpu.ops.rad_hydro import ctu_rad_hydro

        L = self.layout
        c = self.params.castro
        ctx = ctx or self._default_ctx
        u = ctx.fill(u, t)
        if ctx.fill_rad is not None:
            # sharded: halo-exchange the full hydro ghost ring for the
            # CTU rad chain (trace/transverse stencils need ng ghosts)
            Er_g2 = ctx.fill_rad(Er, self.ng)
            if Er_g2.ndim == L.dim:
                Er_g2 = Er_g2[None]
        else:
            Er_g2 = self._fill_rad(Er[None] if Er.ndim == L.dim else Er)
        lam_g = self._rad_lambda_grown(u, Er_g2)

        q, qaux = _ctoprim(u, L, self.eos, self.cfg.small_dens,
                           max(c.small_temp, 1e-200), Er=Er_g2, lam=lam_g,
                           rad_limiter=self.rad.limiter)
        src_old = None
        if self.source_fns:
            src_old = jnp.zeros_like(u)
            for fn in self.source_fns:
                src_old = src_old + fn(self, u, q, qaux, t, dt, ctx=ctx)
        srcQ = None if src_old is None else src_to_prim(q, qaux, src_old, L)

        Er_int = Er[None] if Er.ndim == L.dim else Er  # already interior
        rp = self.params.radiation
        want_fluxes = keep_rad_flux or self.keep_fluxes
        out = ctu_rad_hydro(
            u, Er_int, q, qaux, srcQ, dt, self.geom, L, self.cfg,
            self.rad.limiter, rp.closure,
            nugroup=self.rad.nugroup, dlognu=self.rad.dlognu,
            fspace_type=rp.fspace_advection_type, comoving=rp.comoving,
            flatten_pp_threshold=rp.flatten_pp_threshold,
            keep_fluxes=want_fluxes)
        if want_fluxes:
            u_new, Er_new, gas_fluxes, rfluxes = out
        else:
            u_new, Er_new = out
        if src_old is not None:
            u_new = u_new + dt * src_old

        inner = interior_slice(self.ng, L.dim)
        min_rho = ctx.pmin(u_new[inner][L.URHO])
        nan_flag = ctx.pany(~jnp.isfinite(jnp.sum(u_new[inner])) |
                            ~jnp.isfinite(jnp.sum(Er_new)))
        u_new = self._clean_fill_impl(u_new, ctx, t + dt)

        # implicit FLD matter coupling on the advected field
        ui = u_new[inner]
        rho = ui[L.URHO]
        rhoinv = 1.0 / rho
        e = ui[L.UEINT] * rhoinv
        xn = ui[L.UFS: L.UFS + L.nspec] * rhoinv[None]
        es = self.eos.re(rho=rho, e=e, xn=xn)

        def eos_re(e_k):
            return self.eos.re(rho=rho, e=jnp.maximum(e_k, 1e-300), xn=xn)

        rad_fluxes = None
        names = tuple(ctx.axis_names)
        sharded = any(n is not None for n in names)
        if L.ngroups > 1:
            o2 = self.rad.multigroup_update(
                Er_new, rho, e, es.T, es.cv, dt,
                nu_centers=self.rad.nugroup, dnu=self.rad.dnugroup,
                eos_re=eos_re, metric=self.rad.geom_metric(),
                axis_names=names if sharded else None,
                bc_override=rad_bc, rhs_extra=rad_rhs_extra,
                keep_flux=keep_rad_flux)
            if keep_rad_flux:
                Er_new2, e_new, T_new, rad_fluxes = o2
            else:
                Er_new2, e_new, T_new = o2
            Er_new2, e_new = self._inelastic_sct(Er_new2, rho, e_new,
                                                 T_new, dt)
        else:
            o2 = self.rad.gray_update(
                Er_new[0], rho, e, es.T, es.cv, dt, eos_re=eos_re,
                metric=self.rad.geom_metric(),
                axis_names=names if sharded else None,
                bc_override=rad_bc,
                rhs_extra=rad_rhs_extra, keep_flux=keep_rad_flux)
            if keep_rad_flux:
                Er_new2, e_new, T_new, rad_fluxes = o2
            else:
                Er_new2, e_new, T_new = o2
        de = rho * (e_new - e)
        u_new = u_new.at[(L.UEINT,) + inner[1:]].add(de)
        u_new = u_new.at[(L.UEDEN,) + inner[1:]].add(de)
        u_new = self._clean_fill_impl(u_new, ctx, t + dt)
        if keep_rad_flux:
            # register fluxes: advective (time-centered, per group, cell-
            # registered interior — the dt-advective transport of Er) +
            # implicit diffusion (same convention); the work terms of
            # ctu_rad_consup are genuine sources and are not registered,
            # exactly like the reference's rad flux registers
            ng_, dim = self.ng, L.dim
            gray = Er.ndim == L.dim
            cax = 0 if gray else 1
            for d in range(dim):
                rf = rfluxes[d]
                if gray:
                    rf = rf[0]
                sl = [slice(None)] * cax + [slice(ng_, -ng_)] * dim
                sl[cax + d] = slice(ng_, rf.shape[cax + d] - ng_)
                rf_i = rf[tuple(sl)]
                rad_fluxes[d] = rad_fluxes[d] + rf_i
            # gas fluxes: interior-face slices (hydro convention)
            fint = None
            if self.keep_fluxes:
                fint = []
                for d in range(dim):
                    idx = [slice(None)] + [slice(ng_, -ng_)] * dim
                    idx[1 + d] = slice(ng_, u.shape[1 + d] - ng_ + 1)
                    fint.append(gas_fluxes[d][tuple(idx)])
            return u_new, Er_new2, min_rho, nan_flag, rad_fluxes, fint
        if self.keep_fluxes:
            # op-split-path contract: gas fluxes on interior faces
            # (make_sharded_rad_step keep_fluxes consumes out[4])
            ng_ = self.ng
            fint = []
            for d in range(L.dim):
                idx = [slice(None)] + [slice(ng_, -ng_)] * L.dim
                idx[1 + d] = slice(ng_, u.shape[1 + d] - ng_ + 1)
                fint.append(gas_fluxes[d][tuple(idx)])
            return u_new, Er_new2, min_rho, nan_flag, fint
        return u_new, Er_new2, min_rho, nan_flag

    def _rad_step_impl(self, u, Er, dt, t, ctx: Optional[StepCtx] = None,
                       rad_bc=None, rad_rhs_extra=None, keep_rad_flux=False):
        """Hydro step + Er advection + implicit FLD update (reference
        do_advance_ctu then final_radiation_call). Cartesian runs (any
        dim) use the full characteristic coupling
        (radiation.hydro_coupling=1, the reference scheme) — including
        AMR-window, flux-keeping and SHARDED runs; curvilinear multi-D
        runs fall back to the operator-split advection.

        AMR plumbing (gray): `rad_bc` = window-boundary Dirichlet Er from
        the coarse level, `rad_rhs_extra` = deferred-sync rhs source,
        `keep_rad_flux` returns (hydro fluxes none yet) the diffusion face
        fluxes for the radiation flux registers (Radiation.cpp:247-289)."""
        from castro_tpu.ops.stencil import shifted

        L = self.layout
        ctx = ctx or self._default_ctx
        # the characteristic coupling runs for ALL geometries (the
        # dloga trace source + area/volume consup cover 1D spherical /
        # 2D RZ, reference Castro_ctu_rad.cpp), INCLUDING AMR windows,
        # flux-register runs and SHARDED runs (rad_hydro_combined per
        # level; under a mesh the CTU rad chain runs on halo-exchanged
        # ghosts and the implicit solve through the distributed MG)
        if (self.params.radiation.hydro_coupling
                and self.params.castro.do_hydro
                and (L.ngroups == 1 or self.rad.nugroup is not None)):
            return self._rad_ctu_step_impl(
                u, Er, dt, t, ctx=ctx, rad_bc=rad_bc,
                rad_rhs_extra=rad_rhs_extra, keep_rad_flux=keep_rad_flux)
        out = self._step_impl(u, dt, t, ctx=ctx)
        u_new, min_rho, bad = out[0], out[1], out[2]
        hyd_fluxes = out[3] if self.keep_fluxes else None

        inner = interior_slice(self.ng, L.dim)
        ui = u_new[inner]
        rho = ui[L.URHO]
        rhoinv = 1.0 / rho

        # upwind advection of Er with the updated velocities, computed on
        # a 1-ghost view so shard boundaries (ctx.fill_rad halo exchange)
        # and periodic domain edges see true neighbor data (group-major
        # [ng, grid] arrays carry the group axis in front)
        multigroup = Er.ndim > L.dim
        ng_ = self.ng
        if ctx.fill_rad is not None:
            Er1 = ctx.fill_rad(Er)  # grown by 1 (halo exchange + BCs)
        else:
            Er1 = self._fill_rad(Er if multigroup else Er[None], ngr=1)
            if not multigroup:
                Er1 = Er1[0]
        # velocities on the same 1-ghost view, from the ctx-filled grown
        # state (exact ghosts)
        sl1 = tuple(slice(ng_ - 1, s - ng_ + 1)
                    for s in u_new.shape[1:])
        rho1 = jnp.maximum(u_new[(L.URHO,) + sl1], 1e-300)
        Er_adv = Er
        for d in range(L.dim):
            ax = d + (1 if multigroup else 0)
            vel1 = u_new[(L.momentum_index(d),) + sl1] / rho1
            vf1 = 0.5 * (vel1 + shifted(vel1, -1, d))  # face i-1/2 @ i
            if multigroup:
                vf1 = vf1[None]
            Er_m1 = shifted(Er1, -1, ax)  # edge-clamp touches only the
            # outermost ghost plane, which the face slices below never read
            Er_up1 = jnp.where(vf1 > 0, Er_m1, Er1)
            F1 = vf1 * Er_up1  # valid faces: 1-ghost indices [1, n+1]
            lo = [slice(1, -1)] * L.dim
            hi = [slice(1, -1)] * L.dim
            lo[d] = slice(1, -1)
            hi[d] = slice(2, None)
            pre = (slice(None),) if multigroup else ()
            F_lo = F1[pre + tuple(lo)]
            F_hi = F1[pre + tuple(hi)]
            Er_adv = Er_adv - dt * (F_hi - F_lo) / self.geom.dx[d]

        # implicit diffusion + matter coupling
        e = ui[L.UEINT] * rhoinv
        xn = ui[L.UFS : L.UFS + L.nspec] * rhoinv[None]
        es = self.eos.re(rho=rho, e=e, xn=xn)

        def eos_re(e_k):
            return self.eos.re(rho=rho, e=jnp.maximum(e_k, 1e-300), xn=xn)

        names = tuple(ctx.axis_names)
        sharded = any(n is not None for n in names)
        rad_fluxes = None
        # external radiation source (reference problem_rad_source hook,
        # e.g. RadSuOlson's qn pulse): Q(sim, t, dt) in erg/cm^3/s enters
        # the linear-system rhs as dt*Q
        src_fn = getattr(self.rad, "rad_source_fn", None)
        if src_fn is not None:
            q_src = dt * src_fn(self, t, dt)
            rad_rhs_extra = (q_src if rad_rhs_extra is None
                             else rad_rhs_extra + q_src)
        if multigroup:
            out = self.rad.multigroup_update(
                Er_adv, rho, e, es.T, es.cv, dt,
                nu_centers=self.rad.nugroup, dnu=self.rad.dnugroup,
                eos_re=eos_re, metric=self.rad.geom_metric(),
                axis_names=names if sharded else None,
                bc_override=rad_bc, rhs_extra=rad_rhs_extra,
                keep_flux=keep_rad_flux)
            if keep_rad_flux:
                Er_new, e_new, T_new, rad_fluxes = out
            else:
                Er_new, e_new, T_new = out
            Er_new, e_new = self._inelastic_sct(Er_new, rho, e_new,
                                                T_new, dt)
        else:
            out = self.rad.gray_update(
                Er_adv, rho, e, es.T, es.cv, dt, eos_re=eos_re,
                metric=self.rad.geom_metric(),
                axis_names=names if sharded else None,
                bc_override=rad_bc, rhs_extra=rad_rhs_extra,
                keep_flux=keep_rad_flux)
            if keep_rad_flux:
                Er_new, e_new, T_new, rad_fluxes = out
            else:
                Er_new, e_new, T_new = out
        de = rho * (e_new - e)
        u_new = u_new.at[(L.UEINT,) + inner[1:]].add(de)
        u_new = u_new.at[(L.UEDEN,) + inner[1:]].add(de)
        u_new = self._clean_fill_impl(u_new, ctx, t + dt)
        if keep_rad_flux:
            return u_new, Er_new, min_rho, bad, rad_fluxes, hyd_fluxes
        if self.keep_fluxes:
            return u_new, Er_new, min_rho, bad, hyd_fluxes
        return u_new, Er_new, min_rho, bad

    def _ssdc_step_impl(self, u, dt, t):
        """Simplified-SDC step: CTU advective term (+ sources) feeds the
        full-dt coupled burn (reference react_state(time,dt))."""
        L = self.layout
        c = self.params.castro

        def advective(u_k):
            u_k = self._fill(u_k)
            q, qaux = ctoprim(u_k, L, self.eos, self.cfg.small_dens,
                              max(c.small_temp, 1e-200))
            src = None
            if self.source_fns:
                src = jnp.zeros_like(u_k)
                for fn in self.source_fns:
                    src = src + fn(self, u_k, q, qaux, t, dt)
            srcQ = None if src is None else src_to_prim(q, qaux, src, L)
            hsrc, _, _, _ = ctu_hydro(u_k, q, qaux, srcQ, dt, self.geom, L,
                                      self.cfg)
            return hsrc + (src if src is not None else 0.0)

        u = self._fill(u)
        u_new, burn_fail = self.sdc_simplified.advance(u, dt, t, advective)
        inner = interior_slice(self.ng, L.dim)
        min_rho = jnp.min(u_new[inner][L.URHO])
        nan_flag = ~jnp.isfinite(jnp.sum(u_new[inner]))
        u_new = self._clean_fill_impl(u_new)
        return u_new, min_rho, nan_flag | burn_fail

    def _mhd_estdt_impl(self, u, b):
        """MHD timestep limit (reference estdt_mhd, timestep.cpp:148) +
        the burning limiter, inside the driver's dt machinery."""
        c = self.params.castro
        dt = self.mhd.estdt(u, b, c.cfl)
        dt_b = estdt_burning(u, self.layout, self.eos, self.network,
                             self.ng, c.dtnuc_e, c.dtnuc_X,
                             c.dtnuc_X_threshold)
        return jnp.minimum(dt, dt_b)

    def _mhd_step_impl(self, u, b, dt, t, ctx: Optional[StepCtx] = None,
                       keep_ct=False):
        """One driver MHD step: Strang reactions + old-time sources traced
        into the CTU-CT interface states + new-time source corrector —
        the same orchestration as `_step_impl` with the MHD advance in
        place of the hydro one (reference do_advance_ctu with USE_MHD,
        Castro_advance_ctu.cpp:16 + Castro_mhd.cpp).

        keep_ct=True (AMR flux/EMF registers) additionally returns the
        gas fluxes and the CT data ({"E": edge EMFs, "FB": cell-B
        fluxes}) of the CTU-CT advance."""
        from castro_tpu.mhd.solver import MhdState

        ctx = ctx or self._default_ctx
        L = self.layout
        c = self.params.castro
        u = ctx.fill(u, t)
        b = self.mhd.fill_b_all(b, ctx)

        burn_fail = jnp.asarray(False)
        if self.reactor is not None:
            shk = u[L.USHK] if L.shock_var else None
            u, _, _, bf = self.reactor.react(u, 0.5 * dt, shk)
            burn_fail = burn_fail | bf
            u = self.mhd._clean(u, b, ctx)

        q, qaux = ctoprim(u, L, self.eos, self.cfg.small_dens,
                          max(c.small_temp, 1e-200))
        src_old = None
        src_old_terms = {}
        if self.source_fns:
            src_old = jnp.zeros_like(u)
            for fn in self.source_fns:
                term = fn(self, u, q, qaux, t, dt, ctx=ctx)
                src_old_terms[id(fn)] = term
                src_old = src_old + term
        srcQ = None if src_old is None else src_to_prim(q, qaux, src_old, L)

        ct_data = None
        if c.mhd_ctu:
            out = self.mhd.step_ctu(MhdState(u, b), dt, srcQ=srcQ,
                                    keep_fluxes=True, keep_ct=keep_ct,
                                    ctx=ctx)
            (u_new, b_new), fluxes = out[0], out[1]
            if keep_ct:
                ct_data = out[2]
        else:
            assert not keep_ct, "AMR MHD requires the CTU-CT path"
            u_new, b_new = self.mhd.step_rk2(MhdState(u, b), dt, ctx=ctx)
            fluxes = None
        if src_old is not None:
            u_new = u_new + dt * src_old

        inner = interior_slice(self.ng, L.dim)
        min_rho = ctx.pmin(u_new[inner][L.URHO])
        nan_flag = ctx.pany(~jnp.isfinite(jnp.sum(u_new[inner])))

        if self.source_fns:
            q2, qaux2 = ctoprim(u_new, L, self.eos, self.cfg.small_dens,
                                max(c.small_temp, 1e-200))
            src_new = jnp.zeros_like(u)
            corr = None
            src_old_generic = src_old
            for fn in self.source_fns:
                if hasattr(fn, "corrector"):
                    cfn = fn.corrector(self, u, u_new, t, dt, ctx=ctx,
                                       fluxes=fluxes)
                    corr = cfn if corr is None else corr + cfn
                    src_old_generic = src_old_generic - src_old_terms[id(fn)]
                else:
                    src_new = src_new + fn(self, u_new, q2, qaux2, t + dt,
                                           dt, ctx=ctx)
            u_new = u_new + 0.5 * dt * (src_new - src_old_generic)
            if corr is not None:
                u_new = u_new + dt * corr

        if self.reactor is not None:
            shk2 = u_new[L.USHK] if L.shock_var else None
            u_new, _, _, bf2 = self.reactor.react(u_new, 0.5 * dt, shk2)
            burn_fail = burn_fail | bf2

        u_new = self.mhd._clean(u_new, b_new, ctx)
        burn_fail = ctx.pany(burn_fail)
        if keep_ct:
            # interior-face slices for the flux registers (same convention
            # as the hydro keep_fluxes return: n+1 faces along d, interior
            # cells transverse); the CT data stays grown — the AMR driver
            # slices edges itself (it needs the +1 edge planes)
            ng, dim = self.ng, L.dim
            fint = []
            for d in range(dim):
                idx = [slice(None)] + [slice(ng, -ng)] * dim
                idx[1 + d] = slice(ng, u.shape[1 + d] - ng + 1)
                fint.append(fluxes[d][tuple(idx)])
            return u_new, b_new, min_rho, nan_flag | burn_fail, fint, \
                ct_data
        return u_new, b_new, min_rho, nan_flag | burn_fail

    def _pointmass_fix_impl(self, u_old, u_new, point_mass):
        """point_mass_fix_solution=1 (Castro_pointmass.cpp:155): reset a
        2-cell-radius box around the problem center to the pre-step state;
        the mass change inside the box accretes onto the point mass."""
        import numpy as _np

        L, g, c = self.layout, self.geom, self.params.castro
        ng, dim = self.ng, L.dim
        box = []
        for d in range(dim):
            lo_sym = c.lo_bc[d] in (3, 4, 5)
            cen = (g.prob_lo[d] if lo_sym
                   else 0.5 * (g.prob_lo[d] + g.prob_hi[d]))
            icen = int(_np.floor((cen - g.prob_lo[d]) / g.dx[d] + 1e-8))
            box.append(slice(ng + max(icen - 2, 0),
                             ng + min(icen + 2, g.n_cell[d])))
        sl = (slice(None),) + tuple(box)
        vol = jnp.broadcast_to(g.volume(self.ng),
                               u_new.shape[1:])[tuple(box)]
        dmass = jnp.sum((u_new[(L.URHO,) + tuple(box)]
                         - u_old[(L.URHO,) + tuple(box)]) * vol)
        # only accrete when the box GAINED mass (reference
        # Castro_pointmass.cpp:87-96: point_mass += mass_change if > 0,
        # and only then is the box reset to the pre-step state)
        do_fix = dmass > 0.0
        u_fixed = jnp.where(do_fix, u_new.at[sl].set(u_old[sl]), u_new)
        return u_fixed, point_mass + jnp.where(do_fix, dmass, 0.0)

    def try_step(self, dt: float, t: Optional[float] = None):
        """One trial step from time t (defaults to self.t; subcycles pass
        the advanced substep time so time-dependent sources are correct)."""
        t = self.t if t is None else t
        if self.mhd is not None:
            u_new, b_new, min_rho, nan_flag = self._jit_mhd_step(
                self.u, self.u_b, dt, t)
            status = StepStatus(min_rho=float(min_rho),
                                has_nan=bool(nan_flag))
            if status.success:
                self.u_b = b_new
            return u_new, status
        if self.sdc is not None:
            u_new, fail = self._jit_sdc_step(self.u, dt, t)
            inner = interior_slice(self.ng, self.layout.dim)
            min_rho = float(jnp.min(u_new[inner][self.layout.URHO]))
            ok_num = bool(jnp.isfinite(jnp.sum(u_new[inner])))
            status = StepStatus(min_rho=min_rho, has_nan=(not ok_num),
                                burn_fail=bool(fail))
            return u_new, status
        if self.sdc_simplified is not None:
            u_new, min_rho, nan_flag = self._jit_ssdc_step(self.u, dt, t)
            return u_new, StepStatus(min_rho=float(min_rho),
                                     has_nan=bool(nan_flag))
        if self.rad is not None:
            u_new, Er_new, min_rho, nan_flag = self._jit_rad_step(
                self.u, self.u_rad, dt, t)
            status = StepStatus(min_rho=float(min_rho), has_nan=bool(nan_flag))
            if status.success:
                self.u_rad = Er_new
            return u_new, status
        kw = {}
        if self.params.castro.source_term_predictor == 1:
            kw["src_pred"] = self._src_pred
        if self._pm_fix:
            kw["point_mass"] = jnp.asarray(self.point_mass, self.dtype)
        if kw:
            u_prev = self.u
            out = self._jit_step(self.u, dt, t, **kw)
            u_new, min_rho, nan_flag = out[0], out[1], out[2]
            status = StepStatus(min_rho=float(min_rho),
                                has_nan=bool(nan_flag))
            if status.success:
                if "src_pred" in kw:
                    self._src_pred = out[-1]
                if self._pm_fix:
                    u_new, pm = self._jit_pm_fix(
                        u_prev, u_new, kw["point_mass"])
                    self.point_mass = float(pm)
            return u_new, status
        u_new, min_rho, nan_flag = self._jit_step(self.u, dt, t)
        status = StepStatus(min_rho=float(min_rho), has_nan=bool(nan_flag))
        return u_new, status

    def advance(self, dt: float) -> float:
        """Advance by dt with retry/subcycling on failure (reference
        retry_advance_ctu / subcycle_advance_ctu,
        Castro_advance_ctu.cpp:404,504). Returns the dt actually taken."""
        c = self.params.castro
        u_new, status = self.try_step(dt)
        if status.success or not c.use_retry:
            self.u = u_new
            self.t += dt
            self._count_zones(1)
            return dt

        # retry with subcycling (reference retry_advance_ctu: restore the
        # pre-step state — including radiation — then re-subcycle)
        dt_sub = dt * c.retry_subcycle_factor
        for _ in range(c.max_subcycles):
            t_adv = 0.0
            ok = True
            u_save = self.u
            u_rad_save = self.u_rad
            u_b_save = self.u_b
            nsub = 0
            while t_adv < dt * (1 - 1e-12):
                step_dt = min(dt_sub, dt - t_adv)
                u_new, status = self.try_step(step_dt, t=self.t + t_adv)
                if not status.success:
                    ok = False
                    break
                self.u = u_new
                t_adv += step_dt
                nsub += 1
            if ok:
                self.t += dt
                self._count_zones(nsub)
                return dt
            # restore and halve again
            self.u = u_save
            self.u_rad = u_rad_save
            self.u_b = u_b_save
            dt_sub *= c.retry_subcycle_factor
            if dt_sub < c.dt_cutoff:
                break
        raise RuntimeError(
            f"advance failed at t={self.t}: dt_sub={dt_sub} below cutoff "
            f"(min_rho={status.min_rho}, nan={status.has_nan})")

    def _count_zones(self, nsteps):
        self.num_zones_advanced += nsteps * int(np.prod(self.geom.n_cell))

    # -- main loop -----------------------------------------------------------
    def _filter_prim(self):
        """Purser-filter the primitive fields every filter_prim_int steps
        (reference Radiation::filter_prim, Radiation.cpp:53-136 /
        RadBreakout inputs) — damps odd-even point instabilities behind
        radiating shocks. Filters rho, u, e, X in primitive form, then
        rebuilds the conserved state and Er."""
        from castro_tpu.radiation.filter import apply_filter

        L = self.layout
        T_ord = self.params.radiation.filter_prim_T
        inner = interior_slice(self.ng, L.dim)
        ui = self.u[inner]
        rho = ui[L.URHO]
        rhoinv = 1.0 / jnp.maximum(rho, 1e-300)
        vel = [ui[L.momentum_index(d)] * rhoinv for d in range(3)]
        e = ui[L.UEINT] * rhoinv
        xn = ui[L.UFS : L.UFS + L.nspec] * rhoinv[None]
        axes = range(L.dim)
        rho_f = jnp.maximum(apply_filter(rho, T_ord, axes=axes),
                            self.params.castro.small_dens)
        vel_f = [apply_filter(v, T_ord, axes=axes) for v in vel]
        e_f = jnp.maximum(apply_filter(e, T_ord, axes=axes), 1e-300)
        xn_f = jnp.clip(apply_filter(xn, T_ord,
                                     axes=range(1, xn.ndim)), 0.0, 1.0)
        xn_f = xn_f / jnp.maximum(jnp.sum(xn_f, axis=0), 1e-300)[None]
        es = self.eos.re(rho=rho_f, e=e_f, xn=xn_f)
        ke = 0.5 * rho_f * sum(v * v for v in vel_f)
        u = self.u
        u = u.at[(L.URHO,) + inner[1:]].set(rho_f)
        for d in range(3):
            u = u.at[(L.momentum_index(d),) + inner[1:]].set(rho_f * vel_f[d])
        u = u.at[(L.UEINT,) + inner[1:]].set(rho_f * e_f)
        u = u.at[(L.UEDEN,) + inner[1:]].set(rho_f * e_f + ke)
        u = u.at[(L.UTEMP,) + inner[1:]].set(es.T)
        u = u.at[(slice(L.UFS, L.UFS + L.nspec),) + inner[1:]].set(
            xn_f * rho_f[None])
        self.u = self._jit_clean_fill(u)
        if self.u_rad is not None:
            ax_er = (range(1, self.u_rad.ndim)
                     if self.u_rad.ndim > L.dim else range(L.dim))
            self.u_rad = jnp.maximum(
                apply_filter(self.u_rad, T_ord, axes=ax_er), 0.0)

    def run(self, max_step: Optional[int] = None, stop_time: Optional[float] = None,
            verbose: Optional[bool] = None, callbacks: Optional[List[Callable]] = None):
        a = self.params.amr
        max_step = max_step if max_step is not None else (a.max_step if a.max_step >= 0 else 10**9)
        stop_time = stop_time if stop_time is not None else (a.stop_time if a.stop_time >= 0 else np.inf)
        verbose = self.params.castro.v if verbose is None else verbose
        callbacks = callbacks or []

        if self.u is None:
            self.init_data()

        # I/O cadence (reference Amr plot_int/check_int + data_log)
        from castro_tpu.driver import diagnostics as diag_mod
        from castro_tpu.driver import io as io_mod

        loggers = [diag_mod.DataLogger(p) for p in a.data_log]
        sum_interval = self.params.castro.sum_interval

        def maybe_io():
            if a.plot_int > 0 and self.step_count % a.plot_int == 0:
                io_mod.write_plotfile(self)
            if a.check_int > 0 and self.step_count % a.check_int == 0:
                io_mod.write_checkpoint(self)
            if sum_interval > 0 and self.step_count % sum_interval == 0:
                sums = diag_mod.sum_integrated_quantities(self)
                if verbose:
                    print("  " + " ".join(f"{k}={v:.6e}" for k, v in
                                          list(sums.items())[:8]))
                for lg in loggers:
                    lg.log(sums)

        from castro_tpu.utils import profiler

        if self.params.tpu.profile:
            profiler.enable()

        wall0 = time.time()
        while self.step_count < max_step and self.t < stop_time * (1 - 1e-12):
            with profiler.profile("estTimeStep"):
                dt = self.estimate_dt()
            if self.t + dt > stop_time:
                dt = stop_time - self.t
            with profiler.profile("Castro::advance", sync=self.u):
                taken = self.advance(dt)
            self.dt = taken
            self.step_count += 1
            fp = self.params.radiation.filter_prim_int
            if (self.rad is not None and fp > 0
                    and self.step_count % fp == 0):
                self._filter_prim()
            if verbose:
                print(f"STEP {self.step_count} t={self.t:.6e} dt={taken:.6e}")
            with profiler.profile("io"):
                maybe_io()
            for cb in callbacks:
                cb(self)
        wall = time.time() - wall0
        if verbose and wall > 0:
            fom = self.num_zones_advanced / wall / 1e6
            print(f"  Average number of zones advanced per microsecond: {fom:.3f}")
        return self

    # -- views -----------------------------------------------------------------
    def interior(self, u=None):
        u = self.u if u is None else u
        return u[interior_slice(self.ng, self.layout.dim)]
