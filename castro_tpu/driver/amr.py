"""Block-structured AMR driver: subcycled level hierarchy with fillpatch,
refluxing and averaging-down.

Reference semantics: AMReX `Amr::coarseTimeStep` recursion + Castro's
subcycling (`Castro_advance_ctu.cpp:504`), FillPatch space-time
interpolation at coarse-fine boundaries, `FluxRegister` refluxing
(`Source/driver/Castro.cpp:2549-2700`), `avgDown`, `errorEst` tagging, and
hierarchy-wide retry (`retry_advance_ctu`).

TPU-first representation (round 2): each fine level is a DENSE **window**
— the bucketed bounding box of the tagged region plus margin — at that
level's resolution, with a boolean refinement mask inside the window.
Fillpatch/reflux/avgDown stay pure dense XLA ops, but fine-level FLOPs now
scale with the refined region instead of the whole domain. Window shapes
are bucketed (multiples of 16 fine cells) so XLA recompiles only when the
refined region outgrows its bucket; the window ORIGIN is a traced argument
(`Geometry.local_view`) so window motion never recompiles. The unmasked
window ring always carries time-interpolated coarse data, doubling as the
coarse-fine ghost region for the stencil (FillPatch).

Refinement ratio: 2 (per level), matching amr.ref_ratio defaults.
"""

from __future__ import annotations


from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from castro_tpu.config import Params
from castro_tpu.driver.sim import Simulation, StepCtx
from castro_tpu.driver.tagging import tag_cells
from castro_tpu.geometry import geometry_from_params
from castro_tpu.ops.interlevel import (coarsen_flux, prolong, prolong_face,
                                       prolong_mask, restrict, restrict_edge,
                                       restrict_face, restrict_mask)
from castro_tpu.ops.stencil import interior_slice

BUCKET = 16   # window extents rounded up to multiples of this (fine cells)
MARGIN = 8    # unmasked fine-cell ring kept around tags (>= ng + stencil)
MAX_WINDOWS = 8  # max disjoint windows per level before falling back to hull


def _cluster_tags(t: np.ndarray, merge_gap: int) -> List[tuple]:
    """Connected components of a boolean tag array (unions components
    whose bounding boxes come within `merge_gap` cells), returned as a
    list of (lo, hi) index-bound pairs. Pure-numpy label propagation."""
    if not t.any():
        return []
    dim = t.ndim
    lab = np.full(t.shape, -1, np.int64)
    lab[t] = np.arange(int(t.sum()))
    # propagate minimum labels until stable (O(diameter) passes)
    while True:
        new = lab.copy()
        for d in range(dim):
            for off in (1, -1):
                sh = np.roll(lab, off, axis=d)
                edge = [slice(None)] * dim
                edge[d] = 0 if off == 1 else -1
                sh[tuple(edge)] = -1
                np.minimum(new, np.where((new >= 0) & (sh >= 0), sh, new),
                           out=new)
        if np.array_equal(new, lab):
            break
        lab = new
    boxes = []
    for root in np.unique(lab[lab >= 0]):
        idx = np.nonzero(lab == root)
        boxes.append((np.array([i.min() for i in idx]),
                      np.array([i.max() for i in idx])))
    # merge boxes whose margin-padded extents overlap
    changed = True
    while changed:
        changed = False
        out = []
        for lo, hi in boxes:
            for k, (lo2, hi2) in enumerate(out):
                if np.all(lo <= hi2 + merge_gap) and \
                        np.all(lo2 <= hi + merge_gap):
                    out[k] = (np.minimum(lo, lo2), np.maximum(hi, hi2))
                    changed = True
                    break
            else:
                out.append((lo, hi))
        boxes = out
    return boxes


def _level_params(params: Params, level: int,
                  n_cell: Optional[tuple] = None) -> Params:
    r = 2**level
    nc = n_cell if n_cell is not None else tuple(
        n * r for n in params.amr.n_cell)
    return params.with_ns("amr", n_cell=nc)


class _GeomShim:
    """Duck-typed sim view with a position-correct window geometry, for
    problem_init / problem_tagging hooks on fine windows."""

    def __init__(self, sim, geom):
        self._sim = sim
        self.geom = geom

    def __getattr__(self, name):
        return getattr(self._sim, name)


class _Level:
    """One fine level's compiled programs for a fixed window SHAPE."""

    def __init__(self, params, level, shape_f, geom_full, mesh=None,
                 **sim_kw):
        self.shape = tuple(shape_f)
        sim_kw = dict(sim_kw)
        sim_kw.pop("problem_init", None)
        dim = geom_full.dim
        # dx-correct window geometry (origin placeholder 0; the true,
        # possibly-moving origin arrives per step as the traced `ilo`)
        geom_win = geom_full.local_view(self.shape, (0,) * dim)
        self.sim = Simulation(_level_params(params, level, self.shape),
                              geom=geom_win, **sim_kw)
        self.sim.keep_fluxes = True
        self.geom_full = geom_full
        sim = self.sim

        def step(u, dt, t, ilo, grav_bc=None):
            geom = geom_full.local_view(self.shape, tuple(ilo))
            ctx = StepCtx(fill=sim._fill, pmin=jnp.min, pany=lambda b: b,
                          psum=lambda x: x, geom=geom, axis_names=(),
                          grav_bc=grav_bc)
            return sim._step_impl(u, dt, t, ctx=ctx)

        self.jit_step = jax.jit(step)
        # batched patch program (SURVEY §7: equal-shape windows step as
        # ONE [npatch, ...] vmapped program — the BoxArray analog; XLA
        # tiles the batch onto the hardware, and under a mesh the batch
        # axis is sharded so patches DISTRIBUTE instead of replicating)
        self.jit_step_batch = jax.jit(jax.vmap(
            lambda u, dt, t, ilo: step(u, dt, t, ilo),
            in_axes=(0, None, None, 0)))
        self.jit_estdt = jax.jit(sim._estdt_impl)
        self.jit_clean_fill = jax.jit(sim._clean_fill_impl)

        if sim.sdc is not None:
            # SDC x AMR — beyond-reference capability ("the SDC solvers
            # do not support multilevel or AMR",
            # Docs/source/FlowChart.rst:593): the window's
            # step is the true-SDC advance — the MOL node evaluations read
            # only dx from the (dx-correct) window geometry, the ring
            # carries the coarse-fine data exactly as for CTU, and the
            # quadrature-averaged node fluxes feed the flux registers.
            ng_ = sim.ng
            dim_ = sim.layout.dim

            def sdc_step(u, dt, t, ilo, grav_bc=None):
                u_new, fail, fl = sim.sdc.advance(u, dt, t,
                                                  keep_fluxes=True)
                inner = interior_slice(ng_, dim_)
                min_rho = jnp.min(u_new[inner][sim.layout.URHO])
                bad = ~jnp.isfinite(jnp.sum(u_new[inner])) | fail
                fint = []
                for d in range(dim_):
                    idx = [slice(None)] + [slice(ng_, -ng_)] * dim_
                    idx[1 + d] = slice(ng_, u.shape[1 + d] - ng_ + 1)
                    fint.append(fl[d][tuple(idx)])
                return u_new, min_rho, bad, fint

            self.jit_step = jax.jit(sdc_step)

        # sharded fine-window step (amr.distribute_fine=1): the window's
        # FLOPs distribute over the mesh instead of replicating
        self.jit_sharded_step = None
        if (mesh is not None and sim.mhd is None and sim.rad is None
                and sim.sdc is None):
            from castro_tpu.parallel.decomp import (make_sharded_window_step,
                                                    spatial_axis_names)

            names = spatial_axis_names(sim, mesh)
            ok = all(name is None or self.shape[d] % mesh.shape[name] == 0
                     for d, name in enumerate(names))
            if ok:
                self.jit_sharded_step = make_sharded_window_step(
                    sim, mesh, geom_full)

        self.jit_mhd_step = None
        if sim.mhd is not None:
            def mhd_step(u, b, dt, t, ilo, grav_bc=None):
                geom = geom_full.local_view(self.shape, tuple(ilo))
                ctx = StepCtx(fill=sim._fill, pmin=jnp.min,
                              pany=lambda x: x, psum=lambda x: x,
                              geom=geom, axis_names=(), grav_bc=grav_bc)
                return sim._mhd_step_impl(u, b, dt, t, ctx=ctx,
                                          keep_ct=True)

            self.jit_mhd_step = jax.jit(mhd_step)
            self.jit_estdt = jax.jit(sim._mhd_estdt_impl)
            self.jit_mhd_clean = jax.jit(
                lambda u, b: sim.mhd._clean(u, b))
            self.jit_fill_b = jax.jit(
                lambda b: tuple(sim.mhd._fill_b(bb, d)
                                for d, bb in enumerate(b)))

        grav = next((fn.gravity for fn in sim.source_fns
                     if getattr(fn, "name", "") == "grav"), None)
        self.jit_phi = None
        if grav is not None and grav.gtype == "PoissonGrav":
            def phi_solve(rho, ilo, grav_bc):
                geom = geom_full.local_view(self.shape, tuple(ilo))
                ctx = StepCtx(fill=sim._fill, pmin=jnp.min,
                              pany=lambda b: b, psum=lambda x: x,
                              geom=geom, axis_names=(), grav_bc=grav_bc)
                return grav._poisson(rho, ctx)[1]

            self.jit_phi = jax.jit(phi_solve)

        self.jit_rad_step = None
        if sim.rad is not None:
            def rad_step(u, Er, dt, t, ilo, grav_bc=None, rad_bc=None,
                         rad_rhs_extra=None):
                geom = geom_full.local_view(self.shape, tuple(ilo))
                ctx = StepCtx(fill=sim._fill, pmin=jnp.min,
                              pany=lambda b: b, psum=lambda x: x,
                              geom=geom, axis_names=(), grav_bc=grav_bc)
                return sim._rad_step_impl(u, Er, dt, t, ctx=ctx,
                                          rad_bc=rad_bc,
                                          rad_rhs_extra=rad_rhs_extra,
                                          keep_rad_flux=True)

            self.jit_rad_step = jax.jit(rad_step)


class AmrSimulation:
    """Owns the level hierarchy; level 0 is a whole-domain Simulation,
    finer levels are dense windows with per-shape compiled programs."""

    def __init__(self, params: Params, problem_init: Optional[Callable] = None,
                 problem_tagging: Optional[Callable] = None, mesh=None,
                 **sim_kw):
        """`mesh` (jax.sharding.Mesh): distributed-AMR mode — level 0 runs
        under shard_map over the mesh (the reference's distributed level,
        `Docs/source/software.rst:18-36`) while fine windows are computed
        replicated; interlevel transfers (fillpatch/reflux/avgDown) are
        whole-array XLA ops on the sharded level-0 arrays."""
        self.params = params
        self.max_level = params.amr.max_level
        self.ref_ratio = 2
        self.problem_init = problem_init
        self.problem_tagging = problem_tagging
        self.indicators = self._parse_indicators(params)
        self._sim_kw = sim_kw
        self.mesh = mesh

        self.sim0 = Simulation(_level_params(params, 0),
                               problem_init=problem_init, **sim_kw)
        self.sim0.keep_fluxes = self.max_level > 0
        if self.sim0.sdc is not None:
            # SDC x AMR: level 0 advances with the true-SDC step too; the
            # wrapper matches _jit_step's (u, min_rho, bad, fluxes)
            # contract so the Amr recursion is integrator-agnostic
            # (reference Castro_advance_sdc.cpp:26 under Amr::timeStep;
            # under a mesh the sharded SDC step below takes over)
            sim0 = self.sim0
            ng_ = sim0.ng
            dim_ = sim0.layout.dim

            def _sdc_step0(u, dt, t):
                u_new, fail, fl = sim0.sdc.advance(u, dt, t,
                                                   keep_fluxes=True)
                inner = interior_slice(ng_, dim_)
                min_rho = jnp.min(u_new[inner][sim0.layout.URHO])
                bad = ~jnp.isfinite(jnp.sum(u_new[inner])) | fail
                if not sim0.keep_fluxes:
                    return u_new, min_rho, bad
                fint = []
                for d in range(dim_):
                    idx = [slice(None)] + [slice(ng_, -ng_)] * dim_
                    idx[1 + d] = slice(ng_, u.shape[1 + d] - ng_ + 1)
                    fint.append(fl[d][tuple(idx)])
                return u_new, min_rho, bad, fint

            self.sim0._jit_step = jax.jit(_sdc_step0)
        self._sharded_step0 = None
        if mesh is not None:
            if self.sim0.sdc is not None:
                # distributed SDC AMR: level 0 runs the true-SDC advance
                # under shard_map (beyond-reference: FlowChart.rst:593)
                from castro_tpu.parallel.decomp import make_sharded_sdc_step

                self._sharded_step0 = make_sharded_sdc_step(self.sim0,
                                                            mesh)
                # the sharded SDC step always returns fluxes
                self.sim0.keep_fluxes = True
            else:
                from castro_tpu.parallel.decomp import make_sharded_step

                self._sharded_step0 = make_sharded_step(
                    self.sim0, mesh, keep_fluxes=self.max_level > 0)
        self.dim = self.sim0.layout.dim
        self.ng = self.sim0.ng
        self.dtype = self.sim0.dtype

        # full-domain geometry per level (window views hang off these)
        self.geom_full = [geometry_from_params(
            _level_params(params, l), self.dtype)
            for l in range(self.max_level + 1)]

        # per-level window: (ilo_f ndarray[dim], shape_f tuple) in LEVEL-l
        # global fine cells; level 0 = whole domain
        n0 = tuple(params.amr.n_cell[: self.dim])
        self.window: List = [((np.zeros(self.dim, int)), n0)] + \
            [None] * self.max_level
        self._levels: List[Dict] = [dict() for _ in range(self.max_level + 1)]

        self.u: List = [None] * (self.max_level + 1)
        self.u_old: List = [None] * (self.max_level + 1)
        self.masks: List = [None] * (self.max_level + 1)
        self.t = 0.0
        self.step_count = 0
        self.dt = None
        self.num_zones_advanced = 0

        # composite gravity plumbing (reference Gravity.cpp:418-487 level
        # solves with coarse-phi Dirichlet boundary data): per-level grav_bc
        # for the CURRENT substep, set by the parent's subcycle loop
        from castro_tpu.geometry import CoordSys
        g0 = next((fn.gravity for fn in self.sim0.source_fns
                   if getattr(fn, "name", "") == "grav"), None)
        self._has_poisson = (g0 is not None and g0.gtype == "PoissonGrav"
                             and self.sim0.geom.coord == CoordSys.CARTESIAN)
        self._jit_phi0 = (jax.jit(lambda rho: g0._poisson(rho)[1])
                          if self._has_poisson else None)
        self._cur_grav_bc: Dict[int, object] = {}

        # patch-batch windows (SURVEY §7; reference BoxArray semantics):
        # disjoint tag clusters at level 1 get their OWN windows beyond
        # the primary, so separated features don't pay the convex hull.
        # Each entry: {ilo, shape, u, mask, grav_bc}.
        self.extra: List[List[dict]] = [[] for _ in range(self.max_level + 1)]

        # AMR radiation (gray FLD): per-level Er with composite window
        # solves (coarse-Er Dirichlet BCs) + deferred flux sync into the
        # next coarse solve (reference Radiation flux registers +
        # deferred_sync, Radiation.cpp:247-289,1731-1830)
        # AMR MHD (reference: MHD is just Castro with USE_MHD under the
        # same Amr recursion, `Source/mhd/Castro_mhd.cpp` +
        # `Castro_advance_ctu.cpp:16`): per-level face fields u_b with
        # divergence-free fillpatch (prolong_face), and a CT flux register
        # — the coarse faces are corrected by the curl of the accumulated
        # fine-edge-EMF / coarse-EMF mismatch, which reproduces fine-face
        # restriction on covered faces (telescoping of the fine CT
        # updates) and EMF-refluxes the uncovered interface faces, keeping
        # div B = 0 on every level to round-off.
        self._has_mhd = params.castro.do_mhd == 1 and self.max_level > 0
        self._sharded_mhd_step0 = None
        if self._has_mhd:
            assert params.castro.mhd_ctu, \
                "AMR MHD requires the CTU-CT scheme (castro.mhd_ctu=1)"
            if mesh is not None:
                # distributed AMR MHD: level 0 advances under the mesh
                # with the CT register data exported cell-registered and
                # re-grown by the wrap/edge adapter below (fine windows
                # compute replicated, like hydro's default)
                from castro_tpu.parallel.decomp import make_sharded_mhd_step

                self._sharded_mhd_step0 = make_sharded_mhd_step(
                    self.sim0, mesh, keep_ct=True)
            self._jit_mhd_step0 = jax.jit(
                lambda u, b, dt, t: self.sim0._mhd_step_impl(
                    u, b, dt, t, keep_ct=True))
            self._jit_mhd_clean0 = jax.jit(
                lambda u, b: self.sim0.mhd._clean(u, b))
            self._jit_fill_b0 = jax.jit(
                lambda b: tuple(self.sim0.mhd._fill_b(bb, d)
                                for d, bb in enumerate(b)))
        self.u_b: List = [None] * (self.max_level + 1)
        self.u_b_old: List = [None] * (self.max_level + 1)

        self._has_rad = self.sim0.rad is not None
        assert not (self._has_mhd and self._has_rad), \
            "AMR MHD + radiation not composed (reference has no rad-MHD)"
        # multigroup AMR radiation: Er carries a LEADING GROUP AXIS; all
        # interlevel transfers run per group (reference HypreMultiABec
        # multilevel multigroup solves, MGFLDRadSolver.cpp:21-120)
        self._rad_cax = 1 if self.sim0.layout.ngroups > 1 else 0
        self.u_rad: List = [None] * (self.max_level + 1)
        self.u_rad_old: List = [None] * (self.max_level + 1)
        self._cur_rad_bc: Dict[int, object] = {}
        self._rad_sync_rhs: Dict[int, object] = {}
        self._jit_rad_step0 = None
        self._sharded_rad_step0 = None
        if self._has_rad:
            if mesh is not None:
                # distributed AMR radiation: level 0 advances under the
                # mesh, the implicit solve through the DISTRIBUTED MG
                # (multigrid.py axis_names mode); register fluxes are
                # re-derived globally from the sharded field
                from castro_tpu.parallel.decomp import make_sharded_rad_step

                self._sharded_rad_step0 = make_sharded_rad_step(
                    self.sim0, mesh, keep_fluxes=self.max_level > 0)
                self._jit_rad_flux0 = jax.jit(
                    lambda Er, rho, T: self.sim0.rad.level_fluxes(
                        Er, rho, T))
            else:
                self._jit_rad_step0 = jax.jit(
                    lambda u, Er, dt, t, rhs: self.sim0._rad_step_impl(
                        u, Er, dt, t, rad_rhs_extra=rhs,
                        keep_rad_flux=True))

    # ------------------------------------------------------------------ setup
    @staticmethod
    def _parse_indicators(params) -> List[Dict]:
        """amr.refinement_indicators entries live in params.extra as
        `amr.refinement_indicators` names + `amr.<name>.*` keys
        (reference runtime tagging syntax, Castro.cpp:560-615)."""
        inds = []
        for name in params.amr.refinement_indicators:
            spec = {}
            px = params.extra
            base = f"amr.{name}."
            for k, v in px.items():
                if k.startswith(base):
                    spec[k[len(base):]] = v
            ind = {"field": spec.get("field", "density"),
                   "max_level": spec.get("max_level")}
            for test in ("value_greater", "value_less", "gradient",
                         "relative_gradient"):
                if test in spec:
                    ind["test"] = test
                    ind["value"] = spec[test]
            if "test" in ind:
                inds.append(ind)
        return inds

    def _get_level(self, l, shape_f) -> _Level:
        """Compiled programs for (level, window shape) — cached."""
        key = tuple(shape_f)
        cache = self._levels[l]
        if key not in cache:
            mesh = (self.mesh if (self.mesh is not None and
                                  self.params.amr.distribute_fine)
                    else None)
            cache[key] = _Level(self.params, l, key, self.geom_full[l],
                                mesh=mesh, **self._sim_kw)
        return cache[key]

    def _sims_at(self, l) -> Simulation:
        if l == 0:
            return self.sim0
        return self._get_level(l, self.window[l][1]).sim

    @property
    def sims(self):
        """Per-level Simulation list (window sims for fine levels)."""
        return [self._sims_at(l) for l in range(self.max_level + 1)]

    # ------------------------------------------------------------------ window
    def _compute_window(self, l_fine, tags_global_c):
        """Bucketed bounding box (+margin) of tagged level-(l_fine - 1)
        cells, as a level-l_fine window (ilo_f, shape_f). tags_global_c is
        a dense bool over the COARSE level's full grid. Proper nesting:
        for l_fine >= 2 the window is clamped inside the PARENT window's
        footprint (the parent's stored arrays only cover its window)."""
        n_f = tuple(self.params.amr.n_cell[k] * 2**l_fine
                    for k in range(self.dim))
        if l_fine - 1 > 0 and self.window[l_fine - 1] is not None:
            p_ilo, p_shape = self.window[l_fine - 1]
            blo = tuple(2 * int(p_ilo[k]) for k in range(self.dim))
            bhi = tuple(2 * (int(p_ilo[k]) + p_shape[k])
                        for k in range(self.dim))
        else:
            blo = (0,) * self.dim
            bhi = n_f
        t = np.asarray(tags_global_c)
        if not t.any():
            # minimal window (keeps shapes static when nothing is tagged)
            shape = tuple(min(BUCKET, bhi[k] - blo[k])
                          for k in range(self.dim))
            return np.asarray(blo, int), shape
        box_lo = []
        box_hi = []
        for k in range(self.dim):
            axes = tuple(a for a in range(self.dim) if a != k)
            proj = t.any(axis=axes) if self.dim > 1 else t
            idx = np.nonzero(proj)[0]
            box_lo.append(idx[0])
            box_hi.append(idx[-1])
        return self._box_to_window(np.asarray(box_lo), np.asarray(box_hi),
                                   blo, bhi)

    def _box_to_window(self, box_lo, box_hi, blo, bhi):
        """Coarse-cell tag bbox -> bucketed fine window (ilo, shape),
        clamped to the [blo, bhi) fine-cell bounds."""
        ilo = []
        shape = []
        for k in range(self.dim):
            lo_f = max(blo[k], 2 * int(box_lo[k]) - MARGIN)
            hi_f = min(bhi[k], 2 * (int(box_hi[k]) + 1) + MARGIN)
            ext = int(np.ceil((hi_f - lo_f) / BUCKET)) * BUCKET
            ext = min(ext, bhi[k] - blo[k])
            lo_f = max(blo[k], min(lo_f - (ext - (hi_f - lo_f)) // 2,
                                   bhi[k] - ext))
            lo_f -= lo_f % 2  # even alignment for restriction
            lo_f = max(blo[k], lo_f)
            ilo.append(int(lo_f))
            shape.append(int(ext))
        return np.asarray(ilo, int), tuple(shape)

    def _compute_extra_windows(self, l_fine, tags_global_c):
        """Disjoint-cluster windows beyond the primary (SURVEY §7 patch
        batches; reference BoxArray semantics for separated refined
        regions) at ANY level. Extras are proper-nested inside the
        PARENT'S primary window (their own children clamp to this level's
        primary — extras do not spawn children, documented scope).
        Returns (primary, extras): the primary is the largest cluster's
        window; equal-shape extras step as one vmapped batch program."""
        t = np.asarray(tags_global_c)
        if not t.any():
            return self._compute_window(l_fine, t), []
        boxes = _cluster_tags(t, merge_gap=MARGIN)
        if len(boxes) <= 1 or len(boxes) > MAX_WINDOWS:
            return self._compute_window(l_fine, t), []
        # proper-nesting bounds: the parent's primary window footprint
        if l_fine - 1 > 0 and self.window[l_fine - 1] is not None:
            p_ilo, p_shape = self.window[l_fine - 1]
            blo = tuple(2 * int(p_ilo[k]) for k in range(self.dim))
            bhi = tuple(2 * (int(p_ilo[k]) + p_shape[k])
                        for k in range(self.dim))
        else:
            blo = (0,) * self.dim
            bhi = tuple(self.params.amr.n_cell[k] * 2 ** l_fine
                        for k in range(self.dim))
        wins = [self._box_to_window(lo, hi, blo, bhi) for lo, hi in boxes]
        # order by volume (primary = largest); drop overlap by merging if
        # bucketing made any pair overlap after all
        wins.sort(key=lambda w: -int(np.prod(w[1])))
        for a in range(len(wins)):
            for b in range(a + 1, len(wins)):
                la, sa = wins[a]
                lb, sb = wins[b]
                if np.all(la < lb + np.asarray(sb)) and \
                        np.all(lb < la + np.asarray(sa)):
                    return self._compute_window(l_fine, t), []
        return wins[0], wins[1:]

    def _win_geom(self, l, win=None):
        ilo, shape = win if win is not None else self.window[l]
        return self.geom_full[l].local_view(shape, tuple(int(v) for v in ilo))

    def _coarse_slice(self, l, grow=0, win=None):
        """Slice of the level-(l-1) full interior covered by level l's
        window (coarse cells), optionally grown (clamped)."""
        ilo, shape = win if win is not None else self.window[l]
        sl = []
        for k in range(self.dim):
            lo = int(ilo[k]) // 2 - grow
            hi = (int(ilo[k]) + shape[k]) // 2 + grow
            sl.append(slice(max(0, lo), hi))
        return tuple(sl)

    # ------------------------------------------------------------------ init
    def init_data(self):
        """Initial hierarchy generation (reference Amr::init loop: init
        level 0, tag, create level 1 from problem data, repeat)."""
        self.sim0.init_data()
        self.u[0] = self.sim0.u
        self.masks[0] = jnp.ones(self.sim0.geom.n_cell, bool)
        if self._has_rad:
            self.u_rad[0] = self.sim0.u_rad
        if self._has_mhd:
            self.u_b[0] = self.sim0.u_b
        for l in range(1, self.max_level + 1):
            tags = self._tags_for(l - 1)
            if not self._has_rad and not self._has_mhd:
                (ilo, shape), extras = self._compute_extra_windows(l, tags)
            else:
                ilo, shape = self._compute_window(l, tags)
                extras = []
            self.window[l] = (ilo, shape)
            if self._has_mhd:
                self.u[l], self.u_b[l] = self._make_window_state_mhd(
                    l, (ilo, shape))
            else:
                self.u[l] = self._make_window_state(l, (ilo, shape))
            self.masks[l] = self._window_mask(l, tags)
            self.extra[l] = [
                {"ilo": e[0], "shape": e[1],
                 "u": self._make_window_state(l, e),
                 "mask": self._window_mask(l, tags, win=e),
                 "grav_bc": None}
                for e in extras]
            if self._has_rad:
                csl = self._parent_rel_slice(l)
                cx = (slice(None),) * self._rad_cax
                self.u_rad[l] = prolong(self.u_rad[l - 1][cx + csl],
                                        self.dim,
                                        comp_axes=self._rad_cax)
        return self

    def _make_window_state(self, l, win):
        """Problem data on one window (position-correct shim) + clean."""
        ilo, shape = win
        lev = self._get_level(l, shape)
        u = jnp.zeros((self.sim0.layout.NVAR,) +
                      tuple(s + 2 * self.ng for s in shape), self.dtype)
        if self.problem_init is not None:
            shim = _GeomShim(lev.sim, self._win_geom(l, win=win))
            u = self.problem_init(shim, u)
        return lev.jit_clean_fill(u)

    def _make_window_state_mhd(self, l, win):
        """Problem data (u, b) on one window (reference Amr::init calls
        initData per level — MHD problem hooks define the face field
        analytically, so the fine window's B is divergence-free by
        construction exactly like the level-0 init, sim.init_data)."""
        ilo, shape = win
        lev = self._get_level(l, shape)
        L = self.sim0.layout
        gshape = tuple(s + 2 * self.ng for s in shape)
        u = jnp.zeros((L.NVAR,) + gshape, self.dtype)
        b = tuple(jnp.zeros(gshape, self.dtype) for _ in range(3))
        if self.problem_init is not None:
            shim = _GeomShim(lev.sim, self._win_geom(l, win=win))
            u, b = self.problem_init(shim, u, b)
        bc = lev.sim.mhd.cell_b(b)
        pb = 0.5 * sum(bb * bb for bb in bc)
        u = u.at[L.UEDEN].add(pb)
        b = lev.jit_fill_b(tuple(jnp.asarray(bb, self.dtype) for bb in b))
        u = lev.jit_mhd_clean(jnp.asarray(u, self.dtype), b)
        return u, b

    def _tags_for(self, l):
        """Dense tags over level l's FULL grid (window tags scattered)."""
        sim = self._sims_at(l)
        u_int = self.u[l][interior_slice(self.ng, self.dim)]
        shim = _GeomShim(sim, self._win_geom(l) if l > 0 else sim.geom)
        tags_win = tag_cells(shim, u_int, self.indicators, l,
                             self.params.amr.n_error_buf,
                             self.problem_tagging)
        tags_win = tags_win & self.masks[l]  # proper nesting
        if l == 0:
            return tags_win
        full = jnp.zeros(self.geom_full[l].n_cell, bool)
        ilo, shape = self.window[l]
        return jax.lax.dynamic_update_slice(full, tags_win,
                                            tuple(int(v) for v in ilo))

    def _window_mask(self, l, tags_global_c, win=None):
        """Level-l window mask from coarse-level tags."""
        csl = self._coarse_slice(l, win=win)
        mask = prolong_mask(tags_global_c[csl], self.dim)
        # mask is over the window (coarse slice x2 == window by construction)
        return mask

    # ------------------------------------------------------------------ regrid
    def _migrate_window(self, l, win, old_wins, fill_new=True,
                        b_clean=None):
        """Build a (new) level-l window's state: prolonged coarse data
        everywhere, then overlap copies from the old windows' valid
        (masked) fine data. Returns the grown, cleaned state. `b_clean`:
        the window's (already migrated) face field — selects the MHD
        clean, whose dual-energy reset subtracts the magnetic energy."""
        new_ilo, new_shape = win
        lev = self._get_level(l, new_shape)
        c_int = self.u[l - 1][interior_slice(self.ng, self.dim)]
        csl = self._parent_rel_slice(l, win=win)
        new_int = prolong(c_int[(slice(None),) + csl], self.dim)
        if fill_new:
            for old_ilo, old_shape, old_u, old_mask in old_wins:
                old_int = old_u[interior_slice(self.ng, self.dim)]
                lo = np.maximum(np.asarray(new_ilo), np.asarray(old_ilo))
                hi = np.minimum(np.asarray(new_ilo) + np.asarray(new_shape),
                                np.asarray(old_ilo) + np.asarray(old_shape))
                if np.all(hi > lo):
                    src = (slice(None),) + tuple(
                        slice(int(lo[k] - old_ilo[k]),
                              int(hi[k] - old_ilo[k]))
                        for k in range(self.dim))
                    dst = (slice(None),) + tuple(
                        slice(int(lo[k] - new_ilo[k]),
                              int(hi[k] - new_ilo[k]))
                        for k in range(self.dim))
                    m_src = old_mask[src[1:]]
                    new_int = new_int.at[dst].set(
                        jnp.where(m_src[None], old_int[src], new_int[dst]))
        pads = [(0, 0)] + [(self.ng, self.ng)] * self.dim
        if b_clean is not None:
            return lev.jit_mhd_clean(jnp.pad(new_int, pads), b_clean)
        return lev.jit_clean_fill(jnp.pad(new_int, pads))

    def regrid(self, fill_new=True):
        """Re-tag every level; move/resize windows (incl. the patch-batch
        extras), migrating data (reference Amr regrid + FillCoarsePatch
        for new regions)."""
        for l in range(self.max_level):
            tags = self._tags_for(l)
            if not self._has_rad and not self._has_mhd:
                (new_ilo, new_shape), new_extras = \
                    self._compute_extra_windows(l + 1, tags)
            else:
                new_ilo, new_shape = self._compute_window(l + 1, tags)
                new_extras = []

            old_wins = []
            if self.u[l + 1] is not None:
                old_wins.append((self.window[l + 1][0],
                                 self.window[l + 1][1],
                                 self.u[l + 1], self.masks[l + 1]))
                old_wins += [(e["ilo"], e["shape"], e["u"], e["mask"])
                             for e in self.extra[l + 1]]

            new_rad = None
            if self._has_rad:
                csl = self._parent_rel_slice(l + 1,
                                             win=(new_ilo, new_shape))
                cx = (slice(None),) * self._rad_cax
                new_rad = prolong(self.u_rad[l][cx + csl], self.dim,
                                  comp_axes=self._rad_cax)
                if self.u_rad[l + 1] is not None and fill_new:
                    old_ilo, old_shape = self.window[l + 1]
                    lo = np.maximum(new_ilo, old_ilo)
                    hi = np.minimum(new_ilo + np.asarray(new_shape),
                                    old_ilo + np.asarray(old_shape))
                    if np.all(hi > lo):
                        src = cx + tuple(slice(int(lo[k] - old_ilo[k]),
                                               int(hi[k] - old_ilo[k]))
                                         for k in range(self.dim))
                        dst = cx + tuple(slice(int(lo[k] - new_ilo[k]),
                                               int(hi[k] - new_ilo[k]))
                                         for k in range(self.dim))
                        m_src = self.masks[l + 1][src[self._rad_cax:]]
                        new_rad = new_rad.at[dst].set(
                            jnp.where(m_src, self.u_rad[l + 1][src],
                                      new_rad[dst]))

            # primary FIRST (its _parent_rel_slice consults window[l+1]
            # only through the explicit win argument)
            new_b = None
            if self._has_mhd:
                new_b = self._prolong_window_b(
                    l + 1, win=(new_ilo, new_shape))
            u_new = self._migrate_window(l + 1, (new_ilo, new_shape),
                                         old_wins, fill_new,
                                         b_clean=new_b)
            new_extra_state = [
                {"ilo": e[0], "shape": e[1],
                 "u": self._migrate_window(l + 1, e, old_wins, fill_new),
                 "mask": self._window_mask(l + 1, tags, win=e),
                 "grav_bc": None}
                for e in new_extras]

            self.window[l + 1] = (new_ilo, new_shape)
            self.u[l + 1] = u_new
            self.masks[l + 1] = self._window_mask(l + 1, tags)
            self.extra[l + 1] = new_extra_state
            if new_rad is not None:
                self.u_rad[l + 1] = new_rad
            if self._has_mhd:
                # face field: divergence-free prolongation from the coarse
                # level everywhere (the coarse faces already carry the
                # fine information on covered faces through the CT
                # register correction, so re-prolonging keeps div B = 0
                # EXACTLY through window moves; copying old fine faces
                # into a moved window would seed seam divergence)
                self.u_b[l + 1] = new_b

    # ------------------------------------------------------------------ dt
    def estimate_dt(self) -> float:
        """Level-0 dt respecting all levels (reference computeNewDt with
        subcycling: dt_0 = min_l dt_l * prod(ref_ratio))."""
        c = self.params.castro
        if self._has_rad:
            dt = float(self.sim0._jit_estdt(self.u[0], self.u_rad[0]))
        elif self._has_mhd:
            dt = float(self.sim0._jit_mhd_estdt(self.u[0], self.u_b[0]))
        else:
            dt = float(self.sim0._jit_estdt(self.u[0]))
        for l in range(1, self.max_level + 1):
            lev = self._get_level(l, self.window[l][1])
            if self._has_rad:
                dt_l = float(lev.jit_estdt(self.u[l], self.u_rad[l]))
            elif self._has_mhd:
                dt_l = float(lev.jit_estdt(self.u[l], self.u_b[l]))
            else:
                dt_l = float(lev.jit_estdt(self.u[l]))
            dt = min(dt, dt_l * self.ref_ratio**l)
            for e in self.extra[l]:
                lev_e = self._get_level(l, e["shape"])
                dt = min(dt, float(lev_e.jit_estdt(e["u"]))
                         * self.ref_ratio**l)
        if self.step_count == 0:
            dt *= c.init_shrink
        elif self.dt is not None:
            dt = min(dt, c.change_max * self.dt)
        return min(dt, c.max_dt)

    # ------------------------------------------------------------------ advance
    def _ring_fill(self, l, frac, win, u_w, mask_w):
        """One window's unmasked cells := prolonged coarse data
        time-interpolated between the coarse old/new states (FillPatch)."""
        c_interp = (1.0 - frac) * self.u_old[l - 1] + frac * self.u[l - 1]
        c_int = c_interp[interior_slice(self.ng, self.dim)]
        csl = self._parent_rel_slice(l, win=win)
        fine = prolong(c_int[(slice(None),) + csl], self.dim)
        idx = interior_slice(self.ng, self.dim)
        return u_w.at[idx].set(jnp.where(mask_w[None], u_w[idx], fine))

    def _set_unmasked_from_coarse(self, l, frac):
        self.u[l] = self._ring_fill(l, frac, self.window[l], self.u[l],
                                    self.masks[l])

    def _parent_rel_slice(self, l, win=None):
        """Level-l window's footprint inside the PARENT's stored interior
        (parent window coords for l-1>0, global for l-1==0)."""
        ilo, shape = win if win is not None else self.window[l]
        if l - 1 == 0:
            base = np.zeros(self.dim, int)
        else:
            base = 2 * np.asarray(self.window[l - 1][0], int)
        return tuple(slice((int(ilo[k]) - int(base[k])) // 2,
                           (int(ilo[k]) - int(base[k]) + shape[k]) // 2)
                     for k in range(self.dim))

    # ---------------------------------------------------------- composite phi
    def _solve_phi(self, l, u_l):
        """Level-l Poisson phi from u_l's density, using this level's
        current composite boundary data (coarse-interpolated Dirichlet for
        windows; the domain multipole/periodic BCs at level 0)."""
        rho = u_l[(self._sims_at(l).layout.URHO,) +
                  interior_slice(self.ng, self.dim)[1:]]
        if l == 0:
            return self._jit_phi0(rho)
        lev = self._get_level(l, self.window[l][1])
        ilo = jnp.asarray(self.window[l][0])
        return lev.jit_phi(rho, ilo, self._cur_grav_bc.get(l))

    def _solve_phi_sync(self, l, u_l):
        """Composite delta-phi sync solve (reference Gravity::gravity_sync,
        `Gravity.cpp:488-631` + the phi flux register in
        `Castro.cpp:2727-2760`): level solve -> fine-window Dirichlet
        solve -> grad-phi flux-register mismatch at the coarse-fine
        interface -> Poisson solve for delta-phi -> corrected coarse phi.

        The reference rhs is (4 pi G drho + dphi); here phi is re-solved
        from the CURRENT (post-reflux, post-avgDown) density every
        bracketing, so the drho term is identically absorbed and the
        register carries the composite-solve flux mismatch alone. The
        corrected phi feeds the window Dirichlet BCs (both levels'
        subsequent solves see the correction through them); the residual
        diagnostic is exposed as `self.phi_sync_resid`.

        Measured note (round 5): the post-sync register sits at the
        floor set by the linear interpolation order of the window
        Dirichlet data — iterating this pass as a two-level Richardson
        cycle (with or without slaving covered coarse cells to
        restrict(phi_f)) does NOT contract (growth ~1.09x/iter plain,
        ~6x/iter slaved, measured on the test blob), because the plain
        coarse inverse is not a preconditioner for the composite
        interface coupling. Driving the register to solver zero the way
        AMReX MLMG does requires C/F flux-matched interface stencils
        inside the multigrid operator itself (see ROADMAP.md)."""
        phi_c = self._solve_phi(l, u_l)
        if l != 0 or l + 1 > self.max_level:
            return phi_c
        lev = self._get_level(l + 1, self.window[l + 1][1])
        if lev.jit_phi is None:
            return phi_c
        import math as _m

        from castro_tpu.utils import constants as _C

        ng = self.ng
        L = self.sim0.layout
        rho_f = self.u[l + 1][(L.URHO,) + interior_slice(ng, self.dim)[1:]]
        ilo = jnp.asarray(self.window[l + 1][0])
        # fine window level solve against the uncorrected coarse phi
        bc = self._window_face_bc(l + 1, phi_c)
        phi_f = lev.jit_phi(rho_f, ilo, bc)
        rhs = self._phi_flux_register(l, phi_c, phi_f)
        self.phi_sync_resid = float(jnp.abs(rhs).max())
        # delta solve: reuse the level Poisson machinery with the
        # equivalent delta-density rhs/(4 pi G) (multipole BCs of the
        # delta density = the reference's fill_multipole_BCs on rhs)
        dphi = self._jit_phi0(rhs / (4.0 * _m.pi * _C.Gconst))
        return phi_c + dphi

    def _phi_flux_register(self, l, phi_c, phi_f):
        """Grad-phi coarse-fine flux register for the sync/FAC solves:
        rhs = div-mismatch of (grad phi_fine - grad phi_crse) localized
        at the level-(l+1) window interface, in the hydro-reflux sign
        convention (CrseInit(-grad_phi_crse) + FineAdd(grad_phi_fine) ->
        Reflux; reference `Castro.cpp:2727-2760`)."""
        dim = self.dim
        sim = self._sims_at(l)
        # grad-phi flux register: D = -div(grad phi_fine - grad phi_crse)
        # localized at the interface (the hydro-reflux sign convention,
        # CrseInit(-grad_phi_crse) + FineAdd(grad_phi_fine) -> Reflux)
        csl = self._parent_rel_slice(l + 1)
        cmask = restrict_mask(self.masks[l + 1], dim)
        rhs = jnp.zeros_like(phi_c)
        win = rhs[csl]
        for d in range(dim):
            dx_c = sim.geom.dx[d]
            dx_f = self._sims_at(l + 1).geom.dx[d]
            # coarse face grad over footprint faces [n_fp + 1 along d]
            fsl = []
            for k in range(dim):
                s = csl[k]
                fsl.append(slice(s.start, s.stop + 1) if k == d else s)
            lo_f = [slice(None)] * dim
            hi_f = [slice(None)] * dim
            lo_f[d] = slice(0, -1)
            hi_f[d] = slice(1, None)
            pads = [(0, 0)] * dim
            pads[d] = (1, 1)
            pc = jnp.pad(phi_c, pads, mode="edge")
            Fc = ((pc[tuple(hi_f)] - pc[tuple(lo_f)]) / dx_c)[tuple(fsl)]
            # fine face grads restricted to footprint faces (edge faces
            # are garbage but masked off: interface faces are interior)
            pf = jnp.pad(phi_f, pads, mode="edge")
            Ff_fine = (pf[tuple(hi_f)] - pf[tuple(lo_f)]) / dx_f
            trim = [slice(None)] * dim
            trim[d] = slice(0, -1)
            Ff = restrict_face(Ff_fine[tuple(trim)], d, dim)
            # extend to n_fp+1 faces: append the hi footprint face
            last = [slice(None)] * dim
            last[d] = slice(Ff_fine.shape[d] - 1, Ff_fine.shape[d])
            Ff = jnp.concatenate(
                [Ff, restrict_face(Ff_fine[tuple(last)], d, dim)], axis=d)
            delta = Ff - Fc
            pad_lo = [(0, 0)] * dim
            pad_lo[d] = (1, 0)
            pad_hi = [(0, 0)] * dim
            pad_hi[d] = (0, 1)
            m_left = jnp.pad(cmask, pad_lo)
            m_right = jnp.pad(cmask, pad_hi)
            gain_r = jnp.where(m_left & ~m_right, delta, 0.0)
            lose_l = jnp.where(~m_left & m_right, delta, 0.0)
            sl_hi = [slice(None)] * dim
            sl_hi[d] = slice(1, None)
            sl_lo = [slice(None)] * dim
            sl_lo[d] = slice(0, -1)
            win = win + gain_r[tuple(sl_lo)] / dx_c
            win = win - lose_l[tuple(sl_hi)] / dx_c
        return rhs.at[csl].set(win)

    def _window_face_bc(self, l, phi_c, win=None):
        """Dirichlet values of a cell field on level-l window boundary
        faces, linearly interpolated from the parent-level field phi_c
        (parent-local interior array). Used for composite gravity
        (coarse-phi boundary registers, Gravity.cpp:418-487) and AMR
        radiation (coarse-Er boundary data, RadBndry interpolation)."""
        from jax.scipy.ndimage import map_coordinates

        ilo, shape = win if win is not None else self.window[l]
        base_c = (np.zeros(self.dim, int) if l - 1 == 0
                  else np.asarray(self.window[l - 1][0], int))
        bvl, bvh = [], []
        for d in range(self.dim):
            for side in ("lo", "hi"):
                coords = []
                for k in range(self.dim):
                    if k == d:
                        xf = ilo[d] if side == "lo" else ilo[d] + shape[d]
                        idx = np.asarray([xf / 2.0 - 0.5 - base_c[d]])
                    else:
                        i = np.arange(ilo[k], ilo[k] + shape[k])
                        idx = (i + 0.5) / 2.0 - 0.5 - base_c[k]
                    sh = [1] * self.dim
                    sh[k] = len(idx)
                    coords.append(jnp.asarray(idx, phi_c.dtype).reshape(sh))
                target = tuple(1 if k == d else shape[k]
                               for k in range(self.dim))
                coords = [jnp.broadcast_to(c, target) for c in coords]
                if phi_c.ndim > self.dim:
                    # leading component axis (multigroup Er): per group
                    vals = jax.vmap(lambda f: map_coordinates(
                        f, coords, order=1, mode="nearest"))(phi_c)
                else:
                    vals = map_coordinates(phi_c, coords, order=1,
                                           mode="nearest")
                (bvl if side == "lo" else bvh).append(vals)
        return (tuple(bvl), tuple(bvh))

    # back-compat alias
    _window_phi_bc = _window_face_bc

    # ---------------------------------------------------------- radiation AMR
    def _set_unmasked_rad_from_coarse(self, l, frac):
        """Window ring Er := prolonged, time-interpolated coarse Er
        (the radiation FillPatch analog; per group when multigroup)."""
        Er_c = (1.0 - frac) * self.u_rad_old[l - 1] + frac * self.u_rad[l - 1]
        cx = (slice(None),) * self._rad_cax
        csl = self._parent_rel_slice(l)
        fine = prolong(Er_c[cx + csl], self.dim, comp_axes=self._rad_cax)
        self.u_rad[l] = jnp.where(self.masks[l], self.u_rad[l], fine)

    def _rad_reflux_rhs(self, l, f_coarse_dt, fine_acc):
        """Deferred-sync rhs source for the NEXT level-l implicit solve:
        the time-integrated coarse-fine diffusion-flux mismatch scattered
        into the unrefined-side cells (reference Radiation::deferred_sync
        scaled FluxRegister::Reflux into the solve rhs; scale dt_old/dt
        ~ 1 here since dt varies slowly)."""
        sim = self._sims_at(l)
        dim = self.dim
        cax = self._rad_cax
        cx = (slice(None),) * cax
        csl = self._parent_rel_slice(l + 1)
        cmask = restrict_mask(self.masks[l + 1], dim)
        rhs = jnp.zeros(tuple(self.u_rad[l].shape), self.u_rad[l].dtype)
        win = rhs[cx + csl]
        for d in range(dim):
            fsl = []
            for k in range(dim):
                s = csl[k]
                fsl.append(slice(s.start, s.stop + 1) if k == d else s)
            delta = fine_acc[d] - f_coarse_dt[d][cx + tuple(fsl)]
            pad_lo = [(0, 0)] * cmask.ndim
            pad_lo[d] = (1, 0)
            pad_hi = [(0, 0)] * cmask.ndim
            pad_hi[d] = (0, 1)
            m_left = jnp.pad(cmask, pad_lo)
            m_right = jnp.pad(cmask, pad_hi)
            inv_dx = 1.0 / sim.geom.dx[d]
            gain_r = jnp.where(m_left & ~m_right, delta, 0.0)
            lose_l = jnp.where(~m_left & m_right, delta, 0.0)
            sl_hi = [slice(None)] * delta.ndim
            sl_hi[cax + d] = slice(1, None)
            sl_lo = [slice(None)] * delta.ndim
            sl_lo[cax + d] = slice(0, -1)
            win = win + inv_dx * gain_r[tuple(sl_lo)]
            win = win - inv_dx * lose_l[tuple(sl_hi)]
        return rhs.at[cx + csl].set(win)

    def _rad_avg_down(self, l):
        cx = (slice(None),) * self._rad_cax
        csl = self._parent_rel_slice(l + 1)
        cmask = restrict_mask(self.masks[l + 1], self.dim)
        c_from_f = restrict(self.u_rad[l + 1], self.dim,
                            comp_axes=self._rad_cax)
        blk = jnp.where(cmask, c_from_f, self.u_rad[l][cx + csl])
        self.u_rad[l] = self.u_rad[l].at[cx + csl].set(blk)

    # ---------------------------------------------------------- MHD AMR (CT)
    def _coarse_b_win(self, l, frac, win=None):
        """Time-interpolated parent face fields over level l's window
        footprint (parent-local coords), with one extra face along each
        normal so `prolong_face` can build the mid-plane fine faces.
        Components >= dim are cell-represented (2D Bz, 1D By/Bz)."""
        csl = self._parent_rel_slice(l, win=win)
        ng = self.ng
        dim = self.dim
        out = []
        for d in range(3):
            b_new = self.u_b[l - 1][d]
            b_old = (self.u_b_old[l - 1][d]
                     if self.u_b_old[l - 1] is not None else b_new)
            bi = (1.0 - frac) * b_old + frac * b_new
            sl = []
            for a in range(dim):
                s = csl[a]
                extra = 1 if (a == d and d < dim) else 0
                sl.append(slice(s.start + ng, s.stop + ng + extra))
            out.append(bi[tuple(sl)])
        return out

    def _prolong_b_win(self, l, frac, win=None):
        """Divergence-free prolonged fine interior faces over the window
        (face-field FillPatch/FillCoarsePatch; per-octant fine divergence
        equals the parent cell divergence, so zero stays zero)."""
        bc = self._coarse_b_win(l, frac, win=win)
        dim = self.dim
        fine = []
        for d in range(3):
            if d < dim:
                fine.append(prolong_face(bc[d], d, dim))
            else:
                fine.append(prolong(bc[d], dim, comp_axes=0))
        return fine

    def _prolong_window_b(self, l, win=None):
        """Whole-window face field from the coarse level (init-from-regrid
        path; the coarse covered faces already carry the fine information
        through the CT register correction)."""
        shape = (win if win is not None else self.window[l])[1]
        lev = self._get_level(l, shape)
        fine = self._prolong_b_win(l, 1.0, win=win)
        pads = [(self.ng, self.ng)] * self.dim
        return lev.jit_fill_b(tuple(jnp.pad(f, pads) for f in fine))

    def _set_unmasked_b_from_coarse(self, l, frac):
        """Window ring faces := prolonged, time-interpolated coarse faces
        (the face-field FillPatch). Only faces with NO masked adjacent
        cell are overwritten — mask-adjacent faces belong to the fine CT
        evolution, so the masked interior's div B is never perturbed."""
        dim = self.dim
        ng = self.ng
        fine = self._prolong_b_win(l, frac)
        m = self.masks[l]
        lev = self._get_level(l, self.window[l][1])
        isl = tuple(slice(ng, ng + s) for s in self.window[l][1])
        b = list(self.u_b[l])
        for d in range(3):
            if d < dim:
                pad = [(0, 0)] * dim
                pad[d] = (1, 0)
                mp = jnp.pad(m, pad)
                lo_sl = [slice(None)] * dim
                lo_sl[d] = slice(0, m.shape[d])
                hi_sl = [slice(None)] * dim
                hi_sl[d] = slice(1, m.shape[d] + 1)
                adj = mp[tuple(lo_sl)] | mp[tuple(hi_sl)]
            else:
                adj = m
            cur = b[d][isl]
            b[d] = b[d].at[isl].set(jnp.where(adj, cur, fine[d]))
        self.u_b[l] = lev.jit_fill_b(tuple(b))

    def _ct_fine_register(self, l_fine, ct_f, dt_f, acc_E, acc_FB):
        """Restrict one fine substep's CT data (edge EMFs + cell-B fluxes)
        to parent edges/faces over the window footprint and accumulate the
        time integrals (FluxRegister::FineAdd analog for CT)."""
        dim = self.dim
        ng = self.ng
        nw = self.window[l_fine][1]
        for k, Ef in ct_f["E"].items():
            sl = []
            for a in range(dim):
                extra = 0 if a == k else 1
                sl.append(slice(ng, ng + nw[a] + extra))
            r = restrict_edge(Ef[tuple(sl)], k, dim) * dt_f
            acc_E[k] = r if k not in acc_E else acc_E[k] + r
        for (d, c), Ff in (ct_f.get("FB") or {}).items():
            sl = []
            for a in range(dim):
                extra = 1 if a == d else 0
                sl.append(slice(ng, ng + nw[a] + extra))
            r = restrict_face(Ff[tuple(sl)], d, dim) * dt_f
            key = (d, c)
            acc_FB[key] = r if key not in acc_FB else acc_FB[key] + r

    def _ct_correct_coarse(self, l, ct_c, acc_E, acc_FB, dt):
        """CT flux-register correction of the level-l face field:
        b += curl(ΔE·dt) with ΔE = (accumulated fine-edge EMF integrals −
        coarse EMF · dt) on coarse edges adjacent to covered cells, zero
        elsewhere. The discrete div(curl) vanishes identically, so the
        correction cannot create divergence ANYWHERE; on interior covered
        faces the fine CT updates telescope, so it equals the fine-face
        restriction (avgDown), and on the uncovered interface faces it is
        the EMF reflux — the Balsara divergence-free AMR prescription in
        one formula (reference per-face FluxRegister + EMF consistency,
        Source/mhd/Castro_mhd.cpp). Cell-represented components (2D Bz)
        reflux + avgDown like a conserved scalar."""
        import itertools

        dim = self.dim
        ng = self.ng
        sim = self._sims_at(l)
        n = (tuple(self.geom_full[l].n_cell) if l == 0
             else self.window[l][1])
        csl = self._parent_rel_slice(l + 1)
        cmask = restrict_mask(self.masks[l + 1], dim)
        eps = {(0, 1, 2): 1, (0, 2, 1): -1, (1, 2, 0): 1, (1, 0, 2): -1,
               (2, 0, 1): 1, (2, 1, 0): -1}
        b = list(self.u_b[l])

        for k, Ef_int in acc_E.items():
            Ec = ct_c["E"][k]  # grown level-l edge array
            sl = []
            for a in range(dim):
                s = csl[a]
                extra = 0 if a == k else 1
                sl.append(slice(s.start + ng, s.stop + ng + extra))
            dE = Ef_int - dt * Ec[tuple(sl)]
            # edge mask: adjacent (in the transverse plane) covered cell
            axes = [a for a in range(dim) if a != k]
            mp = jnp.pad(cmask, [(1, 1) if a in axes else (0, 0)
                                 for a in range(dim)])
            adj = None
            for offs in itertools.product((0, 1), repeat=len(axes)):
                sl2 = [slice(None)] * dim
                for a, o in zip(axes, offs):
                    sl2[a] = slice(o, o + cmask.shape[a] + 1)
                v = mp[tuple(sl2)]
                adj = v if adj is None else (adj | v)
            dE = jnp.where(adj, dE, 0.0)
            # scatter into a full-level edge field (zeros elsewhere) so
            # faces just OUTSIDE the footprint also get their edge terms
            full_shape = tuple(n[a] + (0 if a == k else 1)
                               for a in range(dim))
            dE_full = jnp.zeros(full_shape, dE.dtype)
            dE_full = jax.lax.dynamic_update_slice(
                dE_full, dE, tuple(csl[a].start for a in range(dim)))
            for c in axes:
                t = 3 - c - k
                if c >= dim or t >= dim:
                    continue
                hi = [slice(None)] * dim
                hi[t] = slice(1, None)
                lo = [slice(None)] * dim
                lo[t] = slice(0, -1)
                diff = dE_full[tuple(hi)] - dE_full[tuple(lo)]
                upd = -eps[(c, t, k)] * diff / sim.geom.dx[t]
                fsl = []
                for a in range(dim):
                    extra = 1 if a == c else 0
                    fsl.append(slice(ng, ng + n[a] + extra))
                b[c] = b[c].at[tuple(fsl)].add(upd)

        # cell-represented components: flux reflux on interface cells +
        # avgDown on covered cells (plain conserved-scalar semantics)
        cells = tuple(slice(ng, ng + n[a]) for a in range(dim))
        for c in range(dim, 3):
            bc_int = b[c][cells]
            win_v = bc_int[csl]
            for d in range(dim):
                key = (d, c)
                if key not in acc_FB:
                    continue
                Fc = ct_c["FB"][key]
                fsl = []
                for a in range(dim):
                    s = csl[a]
                    extra = 1 if a == d else 0
                    fsl.append(slice(s.start + ng, s.stop + ng + extra))
                delta = acc_FB[key] - dt * Fc[tuple(fsl)]
                pad_lo = [(0, 0)] * dim
                pad_lo[d] = (1, 0)
                pad_hi = [(0, 0)] * dim
                pad_hi[d] = (0, 1)
                m_left = jnp.pad(cmask, pad_lo)
                m_right = jnp.pad(cmask, pad_hi)
                inv_dx = 1.0 / sim.geom.dx[d]
                gain_r = jnp.where(m_left & ~m_right, delta, 0.0)
                lose_l = jnp.where(~m_left & m_right, delta, 0.0)
                sl_hi = [slice(None)] * dim
                sl_hi[d] = slice(1, None)
                sl_lo = [slice(None)] * dim
                sl_lo[d] = slice(0, -1)
                win_v = win_v + inv_dx * gain_r[tuple(sl_lo)]
                win_v = win_v - inv_dx * lose_l[tuple(sl_hi)]
            fine_c = restrict(
                self.u_b[l + 1][c][tuple(slice(ng, ng + s)
                                         for s in self.window[l + 1][1])],
                dim, comp_axes=0)
            win_v = jnp.where(cmask, fine_c, win_v)
            bc_int = bc_int.at[csl].set(win_v)
            b[c] = b[c].at[cells].set(bc_int)

        if l == 0:
            self.u_b[l] = self._jit_fill_b0(tuple(b))
        else:
            lev = self._get_level(l, self.window[l][1])
            self.u_b[l] = lev.jit_fill_b(tuple(b))

    def _mhd_sharded_level0(self, dt, t_level):
        """Level-0 MHD advance under the mesh: the sharded CTU-CT step on
        ghost-free state, then re-grow + refill; the CT register data
        comes back cell-registered and is re-grown with the wrap/edge
        adapter so the register machinery sees the grown-array
        convention. Returns the same tuple as the single-device
        `_jit_mhd_step0`."""
        ng, dim = self.ng, self.dim
        idx = interior_slice(ng, dim)
        isl = idx[1:]
        u_int = self.u[0][idx]
        b_int = tuple(bb[isl] for bb in self.u_b[0])
        out = self._sharded_mhd_step0(u_int, b_int, dt, t_level)
        u_i, b_i, min_rho, bad, fl, E_t, FB_t = out
        b_new = self._jit_fill_b0(tuple(
            jnp.pad(bb, [(ng, ng)] * dim) for bb in b_i))
        pads_u = [(0, 0)] + [(ng, ng)] * dim
        u_new = self._jit_mhd_clean0(jnp.pad(u_i, pads_u), b_new)
        fluxes = []
        for d in range(dim):
            pads = [(0, 0)] * (1 + dim)
            pads[1 + d] = (0, 1)
            fluxes.append(jnp.pad(fl[d], pads))

        def regrow(a):
            for d in range(dim):
                mode = ("wrap" if self.params.castro.lo_bc[d] == 0
                        else "edge")
                p = [(0, 0)] * dim
                p[d] = (ng, ng)
                a = jnp.pad(a, p, mode=mode)
            return a

        e_keys = {3: (0, 1, 2), 2: (2,), 1: ()}[dim]
        fb_keys = tuple((d, c) for c in range(dim, 3)
                        for d in range(dim))
        ct = {"E": {k: regrow(E_t[i]) for i, k in enumerate(e_keys)},
              "FB": {key: regrow(FB_t[i])
                     for i, key in enumerate(fb_keys)}}
        return u_new, b_new, min_rho, bad, fluxes, ct

    def _advance_level(self, l, dt, t_level):
        """Advance level l by dt; recursively subcycle finer levels
        (reference Amr::timeStep recursion)."""
        self.u_old[l] = self.u[l]

        rad_fluxes = None
        if self._has_rad:
            self.u_rad_old[l] = self.u_rad[l]
            rhs_extra = self._rad_sync_rhs.pop(l, None)
            if l == 0 and self._sharded_rad_step0 is not None:
                sim = self.sim0
                idx = interior_slice(self.ng, self.dim)
                if rhs_extra is None:
                    rhs_extra = jnp.zeros_like(self.u_rad[0])
                out = self._sharded_rad_step0(self.u[0][idx], self.u_rad[0],
                                              dt, t_level, rhs_extra)
                if sim.keep_fluxes:
                    u_new_i, Er_new, min_rho, bad, fl = out
                    fluxes = []
                    for d in range(self.dim):
                        pads = [(0, 0)] * (1 + self.dim)
                        pads[1 + d] = (0, 1)
                        fluxes.append(jnp.pad(fl[d], pads))
                else:
                    u_new_i, Er_new, min_rho, bad = out
                    fluxes = None
                pads = [(0, 0)] + [(self.ng, self.ng)] * self.dim
                u_new = sim._jit_clean_fill(jnp.pad(u_new_i, pads))
                # register fluxes from the global sharded field (XLA
                # inserts the halo collectives)
                ui = u_new[idx]
                rad_fluxes = self._jit_rad_flux0(
                    Er_new, ui[sim.layout.URHO], ui[sim.layout.UTEMP])
                out = (u_new, Er_new, min_rho, bad, rad_fluxes, fluxes)
            elif l == 0:
                sim = self.sim0
                out = self._jit_rad_step0(self.u[0], self.u_rad[0], dt,
                                          t_level, rhs_extra)
            else:
                lev = self._get_level(l, self.window[l][1])
                sim = lev.sim
                ilo = jnp.asarray(self.window[l][0])
                out = lev.jit_rad_step(
                    self.u[l], self.u_rad[l], dt, t_level, ilo,
                    grav_bc=self._cur_grav_bc.get(l),
                    rad_bc=self._cur_rad_bc.get(l),
                    rad_rhs_extra=rhs_extra)
            u_new, Er_new, min_rho, bad, rad_fluxes, fluxes = out
            if bool(bad) or float(min_rho) <= 0.0:
                raise RuntimeError(
                    f"AMR rad advance failed at level {l}, t={t_level} "
                    f"(min_rho={float(min_rho)})")
            if l == 0:
                self.u[l] = u_new
                self.u_rad[l] = Er_new
            else:
                idx = interior_slice(self.ng, self.dim)
                keep = jnp.where(self.masks[l][None], u_new[idx],
                                 self.u[l][idx])
                self.u[l] = self.u[l].at[idx].set(keep)
                self.u_rad[l] = jnp.where(self.masks[l], Er_new,
                                          self.u_rad[l])
            return self._advance_finer(l, dt, t_level, fluxes, rad_fluxes)

        if self._has_mhd:
            self.u_b_old[l] = self.u_b[l]
            if l == 0 and self._sharded_mhd_step0 is not None:
                out = self._mhd_sharded_level0(dt, t_level)
            elif l == 0:
                out = self._jit_mhd_step0(self.u[0], self.u_b[0], dt,
                                          t_level)
            else:
                lev = self._get_level(l, self.window[l][1])
                ilo = jnp.asarray(self.window[l][0])
                out = lev.jit_mhd_step(self.u[l], self.u_b[l], dt, t_level,
                                       ilo,
                                       grav_bc=self._cur_grav_bc.get(l))
            u_new, b_new, min_rho, bad, fluxes, ct = out
            if bool(bad) or float(min_rho) <= 0.0:
                raise RuntimeError(
                    f"AMR MHD advance failed at level {l}, t={t_level} "
                    f"(min_rho={float(min_rho)})")
            if l == 0:
                self.u[l] = u_new
            else:
                idx = interior_slice(self.ng, self.dim)
                keep = jnp.where(self.masks[l][None], u_new[idx],
                                 self.u[l][idx])
                self.u[l] = self.u[l].at[idx].set(keep)
            # the whole-window face field is kept; ring faces are refilled
            # from the coarse level before every fine substep
            self.u_b[l] = b_new
            return self._advance_finer(l, dt, t_level, fluxes, ct)

        if l == 0 and self._sharded_step0 is not None:
            sim = self.sim0
            u_int = self.u[l][interior_slice(self.ng, self.dim)]
            out = self._sharded_step0(u_int, dt, t_level)
            if sim.keep_fluxes:
                u_new_i, min_rho, bad, fl = out
                # cell-registered global fluxes -> n+1-face convention
                # (the appended hi-domain plane is never read by _reflux:
                # at a domain-edge window face both reflux masks are 0)
                fluxes = []
                for d in range(self.dim):
                    pads = [(0, 0)] * (1 + self.dim)
                    pads[1 + d] = (0, 1)
                    fluxes.append(jnp.pad(fl[d], pads))
            else:
                u_new_i, min_rho, bad = out
                fluxes = None
            pads = [(0, 0)] + [(self.ng, self.ng)] * self.dim
            out = (sim._jit_clean_fill(jnp.pad(u_new_i, pads)), min_rho,
                   bad) + ((fluxes,) if sim.keep_fluxes else ())
        elif l == 0:
            sim = self.sim0
            out = sim._jit_step(self.u[l], dt, t_level)
        else:
            lev = self._get_level(l, self.window[l][1])
            sim = lev.sim
            ilo = jnp.asarray(self.window[l][0])
            if (lev.jit_sharded_step is not None
                    and self._cur_grav_bc.get(l) is None):
                # distributed fine window (amr.distribute_fine=1)
                u_int = self.u[l][interior_slice(self.ng, self.dim)]
                u_new_i, min_rho, bad, fl = lev.jit_sharded_step(
                    u_int, dt, t_level, ilo)
                fluxes = []
                for d in range(self.dim):
                    pads = [(0, 0)] * (1 + self.dim)
                    pads[1 + d] = (0, 1)
                    fluxes.append(jnp.pad(fl[d], pads))
                pads = [(0, 0)] + [(self.ng, self.ng)] * self.dim
                out = (lev.jit_clean_fill(jnp.pad(u_new_i, pads)),
                       min_rho, bad, fluxes)
            else:
                out = lev.jit_step(self.u[l], dt, t_level, ilo,
                                   grav_bc=self._cur_grav_bc.get(l))
        u_new, min_rho, bad = out[0], out[1], out[2]
        fluxes = out[3] if sim.keep_fluxes else None
        if bool(bad) or float(min_rho) <= 0.0:
            raise RuntimeError(
                f"AMR advance failed at level {l}, t={t_level} "
                f"(min_rho={float(min_rho)})")
        if l == 0:
            self.u[l] = u_new
        else:
            idx = interior_slice(self.ng, self.dim)
            keep = jnp.where(self.masks[l][None], u_new[idx], self.u[l][idx])
            self.u[l] = self.u[l].at[idx].set(keep)

        return self._advance_finer(l, dt, t_level, fluxes, None)

    def _advance_finer(self, l, dt, t_level, fluxes, aux):
        """Subcycle level l+1 (if any), then reflux + avgDown. Returns
        (fluxes, aux) for the parent's own flux registers; `aux` is the
        radiation fluxes (rad runs) or the CT register data (MHD runs)."""
        rad_fluxes = aux if self._has_rad else None
        if l < self.max_level:
            # flux register: coarse side contribution (CrseInit)
            f_coarse = [f * dt for f in fluxes]
            fine_acc = None
            f_coarse_rad_dt = None
            fine_acc_rad = None
            mhd_E_acc: Dict = {}
            mhd_FB_acc: Dict = {}
            if self._has_rad:
                f_coarse_rad_dt = []
                for d in range(self.dim):
                    pads = [(0, 0)] * (self._rad_cax + self.dim)
                    pads[self._rad_cax + d] = (0, 1)
                    f_coarse_rad_dt.append(jnp.pad(rad_fluxes[d], pads) * dt)

            # composite gravity: this level's old/new phi bracket the
            # subcycle window for time-interpolated fine boundary data.
            # The new-time phi gets the delta-phi SYNC correction
            # (Gravity::gravity_sync) so the window Dirichlet data is
            # composite-consistent (flux-matched at the interface).
            phi_old = phi_new = None
            if self._has_poisson:
                phi_old = self._solve_phi(l, self.u_old[l])
                phi_new = self._solve_phi_sync(l, self.u[l])

            extras = self.extra[l + 1]
            fine_acc_extra = [None] * len(extras)

            r = self.ref_ratio
            for i in range(r):
                frac0 = i / r
                fm = (i + 0.5) / r  # midpoint of the substep
                if phi_old is not None:
                    phi_mid = (1.0 - fm) * phi_old + fm * phi_new
                    self._cur_grav_bc[l + 1] = self._window_face_bc(
                        l + 1, phi_mid)
                    for e in extras:
                        e["grav_bc"] = self._window_face_bc(
                            l + 1, phi_mid, win=(e["ilo"], e["shape"]))
                if self._has_rad:
                    Er_mid = (1.0 - fm) * self.u_rad_old[l] + \
                        fm * self.u_rad[l]
                    self._cur_rad_bc[l + 1] = self._window_face_bc(
                        l + 1, Er_mid)
                    self._set_unmasked_rad_from_coarse(l + 1, frac0)
                if self._has_mhd:
                    self._set_unmasked_b_from_coarse(l + 1, frac0)
                self._set_unmasked_from_coarse(l + 1, frac0 + 0.0)
                fine_fluxes, fine_rad = self._advance_level(
                    l + 1, dt / r, t_level + i * dt / r)
                if self._has_mhd:
                    self._ct_fine_register(l + 1, fine_rad, dt / r,
                                           mhd_E_acc, mhd_FB_acc)
                if fine_acc is None:
                    fine_acc = [jnp.zeros_like(coarsen_flux(
                        fine_fluxes[d], d, self.dim)) for d in range(self.dim)]
                for d in range(self.dim):
                    fine_acc[d] = fine_acc[d] + coarsen_flux(
                        fine_fluxes[d], d, self.dim) * (dt / r)
                # patch-batch extras: ring fill + batched advance +
                # accumulate (equal-shape windows step as one vmapped
                # [npatch, ...] program)
                for e in extras:
                    e["u"] = self._ring_fill(l + 1, frac0,
                                             (e["ilo"], e["shape"]),
                                             e["u"], e["mask"])
                fl_all = self._advance_extras_batch(
                    l + 1, extras, dt / r, t_level + i * dt / r)
                for kx, fl_e in enumerate(fl_all):
                    fc = [coarsen_flux(fl_e[d], d, self.dim) * (dt / r)
                          for d in range(self.dim)]
                    fine_acc_extra[kx] = (fc if fine_acc_extra[kx] is None
                                          else [a + b for a, b in
                                                zip(fine_acc_extra[kx], fc)])
                if self._has_rad:
                    frc = []
                    for d in range(self.dim):
                        pads = [(0, 0)] * (self._rad_cax + self.dim)
                        pads[self._rad_cax + d] = (0, 1)
                        frc.append(coarsen_flux(
                            jnp.pad(fine_rad[d], pads), d, self.dim,
                            comp_axes=self._rad_cax) * (dt / r))
                    fine_acc_rad = (frc if fine_acc_rad is None else
                                    [a + b for a, b in
                                     zip(fine_acc_rad, frc)])
            self._set_unmasked_from_coarse(l + 1, 1.0)
            for e in extras:
                e["u"] = self._ring_fill(l + 1, 1.0, (e["ilo"], e["shape"]),
                                         e["u"], e["mask"])
            if self._has_rad:
                self._set_unmasked_rad_from_coarse(l + 1, 1.0)
            if self._has_mhd:
                self._set_unmasked_b_from_coarse(l + 1, 1.0)
                # CT register FIRST: the gas avgDown's MHD clean re-derives
                # eint/T against the corrected coarse face field
                self._ct_correct_coarse(l, aux, mhd_E_acc, mhd_FB_acc, dt)

            # reflux (FluxRegister::Reflux): correct unrefined-side coarse
            # cells with (sum fine flux dt) - (coarse flux dt)
            self._reflux(l, f_coarse, fine_acc)
            # avgDown: covered coarse cells from the fine average
            self._avg_down(l)
            for kx, e in enumerate(extras):
                self._reflux(l, f_coarse, fine_acc_extra[kx],
                             fwin=(e["ilo"], e["shape"]), fmask=e["mask"])
                self._avg_down(l, fwin=(e["ilo"], e["shape"]),
                               fmask=e["mask"], fu=e["u"])
            if self._has_rad:
                # deferred sync: mismatch feeds the NEXT level-l implicit
                # solve's rhs (Radiation::deferred_sync semantics)
                self._rad_sync_rhs[l] = self._rad_reflux_rhs(
                    l, f_coarse_rad_dt, fine_acc_rad)
                self._rad_avg_down(l)

        return fluxes, aux

    def _advance_extras_batch(self, l, extras, dt, t_level):
        """Advance all patch-batch extras by dt. Equal-shape windows with
        no per-window gravity BC step as ONE [npatch, ...] vmapped
        program (SURVEY §7 batched-patch design; the BoxArray analog) —
        under a mesh the batch axis is SHARDED over the first mesh axis
        when it divides evenly, so patches distribute across devices
        instead of computing replicated. Returns per-extra flux lists."""
        out_fluxes = [None] * len(extras)
        groups: Dict = {}
        for i, e in enumerate(extras):
            if e.get("grav_bc") is not None or self.sim0.sdc is not None:
                # per-window path: gravity-BC windows (the Dirichlet face
                # planes aren't batched) and SDC runs (jit_step_batch
                # wraps the CTU program; SDC windows use their own step)
                out_fluxes[i] = self._advance_extra(l, e, dt, t_level)
            else:
                groups.setdefault(tuple(e["shape"]), []).append(i)
        for shape, idxs in groups.items():
            if len(idxs) == 1:
                i = idxs[0]
                out_fluxes[i] = self._advance_extra(l, extras[i], dt,
                                                    t_level)
                continue
            lev = self._get_level(l, shape)
            U = jnp.stack([extras[i]["u"] for i in idxs])
            ILO = jnp.stack([jnp.asarray(extras[i]["ilo"])
                             for i in idxs])
            if (self.mesh is not None
                    and U.shape[0] % self.mesh.devices.shape[0] == 0):
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P

                U = jax.device_put(U, NamedSharding(
                    self.mesh, P(self.mesh.axis_names[0])))
            u_new, min_rho, bad, fluxes = lev.jit_step_batch(
                U, dt, t_level, ILO)
            for bi, i in enumerate(idxs):
                if bool(bad[bi]) or float(min_rho[bi]) <= 0.0:
                    raise RuntimeError(
                        f"AMR advance failed (extra batch) at level {l}, "
                        f"t={t_level} (min_rho={float(min_rho[bi])})")
                e = extras[i]
                idx = interior_slice(self.ng, self.dim)
                keep = jnp.where(e["mask"][None], u_new[bi][idx],
                                 e["u"][idx])
                e["u"] = e["u"].at[idx].set(keep)
                out_fluxes[i] = [fluxes[d][bi] for d in range(self.dim)]
        return out_fluxes

    def _advance_extra(self, l, e, dt, t_level):
        """Advance one patch-batch extra window by dt (same per-shape
        compiled program cache as the primary window)."""
        lev = self._get_level(l, e["shape"])
        ilo = jnp.asarray(e["ilo"])
        out = lev.jit_step(e["u"], dt, t_level, ilo,
                           grav_bc=e.get("grav_bc"))
        u_new, min_rho, bad = out[0], out[1], out[2]
        fluxes = out[3]
        if bool(bad) or float(min_rho) <= 0.0:
            raise RuntimeError(
                f"AMR advance failed (extra window) at level {l}, "
                f"t={t_level} (min_rho={float(min_rho)})")
        idx = interior_slice(self.ng, self.dim)
        keep = jnp.where(e["mask"][None], u_new[idx], e["u"][idx])
        e["u"] = e["u"].at[idx].set(keep)
        return fluxes

    def _reflux(self, l, f_coarse, fine_acc, fwin=None, fmask=None):
        """fine_acc: window-coarsened fine-flux sums (over the level-(l+1)
        window's coarse footprint); f_coarse: full (or parent-window)
        coarse fluxes. All corrections live inside the window footprint."""
        sim = self._sims_at(l)
        dim = self.dim
        csl = self._parent_rel_slice(l + 1, win=fwin)
        cmask = restrict_mask(fmask if fmask is not None
                              else self.masks[l + 1], dim)
        idx = interior_slice(self.ng, dim)
        u_int = self.u[l][idx]
        win = u_int[(slice(None),) + csl]
        for d in range(dim):
            # coarse flux faces covering the window footprint (n_win+1
            # along d)
            fsl = [slice(None)]
            for k in range(dim):
                s = csl[k]
                fsl.append(slice(s.start, s.stop + 1) if k == d else s)
            delta = fine_acc[d] - f_coarse[d][tuple(fsl)]
            pad_lo = [(0, 0)] * cmask.ndim
            pad_lo[d] = (1, 0)
            pad_hi = [(0, 0)] * cmask.ndim
            pad_hi[d] = (0, 1)
            m_left = jnp.pad(cmask, pad_lo)
            m_right = jnp.pad(cmask, pad_hi)
            inv_dx = 1.0 / sim.geom.dx[d]

            gain_r = jnp.where((m_left & ~m_right)[None], delta, 0.0)
            lose_l = jnp.where((~m_left & m_right)[None], delta, 0.0)

            sl_hi = [slice(None)] * delta.ndim
            sl_hi[1 + d] = slice(1, None)
            sl_lo = [slice(None)] * delta.ndim
            sl_lo[1 + d] = slice(0, -1)
            win = win + inv_dx * gain_r[tuple(sl_lo)]
            win = win - inv_dx * lose_l[tuple(sl_hi)]
        u_int = u_int.at[(slice(None),) + csl].set(win)
        self.u[l] = self.u[l].at[idx].set(u_int)

    def _avg_down(self, l, fwin=None, fmask=None, fu=None):
        dim = self.dim
        csl = self._parent_rel_slice(l + 1, win=fwin)
        cmask = restrict_mask(fmask if fmask is not None
                              else self.masks[l + 1], dim)
        f_int = (fu if fu is not None
                 else self.u[l + 1])[interior_slice(self.ng, dim)]
        c_from_f = restrict(f_int, dim)
        idx = interior_slice(self.ng, dim)
        u_int = self.u[l][idx]
        blk = jnp.where(cmask[None], c_from_f, u_int[(slice(None),) + csl])
        u_int = u_int.at[(slice(None),) + csl].set(blk)
        self.u[l] = self.u[l].at[idx].set(u_int)
        if self._has_mhd:
            if l == 0:
                self.u[l] = self._jit_mhd_clean0(self.u[l], self.u_b[l])
            else:
                lev = self._get_level(l, self.window[l][1])
                self.u[l] = lev.jit_mhd_clean(self.u[l], self.u_b[l])
        elif l == 0:
            self.u[l] = self.sim0._jit_clean_fill(self.u[l])
        else:
            lev = self._get_level(l, self.window[l][1])
            self.u[l] = lev.jit_clean_fill(self.u[l])

    def advance(self, dt):
        """Advance the whole hierarchy by dt with retry (reference
        retry_advance_ctu lifted to the hierarchy: on any level failure,
        restore the pre-step hierarchy and re-run subcycled)."""
        c = self.params.castro
        snap_u = list(self.u)
        snap_masks = list(self.masks)
        snap_rad = list(self.u_rad)
        snap_b = list(self.u_b)
        snap_sync = dict(self._rad_sync_rhs)
        snap_extra = [[dict(e) for e in lvl] for lvl in self.extra]

        def restore():
            self.u = list(snap_u)
            self.masks = list(snap_masks)
            self.u_rad = list(snap_rad)
            self.u_b = list(snap_b)
            self._rad_sync_rhs = dict(snap_sync)
            self.extra = [[dict(e) for e in lvl] for lvl in snap_extra]

        try:
            self._advance_level(0, dt, self.t)
            self.t += dt
            self._count_zones(1)
            return dt
        except RuntimeError:
            if not c.use_retry:
                raise

        dt_sub = dt * c.retry_subcycle_factor
        for _ in range(c.max_subcycles):
            restore()
            t_adv = 0.0
            nsub = 0
            try:
                while t_adv < dt * (1 - 1e-12):
                    step = min(dt_sub, dt - t_adv)
                    self._advance_level(0, step, self.t + t_adv)
                    t_adv += step
                    nsub += 1
                self.t += dt
                self._count_zones(nsub)
                return dt
            except RuntimeError:
                dt_sub *= c.retry_subcycle_factor
                if dt_sub < c.dt_cutoff:
                    break
        restore()
        raise RuntimeError(
            f"AMR advance failed at t={self.t}: dt_sub={dt_sub} below cutoff")

    def _count_zones(self, nsub):
        zones = int(np.prod(self.sim0.geom.n_cell))
        for l in range(1, self.max_level + 1):
            zones += int(np.prod(self.window[l][1])) * self.ref_ratio**l
            for e in self.extra[l]:
                zones += int(np.prod(e["shape"])) * self.ref_ratio**l
        self.num_zones_advanced += zones * nsub
        return zones

    # ------------------------------------------------------------------ loop
    def run(self, max_step=None, stop_time=None, verbose=None):
        a = self.params.amr
        max_step = max_step if max_step is not None else (
            a.max_step if a.max_step >= 0 else 10**9)
        stop_time = stop_time if stop_time is not None else (
            a.stop_time if a.stop_time >= 0 else np.inf)
        verbose = self.params.castro.v if verbose is None else verbose

        if self.u[0] is None:
            self.init_data()

        from castro_tpu.driver import io as io_mod

        def maybe_io():
            if a.plot_int > 0 and self.step_count % a.plot_int == 0:
                io_mod.write_plotfile_amr(self)
            if a.check_int > 0 and self.step_count % a.check_int == 0:
                io_mod.write_checkpoint_amr(self)

        while self.step_count < max_step and self.t < stop_time * (1 - 1e-12):
            if (self.params.amr.regrid_int > 0 and self.step_count > 0
                    and self.step_count % self.params.amr.regrid_int == 0):
                self.regrid()
            dt = self.estimate_dt()
            if self.t + dt > stop_time:
                dt = stop_time - self.t
            self.advance(dt)
            self.dt = dt
            self.step_count += 1
            if verbose:
                nref = int(self.masks[1].sum()) if self.max_level > 0 else 0
                win = self.window[1][1] if self.max_level > 0 else ()
                print(f"STEP {self.step_count} t={self.t:.6e} dt={dt:.6e} "
                      f"refined_cells_l1={nref} window_l1={win}")
            maybe_io()
        return self

    # ------------------------------------------------------------------ views
    def interior(self, l=0):
        return self.u[l][interior_slice(self.ng, self.dim)]

    def composite_interior(self):
        """Finest-available data represented on the finest grid."""
        out = self.interior(0)
        for l in range(1, self.max_level + 1):
            out = prolong(out, self.dim, conservative=False)
            wins = [(self.window[l], self.u[l], self.masks[l])] + [
                ((e["ilo"], e["shape"]), e["u"], e["mask"])
                for e in self.extra[l]]
            for (ilo, shape), u_w, m_w in wins:
                fine = u_w[interior_slice(self.ng, self.dim)]
                blk_sl = (slice(None),) + tuple(
                    slice(int(ilo[k]), int(ilo[k]) + shape[k])
                    for k in range(self.dim))
                blk = jnp.where(m_w[None], fine, out[blk_sl])
                out = out.at[blk_sl].set(blk)
        return out
