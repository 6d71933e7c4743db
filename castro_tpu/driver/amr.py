"""Block-structured AMR driver: subcycled level hierarchy with fillpatch,
refluxing and averaging-down.

Reference semantics: AMReX `Amr::coarseTimeStep` recursion + Castro's
subcycling (`Castro_advance_ctu.cpp:504`), FillPatch space-time
interpolation at coarse-fine boundaries, `FluxRegister` refluxing
(`Source/driver/Castro.cpp:2549-2700`), `avgDown`, and `errorEst` tagging.

TPU-first representation (round 1): each level is a DENSE full-domain array
at its resolution plus a boolean refinement mask, so fillpatch/reflux/
avgDown are pure dense XLA ops (where / strided reshape / pad) with zero
host gather-scatter — the XLA-friendly extreme of the patch-batch design in
SURVEY.md §7. Unmasked fine cells always carry time-interpolated coarse
data, which doubles as the coarse-fine ghost region for the stencil.
Compute on unmasked cells is wasted (masked out) — patch-batch compaction
is the planned optimization; the semantics here are the contract.

Refinement ratio: 2 (per level), matching amr.ref_ratio defaults.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from castro_tpu.config import Params
from castro_tpu.driver.sim import Simulation, StepStatus
from castro_tpu.driver.tagging import tag_cells
from castro_tpu.ops.interlevel import (coarsen_flux, prolong, prolong_mask,
                                       restrict, restrict_mask)
from castro_tpu.ops.stencil import interior_slice


def _refined_params(params: Params, level: int) -> Params:
    r = 2**level
    n_cell = tuple(n * r for n in params.amr.n_cell)
    p = params.with_ns("amr", n_cell=n_cell)
    if level > 0:
        # dense masked fine levels carry fill values outside the refined
        # region; the whole-grid CFL scan would see them (the patch-batch
        # redesign restores the per-level check)
        p = p.with_ns("castro", check_cfl_violation=0)
    return p


class AmrSimulation:
    """Owns the level hierarchy; each level wraps a Simulation (its own
    geometry + jitted step at that resolution)."""

    def __init__(self, params: Params, problem_init: Optional[Callable] = None,
                 problem_tagging: Optional[Callable] = None, **sim_kw):
        self.params = params
        self.max_level = params.amr.max_level
        self.ref_ratio = 2
        self.problem_tagging = problem_tagging
        self.indicators = self._parse_indicators(params)

        self.sims: List[Simulation] = []
        for l in range(self.max_level + 1):
            sim = Simulation(_refined_params(params, l),
                             problem_init=problem_init, **sim_kw)
            sim.keep_fluxes = l > 0 or self.max_level > 0
            self.sims.append(sim)

        self.u: List[jnp.ndarray] = [None] * (self.max_level + 1)
        self.u_old: List[jnp.ndarray] = [None] * (self.max_level + 1)
        self.masks: List[jnp.ndarray] = [None] * (self.max_level + 1)
        self.t = 0.0
        self.step_count = 0
        self.dt = None
        self.num_zones_advanced = 0

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

    def _mask_grown(self, l):
        """Mask broadcast over the grown array (ghosts = False)."""
        sim = self.sims[l]
        m = self.masks[l]
        pads = [(sim.ng, sim.ng)] * sim.layout.dim
        return jnp.pad(m, pads)

    def init_data(self):
        """Initial hierarchy generation (reference Amr::init loop: init
        level 0, tag, create level 1, init from problem data, repeat)."""
        for l in range(self.max_level + 1):
            self.sims[l].init_data()
            self.u[l] = self.sims[l].u
        self.masks[0] = jnp.ones(self.sims[0].geom.n_cell, bool)
        for l in range(self.max_level):
            self.masks[l + 1] = jnp.zeros(self.sims[l + 1].geom.n_cell, bool)
        # problem data is exact everywhere at t=0: tag, but do not replace
        # fine data with prolonged coarse data (reference Amr::init does the
        # same — initData per level, then grids)
        self.regrid(fill_new=False)
        return self

    # ------------------------------------------------------------------ regrid
    def regrid(self, fill_new=True):
        """Re-tag every level (reference Amr regrid; ratio-2 dense masks)."""
        for l in range(self.max_level):
            sim = self.sims[l]
            u_int = self.u[l][interior_slice(sim.ng, sim.layout.dim)]
            tags = tag_cells(sim, u_int, self.indicators, l,
                             self.params.amr.n_error_buf, self.problem_tagging)
            tags = tags & self.masks[l]  # proper nesting
            new_mask = prolong_mask(tags, sim.layout.dim)
            fsim = self.sims[l + 1]
            newly = new_mask & ~self.masks[l + 1]
            if self.u[l + 1] is not None and fill_new:
                # fill newly-refined cells from the coarse level
                coarse_int = self.u[l][interior_slice(sim.ng, sim.layout.dim)]
                fine_from_coarse = prolong(coarse_int, sim.layout.dim)
                u_int_f = self.u[l + 1][interior_slice(fsim.ng, fsim.layout.dim)]
                u_int_f = jnp.where(newly[None], fine_from_coarse, u_int_f)
                idx = interior_slice(fsim.ng, fsim.layout.dim)
                self.u[l + 1] = self.u[l + 1].at[idx].set(u_int_f)
            self.masks[l + 1] = new_mask

    # ------------------------------------------------------------------ dt
    def estimate_dt(self) -> float:
        """Level-0 dt respecting all levels (reference computeNewDt with
        subcycling: dt_0 = min_l dt_l * prod(ref_ratio))."""
        c = self.params.castro
        dt = np.inf
        for l in range(self.max_level + 1):
            dt_l = float(self.sims[l]._jit_estdt(self.u[l]))
            dt = min(dt, dt_l * self.ref_ratio**l)
        if self.step_count == 0:
            dt *= c.init_shrink
        elif self.dt is not None:
            dt = min(dt, c.change_max * self.dt)
        return min(dt, c.max_dt)

    # ------------------------------------------------------------------ advance
    def _set_unmasked_from_coarse(self, l, frac):
        """Fine unmasked cells := prolonged coarse data time-interpolated
        between the coarse old/new states (FillPatch time interp)."""
        csim, fsim = self.sims[l - 1], self.sims[l]
        dim = csim.layout.dim
        c_interp = (1.0 - frac) * self.u_old[l - 1] + frac * self.u[l - 1]
        c_int = c_interp[interior_slice(csim.ng, dim)]
        fine = prolong(c_int, dim)
        idx = interior_slice(fsim.ng, dim)
        mg = self.masks[l][None]
        u_int = self.u[l][idx]
        self.u[l] = self.u[l].at[idx].set(jnp.where(mg, u_int, fine))

    def _advance_level(self, l, dt, t_level):
        """Advance level l by dt; recursively subcycle finer levels
        (reference Amr::timeStep recursion)."""
        sim = self.sims[l]
        dim = sim.layout.dim
        self.u_old[l] = self.u[l]

        out = sim._jit_step(self.u[l], dt, t_level)
        u_new, min_rho, bad, fluxes = (out if sim.keep_fluxes
                                       else (*out, None))
        if bool(bad) or float(min_rho) <= 0.0:
            raise RuntimeError(
                f"AMR advance failed at level {l}, t={t_level} "
                f"(min_rho={float(min_rho)})")
        if l == 0:
            self.u[l] = u_new
        else:
            idx = interior_slice(sim.ng, dim)
            keep = jnp.where(self.masks[l][None], u_new[idx], self.u[l][idx])
            self.u[l] = self.u[l].at[idx].set(keep)

        if l < self.max_level:
            # flux register: coarse side contribution (CrseInit)
            f_coarse = [f * dt for f in fluxes]
            fine_acc = [jnp.zeros_like(f) for f in f_coarse]

            r = self.ref_ratio
            for i in range(r):
                frac0 = i / r
                self._set_unmasked_from_coarse(l + 1, frac0 + 0.0)
                fine_fluxes = self._advance_level(l + 1, dt / r,
                                                  t_level + i * dt / r)
                for d in range(dim):
                    fine_acc[d] = fine_acc[d] + coarsen_flux(
                        fine_fluxes[d], d, dim) * (dt / r)
            self._set_unmasked_from_coarse(l + 1, 1.0)

            # reflux (FluxRegister::Reflux): correct unrefined-side coarse
            # cells with (sum fine flux dt) - (coarse flux dt)
            self._reflux(l, f_coarse, fine_acc)
            # avgDown: covered coarse cells from the fine average
            self._avg_down(l)

        return fluxes

    def _reflux(self, l, f_coarse, fine_acc):
        sim = self.sims[l]
        dim = sim.layout.dim
        cmask = restrict_mask(self.masks[l + 1], dim)
        idx = interior_slice(sim.ng, dim)
        u_int = self.u[l][idx]
        for d in range(dim):
            delta = fine_acc[d] - f_coarse[d]  # [NVAR, faces...] (n+1 along d)
            # face i between cells i-1, i (face array index i in [0..n])
            pad_lo = [(0, 0)] * cmask.ndim
            pad_lo[d] = (1, 0)
            pad_hi = [(0, 0)] * cmask.ndim
            pad_hi[d] = (0, 1)
            m_left = jnp.pad(cmask, pad_lo)  # mask of cell i-1 at face i
            m_right = jnp.pad(cmask, pad_hi)  # mask of cell i at face i
            inv_dx = 1.0 / sim.geom.dx[d]

            # refined on the left, unrefined right cell i gains +delta
            gain_r = jnp.where((m_left & ~m_right)[None], delta, 0.0)
            # refined on the right, unrefined left cell i-1 loses delta
            lose_l = jnp.where((~m_left & m_right)[None], delta, 0.0)

            sl_hi = [slice(None)] * delta.ndim
            sl_hi[1 + d] = slice(1, None)
            sl_lo = [slice(None)] * delta.ndim
            sl_lo[1 + d] = slice(0, -1)
            u_int = u_int + inv_dx * gain_r[tuple(sl_lo)]
            u_int = u_int - inv_dx * lose_l[tuple(sl_hi)]
        self.u[l] = self.u[l].at[idx].set(u_int)

    def _avg_down(self, l):
        sim, fsim = self.sims[l], self.sims[l + 1]
        dim = sim.layout.dim
        cmask = restrict_mask(self.masks[l + 1], dim)
        f_int = self.u[l + 1][interior_slice(fsim.ng, dim)]
        c_from_f = restrict(f_int, dim)
        idx = interior_slice(sim.ng, dim)
        u_int = jnp.where(cmask[None], c_from_f, self.u[l][idx])
        self.u[l] = self.u[l].at[idx].set(u_int)
        self.u[l] = self.sims[l]._jit_clean_fill(self.u[l])

    def advance(self, dt):
        self._advance_level(0, dt, self.t)
        self.t += dt
        zones = 0
        for l in range(self.max_level + 1):
            mult = self.ref_ratio**l if l > 0 else 1
            n_act = int(np.prod(self.sims[l].geom.n_cell)) if l == 0 else None
            zones += int(np.prod(self.sims[l].geom.n_cell)) * (1 if l == 0 else mult)
        self.num_zones_advanced += zones
        return dt

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
                print(f"STEP {self.step_count} t={self.t:.6e} dt={dt:.6e} "
                      f"refined_cells_l1={nref}")
        return self

    # ------------------------------------------------------------------ views
    def interior(self, l=0):
        sim = self.sims[l]
        return self.u[l][interior_slice(sim.ng, sim.layout.dim)]

    def composite_interior(self):
        """Finest-available data represented on the finest grid."""
        dim = self.sims[0].layout.dim
        out = self.interior(0)
        for l in range(1, self.max_level + 1):
            out = prolong(out, dim, conservative=False)
            fine = self.interior(l)
            out = jnp.where(self.masks[l][None], fine, out)
        return out
