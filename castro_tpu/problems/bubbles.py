"""Buoyant-bubble test problems (reference `Exec/hydro_tests/gamma_law_bubble`
and `Exec/hydro_tests/double_bubble`): hydrostatic plane-parallel atmospheres
with one or two perturbed bubbles rising under constant gravity.

- gamma_law_bubble: isobaric temperature perturbation
  (`gamma_law_bubble/problem_initialize_state_data.H:45-59`,
  `initial_model.H` isothermal/isentropic HSE column).
- double_bubble: two density-deficit bubbles of different species on a
  multigamma EOS so they buoy identically but evolve with different
  gamma (`double_bubble/problem_initialize_state_data.H:37-120`,
  `_prob_params`).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from castro_tpu.config import Params
from castro_tpu.problems.util import fill_from_prim

# _prob_params defaults shared by both problems
DEFAULTS = dict(pert_factor=8.1e-3, dens_base=1.65e-3, pres_base=1.65e6,
                y_pert_center=0.7, pert_width=0.025, do_isentropic=0,
                single=0, left_bubble_x_center=0.75,
                right_bubble_x_center=1.25)
G_CONST = -1.0e9  # inputs_2d gravity.const_grav


def _hse_column(y, dens_base, pres_base, g, gamma, do_isentropic):
    """The `initial_model.H` HSE column: analytic isothermal (exp) or
    isentropic density profile + midpoint hydrostatic pressure integration
    (double_bubble/initial_model.H:36-115)."""
    y = np.asarray(y, dtype=float)
    H = pres_base / dens_base / abs(g)
    y0 = y[0]
    if do_isentropic:
        # e = p/((gamma-1) rho); gamma_const = p/(rho e) + 1 = gamma
        rho = dens_base * np.maximum(
            g * dens_base * (gamma - 1.0) * (y - y0) /
            (gamma * pres_base) + 1.0, 1e-30) ** (1.0 / (gamma - 1.0))
    else:
        rho = dens_base * np.exp(-(y - y0) / H)
    p = np.empty_like(rho)
    p[0] = pres_base
    dy = y[1] - y[0]
    for j in range(1, len(y)):
        p[j] = p[j - 1] - dy * 0.5 * (rho[j] + rho[j - 1]) * abs(g)
    return rho, p


def _base_params(n, eos_ns, lo_bc=(0, 1), hi_bc=(0, 1), stop_time=4.5e-5,
                 **prob):
    merged = dict(DEFAULTS)
    merged.update(prob)
    p = Params()
    p = p.with_ns("amr", n_cell=tuple(n), stop_time=stop_time)
    p = p.with_ns("geometry", prob_lo=(0.0, 0.0, 0.0),
                  prob_hi=(2.0, 2.0, 1.0))
    p = p.with_ns("castro", lo_bc=tuple(lo_bc) + (0,),
                  hi_bc=tuple(hi_bc) + (0,), cfl=0.5, do_grav=1,
                  ppm_type=1, use_flattening=1,
                  small_dens=1e-8, small_temp=1e-8, small_pres=1e-12)
    p = p.with_ns("gravity", gravity_type="ConstantGrav", const_grav=G_CONST)
    for k, v in eos_ns.items():
        p = p.with_ns("eos", **{k: v})
    p = p.with_ns("tpu", dtype="float64")
    return p.replace(problem=merged)


def gamma_law_params(n=(128, 128), gamma=1.4, **prob):
    return _base_params(n, dict(eos_gamma=gamma), **prob)


def gamma_law_init(sim, u):
    """Isobaric T bump: T *= 1 + pert_factor*(1 + tanh(2 - r/width)),
    rho from EOS(T, p) (gamma_law_bubble state init)."""
    pp = dict(DEFAULTS)
    pp.update(sim.params.problem)
    g = sim.geom
    shape = u.shape[1:]
    y1 = np.asarray(g.cell_centers_1d(1, sim.ng))
    rho1, p1 = _hse_column(y1, pp["dens_base"], pp["pres_base"], G_CONST,
                           sim.eos.gamma, pp["do_isentropic"])
    bshape = [1] * len(shape)
    bshape[1] = shape[1]
    rho = jnp.broadcast_to(jnp.asarray(rho1).reshape(bshape), shape)
    p = jnp.broadcast_to(jnp.asarray(p1).reshape(bshape), shape)

    x = jnp.broadcast_to(g.cell_centers(0, sim.ng), shape)
    y = jnp.broadcast_to(g.cell_centers(1, sim.ng), shape)
    x1 = 0.5 * (g.prob_lo[0] + g.prob_hi[0])
    r1 = jnp.sqrt((x - x1) ** 2 + (y - pp["y_pert_center"]) ** 2) / pp["pert_width"]

    # T of the unperturbed column (gamma law: T ~ p/rho up to constants)
    es0 = sim.eos.rp(rho=rho, p=p)
    T = es0.T * (1.0 + pp["pert_factor"] * (1.0 + jnp.tanh(2.0 - r1)))
    # isobaric: recompute rho at (T, p) — gamma law: rho ~ p/T
    rho_pert = rho * es0.T / T
    return fill_from_prim(sim, u, rho_pert, (0.0, 0.0, 0.0), p=p)


def double_bubble_params(n=(128, 128), gammas=(1.666, 1.4, 1.666), **prob):
    """Multigamma EOS: species 0 = ambient, 1 = left bubble, 2 = right
    bubble (double_bubble/GNUmakefile EOS_DIR=multigamma)."""
    p = _base_params(n, dict(eos_name="multigamma"), **prob)
    p = p.with_ns("network", network_name="general_null",
                  spec_names=("X", "A", "B"))
    return p.replace(extra=dict(p.extra, **{"eos.species_gammas": tuple(gammas)}))


def double_bubble_init(sim, u):
    """Two rho-deficit bubbles with species swapped to pure bubble species;
    e from EOS(rho_pert, p) at fixed pressure
    (double_bubble/problem_initialize_state_data.H:48-120)."""
    pp = dict(DEFAULTS)
    pp.update(sim.params.problem)
    g = sim.geom
    shape = u.shape[1:]
    y1 = np.asarray(g.cell_centers_1d(1, sim.ng))
    # gamma of the ambient species for the isentropic branch
    gam0 = float(getattr(sim.eos, "gammas", [1.666])[0]) if hasattr(sim.eos, "gammas") else 1.666
    rho1, p1 = _hse_column(y1, pp["dens_base"], pp["pres_base"], G_CONST,
                           gam0, pp["do_isentropic"])
    bshape = [1] * len(shape)
    bshape[1] = shape[1]
    rho = jnp.broadcast_to(jnp.asarray(rho1).reshape(bshape), shape)
    p = jnp.broadcast_to(jnp.asarray(p1).reshape(bshape), shape)

    x = jnp.broadcast_to(g.cell_centers(0, sim.ng), shape)
    y = jnp.broadcast_to(g.cell_centers(1, sim.ng), shape)
    yc = pp["y_pert_center"]
    w = pp["pert_width"]
    if pp["single"]:
        centers = [(0.5 * (g.prob_lo[0] + g.prob_hi[0]), 1)]
    else:
        centers = [(pp["left_bubble_x_center"], 1),
                   (pp["right_bubble_x_center"], 2)]

    pert = jnp.zeros(shape, u.dtype)
    nspec = sim.layout.nspec
    xn = jnp.zeros((nspec,) + shape, u.dtype).at[0].set(1.0)
    for xc, isp in centers:
        r = jnp.sqrt((x - xc) ** 2 + (y - yc) ** 2) / w
        inb = r < 2.0
        pert = jnp.where(inb, pp["pert_factor"] * (1.0 + jnp.tanh(2.0 - r)), pert)
        for m in range(nspec):
            xn = xn.at[m].set(jnp.where(inb, 1.0 if m == isp else 0.0, xn[m]))
    rho_pert = rho * (1.0 - pert)
    return fill_from_prim(sim, u, rho_pert, (0.0, 0.0, 0.0), p=p, xn=xn)
