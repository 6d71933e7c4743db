"""Reacting convergence-test problems (reference
`Exec/reacting_tests/{reacting_convergence,bubble_convergence,nse_test}`).

- reacting_convergence: isentropic pressure bump in a triple-alpha fuel
  ball; measures the convergence order of the coupled hydro+reactions
  advance (`problem_initialize_state_data.H` uses eos_input_ps; here the
  isentrope through (rho0, T0) is tabulated and inverted in p).
- bubble_convergence: hot bubble in an isentropic HSE atmosphere with
  He/C/O triple-alpha burning under constant gravity.
- nse_test: temperature/Ye-perturbed iron-group ball initialized from
  the NSE distribution (aprox19 + on-device NSE solver).
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from castro_tpu.config import Params
from castro_tpu.problems.util import fill_from_prim

RC_DEFAULTS = dict(rho0=5.0e5, T0=3.0e8, dp_fact=2.0, L_pert=2.0e7)


def reacting_convergence_params(n=64, dim=2, **prob):
    merged = dict(RC_DEFAULTS)
    merged.update(prob)
    p = Params()
    p = p.with_ns("amr", n_cell=(n,) * dim, stop_time=0.06)
    p = p.with_ns("geometry", prob_lo=(0.0,) * 3, prob_hi=(1.0e8,) * 3)
    p = p.with_ns("castro", lo_bc=(0,) * dim, hi_bc=(0,) * dim, cfl=0.5,
                  do_react=1, small_dens=1e-5, small_temp=1e7)
    p = p.with_ns("eos", eos_name="helmholtz")
    p = p.with_ns("network", network_name="triple_alpha_plus_cago")
    p = p.with_ns("tpu", dtype="float64")
    return p.replace(problem=merged)


def reacting_convergence_init(sim, u):
    """p = p0 (1 + dp_fact exp(-(d/L)^2) cos^6(pi d/L_dom)) at constant
    entropy through (rho0, T0) (state init lines 20-44)."""
    from castro_tpu.utils.initial_models import isentrope_through

    pp = dict(RC_DEFAULTS)
    pp.update(sim.params.problem)
    L = sim.layout
    g = sim.geom
    shape = u.shape[1:]
    nspec = L.nspec
    small_x = 1e-10
    xn0 = np.full(nspec, small_x)
    xn0[0] = 1.0 - (nspec - 1) * small_x  # pure He4 fuel

    tab = isentrope_through(sim.eos, pp["rho0"], pp["T0"], xn0)
    es0 = sim.eos.rt(rho=jnp.asarray(pp["rho0"]), T=jnp.asarray(pp["T0"]),
                     xn=jnp.asarray(xn0))
    p0 = float(es0.p)

    axes = [jnp.broadcast_to(g.cell_centers(d, sim.ng), shape)
            for d in range(L.dim)]
    center = [0.5 * (g.prob_lo[d] + g.prob_hi[d]) for d in range(L.dim)]
    dist = jnp.sqrt(sum((a - c) ** 2 for a, c in zip(axes, center)))
    Ldom = g.prob_hi[0] - g.prob_lo[0]
    bump = pp["dp_fact"] * jnp.exp(-((dist / pp["L_pert"]) ** 2)) * \
        jnp.cos(math.pi * dist / Ldom) ** 6
    p = p0 * jnp.where(dist <= center[0], 1.0 + bump, 1.0)

    # invert p along the tabulated isentrope
    rho = jnp.interp(p, jnp.asarray(tab["p"]), jnp.asarray(tab["rho"]))
    T = jnp.interp(p, jnp.asarray(tab["p"]), jnp.asarray(tab["T"]))
    xn = jnp.broadcast_to(jnp.asarray(xn0).reshape((-1,) + (1,) * len(shape)),
                          (nspec,) + shape)
    return fill_from_prim(sim, u, rho, (0.0, 0.0, 0.0), T=T, xn=xn)


# ---------------------------------------------------------------------------
# bubble_convergence

BC_DEFAULTS = dict(dens_base=1.0e7, temp_base=1.0e8, pert_width=2.56e5,
                   do_pert=1)
BC_G = -1.0e10


def bubble_convergence_params(n=64, **prob):
    merged = dict(BC_DEFAULTS)
    merged.update(prob)
    p = Params()
    p = p.with_ns("amr", n_cell=(n, n), stop_time=0.1)
    p = p.with_ns("geometry", prob_lo=(0.0, 0.0, 0.0),
                  prob_hi=(7.68e6, 7.68e6, 1.0))
    p = p.with_ns("castro", lo_bc=(0, 1, 0), hi_bc=(0, 1, 0), cfl=0.5,
                  do_grav=1, do_react=1, small_dens=1e-3, small_temp=1e6)
    p = p.with_ns("gravity", gravity_type="ConstantGrav", const_grav=BC_G)
    p = p.with_ns("eos", eos_name="helmholtz")
    p = p.with_ns("network", network_name="triple_alpha_plus_cago")
    p = p.with_ns("tpu", dtype="float64")
    return p.replace(problem=merged)


def bubble_convergence_init(sim, u):
    """Isentropic HSE He atmosphere + T bubble: T *= 1 + 0.6(1+tanh(4-r/w)),
    rho from EOS(T, p) at constant pressure, X scaled with rho
    (state init lines 60-92)."""
    from castro_tpu.utils.initial_models import (hse_plane_parallel,
                                                 model_to_grid)

    pp = dict(BC_DEFAULTS)
    pp.update(sim.params.problem)
    L = sim.layout
    g = sim.geom
    shape = u.shape[1:]
    y1 = np.asarray(g.cell_centers_1d(1, sim.ng))
    nspec = L.nspec
    xn0 = np.zeros(nspec)
    xn0[0] = 1.0  # He4
    model = hse_plane_parallel(
        sim.eos, y1, pp["dens_base"], pp["temp_base"], BC_G,
        lambda z: xn0, isentropic_until=float(y1[-1]) + 1.0, T_min=1e6)
    vals = model_to_grid(model, y1)

    bshape = [1] * len(shape)
    bshape[1] = shape[1]

    def col(a):
        return jnp.broadcast_to(jnp.asarray(a).reshape(bshape), shape)

    rho = col(vals["density"])
    T = col(vals["temperature"])
    es = sim.eos.rt(rho=rho, T=T)
    p = es.p

    if pp["do_pert"]:
        x = jnp.broadcast_to(g.cell_centers(0, sim.ng), shape)
        y = jnp.broadcast_to(g.cell_centers(1, sim.ng), shape)
        xc = 0.5 * (g.prob_lo[0] + g.prob_hi[0])
        yc = 0.5 * (g.prob_lo[1] + g.prob_hi[1])
        r = jnp.sqrt((x - xc) ** 2 + (y - yc) ** 2) / pp["pert_width"]
        T = T * (1.0 + 0.6 * (1.0 + jnp.tanh(4.0 - r)))
        # isobaric: rho from (T, p)
        es_p = sim.eos.tp(T=T, p=p)
        rho = es_p.rho
    xn = jnp.broadcast_to(jnp.asarray(xn0).reshape((-1,) + (1,) * len(shape)),
                          (nspec,) + shape)
    return fill_from_prim(sim, u, rho, (0.0, 0.0, 0.0), T=T, xn=xn)


# ---------------------------------------------------------------------------
# nse_test

NSE_DEFAULTS = dict(rho0=1.0e9, T0=6.0e9, dT_fact=0.2, L_pert=2.0e7,
                    ye0=0.5)


def nse_test_params(n=64, dim=1, **prob):
    merged = dict(NSE_DEFAULTS)
    merged.update(prob)
    p = Params()
    p = p.with_ns("amr", n_cell=(n,) * dim, stop_time=1e-4)
    p = p.with_ns("geometry", prob_lo=(0.0,) * 3, prob_hi=(1.0e8,) * 3)
    p = p.with_ns("castro", lo_bc=(0,) * dim, hi_bc=(0,) * dim, cfl=0.5,
                  do_react=1, small_dens=1e2, small_temp=1e8)
    p = p.with_ns("eos", eos_name="helmholtz")
    p = p.with_ns("network", network_name="aprox19")
    p = p.with_ns("tpu", dtype="float64")
    return p.replace(problem=merged)


def nse_test_init(sim, u):
    """T (and optionally Ye) bump; composition from the NSE distribution
    at each zone's (rho0, T, ye) (state init: nse_interp + eos_input_rt)."""
    from castro_tpu.network.nse import make_nse_solver

    pp = dict(NSE_DEFAULTS)
    pp.update(sim.params.problem)
    L = sim.layout
    g = sim.geom
    shape = u.shape[1:]
    axes = [jnp.broadcast_to(g.cell_centers(d, sim.ng), shape)
            for d in range(L.dim)]
    center = [0.5 * (g.prob_lo[d] + g.prob_hi[d]) for d in range(L.dim)]
    dist = jnp.sqrt(sum((a - c) ** 2 for a, c in zip(axes, center)))
    Ldom = g.prob_hi[0] - g.prob_lo[0]
    prof = jnp.exp(-((dist / pp["L_pert"]) ** 2)) * \
        jnp.cos(math.pi * dist / Ldom) ** 6
    T = pp["T0"] * jnp.where(dist <= center[0], 1.0 + pp["dT_fact"] * prof,
                             1.0)
    rho = jnp.full(shape, pp["rho0"], u.dtype)
    ye = jnp.full(shape, pp["ye0"], u.dtype)

    nse = make_nse_solver(sim.network)
    xn = nse(rho, T, ye)  # X [nspec, *shape]
    xn = xn / jnp.maximum(jnp.sum(xn, axis=0), 1e-300)[None]
    return fill_from_prim(sim, u, rho, (0.0, 0.0, 0.0), T=T, xn=xn)
