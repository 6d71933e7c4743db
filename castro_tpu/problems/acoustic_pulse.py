"""Acoustic pulse (reference `Exec/hydro_tests/acoustic_pulse`): a smooth
pressure/density perturbation in a periodic box — the standard
convergence-order measurement problem."""

from __future__ import annotations

import jax.numpy as jnp

from castro_tpu.config import Params
from castro_tpu.problems.util import fill_from_prim

DEFAULTS = dict(rho0=1.4, drho0=0.14, gamma=1.4)


def make_params(n=64, dim=2, dtype="float64"):
    p = Params()
    p = p.with_ns("amr", n_cell=(n,) * dim)
    p = p.with_ns("geometry", prob_lo=(0.0,) * 3, prob_hi=(1.0,) * 3)
    p = p.with_ns("castro", lo_bc=(0,) * dim, hi_bc=(0,) * dim, cfl=0.5,
                  small_temp=1e-12, small_dens=1e-12, small_pres=1e-15)
    p = p.with_ns("eos", eos_gamma=DEFAULTS["gamma"])
    p = p.with_ns("tpu", dtype=dtype)
    return p.replace(problem=dict(DEFAULTS))


def problem_init(sim, u):
    pp = dict(DEFAULTS)
    pp.update(sim.params.problem)
    g = sim.geom
    r2 = 0.0
    for d in range(g.dim):
        x = g.cell_centers(d, sim.ng) - 0.5
        r2 = r2 + x * x
    r = jnp.sqrt(r2)
    rho = jnp.where(r <= 0.5,
                    pp["rho0"] + pp["drho0"] * jnp.exp(-16 * r * r)
                    * jnp.cos(jnp.pi * r) ** 6,
                    pp["rho0"])
    # isentropic: p = (rho/rho0)^gamma
    p = (rho / pp["rho0"]) ** pp["gamma"]
    return fill_from_prim(sim, u, rho, (0.0, 0.0, 0.0), p=p)


# ---------------------------------------------------------------------------
# acoustic_pulse_general (reference Exec/hydro_tests/acoustic_pulse_general):
# the same convergence measurement on a general (Helmholtz) EOS — an
# isentropic pressure bump, initialized via the isentrope through
# (rho0, T0) (the reference's eos_input_ps path).

GEN_DEFAULTS = dict(rho0=5.0e5, T0=3.0e8, dp_fact=1.5, L_pert=2.0e7)


def general_params(n=64, dim=2, dtype="float64", **prob):
    merged = dict(GEN_DEFAULTS)
    merged.update(prob)
    p = Params()
    p = p.with_ns("amr", n_cell=(n,) * dim, stop_time=2.0e-3)
    p = p.with_ns("geometry", prob_lo=(0.0,) * 3, prob_hi=(1.0e8,) * 3)
    p = p.with_ns("castro", lo_bc=(0,) * dim, hi_bc=(0,) * dim, cfl=0.5,
                  small_temp=1e6, small_dens=1e-5)
    p = p.with_ns("eos", eos_name="helmholtz")
    p = p.with_ns("network", network_name="general_null",
                  spec_names=("He4", "C12", "O16"))
    p = p.with_ns("tpu", dtype=dtype)
    return p.replace(problem=merged)


def general_init(sim, u):
    """Isentropic pressure bump (cf. reacting_convergence — the two
    problems share the eos_input_ps construction)."""
    import math

    import numpy as np

    from castro_tpu.utils.initial_models import isentrope_through

    pp = dict(GEN_DEFAULTS)
    pp.update(sim.params.problem)
    L = sim.layout
    g = sim.geom
    shape = u.shape[1:]
    xn0 = np.zeros(L.nspec)
    xn0[0] = 1.0
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
    pres = p0 * jnp.where(dist <= center[0], 1.0 + bump, 1.0)
    rho = jnp.interp(pres, jnp.asarray(tab["p"]), jnp.asarray(tab["rho"]))
    T = jnp.interp(pres, jnp.asarray(tab["p"]), jnp.asarray(tab["T"]))
    xn = jnp.broadcast_to(
        jnp.asarray(xn0).reshape((-1,) + (1,) * len(shape)),
        (L.nspec,) + shape)
    return fill_from_prim(sim, u, rho, (0.0, 0.0, 0.0), T=T, xn=xn)
