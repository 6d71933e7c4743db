"""Science-problem ports: celldet, planet, bwp-rad (reference
`Exec/science/{celldet,planet,bwp-rad}`).

- celldet: cellular detonation — a hot/cold C/O interface whose position
  is sinusoidally perturbed along y so the planar detonation develops
  transverse cell structure (`celldet/problem_initialize_state_data.H`).
- planet: hot-Jupiter atmosphere under constant gravity with an optional
  shear-velocity band (`planet/problem_initialize_state_data.H`,
  HotJupiter.cpp initial model — here an isothermal-stratified gamma-law
  atmosphere built in place).
- bwp-rad: a solar-like 0.2 Msun star under MonopoleGrav with gray FLD
  radiation and Kramers opacity (rho^2 T^-3.5), 2D RZ
  (`bwp-rad/problem_initialize_state_data.H`, inputs_2d).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from castro_tpu.config import Params
from castro_tpu.problems.util import fill_from_prim

# ---------------------------------------------------------------------------
# celldet

CD_DEFAULTS = dict(T_l=1.0e9, T_r=5.0e7, dens_l=1.0e8, dens_r=1.0e8,
                   cfrac=0.5, ofrac=0.0, w_T=5.0e-4, center_T=0.3,
                   pert_amplitude=0.1, vel=0.0)


def celldet_params(n=(256, 64), **prob):
    merged = dict(CD_DEFAULTS)
    merged.update(prob)
    p = Params()
    p = p.with_ns("amr", n_cell=tuple(n), stop_time=4.0e-7)
    p = p.with_ns("geometry", prob_lo=(0.0, 0.0, 0.0),
                  prob_hi=(4.0e5, 1.0e5, 1.0))
    p = p.with_ns("castro", lo_bc=(2, 0, 0), hi_bc=(2, 0, 0), cfl=0.5,
                  do_react=1, small_dens=1e-5, small_temp=1e7,
                  dtnuc_e=0.25)
    p = p.with_ns("eos", eos_name="helmholtz")
    p = p.with_ns("network", network_name="aprox13")
    p = p.with_ns("tpu", dtype="float64")
    return p.replace(problem=merged)


def celldet_init(sim, u):
    """Sigmoid hot/cold interface at center_T*Lx with a sin(2*2pi y/Ly)
    perturbation of the interface position (state init line 18)."""
    pp = dict(CD_DEFAULTS)
    pp.update(sim.params.problem)
    L = sim.layout
    g = sim.geom
    shape = u.shape[1:]
    x = jnp.broadcast_to(g.cell_centers(0, sim.ng), shape)
    y = jnp.broadcast_to(g.cell_centers(1, sim.ng), shape)
    Lx = g.prob_hi[0] - g.prob_lo[0]
    Ly = g.prob_hi[1] - g.prob_lo[1]
    width = pp["w_T"] * Lx
    c_T = g.prob_lo[0] + pp["center_T"] * Lx * (
        1.0 + pp["pert_amplitude"] * jnp.sin(2.0 * jnp.pi * 2.0 * y / Ly))
    sigma = 1.0 / (1.0 + jnp.exp(-(c_T - x) / width))
    rho = pp["dens_l"] + (pp["dens_r"] - pp["dens_l"]) * (1.0 - sigma)
    T = pp["T_l"] + (pp["T_r"] - pp["T_l"]) * (1.0 - sigma)
    vx = pp["vel"] - 2.0 * pp["vel"] * (1.0 - sigma)

    names = sim.network.spec_names
    xn0 = np.zeros(L.nspec)
    xn0[names.index("C12")] = pp["cfrac"]
    xn0[names.index("O16")] = pp["ofrac"]
    xn0[names.index("He4")] = 1.0 - pp["cfrac"] - pp["ofrac"]
    xn = jnp.broadcast_to(jnp.asarray(xn0).reshape((-1,) + (1,) * len(shape)),
                          (L.nspec,) + shape)
    return fill_from_prim(sim, u, rho, (vx, 0.0, 0.0), T=T, xn=xn)


# ---------------------------------------------------------------------------
# planet

PL_DEFAULTS = dict(dens_base=1.0e-2, T_iso=1.0e3, cutoff_density=1e-10,
                   shear_vel_field=1, shear_height_loc=2.7e9,
                   shear_amplitude=3.863080704e5, shear_height_frac=0.05)
PL_G = -1.0e3


def planet_params(n=(64, 256), **prob):
    merged = dict(PL_DEFAULTS)
    merged.update(prob)
    p = Params()
    p = p.with_ns("amr", n_cell=tuple(n), stop_time=1.0e6)
    p = p.with_ns("geometry", prob_lo=(0.0, 0.0, 0.0),
                  prob_hi=(1.227e9, 3.927e9, 1.0))
    p = p.with_ns("castro", lo_bc=(0, 1, 0), hi_bc=(0, 2, 0), cfl=0.5,
                  do_grav=1, small_dens=1e-15, small_temp=1.0)
    p = p.with_ns("gravity", gravity_type="ConstantGrav", const_grav=PL_G)
    p = p.with_ns("eos", eos_gamma=1.4)
    p = p.with_ns("tpu", dtype="float64")
    return p.replace(problem=merged)


def planet_init(sim, u):
    """Isothermal gamma-law atmosphere (scale height H = kT/(mu m_u g))
    with a tanh-bounded horizontal shear band at shear_height_loc
    (state init shear_vel_field branch)."""
    pp = dict(PL_DEFAULTS)
    pp.update(sim.params.problem)
    g = sim.geom
    shape = u.shape[1:]
    y = jnp.broadcast_to(g.cell_centers(1, sim.ng), shape)

    es = sim.eos.rt(rho=jnp.asarray(pp["dens_base"]),
                    T=jnp.asarray(pp["T_iso"]))
    # isothermal: p = rho * (p0/rho0), so H = p0/(rho0 |g|)
    H = float(es.p) / (pp["dens_base"] * abs(PL_G))
    rho = jnp.maximum(pp["dens_base"] * jnp.exp(-(y - g.prob_lo[1]) / H),
                      pp["cutoff_density"])
    T = jnp.full(shape, pp["T_iso"], u.dtype)

    vx = jnp.zeros(shape, u.dtype)
    if pp["shear_vel_field"]:
        hband = pp["shear_height_frac"] * (g.prob_hi[1] - g.prob_lo[1])
        s = (y - pp["shear_height_loc"]) / hband
        # linear ramp inside the band, saturating at +-shear_amplitude
        vx = pp["shear_amplitude"] * jnp.clip(s, -1.0, 1.0)
    return fill_from_prim(sim, u, rho, (vx, 0.0, 0.0), T=T)


# ---------------------------------------------------------------------------
# bwp-rad

BWP_DEFAULTS = dict(rho_c=80.0, T_c=7.0e6, rho_ambient=1.0e-8)


def bwp_rad_params(n=(64, 128), **prob):
    merged = dict(BWP_DEFAULTS)
    merged.update(prob)
    p = Params()
    p = p.with_ns("amr", n_cell=tuple(n), stop_time=100.0)
    p = p.with_ns("geometry", coord_sys=1, prob_lo=(0.0, 0.0, 0.0),
                  prob_hi=(2.48e10, 4.96e10, 1.0))
    p = p.with_ns("castro", lo_bc=(3, 2, 0), hi_bc=(2, 2, 0), cfl=0.5,
                  do_grav=1, do_radiation=1, small_dens=1e-10,
                  small_temp=1e2)
    p = p.with_ns("gravity", gravity_type="MonopoleGrav")
    p = p.with_ns("eos", eos_gamma=5.0 / 3.0)
    # Kramers opacity kappa = 3.8e22 rho^2 T^-3.5 (inputs_2d)
    p = p.with_ns("radiation", ngroups=1,
                  lo_bc=(102, 101, 0), hi_bc=(105, 101, 0),
                  const_kappa_p=3.8e22, kappa_p_exp_m=2.0,
                  kappa_p_exp_n=3.5,
                  const_kappa_r=3.8e22, kappa_r_exp_m=2.0,
                  kappa_r_exp_n=3.5, limiter=2, comoving=0,
                  hydro_coupling=0, outer_iters=6)
    p = p.with_ns("tpu", dtype="float64")
    return p.replace(problem=merged)


def bwp_rad_init(sim, u):
    """0.2 Msun solar-like star: spherical HSE model (gamma-law, mapped
    by spherical radius in the RZ plane about the lower-axis origin),
    standing in for `SolarLike_0.2M.hse.1280`."""
    from castro_tpu.utils import initial_models as im
    from castro_tpu.utils.initial_models import model_to_grid

    pp = dict(BWP_DEFAULTS)
    pp.update(sim.params.problem)
    L = sim.layout
    g = sim.geom
    shape = u.shape[1:]

    rmax = float(g.prob_hi[1]) * 1.05
    nshell = 1024
    r1 = np.linspace(rmax / (2 * nshell), rmax, nshell)
    xnj = jnp.asarray(np.ones(L.nspec) / L.nspec)

    def T_of_rho(rho):
        # polytrope-ish thermal structure: T ~ rho^{2/3} anchored at center
        return jnp.maximum(
            pp["T_c"] * (jnp.maximum(rho, 1e-12) / pp["rho_c"]) ** (2.0 / 3.0),
            1.0e3)

    model = im.hse_spherical(sim.eos, r1, pp["rho_c"], pp["T_c"],
                             lambda m: xnj, T_of_rho=T_of_rho,
                             rho_cutoff=pp["rho_ambient"])
    x = jnp.broadcast_to(g.cell_centers(0, sim.ng), shape)
    y = jnp.broadcast_to(g.cell_centers(1, sim.ng), shape)
    yc = 0.5 * (g.prob_lo[1] + g.prob_hi[1])
    dist = jnp.sqrt(x * x + (y - yc) ** 2)
    vals = model_to_grid(model, np.asarray(dist).reshape(-1))
    rho = jnp.asarray(vals["density"]).reshape(shape)
    T = jnp.asarray(vals["temperature"]).reshape(shape)
    return fill_from_prim(sim, u, rho, (0.0, 0.0, 0.0), T=T)
