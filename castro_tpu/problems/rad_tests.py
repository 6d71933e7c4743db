"""Radiation test problems (reference `Exec/radiation_tests/*`).

- thermal_wave: RadThermalWave — point thermal explosion diffusing
  through a cold constant-cv medium with kappa_R ~ T^{1/2} (Zel'dovich
  nonlinear thermal wave; 1D spherical).
- rad_source: RadSourceTest — 0-D matter<->radiation relaxation with
  constant Planck opacity and no diffusion; the cooling/heating
  configurations have the exact exponential-equilibration solution the
  reference's `analytic.f90` evaluates.

Both run through the standard `Simulation` radiation path (do_hydro=0,
gray FLD). Parameter defaults mirror the reference `inputs.*` files.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from castro_tpu.config import Params
from castro_tpu.utils import constants as C

# RadThermalWave inputs.1d
TW_DEFAULTS = dict(rhocv=0.05, T0=1e-6, Eexp=3e7, rexp=3.125)


def thermal_wave_params(n=64, prob_hi=200.0, **prob):
    merged = dict(TW_DEFAULTS)
    merged.update(prob)
    p = Params()
    p = p.with_ns("amr", n_cell=(n,))
    p = p.with_ns("geometry", coord_sys=2, prob_lo=(0.0, 0.0, 0.0),
                  prob_hi=(prob_hi, 1.0, 1.0))
    p = p.with_ns("castro", lo_bc=(3,), hi_bc=(2,), do_hydro=0,
                  do_radiation=1, small_temp=0.0, fixed_dt=-1.0)
    rho0 = 1.0
    cv = merged["rhocv"] / rho0
    p = p.with_ns("eos", eos_name="rad_power_law", eos_gamma=1.4)
    p = p.replace(extra={"eos.const_c_v": cv})
    p = p.with_ns("tpu", dtype="float64")
    p = p.with_ns("radiation", ngroups=1,
                  lo_bc=(102, 0, 0), hi_bc=(102, 0, 0),
                  const_kappa_p=1.0e6,
                  const_kappa_r=1.0e-3, kappa_r_exp_n=-0.5,
                  limiter=0, outer_iters=6)
    return p.replace(problem=merged)


def thermal_wave_init(sim, u):
    pp = dict(TW_DEFAULTS)
    pp.update(sim.params.problem)
    L = sim.layout
    shape = u.shape[1:]
    r = jnp.broadcast_to(sim.geom.cell_centers(0, sim.ng), shape)
    rhocv = pp["rhocv"]
    rho0 = 1.0
    cv = rhocv / rho0
    # deposit Eexp uniformly inside rexp (matter internal energy)
    vol = 4.0 / 3.0 * np.pi * pp["rexp"] ** 3
    e_in = pp["Eexp"] / vol / rho0
    e_out = cv * pp["T0"]
    e = jnp.where(r < pp["rexp"], e_in, e_out)
    u = u.at[L.URHO].set(rho0)
    u = u.at[L.UMX].set(0.0)
    u = u.at[L.UEINT].set(rho0 * e)
    u = u.at[L.UEDEN].set(rho0 * e)
    u = u.at[L.UTEMP].set(e / cv)
    u = u.at[L.UFS].set(rho0)
    return u


# RadSourceTest inputs-cooling / inputs-heating
RS_DEFAULTS = dict(rho_0=1e-7, rhoe_0=1e9, E_rad=1e12,
                   cv=206586826.34730542, kappa_p=4e-8)


def rad_source_params(n=16, heating=False, **prob):
    merged = dict(RS_DEFAULTS)
    if heating:
        # inputs-heating: cold matter in a hot radiation bath
        merged.update(rhoe_0=1e2, E_rad=1e12)
    merged.update(prob)
    p = Params()
    p = p.with_ns("amr", n_cell=(n,))
    p = p.with_ns("geometry", prob_lo=(0.0, 0.0, 0.0),
                  prob_hi=(1.0, 1.0, 1.0))
    p = p.with_ns("castro", lo_bc=(0,), hi_bc=(0,), do_hydro=0,
                  do_radiation=1, small_temp=0.0)
    p = p.with_ns("eos", eos_name="rad_power_law", eos_gamma=1.4)
    p = p.replace(extra={"eos.const_c_v": merged["cv"]})
    p = p.with_ns("tpu", dtype="float64")
    p = p.with_ns("radiation", ngroups=1, lo_bc=(102,), hi_bc=(102,),
                  const_kappa_p=merged["kappa_p"], const_kappa_r=1e-10,
                  limiter=0, outer_iters=8)
    return p.replace(problem=merged)


def rad_source_init(sim, u):
    pp = dict(RS_DEFAULTS)
    pp.update(sim.params.problem)
    L = sim.layout
    rho = pp["rho_0"]
    e = pp["rhoe_0"] / rho
    cv = float(sim.params.extra.get("eos.const_c_v", pp["cv"]))
    u = u.at[L.URHO].set(rho)
    u = u.at[L.UMX].set(0.0)
    u = u.at[L.UEINT].set(rho * e)
    u = u.at[L.UEDEN].set(rho * e)
    u = u.at[L.UTEMP].set(e / cv)
    u = u.at[L.UFS].set(rho)
    return u


def rad_source_Er0(sim):
    pp = dict(RS_DEFAULTS)
    pp.update(sim.params.problem)
    return jnp.full(tuple(sim.geom.n_cell), pp["E_rad"], sim.dtype)
