"""Radiative shock problems.

- Rad2Tshock (reference `Exec/radiation_tests/Rad2Tshock`): the
  Lowrie & Edwards (2008) nonequilibrium two-temperature radiative
  shock.  A steady shock in mixed-frame gray rad-hydro: pre/post states
  from the inputs (inputs.M2: Mach-2 with its semi-analytic solution),
  `radiation.comoving = 0`.
- RadFront-style streaming test helper (optically thin limiter check).
"""

from __future__ import annotations

import jax.numpy as jnp

from castro_tpu.config import Params

# inputs.M2 (Mach-2) parameters
M2 = dict(rho0=5.45969027775e-13, T0=100.0, v0=235435.230236,
          rho1=1.24812608999e-12, T1=207.756999533, v1=102986.665199)
# inputs.M5 (Mach-5)
M5 = dict(rho0=5.45969027775e-13, T0=100.0, v0=588588.075590,
          rho1=1.96495613421e-12, T1=855.719921848, v1=163547.652718)


def make_params(mach=2, n=128, **prob):
    merged = dict(M2 if mach == 2 else M5)
    merged.update(prob)
    p = Params()
    p = p.with_ns("amr", n_cell=(n,))
    p = p.with_ns("geometry", prob_lo=(-1000.0, 0.0, 0.0),
                  prob_hi=(500.0, 1.0, 1.0))
    p = p.with_ns("castro", lo_bc=(2,), hi_bc=(2,), do_hydro=1,
                  do_radiation=1, cfl=0.5, small_temp=1.0,
                  small_dens=1e-20, small_pres=1e-25)
    p = p.with_ns("eos", eos_name="rad_power_law", eos_gamma=1.6666666667)
    # eos.const_c_v for the Lowrie-Edwards gas: cv = k/((gamma-1) mu m_u)
    # with mu = 1 (the inputs use the gamma-law ideal gas directly)
    p = p.replace(extra={"eos.const_c_v": 1.2472335702397082e8})
    from castro_tpu.utils import constants as C

    p = p.with_ns("radiation", ngroups=1, comoving=0,
                  const_kappa_p=3.92663697758e-5,
                  const_kappa_r=0.848902853095,
                  lo_bc=(101, 0, 0), hi_bc=(101, 0, 0), limiter=2,
                  outer_iters=6,
                  # Dirichlet Er = a T^4 of the pre/post equilibrium
                  # states (inputs.M2 lo_bcval/hi_bcval)
                  lo_bcval=(C.a_rad * merged["T0"] ** 4, 0.0, 0.0),
                  hi_bcval=(C.a_rad * merged["T1"] ** 4, 0.0, 0.0))
    p = p.with_ns("tpu", dtype="float64")
    return p.replace(problem=merged)


def problem_init(sim, u):
    """Pre-shock (x<0) / post-shock (x>0) Lowrie-Edwards states
    (reference problem_initialize_state_data.H: idir selects the axis;
    both rad and gas start in their equilibrium two-temperature
    states)."""
    from castro_tpu.problems.util import fill_from_prim

    pp = sim.params.problem
    g = sim.geom
    shape = u.shape[1:]
    x = jnp.broadcast_to(g.cell_centers(0, sim.ng), shape)
    pre = x < 0.0
    rho = jnp.where(pre, pp["rho0"], pp["rho1"])
    T = jnp.where(pre, pp["T0"], pp["T1"])
    vx = jnp.where(pre, pp["v0"], pp["v1"])
    return fill_from_prim(sim, u, rho, (vx, 0.0, 0.0), T=T)


def rad_init(sim):
    """Er = a T^4 on each side (equilibrium with the local gas)."""
    from castro_tpu.utils import constants as C

    pp = sim.params.problem
    L = sim.layout
    x = sim.geom.cell_centers_1d(0, 0)
    T = jnp.where(x < 0.0, pp["T0"], pp["T1"])
    return C.a_rad * T ** 4
