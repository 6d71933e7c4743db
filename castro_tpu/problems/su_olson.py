"""Su & Olson (1996) non-equilibrium Marshak wave (reference
`Exec/radiation_tests/RadSuOlson`, Hayes & Norman 2003 parameters):
a cold slab with cv = alpha T^3 (epsilon = 4a/alpha = 0.1), kappa = 1,
no flux limiting (lambda = 1/3), driven by a Marshak boundary with
incident flux F_inc = 1 at x = 0. The dimensionless profiles
u(x_hat, tau) = c Er / (4 F_inc) and v = c a T^4 / (4 F_inc), with
x_hat = sqrt(3) kappa x and tau = eps c kappa t, have the published
semi-analytic diffusion solution (Su & Olson 1996, Table 2)."""

from __future__ import annotations

import jax.numpy as jnp

from castro_tpu.config import Params

EPS = 0.1
ALPHA_CV = 3.02584e-13  # 4 a / eps

# Su & Olson (1996) diffusion solution, as tabulated in the reference's
# analysis script (Exec/radiation_tests/RadSuOlson/python/paper.py)
TABLE = {
    0.01: dict(x=[0.1, 0.25, 0.5, 0.75, 1.0],
               u=[0.17979, 0.11006, 0.04104, 0.01214, 0.00268],
               xv=[0.1, 0.25, 0.5, 0.75],
               v=[0.00110, 0.00055, 0.00012, 0.00003]),
    0.3: dict(x=[0.1, 0.25, 0.5, 0.75, 1.0, 2.5, 5.0, 7.5],
              u=[0.44289, 0.38544, 0.30500, 0.24062, 0.18922, 0.04167,
                 0.00238, 0.00008],
              xv=[0.1, 0.25, 0.5, 0.75, 1.0, 2.5, 5.0, 7.5],
              v=[0.10124, 0.08551, 0.06437, 0.04830, 0.03612, 0.00584,
                 0.00020, 0.00001]),
}


def make_params(n=128, dtype="float64"):
    p = Params()
    p = p.with_ns("amr", n_cell=(n,), max_step=10**6)
    p = p.with_ns("geometry", prob_lo=(0.0,) * 3, prob_hi=(5.0, 1.0, 1.0))
    p = p.with_ns("castro", lo_bc=(2,), hi_bc=(2,), do_hydro=0,
                  do_radiation=1, fixed_dt=1.0e-13, small_temp=0.0,
                  small_dens=1e-20, check_cfl_violation=0)
    p = p.with_ns("eos", eos_name="rad_power_law", eos_gamma=5.0 / 3.0)
    p = p.replace(extra={"eos.const_c_v": ALPHA_CV, "eos.c_v_exp_m": 0.0,
                         "eos.c_v_exp_n": -3.0})
    p = p.with_ns("radiation", lo_bc=(104, 0, 0), hi_bc=(102, 0, 0),
                  lo_bcval=(1.0, 0.0, 0.0), hi_bcval=(0.0, 0.0, 0.0),
                  const_kappa_p=1.0, const_kappa_r=1.0, limiter=0)
    p = p.with_ns("tpu", dtype=dtype)
    return p


def problem_init(sim, u):
    L = sim.layout
    u = u.at[L.URHO].set(1.0)
    T0 = 1.0e-4  # effectively cold start
    es = sim.eos.rt(rho=jnp.ones(()), T=jnp.asarray(T0))
    u = u.at[L.UTEMP].set(T0)
    u = u.at[L.UEINT].set(float(es.e))
    u = u.at[L.UEDEN].set(float(es.e))
    u = u.at[L.UFS].set(1.0)
    return u
