"""Hydro robustness guards (reference `advection_util.cpp:662,897` flux
limiters + `Castro_hydro.cpp:234` CFL-violation retry): each test fails
without the corresponding guard."""

import numpy as np

import jax.numpy as jnp

from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import sod


def _double_rarefaction_params(limit):
    # reference Sod/inputs-double-rarefaction: diverging velocities drain
    # the center toward vacuum
    p = sod.make_params(n=64, dim=1, p_l=0.4, p_r=0.4, rho_l=1.0, rho_r=1.0,
                        u_l=-6.0, u_r=6.0)
    p = p.with_ns("castro", limit_fluxes_on_small_dens=limit,
                  small_dens=1e-4, use_retry=0, check_cfl_violation=0)
    return p


def test_small_dens_flux_limiter_keeps_floor():
    p = _double_rarefaction_params(limit=1)
    sim = Simulation(p, problem_init=sod.problem_init)
    sim.init_data()
    u = sim.u
    dt = 1e-3
    ok = True
    for _ in range(40):
        u, min_rho, bad = sim._jit_step(u, dt, 0.0)
        ok = ok and not bool(bad)
    assert ok
    rho = np.asarray(sim.interior(u))[sim.layout.URHO]
    # the limiter keeps every raw update at/above the padded floor
    # (small_dens * 1.1 * 2 * dim)
    assert rho.min() >= 2.2e-4 * 0.99, rho.min()


def test_small_dens_limiter_changes_answer():
    """Sanity: with the limiter off, the same run drives density to the
    clean_state floor (i.e. the limiter is actually load-bearing here)."""
    p = _double_rarefaction_params(limit=0)
    sim = Simulation(p, problem_init=sod.problem_init)
    sim.init_data()
    u = sim.u
    dt = 1e-3
    hit_floor = False
    for _ in range(40):
        u, min_rho, bad = sim._jit_step(u, dt, 0.0)
        if float(min_rho) < 1e-4:
            hit_floor = True
    assert hit_floor, "unlimited run no longer violates the floor; " \
        "strengthen the test problem" 


def test_speed_limit_flux_limiter():
    p = sod.make_params(n=64, dim=1, p_l=1000.0, p_r=0.01, rho_l=1.0,
                        rho_r=0.01)
    p = p.with_ns("castro", speed_limit=5.0, use_retry=0,
                  check_cfl_violation=0, small_dens=1e-8)
    sim = Simulation(p, problem_init=sod.problem_init)
    sim.init_data()
    u = sim.u
    dt = 5e-4
    for _ in range(20):
        u, min_rho, bad = sim._jit_step(u, dt, 0.0)
    L = sim.layout
    ui = np.asarray(sim.interior(u))
    v = np.abs(ui[L.UMX] / ui[L.URHO])
    # enforce_speed_limit (clean_state) + the flux limiter cap |v|
    assert v.max() <= 5.0 * 1.001, v.max()


def test_cfl_violation_triggers_retry():
    p = sod.make_params(n=64, dim=1)
    sim = Simulation(p, problem_init=sod.problem_init)
    sim.init_data()
    # dt far beyond CFL: the step must flag itself invalid
    u, min_rho, bad = sim._jit_step(sim.u, 0.5, 0.0)
    assert bool(bad)
    # a CFL-safe dt does not flag
    u, min_rho, bad = sim._jit_step(sim.u, 1e-4, 0.0)
    assert not bool(bad)
