"""Characteristic rad-hydro coupling (reference trace_ppm_rad +
ctu_rad_consup): physics checks of the coupled 1D gray path."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.config import Params
from castro_tpu.driver.sim import Simulation
from castro_tpu.problems.util import fill_from_prim


def _mk(n=128, kappa_r=1e8, kappa_p=0.0):
    p = Params()
    p = p.with_ns("amr", n_cell=(n,))
    p = p.with_ns("geometry", prob_lo=(0.0,) * 3, prob_hi=(1.0,) * 3)
    p = p.with_ns("castro", lo_bc=(0,), hi_bc=(0,), do_radiation=1,
                  small_dens=1e-12, small_temp=1e-12, small_pres=1e-15,
                  check_cfl_violation=0)
    p = p.with_ns("radiation", const_kappa_p=kappa_p, const_kappa_r=kappa_r,
                  limiter=2)
    p = p.with_ns("eos", eos_gamma=5.0 / 3.0)
    p = p.with_ns("tpu", dtype="float64")
    return p


def test_rad_ctu_reduces_to_pure_hydro():
    """With Er ~ 0 the coupled characteristic path must reproduce the pure
    hydro step."""
    def init(sim, u):
        x = sim.geom.cell_centers(0, sim.ng)
        rho = 1.0 + 0.2 * jnp.sin(2 * jnp.pi * x)
        return fill_from_prim(sim, u, rho, (0.3, 0.0, 0.0), p=1.0)

    p_rad = _mk()
    sim = Simulation(p_rad, problem_init=init)
    sim.init_data()
    sim.u_rad = sim.u_rad * 0.0 + 1e-20

    p_h = p_rad.with_ns("castro", do_radiation=0)
    simh = Simulation(p_h, problem_init=init)
    simh.init_data()

    dt = 1e-3
    u_r = sim.u
    Er = sim.u_rad
    for _ in range(5):
        u_r, Er, mr, bad = sim._jit_rad_step(u_r, Er, dt, 0.0)
        assert not bool(bad)
    u_h = simh.u
    for _ in range(5):
        u_h, _, _ = simh._jit_step(u_h, dt, 0.0)

    L = sim.layout
    a = np.asarray(sim.interior(u_r))
    b = np.asarray(simh.interior(u_h))
    for comp in (L.URHO, L.UMX, L.UEDEN):
        assert np.allclose(a[comp], b[comp], rtol=1e-6, atol=1e-12), \
            (comp, np.abs(a[comp] - b[comp]).max())


def test_rad_acoustic_wave_speed():
    """Optically-thick radiation stiffens the sound speed:
    c_tot^2 = c_gas^2 + gamma_r lambda Er / rho with gamma_r = 4/3,
    lambda = 1/3 in the thick limit. A standing velocity perturbation
    v = eps sin(kx) oscillates as cos(k c_tot t) — measure c_tot."""
    n = 128
    rho0, p0, Er0 = 1.0, 0.6, 5.0
    gam = 5.0 / 3.0

    def init(sim, u):
        x = sim.geom.cell_centers(0, sim.ng)
        v = 1e-4 * jnp.sin(2 * jnp.pi * x)
        return fill_from_prim(sim, u, rho0, (v, 0.0, 0.0), p=p0)

    sim = Simulation(_mk(n=n, kappa_r=1e13), problem_init=init)
    sim.init_data()
    sim.u_rad = sim.u_rad * 0.0 + Er0

    cg = np.sqrt(gam * p0 / rho0)
    c_tot = np.sqrt(cg**2 + (4.0 / 9.0) * Er0 / rho0)

    k = 2 * np.pi
    # run to a quarter period of the RAD-stiffened oscillation
    T4 = 0.25 * 2 * np.pi / (k * c_tot)
    dt = T4 / 40
    u, Er = sim.u, sim.u_rad
    amps = [1e-4]
    for _ in range(40):
        u, Er, mr, bad = sim._jit_rad_step(u, Er, dt, 0.0)
        assert not bool(bad)
        L = sim.layout
        ui = sim.interior(u)
        amps.append(float(jnp.max(jnp.abs(ui[L.UMX] / ui[L.URHO]))))

    # fit the oscillation frequency from the amplitude decay toward the
    # quarter period: A(t) = A0 |cos(k c t)|
    t = np.arange(41) * dt
    A = np.asarray(amps)
    # use the mid-range where cos is well-conditioned
    selm = (A / A[0] > 0.2) & (A / A[0] < 0.95) & (t > 0)
    c_fit = np.median(np.arccos(np.clip(A[selm] / A[0], -1, 1)) /
                      (k * t[selm]))
    # the gas-only speed would give c_fit ~ 1.0; rad-stiffened ~ 1.80
    assert abs(c_fit - c_tot) / c_tot < 0.10, (c_fit, c_tot, cg)
