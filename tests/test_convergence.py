"""Convergence-order and curvilinear-gravity verification (reference:
acoustic_pulse convergence, DustCollapse analytic, SURVEY.md §4.3)."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import acoustic_pulse, dust_collapse


def run_pulse(n):
    params = acoustic_pulse.make_params(n=n, dim=2)
    sim = Simulation(params, problem_init=acoustic_pulse.problem_init)
    sim.run(stop_time=0.06, verbose=False)
    return sim


@pytest.mark.slow
def test_acoustic_pulse_convergence_order():
    """Self-convergence of the 2D CTU scheme on the smooth pulse: order
    approaching 2 (reference Verification: acoustic_pulse)."""
    sims = {n: run_pulse(n) for n in (32, 64, 128)}
    rho = {n: np.asarray(s.interior())[0] for n, s in sims.items()}

    def coarsen(a):
        return 0.25 * (a[::2, ::2] + a[1::2, ::2] + a[::2, 1::2] + a[1::2, 1::2])

    e_lo = np.abs(coarsen(rho[64]) - rho[32]).mean()
    e_hi = np.abs(coarsen(rho[128]) - rho[64]).mean()
    order = np.log2(e_lo / e_hi)
    assert order > 1.5, (e_lo, e_hi, order)


def test_dust_collapse_1d_spherical():
    """1D spherical monopole-gravity collapse: central density grows on the
    free-fall timescale and stays finite/positive."""
    params = dust_collapse.make_params(n=128, dim=1)
    sim = Simulation(params, problem_init=dust_collapse.problem_init)
    sim.init_data()
    L = sim.layout
    rho0_max = float(np.asarray(sim.interior())[L.URHO].max())

    t_ff = dust_collapse.free_fall_time(1.0e9)
    sim.run(stop_time=0.6 * t_ff, max_step=4000, verbose=False)
    ui = np.asarray(sim.interior())
    rho = ui[L.URHO]
    assert np.isfinite(rho).all() and rho.min() > 0
    # at 0.6 t_ff the analytic compression factor is (r0/r)^3 ~ 2.1;
    # numerics with pressure floor lands in a broad band around it
    assert rho.max() > 1.5 * rho0_max, rho.max() / rho0_max
    # the collapse is homologous: interior density stays nearly flat
    inner = rho[:20]
    assert inner.std() / inner.mean() < 0.2


def test_gaussian_diffusion_vs_analytic():
    """diffuse_temp with constant conductivity, hydro off: a Gaussian
    temperature pulse spreads per the analytic heat kernel (reference
    Exec/unit_tests/diffusion_test)."""
    from castro_tpu.config import Params
    from castro_tpu.problems.util import fill_from_prim
    import jax.numpy as jnp
    from castro_tpu.utils import constants as C

    n = 128
    p = Params()
    p = p.with_ns("amr", n_cell=(n,))
    p = p.with_ns("geometry", prob_lo=(0.0,), prob_hi=(1.0,))
    p = p.with_ns("castro", lo_bc=(0,), hi_bc=(0,), do_hydro=0,
                  diffuse_temp=1, fixed_dt=1e-7 * 2e10,
                  small_dens=1e-12, small_temp=1e-12, small_pres=1e-15)
    p = p.with_ns("eos", eos_gamma=1.4)
    p = p.with_ns("tpu", dtype="float64")
    # conductivity via extra namespace (reference conductivity.*)
    p = p.replace(extra={"conductivity.const_conductivity": 1.0e8})

    rho0 = 1.0
    cv = C.k_B / (1.0 * C.m_u * 0.4)  # gamma-law cv for X(A=1)
    D = 1.0e8 / (rho0 * cv)
    t0 = 0.001 / (4 * D)  # so the initial width is sqrt(4 D t0) ~ 0.032

    def init(sim, u):
        x = sim.geom.cell_centers(0, sim.ng)
        T = 1e5 * (1.0 + jnp.exp(-((x - 0.5) ** 2) / (4 * D * t0)))
        return fill_from_prim(sim, u, rho0, (0.0, 0.0, 0.0), T=T)

    from castro_tpu.driver.sim import Simulation

    sim = Simulation(p, problem_init=init)
    sim.init_data()
    t_end = 2 * t0
    # fixed small dt for the explicit diffusion
    dt = 0.2 * (1.0 / n) ** 2 / D
    nstep = int(t_end / dt)
    sim.params = sim.params.with_ns("castro", fixed_dt=dt)
    sim.run(stop_time=t_end, max_step=nstep + 5, verbose=False)

    L = sim.layout
    ui = np.asarray(sim.interior())
    T_num = ui[L.UTEMP]
    x = np.asarray(sim.geom.cell_centers_1d(0, 0))
    tt = t0 + sim.t
    T_exact = 1e5 * (1.0 + np.sqrt(t0 / tt) * np.exp(-((x - 0.5) ** 2) / (4 * D * tt)))
    err = np.abs(T_num - T_exact).max() / 1e5
    assert err < 0.01, err
