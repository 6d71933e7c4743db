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
