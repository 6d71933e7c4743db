"""True SDC-4 + 4th-order finite-volume MOL verification (reference
Castro_sdc.cpp ca_sdc_update_advection_o4_lobatto + fourth_order.cpp):
self-convergence on the smooth acoustic pulse approaches 4th order, vs
~2nd order for the SDC-2 / 2nd-order MOL path."""

import numpy as np
import pytest

from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import acoustic_pulse


def _run(n, order, nsteps_base=8, dim=1, quadrature=0):
    params = acoustic_pulse.make_params(n=n, dim=dim)
    params = params.with_ns("castro", time_integration_method=2,
                            sdc_order=order, use_retry=0,
                            sdc_quadrature=quadrature)
    sim = Simulation(params, problem_init=acoustic_pulse.problem_init)
    sim.init_data()
    if order >= 4:
        # the problem hook fills pointwise cell-center values; the 4th-
        # order FV scheme evolves cell AVERAGES, so convert (else the IC
        # representation alone caps observed convergence at 2nd order)
        from castro_tpu.ops.fourth_order import cell_center_to_avg

        sim.u = sim._jit_clean_fill(cell_center_to_avg(sim.u, dim))
    # fixed dt halving with resolution (dt ~ dx so temporal+spatial orders
    # are probed together, as the reference convergence study does)
    nsteps = nsteps_base * (n // 16)
    dt = 0.24 / 1.8 / n  # cfl-ish: c ~ 1.8 for the pulse background
    u = sim.u
    for _ in range(nsteps):
        u, fail = sim._jit_sdc_step(u, dt, 0.0)
        assert not bool(fail)
    return np.asarray(sim.interior(u)), nsteps * dt


def _self_convergence(order, dim=1, quadrature=0):
    u16, t16 = _run(16, order, dim=dim, quadrature=quadrature)
    u32, t32 = _run(32, order, dim=dim, quadrature=quadrature)
    u64, t64 = _run(64, order, dim=dim, quadrature=quadrature)
    assert abs(t16 - t32) < 1e-12 and abs(t32 - t64) < 1e-12

    def coarsen(a):
        # average pairs along each spatial axis (conservative restriction)
        for ax in range(1, a.ndim):
            shape = a.shape[:ax] + (a.shape[ax] // 2, 2) + a.shape[ax + 1:]
            a = a.reshape(shape).mean(axis=ax + 1)
        return a

    e_coarse = np.abs(u16 - coarsen(u32)).mean()
    e_fine = np.abs(u32 - coarsen(u64)).mean()
    return np.log2(e_coarse / e_fine)


def test_sdc4_fourth_order_convergence():
    rate = _self_convergence(4)
    assert rate > 3.2, f"SDC-4 rate {rate}"


def test_sdc2_second_order_convergence():
    rate = _self_convergence(2)
    assert 1.5 < rate < 3.2, f"SDC-2 rate {rate}"


def test_sdc4_radau_fourth_order_convergence():
    """castro.sdc_quadrature=1: the Radau IIA node/weight set
    (ca_sdc_update_advection_o4_radau) also converges at ~4th order."""
    rate = _self_convergence(4, quadrature=1)
    assert rate > 3.2, f"SDC-4 Radau rate {rate}"
