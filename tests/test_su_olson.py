"""Su-Olson Marshak wave vs the published semi-analytic diffusion
solution (reference `Exec/radiation_tests/RadSuOlson`; BASELINE A4's
radiation-benchmark requirement)."""

import numpy as np
import pytest

from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import su_olson
from castro_tpu.utils import constants as C


@pytest.mark.parametrize("tau", [0.01, 0.3])
def test_su_olson_marshak_wave(tau):
    kappa, eps, Finc = 1.0, su_olson.EPS, 1.0
    t_end = tau / (eps * C.c_light * kappa)

    sim = Simulation(su_olson.make_params(n=128),
                     problem_init=su_olson.problem_init)
    sim.init_data()
    sim.u_rad = sim.u_rad * 0.0  # cold radiation field
    dt = 1.0e-13 if tau <= 0.01 else 5.0e-13
    nsteps = int(round(t_end / dt))
    for _ in range(nsteps):
        u_new, status = sim.try_step(dt)
        assert status.success
        sim.u = u_new
        sim.t += dt

    L = sim.layout
    ui = np.asarray(sim.interior())
    Er = np.asarray(sim.u_rad)
    T = ui[L.UTEMP]
    z = np.asarray(sim.geom.cell_centers_1d(0, 0))
    xhat = np.sqrt(3.0) * kappa * z
    u_num = C.c_light * Er / (4.0 * Finc)
    v_num = C.c_light * C.a_rad * T**4 / (4.0 * Finc)

    tab = su_olson.TABLE[tau]
    u_i = np.interp(tab["x"], xhat, u_num)
    v_i = np.interp(tab["xv"], xhat, v_num)
    for got, ref in zip(u_i, tab["u"]):
        if ref > 5e-3:
            assert abs(got - ref) / ref < 0.10, (tau, got, ref)
    for got, ref in zip(v_i, tab["v"]):
        if ref > 5e-3:
            assert abs(got - ref) / ref < 0.12, (tau, got, ref)
