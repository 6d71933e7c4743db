"""toy_flame: the powerlaw-network laminar flame ignites and propagates
into the fuel (reference Exec/reacting_tests/toy_flame)."""

import numpy as np
import pytest

from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import toy_flame


def test_toy_flame_propagates():
    # reference-default flame speed is ~0.003 cells/step (the inputs run
    # ~10^4 steps); boost the burning rate 400x so the front crosses
    # several cells in a CI-sized run (speed ~ sqrt(rate))
    params = toy_flame.make_params(n=128)
    params = params.with_ns("network", rtilde=16000.0)
    sim = Simulation(params, problem_init=toy_flame.problem_init)
    sim.init_data()
    L = sim.layout
    x = np.asarray(sim.geom.cell_centers_1d(0, 0))

    def ash_front(u):
        xash = np.asarray(sim.interior(u))[L.UFS + 1]
        rho = np.asarray(sim.interior(u))[L.URHO]
        frac = xash / rho
        idx = np.where(frac > 0.5)[0]
        return x[idx.max()] if idx.size else 0.0

    u = sim.u
    f0 = ash_front(u)
    t = 0.0
    for _ in range(220):
        dt = float(sim._jit_estdt(u)) * 0.5
        u, _, bad = sim._jit_step(u, dt, t)
        t += dt
        assert not bool(bad)
    f1 = ash_front(u)
    ui = np.asarray(sim.interior(u))
    assert np.isfinite(ui).all()
    # the burning front moved into the fuel
    assert f1 > f0 + 2 * (x[1] - x[0]), (f0, f1)
    # energy release heated the ash region above the fuel temperature
    assert ui[L.UTEMP].max() > 2.5
