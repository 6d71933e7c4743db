"""flame_wave science configuration (BASELINE A5): Helmholtz EOS +
aprox13 burning + conduction + constant gravity + HSE boundary, composed
through the production driver."""

import numpy as np
import pytest

from castro_tpu.problems import flame_wave


@pytest.mark.slow
def test_flame_wave_ignites_and_stays_bound():
    sim = flame_wave.build(n=(64, 32))
    sim.init_data()
    L = sim.layout
    T0 = np.asarray(sim.interior())[L.UTEMP]
    assert T0.max() > 3.5e8  # hot patch present

    for _ in range(5):
        dt = sim.estimate_dt()
        sim.advance(dt)
    ui = np.asarray(sim.interior())
    T1 = ui[L.UTEMP]
    assert np.all(np.isfinite(ui))
    # the burn deposits energy: peak T does not fall, carbon appears
    assert T1.max() >= 0.95 * T0.max()
    xc12 = ui[L.UFS + 1] / ui[L.URHO]
    assert xc12.max() > 1e-10, xc12.max()
    # atmosphere remains bound / subsonic outside the ignition region
    v = np.abs(ui[L.UMY] / ui[L.URHO])
    assert v.max() < 1e8, v.max()
