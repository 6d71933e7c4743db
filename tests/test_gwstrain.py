"""GW strain diagnostics (reference Castro::gwstrain,
sum_utils.cpp:343-661)."""

import numpy as np
import jax.numpy as jnp

from castro_tpu.driver.sim import Simulation
from castro_tpu.driver import diagnostics as diag
from castro_tpu.problems import gravity_tests as gt
from castro_tpu.utils import constants as C


def _sim_with_quadrupole():
    p = gt.evrard_params(n=16).with_ns("castro", gw_dist=10.0)
    sim = Simulation(p, problem_init=gt.evrard_init)
    sim.init_data()
    L = sim.layout
    u = sim.u
    g = sim.geom
    sh = u.shape[1:]
    x = jnp.broadcast_to(g.cell_centers(0, sim.ng), sh)
    y = jnp.broadcast_to(g.cell_centers(1, sim.ng), sh)
    R = abs(float(g.prob_hi[0]))
    u = u.at[L.UMX].set(u[L.URHO] * 1e7 * y / R)
    u = u.at[L.UMY].set(u[L.URHO] * 1e7 * x / R)
    sim.u = u
    return sim


def test_gwstrain_nonzero_and_traceless():
    sim = _sim_with_quadrupole()
    out = diag.gwstrain(sim)
    assert set(out) == {"h_plus_1", "h_cross_1", "h_plus_2", "h_cross_2",
                        "h_plus_3", "h_cross_3"}
    vals = np.array(list(out.values()))
    assert np.isfinite(vals).all()
    assert np.abs(vals).max() > 0.0
    # strain amplitude scales like 1/distance
    sim.params = sim.params.with_ns("castro", gw_dist=20.0)
    out2 = diag.gwstrain(sim)
    k = "h_plus_3"
    if abs(out[k]) > 0:
        assert abs(out2[k] / out[k] - 0.5) < 1e-10


def test_gwstrain_off_when_disabled():
    p = gt.evrard_params(n=16)  # gw_dist defaults to -1
    sim = Simulation(p, problem_init=gt.evrard_init)
    sim.init_data()
    assert diag.gwstrain(sim) == {}


def test_gwstrain_in_sum_integrated():
    sim = _sim_with_quadrupole()
    sums = diag.sum_integrated_quantities(sim)
    assert "h_plus_1" in sums and np.isfinite(sums["h_plus_1"])
