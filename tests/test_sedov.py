"""Sedov blast verification (reference `Exec/hydro_tests/Sedov`,
`Docs/source/Verification.rst`): symmetry, positivity, outward shock
propagation, and compression. (The full analytic-profile comparison at
reference resolution runs in the benchmark configs, not CPU CI.)"""

import numpy as np
import pytest

from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import sedov


def shock_radius(sim):
    """Radius of the peak-density ring."""
    L = sim.layout
    rho = np.asarray(sim.interior()[L.URHO])
    g = sim.geom
    centers = [np.asarray(g.cell_centers_1d(d, 0)) for d in range(g.dim)]
    mesh = np.meshgrid(*centers, indexing="ij")
    c = [0.5 * (g.prob_lo[d] + g.prob_hi[d]) for d in range(g.dim)]
    r = np.sqrt(sum((m - cc) ** 2 for m, cc in zip(mesh, c)))
    return r.ravel()[np.argmax(rho.ravel())]


def test_sedov_2d_symmetry_and_shock():
    params = sedov.make_params(n=64, dim=2, stop_time=0.05, r_init=0.1,
                               exp_energy=0.3)
    sim = Simulation(params, problem_init=sedov.problem_init)
    sim.run(verbose=False)
    L = sim.layout
    rho = np.asarray(sim.interior()[L.URHO])

    # x<->y mirror symmetry and quadrant reflection symmetry of the blast
    assert np.allclose(rho, rho.T, rtol=1e-10, atol=1e-10)
    assert np.allclose(rho, rho[::-1, :], rtol=1e-10, atol=1e-10)
    assert np.allclose(rho, rho[:, ::-1], rtol=1e-10, atol=1e-10)

    assert rho.min() > 0.0
    assert rho.max() > 2.0  # shock compression
    r1 = shock_radius(sim)
    assert r1 > 0.12  # shock moved outward of the deposit region

    sim.run(stop_time=0.1, verbose=False)
    r2 = shock_radius(sim)
    assert r2 > r1  # still expanding
