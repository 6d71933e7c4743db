"""Sedov blast verification (reference `Exec/hydro_tests/Sedov`,
`Docs/source/Verification.rst`): symmetry + Sedov-Taylor similarity scaling
of the shock radius."""

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
    params = sedov.make_params(n=128, dim=2, stop_time=0.05, r_init=0.03)
    sim = Simulation(params, problem_init=sedov.problem_init)
    sim.run(verbose=False)
    L = sim.layout
    rho = np.asarray(sim.interior()[L.URHO])

    # x<->y mirror symmetry of the blast
    assert np.allclose(rho, rho.T, rtol=1e-10, atol=1e-10)
    # quadrant reflection symmetry
    assert np.allclose(rho, rho[::-1, :], rtol=1e-10, atol=1e-10)

    # cylindrical Sedov: r_s = xi0 * (E t^2 / rho)^(1/4), xi0(gamma=1.4)~1.0
    r_s = shock_radius(sim)
    expected = 1.0 * (1.0 * sim.t**2 / 1.0) ** 0.25
    assert abs(r_s - expected) / expected < 0.15, (r_s, expected)

    # compression ratio approaches (gamma+1)/(gamma-1) = 6
    assert rho.max() > 3.0
    assert rho.min() > 0.0


def test_sedov_2d_shock_position_converges():
    """Shock radius scaling r ~ t^(1/2) between two times (similarity)."""
    params = sedov.make_params(n=128, dim=2, stop_time=0.03, r_init=0.03)
    sim = Simulation(params, problem_init=sedov.problem_init)
    sim.run(verbose=False)
    r1, t1 = shock_radius(sim), sim.t
    sim.run(stop_time=0.06, verbose=False)
    r2, t2 = shock_radius(sim), sim.t
    got = np.log(r2 / r1) / np.log(t2 / t1)
    assert abs(got - 0.5) < 0.1, got
