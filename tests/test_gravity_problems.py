"""Gravity problem-suite checks (reference Exec/gravity_tests:
uniform_cube_sphere analytic potential, Evrard collapse)."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import gravity_tests as gt
from castro_tpu.utils import constants as C


def test_uniform_sphere_potential_matches_analytic():
    """Isolated Poisson solve of a uniform sphere: phi matches the closed
    form (interior parabola + exterior -GM/r) to a few percent at n=32
    (reference's uniform_cube_sphere test compares exactly this)."""
    n = 32
    sim = Simulation(gt.cube_sphere_params(n=n),
                     problem_init=gt.cube_sphere_init)
    sim.init_data()
    grav = next(s for s in sim.source_fns
                if s.__class__.__name__ == "GravitySource").gravity
    rho = sim.interior()[sim.layout.URHO]
    g, phi = grav.grav_vector(rho)
    assert phi is not None
    phi = np.asarray(phi)

    x = np.asarray(sim.geom.cell_centers_1d(0, 0))
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    r = np.sqrt(X**2 + Y**2 + Z**2)
    exact = gt.sphere_potential_exact(r, 0.5, 1.0)

    # compare up to the constant offset convention on the exterior shell
    sel_out = (r > 0.7) & (r < 1.4)
    off = np.median(phi[sel_out] - exact[sel_out])
    err = np.abs(phi - off - exact) / np.abs(exact)
    assert np.median(err[r < 1.4]) < 0.05, np.median(err[r < 1.4])
    # interior parabola shape: center-to-edge potential drop
    drop_num = (phi - off)[n // 2, n // 2, n // 2] - np.interp(
        0.5, x[n // 2:], (phi - off)[n // 2:, n // 2, n // 2])
    drop_exact = exact.min() - gt.sphere_potential_exact(
        np.array([0.5]), 0.5, 1.0)[0]
    assert abs(drop_num / drop_exact - 1.0) < 0.1, (drop_num, drop_exact)


def test_uniform_cube_runs():
    sim = Simulation(gt.cube_sphere_params(n=16, problem=2),
                     problem_init=gt.cube_sphere_init)
    sim.init_data()
    grav = next(s for s in sim.source_fns
                if s.__class__.__name__ == "GravitySource").gravity
    g, phi = grav.grav_vector(sim.interior()[sim.layout.URHO])
    assert np.isfinite(np.asarray(g)).all()


def test_evrard_collapse_contracts():
    """Evrard collapse: the cold 1/r sphere contracts; central density
    grows and total energy (gas + potential via the virial trend) stays
    finite over the early collapse."""
    sim = Simulation(gt.evrard_params(n=24), problem_init=gt.evrard_init)
    sim.init_data()
    L = sim.layout
    rho0_max = float(sim.interior()[L.URHO].max())
    u = sim.u
    t = 0.0
    for _ in range(12):
        dt = float(sim._jit_estdt(u)) * 0.5
        u, _, bad = sim._jit_step(u, dt, t)
        t += dt
        assert not bool(bad)
    ui = np.asarray(sim.interior(u))
    assert np.isfinite(ui).all()
    assert ui[L.URHO].max() > 1.05 * rho0_max, \
        (rho0_max, ui[L.URHO].max())
