"""Tests for the unit_tests / science problem ports (reference
Exec/unit_tests/{diffusion_test,particles_test}, Exec/scf_tests/single_star,
Exec/science/{celldet,planet,bwp-rad}, Exec/hydro_tests/acoustic_pulse_general)."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import unit_tests as ut
from castro_tpu.problems import science_extra as se
from castro_tpu.problems import acoustic_pulse as ap


def test_diffusion_test_matches_heat_kernel():
    """Gaussian T pulse diffuses per the exact heat-kernel evolution
    (reference diffusion_test/analysis)."""
    sim = Simulation(ut.diffusion_params(n=128, dim=1),
                     problem_init=ut.diffusion_init)
    sim.init_data()
    L = sim.layout
    pp = dict(ut.DT_DEFAULTS)
    dt = 2.0e-6
    t = 0.0
    u = sim.u
    for _ in range(500):
        u, _, bad = sim._jit_step(u, dt, t)
        t += dt
        assert not bool(bad)
    Tnum = np.asarray(sim.interior(u))[L.UTEMP]
    x = np.asarray(sim.geom.cell_centers_1d(0)) - 0.5
    Texact = ut.diffusion_exact(x, t, pp)
    err = np.abs(Tnum - Texact).max()
    assert err < 5e-3, err


def test_particles_test_solid_body_rotation():
    """Tracers in a solid-body vortex return toward their start after a
    full period (RK2 advection, reference particles_test)."""
    from castro_tpu.particles import TracerParticles

    sim = Simulation(ut.particles_params(n=64),
                     problem_init=ut.particles_init)
    sim.init_data()
    pts = np.array([[0.7, 0.5], [0.5, 0.65]])
    tp = TracerParticles(sim, pts)
    # hold the flow frozen (solid-body rotation is steady to leading
    # order); advance particles through one full period T = 2*pi/amp
    period = 2.0 * np.pi
    nsteps = 400
    dt = period / nsteps
    for _ in range(nsteps):
        tp.advance(dt)
    end = np.asarray(tp.x)
    assert np.abs(end - pts).max() < 0.02, end


def test_single_star_scf_through_driver():
    """scf_tests/single_star: the do_scf_initial_model path builds a
    Lane-Emden n=1 polytrope at init_data time."""
    sim = Simulation(ut.single_star_params(n=32),
                     problem_init=ut.single_star_init)
    sim.init_data()
    L = sim.layout
    rho = np.asarray(sim.interior(sim.u))[L.URHO]
    assert rho.max() > 0.5  # central density ~ scf_maximum_density
    # star is compact: density drops by >100x from center to edge
    assert rho.max() / np.median(rho) > 50.0


def test_celldet_ignites():
    """The burn is violent at T_l = 1e9: drive through Simulation.run so
    the dtnuc limiter + retry machinery control the step (as the
    reference does for this problem)."""
    sim = Simulation(se.celldet_params(n=(128, 32)),
                     problem_init=se.celldet_init)
    sim.init_data()
    L = sim.layout
    u0 = np.asarray(sim.interior(sim.u))
    sim.run(max_step=10, verbose=False)
    ui = np.asarray(sim.interior(sim.u))
    assert np.isfinite(ui).all()
    # the hot side burns: heavier ash beyond O16 accumulates
    heavy0 = u0[L.UFS + 3 :].sum()
    heavy1 = ui[L.UFS + 3 :].sum()
    assert heavy1 > heavy0


def test_planet_shear_atmosphere():
    sim = Simulation(se.planet_params(n=(32, 128)),
                     problem_init=se.planet_init)
    sim.init_data()
    L = sim.layout
    u0 = np.asarray(sim.interior(sim.u))
    # shear band present
    vx = u0[L.UMX] / u0[L.URHO]
    assert vx.max() > 1e5 and vx.min() < -1e5
    u = sim.u
    for _ in range(10):
        d = float(sim._jit_estdt(u)) * 0.4
        u, _, bad = sim._jit_step(u, d, 0.0)
        assert not bool(bad)
    assert np.isfinite(np.asarray(sim.interior(u))).all()


@pytest.mark.slow
def test_bwp_rad_star_smoke():
    sim = Simulation(se.bwp_rad_params(n=(32, 64)),
                     problem_init=se.bwp_rad_init)
    sim.init_data()
    L = sim.layout
    rho = np.asarray(sim.interior(sim.u))[L.URHO]
    assert rho.max() > 10.0  # central star present
    u, Er = sim.u, sim.u_rad
    for _ in range(5):
        d = float(sim._jit_estdt(u)) * 0.3
        u, Er, _, bad = sim._jit_rad_step(u, Er, d, 0.0)
        assert not bool(bad)
    assert np.isfinite(np.asarray(Er)).all()


@pytest.mark.slow
def test_acoustic_pulse_general_isentropic():
    sim = Simulation(ap.general_params(n=32, dim=2),
                     problem_init=ap.general_init)
    sim.init_data()
    L = sim.layout
    u0 = np.asarray(sim.interior(sim.u))
    assert u0[L.UTEMP].max() > 1.2 * np.median(u0[L.UTEMP])
    u = sim.u
    for _ in range(10):
        d = float(sim._jit_estdt(u)) * 0.4
        u, _, bad = sim._jit_step(u, d, 0.0)
        assert not bool(bad)
    assert np.isfinite(np.asarray(sim.interior(u))).all()
