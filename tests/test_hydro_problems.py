"""Hydro problem-suite checks (reference Exec/hydro_tests: KH, RT, Noh,
gresho_vortex, oddeven)."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import hydro_tests as ht


def _advance(sim, nsteps, dt=None):
    u = sim.u
    for _ in range(nsteps):
        d = dt if dt is not None else float(sim._jit_estdt(u)) * 0.5
        u, _, bad = sim._jit_step(u, d, 0.0)
        assert not bool(bad)
    return u


def test_noh_postshock_density_1d_spherical():
    """Noh implosion in 1D spherical symmetry: the stagnated density
    plateaus at the exact ((g+1)/(g-1))^3 = 64 for gamma = 5/3 (shock
    at r = t/3)."""
    n = 256
    sim = Simulation(ht.noh_params(n=n, dim=1, coord=2),
                     problem_init=ht.noh_init)
    sim.init_data()
    u = sim.u
    t = 0.0
    dt = 5e-4
    for _ in range(600):
        u, _, bad = sim._jit_step(u, dt, t)
        t += dt
        assert not bool(bad)
    L = sim.layout
    rho = np.asarray(sim.interior(u))[L.URHO]
    exact = ht.noh_postshock_density(5.0 / 3.0, dim=3)
    r = (np.arange(n) + 0.5) / n
    sel = (r < 0.8 * t / 3.0) & (r > 4.0 / n)
    assert sel.sum() > 10
    core = float(np.median(rho[sel]))
    assert abs(core - exact) / exact < 0.1, (core, exact)


def test_noh_2d_smoke():
    """2D Cartesian-octant Noh stays finite and forms the stagnation
    shock (quantitative plateau needs far higher resolution on a
    Cartesian grid — the 1D spherical test above checks the value)."""
    sim = Simulation(ht.noh_params(n=48, dim=2), problem_init=ht.noh_init)
    sim.init_data()
    u = sim.u
    for _ in range(60):
        u, _, bad = sim._jit_step(u, 2e-3, 0.0)
        assert not bool(bad)
    L = sim.layout
    rho = np.asarray(sim.interior(u))[L.URHO]
    assert np.isfinite(rho).all()
    assert rho.max() > 8.0


def test_gresho_vortex_stationary():
    """The Gresho vortex is an exact steady state: after a dynamical time
    the azimuthal velocity profile is preserved."""
    sim = Simulation(ht.gresho_params(n=64), problem_init=ht.gresho_init)
    sim.init_data()
    L = sim.layout
    u0 = np.asarray(sim.interior())
    u = _advance(sim, 40, dt=2e-3)
    u1 = np.asarray(sim.interior(u))
    ke0 = 0.5 * ((u0[L.UMX] ** 2 + u0[L.UMY] ** 2) / u0[L.URHO]).sum()
    ke1 = 0.5 * ((u1[L.UMX] ** 2 + u1[L.UMY] ** 2) / u1[L.URHO]).sum()
    assert ke1 > 0.85 * ke0, (ke0, ke1)
    # velocity field still correlates strongly with the initial one
    c = np.corrcoef(u0[L.UMX].ravel(), u1[L.UMX].ravel())[0, 1]
    assert c > 0.99, c


def test_kh_grows():
    sim = Simulation(ht.kh_params(n=48), problem_init=ht.kh_init)
    sim.init_data()
    L = sim.layout
    u = _advance(sim, 40)
    ui = np.asarray(sim.interior(u))
    assert np.isfinite(ui).all()
    # transverse kinetic energy grows from the seed
    key0 = 0.0  # seed has w0=0.1 sine only
    key = (ui[L.UMY] ** 2 / ui[L.URHO]).sum()
    assert key > 0.0


def test_rt_sinks():
    sim = Simulation(ht.rt_params(n=(32, 64)), problem_init=ht.rt_init)
    sim.init_data()
    L = sim.layout
    u = _advance(sim, 30)
    ui = np.asarray(sim.interior(u))
    assert np.isfinite(ui).all()
    # gravity accelerates the interface: downward momentum appears
    assert np.abs(ui[L.UMY]).max() > 1e-3


def test_oddeven_hybrid_riemann_stable():
    """Strong grid-aligned shock with a seeded odd-even perturbation:
    with hybrid_riemann=1 (HLL inside shocks) the flow stays finite and
    the post-shock state remains coherent."""
    sim = Simulation(ht.oddeven_params(n=48), problem_init=ht.oddeven_init)
    sim.init_data()
    u = sim.u
    for _ in range(30):
        dt = float(sim._jit_estdt(u)) * 0.4
        u, _, bad = sim._jit_step(u, dt, 0.0)
        assert not bool(bad)
    ui = np.asarray(sim.interior(u))
    assert np.isfinite(ui).all()
    L = sim.layout
    # colliding flows produce a high-density central slab
    assert ui[L.URHO].max() > 3.0


def test_lw_acoustics_vortex_pair_corotation():
    """Vortices_LWAcoustics (Lee & Koo 1995): a co-rotating pair of
    vortices separated by 2 r_0 spins about its centroid at
    omega = circ / (4 pi r_0^2) (point-vortex mutual induction).  The
    reference inputs resolve the r_c = 0.0375 cores with 5 AMR levels;
    here the pair is rescaled (r_0 = 5, ratio_c = 0.3) so a flat 96^2
    grid resolves it, and the measured rotation rate and sense
    (clockwise for the reference sign convention) are checked."""
    n = 96
    r_0, ratio_c, r_circ = 5.0, 0.3, 2.0
    sim = Simulation(ht.lw_acoustics_params(n=n, r_0=r_0, ratio_c=ratio_c,
                                            r_circ=r_circ),
                     problem_init=ht.lw_acoustics_init)
    sim.init_data()
    L = sim.layout
    dx = sim.geom.dx[0]
    xc = 0.5 * sim.params.geometry.prob_hi[0]

    def vortex_angle(u):
        q = np.asarray(sim.interior(u))
        vx = q[L.UMX] / q[L.URHO]
        vy = q[L.UMY] / q[L.URHO]
        wz = np.gradient(vy, dx, axis=0) - np.gradient(vx, dx, axis=1)
        core = wz < 0.5 * wz.min()          # clockwise cores: wz < 0
        xi = (np.arange(n) + 0.5) * dx
        X, Y = np.meshgrid(xi, xi, indexing="ij")
        # centroid of the upper-half core (one vortex of the pair)
        sel = core & (Y > xc)
        w = -wz * sel
        x0 = (X * w).sum() / w.sum()
        y0 = (Y * w).sum() / w.sum()
        return np.arctan2(y0 - xc, x0 - xc)

    th0 = vortex_angle(sim.u)
    u = sim.u
    t = 0.0
    for _ in range(60):
        d = float(sim._jit_estdt(u)) * 0.5
        u, _, bad = sim._jit_step(u, d, t)
        t += d
        assert not bool(bad)
    th1 = vortex_angle(u)
    dth = (th1 - th0 + np.pi) % (2.0 * np.pi) - np.pi

    gamma = 1.4
    p_ref = ht.LWA_DEFAULTS["p_ref"]
    rho0 = p_ref ** (1.0 / gamma)
    c0 = np.sqrt(gamma * p_ref / rho0)
    circ = r_circ * r_0 * c0
    omega = circ / (4.0 * np.pi * r_0 ** 2)
    expected = -omega * t  # clockwise
    assert dth < -0.05, (dth, expected)
    assert abs(dth - expected) < 0.5 * abs(expected), (dth, expected)
