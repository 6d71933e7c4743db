"""Tests for RadSuOlsonMG / RadBlastWave / RadBreakout (reference
Exec/radiation_tests/{RadSuOlsonMG,RadBlastWave,RadBreakout}) and the
filter_prim plumbing."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import su_olson, rad_blast, rad_breakout
from castro_tpu.utils import constants as C


def test_su_olson_mg_source_energy_balance():
    """While the qn pulse is on, total (rad + matter) energy equals the
    injected 2 * qn * x0 * t to high accuracy (the domain is optically
    thick and 102 mfp deep, so boundary losses are negligible)."""
    sim = Simulation(su_olson.mg_params(n=256), problem_init=su_olson.mg_init)
    sim.init_data()
    su_olson.mg_setup_radiation(sim)
    L = sim.layout
    dx = float(sim.geom.dx[0])
    dt = float(sim.params.castro.fixed_dt)
    e_mat0 = float(np.sum(np.asarray(sim.interior(sim.u))[L.UEINT])) * dx

    u, Er, t = sim.u, sim.u_rad, 0.0
    nsteps = 20
    for _ in range(nsteps):
        u, Er, _, bad = sim._jit_rad_step(u, Er, dt, t)
        t += dt
        assert not bool(bad)
    assert t < su_olson.MG_T_STOP  # still inside the pulse

    e_rad = float(np.sum(np.asarray(Er))) * dx
    e_mat = float(np.sum(np.asarray(sim.interior(u))[L.UEINT])) * dx
    # injected energy uses the DISCRETIZED source support (cells whose
    # center lies inside |x| <= x0), matching the rhs deposition
    x = np.asarray(sim.geom.cell_centers_1d(0))
    n_src = int(np.sum(np.abs(x) <= su_olson.MG_X0))
    injected = 2.0 * su_olson.MG_QN * (n_src * dx) * t
    total = e_rad + (e_mat - e_mat0)
    assert abs(total - injected) / injected < 0.02, (total, injected)


def test_su_olson_mg_picket_fence_group_asymmetry():
    """kappa ~ nu^2 makes group 1 ~100x more opaque than group 0: the
    thick group stays trapped near the source while the thin group
    diffuses much further (the picket-fence physics of Su & Olson 1999)."""
    sim = Simulation(su_olson.mg_params(n=256), problem_init=su_olson.mg_init)
    sim.init_data()
    su_olson.mg_setup_radiation(sim)
    dt = float(sim.params.castro.fixed_dt)
    u, Er, t = sim.u, sim.u_rad, 0.0
    for _ in range(60):
        u, Er, _, bad = sim._jit_rad_step(u, Er, dt, t)
        t += dt
    Er = np.asarray(Er)
    x = np.asarray(sim.geom.cell_centers_1d(0))
    far = x > 3.0  # several thin-group mfp beyond the source
    # thin group (0) reaches far field; thick group (1) is trapped (its
    # far-field level is only matter re-emission)
    assert Er[0][far].max() > 10.0 * Er[1][far].max(), (
        Er[0][far].max(), Er[1][far].max())


def test_rad_blast_wave_smoke():
    """1D spherical radiation blast: stays finite, radiation front runs
    ahead of the hot sphere."""
    sim = Simulation(rad_blast.make_params(n=128),
                     problem_init=rad_blast.problem_init)
    sim.init_data()
    L = sim.layout
    Er0 = np.asarray(sim.u_rad)
    u, Er, t = sim.u, sim.u_rad, 0.0
    dt = 2.0e3  # hydro CFL is ~8800 s; the FLD update is implicit
    for _ in range(30):
        u, Er, _, bad = sim._jit_rad_step(u, Er, dt, t)
        t += dt
        assert not bool(bad)
    Er = np.asarray(Er)
    assert np.isfinite(Er).all()
    r = np.asarray(sim.geom.cell_centers_1d(0))
    r1 = rad_blast.DEFAULTS["r1"] * float(sim.geom.prob_hi[0])
    dx = float(sim.geom.dx[0])
    # the diffusion length after 6e4 s is ~2 cells: the band just outside
    # the hot sphere has heated by the advancing radiation front
    band = (r > r1 + dx) & (r < r1 + 4 * dx)
    assert Er[band].max() > 10.0 * Er0[band].max()


@pytest.mark.slow
def test_rad_breakout_smoke():
    """SN envelope + wind profile: monotone wind tail, homologous ejecta,
    and a stable first few rad-hydro steps with filter_prim on."""
    sim = Simulation(rad_breakout.make_params(n=512),
                     problem_init=rad_breakout.problem_init)
    sim.init_data()
    L = sim.layout
    ui = np.asarray(sim.interior(sim.u))
    r = np.asarray(sim.geom.cell_centers_1d(0))
    rho = ui[L.URHO]
    # wind region: rho ~ r^-2
    wind = r > rad_breakout.DEFAULTS["rwind0"]
    lr = np.log(r[wind])
    lrho = np.log(rho[wind])
    slope = np.polyfit(lr, lrho, 1)[0]
    assert abs(slope + 2.0) < 0.1, slope
    # run a few steps through Simulation.run to exercise filter_prim
    sim.run(max_step=3, verbose=False)
    assert np.isfinite(np.asarray(sim.u)).all()
    assert np.isfinite(np.asarray(sim.u_rad)).all()


def test_filter_prim_conserves_reasonably():
    """The Purser filter preserves the mean and damps the Nyquist mode."""
    from castro_tpu.radiation.filter import apply_filter

    x = np.arange(64)
    f = 1.0 + 0.1 * (-1.0) ** x  # Nyquist oscillation
    out = np.asarray(apply_filter(jnp.asarray(f), 4))
    assert abs(out.mean() - f.mean()) < 0.01
    # interior (away from the clamped edges): Nyquist mode annihilated
    assert np.abs(out[8:-8] - 1.0).max() < 1e-12
