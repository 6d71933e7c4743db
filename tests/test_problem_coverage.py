"""Coverage tests for the round-3 problem additions (reference
Exec/hydro_tests/{gamma_law_bubble,double_bubble,toy_convect,test_convect,
riemann_2d} and Exec/gravity_tests/{StarGrav,hydrostatic_adjust,
hse_convergence_general})."""

import numpy as np
import pytest

from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import bubbles, convect, riemann_2d
from castro_tpu.problems import gravity_tests as gt


def _run(sim, nsteps, dt=None, t0=0.0):
    u = sim.u
    t = t0
    for _ in range(nsteps):
        d = dt if dt is not None else float(sim._jit_estdt(u)) * 0.5
        u, _, bad = sim._jit_step(u, d, t)
        t += d
        assert not bool(bad)
    return u, t


def test_gamma_law_bubble_rises():
    sim = Simulation(bubbles.gamma_law_params(n=(64, 64)),
                     problem_init=bubbles.gamma_law_init)
    sim.init_data()
    L = sim.layout
    u0 = np.asarray(sim.interior(sim.u))
    # the perturbation is an isobaric hot spot: T max above background
    assert u0[L.UTEMP].max() > 1.01 * np.median(u0[L.UTEMP])
    u, _ = _run(sim, 40)
    ui = np.asarray(sim.interior(u))
    assert np.isfinite(ui).all()
    # buoyancy: upward momentum where the bubble was
    assert ui[L.UMY].max() > 0.0


def test_double_bubble_species_buoyancy():
    sim = Simulation(bubbles.double_bubble_params(n=(64, 64)),
                     problem_init=bubbles.double_bubble_init)
    sim.init_data()
    L = sim.layout
    u0 = np.asarray(sim.interior(sim.u))
    # two distinct bubble species present
    assert u0[L.UFS + 1].max() > 0.0 and u0[L.UFS + 2].max() > 0.0
    u, _ = _run(sim, 30)
    ui = np.asarray(sim.interior(u))
    assert np.isfinite(ui).all()
    # both bubbles buoyant: upward momentum in each bubble's column
    nx = ui.shape[1]
    assert ui[L.UMY, : nx // 2].max() > 0.0
    assert ui[L.UMY, nx // 2 :].max() > 0.0


def test_riemann_2d_config3():
    sim = Simulation(riemann_2d.make_params(n=64, config=3),
                     problem_init=riemann_2d.problem_init)
    sim.init_data()
    u, t = _run(sim, 60)
    L = sim.layout
    ui = np.asarray(sim.interior(u))
    assert np.isfinite(ui).all()
    # the c3 quadrant interaction drives a density spike well above any
    # initial quadrant value near the center
    assert ui[L.URHO].max() > 1.5


def test_riemann_2d_all_configs_init():
    for cfg in sorted(riemann_2d.CONFIGS):
        sim = Simulation(riemann_2d.make_params(n=16, config=cfg),
                         problem_init=riemann_2d.problem_init)
        sim.init_data()
        assert np.isfinite(np.asarray(sim.u)).all()


@pytest.mark.slow
def test_toy_convect_vortices():
    sim = Simulation(convect.toy_convect_params(n=(32, 64)),
                     problem_init=convect.toy_convect_init)
    sim.init_data()
    L = sim.layout
    u0 = np.asarray(sim.interior(sim.u))
    # vortex velocity field applied
    assert np.abs(u0[L.UMX]).max() > 0.0
    u, _ = _run(sim, 10)
    assert np.isfinite(np.asarray(sim.interior(u))).all()


@pytest.mark.slow
def test_test_convect_heating_layer():
    """The problem_source heating layer deposits energy: compare against
    a control run without the source (the raw atmosphere drifts by ~1%
    as it relaxes numerically, so an absolute check would be buried).
    The heating rate is boosted so 10 steps give a clear signal."""
    params = convect.test_convect_params(n=(32, 64), heating_peak=2.5e19)
    src = convect.make_test_convect_source(params)
    sim = Simulation(params, problem_init=convect.test_convect_init,
                     ext_src=src)
    sim.init_data()
    ctl = Simulation(convect.test_convect_params(n=(32, 64)),
                     problem_init=convect.test_convect_init)
    ctl.init_data()
    L = sim.layout
    dt = float(sim._jit_estdt(sim.u)) * 0.4
    u, _ = _run(sim, 10, dt=dt)
    uc, _ = _run(ctl, 10, dt=dt)
    e1 = float(np.sum(np.asarray(sim.interior(u))[L.UEINT]))
    ec = float(np.sum(np.asarray(ctl.interior(uc))[L.UEINT]))
    assert np.isfinite(e1)
    assert e1 > ec  # the heating layer deposits energy vs the control


@pytest.mark.slow
def test_star_grav_holds_hse():
    sim = Simulation(gt.star_grav_params(n=256),
                     problem_init=gt.star_grav_init)
    sim.init_data()
    L = sim.layout
    u, _ = _run(sim, 30)
    ui = np.asarray(sim.interior(u))
    assert np.isfinite(ui).all()
    # the star should stay near HSE: Mach number of the induced flow
    # stays small in the bulk (rho > 1e7 core region)
    sel = ui[L.URHO] > 1e7
    v = np.abs(ui[L.UMX][sel] / ui[L.URHO][sel])
    # sound speed in a 2e9 g/cc WD core is ~1e9 cm/s
    assert v.max() < 5e7, v.max()


@pytest.mark.slow
def test_hse_adjust_heating_expands_star():
    params = gt.hse_adjust_params(n=256, heating_time=0.5,
                                  heating_peak=1e16, heating_sigma=1e7)
    src = gt.make_hse_adjust_source(params)
    sim = Simulation(params, problem_init=gt.hse_adjust_init, ext_src=src)
    sim.init_data()
    L = sim.layout
    e0 = float(np.sum(np.asarray(sim.interior(sim.u))[L.UEINT]))
    u, _ = _run(sim, 20)
    e1 = float(np.sum(np.asarray(sim.interior(u))[L.UEINT]))
    assert e1 > e0  # central heating deposits energy before t_stop


@pytest.mark.slow
def test_hse_general_velocity_stays_small():
    sim = Simulation(gt.hse_general_params(n=128),
                     problem_init=gt.hse_general_init)
    sim.init_data()
    L = sim.layout
    u, _ = _run(sim, 30)
    ui = np.asarray(sim.interior(u))
    assert np.isfinite(ui).all()
    rho = ui[L.URHO]
    sel = rho > 1e3
    mach_proxy = np.abs(ui[L.UMX][sel] / rho[sel])
    # fuel-layer sound speed ~ 5e8 cm/s; HSE drift must stay well below
    assert mach_proxy.max() < 5e6, mach_proxy.max()
