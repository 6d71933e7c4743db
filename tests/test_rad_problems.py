"""Radiation problem-suite checks (reference Exec/radiation_tests:
RadSourceTest cooling equilibration vs the exact relaxation solution,
RadThermalWave propagation + energy budget)."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import rad_tests as rt
from castro_tpu.utils import constants as C


def test_rad_source_cooling_equilibrates():
    """RadSourceTest inputs-cooling: hot matter in a cold-ish radiation
    bath relaxes toward T^4 equilibrium; the late-time state satisfies
    rho e + Er = const and Er ~ a T^4 (the reference compares against
    analytic.f90's exact integral — we pin the equilibrium + the
    early-time linear cooling rate)."""
    sim = Simulation(rt.rad_source_params(), problem_init=rt.rad_source_init)
    sim.init_data()
    sim.u_rad = rt.rad_source_Er0(sim)
    L = sim.layout
    rho = 1e-7
    rhoe0 = 1e9
    Er0 = 1e12
    cv = rt.RS_DEFAULTS["cv"]
    kp = rt.RS_DEFAULTS["kappa_p"]

    # early-time: d(rho e)/dt = -c kappa_p (a T^4 - Er). dt must satisfy
    # beta*kappa*c*dt << 1 or the implicit eta-weighting (correctly)
    # damps the first-step rate.
    T0 = rhoe0 / rho / cv
    rate0 = C.c_light * kp * (C.a_rad * T0**4 - Er0)
    dt = 1e-13
    u, Er = sim.u, sim.u_rad
    u1, Er1, _, _ = sim._jit_rad_step(u, Er, dt, 0.0)
    drhoe = float(sim.interior(u1)[L.UEINT].mean()) - rhoe0
    assert np.isclose(drhoe / dt, -rate0, rtol=0.05), (drhoe / dt, -rate0)

    # run to equilibrium
    t = 0.0
    for _ in range(200):
        u, Er, _, _ = sim._jit_rad_step(u, Er, 5e-9, t)
        t += 5e-9
    rhoe_f = float(sim.interior(u)[L.UEINT].mean())
    Er_f = float(jnp.mean(Er))
    # energy budget closed
    assert np.isclose(rhoe_f + Er_f, rhoe0 + Er0, rtol=1e-6)
    # matter-radiation equilibrium: Er ~ a T^4
    T_f = rhoe_f / rho / cv
    assert np.isclose(Er_f, C.a_rad * T_f**4, rtol=0.02), \
        (Er_f, C.a_rad * T_f**4)


def test_thermal_wave_propagates():
    """RadThermalWave: the thermal wave front expands, conserving the
    deposited energy (matter + radiation), with the interior relaxing
    toward radiative equilibrium."""
    sim = Simulation(rt.thermal_wave_params(n=64),
                     problem_init=rt.thermal_wave_init)
    sim.init_data()
    L = sim.layout
    # cold ambient radiation field (the default init equilibrates Er with
    # the hot core, which would dominate the energy budget; the thermal
    # wave physics is matter energy diffusing outward radiatively)
    sim.u_rad = jnp.full_like(sim.u_rad, C.a_rad * 1e-6**4 + 1e-30)
    ng = sim.ng
    r = np.asarray(sim.geom.cell_centers_1d(0, 0))
    dr = r[1] - r[0]
    r_f = np.asarray(sim.geom.faces_1d(0, 0))
    vol = 4.0 * np.pi / 3.0 * (r_f[1:] ** 3 - r_f[:-1] ** 3)

    def front(u, Er):
        T = np.asarray(sim.interior(u))[L.UTEMP]
        Tmax = T.max()
        idx = np.where(T > 0.01 * Tmax)[0]
        return r[idx.max()] if idx.size else 0.0

    def energy(u, Er):
        ui = np.asarray(sim.interior(u))
        return float((vol * (ui[L.UEINT] + np.asarray(Er))).sum())

    u, Er = sim.u, sim.u_rad
    E0 = energy(u, Er)
    f0 = front(u, Er)
    t = 0.0
    dt = 1e-10
    for _ in range(120):
        u, Er, _, bad = sim._jit_rad_step(u, Er, dt, t)
        t += dt
        assert not bool(bad)
    f1 = front(u, Er)
    E1 = energy(u, Er)
    assert f1 > f0 + 3 * dr, (f0, f1)
    assert np.isclose(E1, E0, rtol=1e-3), (E0, E1)
    assert np.isfinite(np.asarray(u)).all()
