"""Science-problem setups: Sod_stellar (Helmholtz shock tubes),
sub_chandra (CO WD + He shell double-detonation setup).  Reference:
Exec/hydro_tests/Sod_stellar, Exec/science/subchandra."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import sod_stellar, subchandra
from castro_tpu.utils import constants as C


def test_sod_stellar_test1():
    """Stellar Sod tube (rho 1e7/1e6, T 1e8/1e6 through helmholtz): a
    right-moving shock + contact and a left rarefaction form; density
    stays bracketed and the solution is finite."""
    sim = Simulation(sod_stellar.make_params(test=1, n=64),
                     problem_init=sod_stellar.problem_init)
    sim.init_data()
    L = sim.layout
    t = 0.0
    u = sim.u
    for _ in range(25):
        dt = float(sim._jit_estdt(u)) * 0.8
        u, _, bad = sim._jit_step(u, dt, t)
        t += dt
        assert not bool(bad)
    ui = np.asarray(sim.interior(u))
    assert np.isfinite(ui).all()
    rho = ui[L.URHO]
    v = ui[L.UMX] / rho
    # wave system launched rightward into the low-pressure side
    assert v.max() > 1e7, v.max()
    assert rho.min() > 0.5e6 and rho.max() < 1.2e7
    # the interface moved right: the half-way density is above rho_r
    assert rho[40] > 1.5e6


def test_subchandra_model_mass_and_shell():
    """The generated WD model hits the target mass and carries a helium
    shell outside the CO core."""
    sim = Simulation(subchandra.make_params(dim=1, n=64,
                                            M_WD=0.9 * C.M_solar,
                                            M_He=0.05 * C.M_solar))
    model = subchandra.build_model(sim, nshell=384)
    from castro_tpu.utils.initial_models import wd_mass

    M = wd_mass(model)
    assert np.isclose(M, 0.95 * C.M_solar, rtol=0.05), M / C.M_solar
    he = model["spec_0"]
    c12 = model["spec_1"]
    assert c12[0] == pytest.approx(0.5)  # CO core center
    # He shell with the 1% N14 admixture that drives the subch bypass
    assert he.max() == pytest.approx(0.99)
    assert model["R_shell_base"] > 1e8


def test_subchandra_1d_ignites_shell():
    """1D spherical sub-chandra: the perturbed He shell base heats from
    burning while the CO core stays close to hydrostatic."""
    sim = Simulation(subchandra.make_params(dim=1, n=128,
                                            M_WD=0.9 * C.M_solar,
                                            M_He=0.05 * C.M_solar,
                                            pert_temp_factor=25.0),
                     problem_init=subchandra.problem_init)
    sim.init_data()
    L = sim.layout
    ui0 = np.asarray(sim.interior(sim.u))
    T0max = ui0[L.UTEMP].max()
    u = sim.u
    t = 0.0
    for _ in range(6):
        dt = float(sim._jit_estdt(u)) * 0.5
        u, _, bad = sim._jit_step(u, dt, t)
        t += dt
        assert not bool(bad)
    ui = np.asarray(sim.interior(u))
    assert np.isfinite(ui).all()
    # core (first quarter) remains near HSE: velocities well below the
    # local sound speed (~1e8-1e9 cm/s at WD-interior conditions)
    vcore = np.abs(ui[L.UMX] / ui[L.URHO])[:32]
    assert vcore.max() < 3e7, vcore.max()
    # the hot perturbation survives / grows (burning + compression beat
    # the initial transient)
    assert ui[L.UTEMP].max() > 0.8 * T0max
