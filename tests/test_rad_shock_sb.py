"""Rad2Tshock (Lowrie-Edwards mixed-frame radiative shock) and
RadShestakovBolstad (multigroup sub-diffusive wave with problem
emissivity).  Reference: Exec/radiation_tests/{Rad2Tshock,
RadShestakovBolstad}."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import rad_shock, rad_shestakov
from castro_tpu.utils import constants as C


def test_rad2tshock_m2_precursor():
    """Mach-2 Lowrie-Edwards shock: a radiative precursor develops ahead
    of the gas shock (T_rad leads T_gas upstream) while the downstream
    relaxes to two-temperature equilibrium."""
    sim = Simulation(rad_shock.make_params(mach=2, n=128),
                     problem_init=rad_shock.problem_init)
    sim.init_data()
    sim.u_rad = rad_shock.rad_init(sim)
    L = sim.layout
    u, Er = sim.u, sim.u_rad
    t = 0.0
    for _ in range(50):
        dt = float(sim._jit_estdt(u, Er))
        u, Er, _, bad = sim._jit_rad_step(u, Er, dt, t)
        t += dt
        assert not bool(bad)
    ui = np.asarray(sim.interior(u))
    Er_n = np.asarray(Er)
    assert np.isfinite(ui).all() and np.isfinite(Er_n).all()
    Tgas = ui[L.UTEMP]
    Trad = (Er_n / C.a_rad) ** 0.25
    x = np.asarray(sim.geom.cell_centers_1d(0, 0))
    # precursor: just upstream of the front the radiation temperature
    # exceeds the (still cold, ~T0) gas temperature
    upstream = (x > -300) & (x < -30)
    assert (Trad[upstream] - Tgas[upstream]).max() > 5.0, \
        (Trad[upstream].max(), Tgas[upstream].max())
    # far upstream both sit at the unshocked state
    far = x < -800
    assert np.allclose(Tgas[far], 100.0, rtol=0.05)
    # downstream: equilibrium near the hot state
    down = x > 300
    assert np.allclose(Trad[down] / Tgas[down], 1.0, atol=0.15)


def test_shestakov_bolstad_wave():
    """SB05 multigroup wave: energy leaks from the hot half-space into
    the cold region; the spectrum is broad-band (the nu^-3 opacity
    differentiates the groups) and total energy is conserved."""
    # the full 64 geometric groups are load-bearing: with the nu^-3
    # opacity only the groups above the Planck peak are transparent
    # enough to carry the wave
    ng = 64
    sim = Simulation(rad_shestakov.make_params(n=128, ngroups=ng),
                     problem_init=rad_shestakov.problem_init)
    sim.init_data()
    rad_shestakov.setup_radiation(sim)
    L = sim.layout
    sc = rad_shestakov.scales(sim.params)
    u, Er = sim.u, sim.u_rad
    assert Er.shape == (ng, 128)

    rhoe0 = float(np.asarray(sim.interior(u))[L.UEINT].sum())
    dt = 4.5339149910673475e-08  # inputs.common fixed_dt (1/256 dimless)
    t = 0.0
    for _ in range(40):
        u, Er, _, bad = sim._jit_rad_step(u, Er, dt, t)
        t += dt
        assert not bool(bad)
    ui = np.asarray(sim.interior(u))
    Er_n = np.asarray(Er)
    assert np.isfinite(ui).all() and np.isfinite(Er_n).all()
    # radiation escaped past the initial temperature jump
    x = np.asarray(sim.geom.cell_centers_1d(0, 0))
    beyond = x > 1.5 * sc["x0"] * 0.5
    assert Er_n[:, beyond].sum() > 0.0
    Er_tot_profile = Er_n.sum(axis=0)
    assert Er_tot_profile[beyond].max() > 1e-6 * Er_tot_profile.max()
    # broad-band spectrum at the source: several groups carry energy
    spec = Er_n[:, 2]
    carriers = (spec > 0.01 * spec.max()).sum()
    assert carriers >= 3, carriers
    # energy budget: matter loss = radiation gain (closed box; the lo
    # boundary is reflecting, hi is far away)
    rhoe1 = float(ui[L.UEINT].sum())
    dEr = float(Er_n.sum())
    assert np.isclose(rhoe0 - rhoe1, dEr, rtol=0.05), \
        (rhoe0 - rhoe1, dEr)


def test_purser_filter_properties():
    """Purser filters (filter.H ff1..ff4): unit DC gain (constant fields
    unchanged), grid-scale (odd-even) noise strongly damped, higher T
    preserving smooth profiles better."""
    from castro_tpu.radiation.filter import apply_filter, filter_kernel

    for T in (1, 2, 3, 4):
        k = filter_kernel(T)
        assert np.isclose(k.sum(), 1.0), (T, k.sum())
    x = jnp.linspace(0.0, 1.0, 64)
    smooth = jnp.sin(2 * np.pi * x)
    noise = 0.1 * jnp.asarray((-1.0) ** np.arange(64))
    f = smooth + noise
    for T in (1, 2, 3, 4):
        out = apply_filter(f, T)
        resid = np.asarray(out - smooth)[8:-8]
        assert np.abs(resid).max() < 0.02, (T, np.abs(resid).max())
    const = jnp.full((16, 16), 3.14)
    np.testing.assert_allclose(np.asarray(apply_filter(const, 3)), 3.14,
                               rtol=1e-12)
