"""Reaction network + stiff integrator verification (reference test
strategy: reacting_convergence / Detonation analysis, SURVEY.md A3)."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.config import Params
from castro_tpu.eos import GammaLawEos
from castro_tpu.integrators.stiff import make_burner
from castro_tpu.network import PowerLawNetwork, Aprox13Network


def reference_integrate(net, eos, rho, T0, xn0, dt, nsub=20000):
    """Tiny-step explicit Euler oracle (numpy)."""
    y = np.concatenate([xn0, [float(eos.rt(rho=jnp.asarray(rho), T=jnp.asarray(T0), xn=jnp.asarray(xn0)[:, None]).e[0])]])
    h = dt / nsub
    for _ in range(nsub):
        xn = jnp.asarray(y[:-1])[:, None]
        e = jnp.asarray([y[-1]])
        es = eos.re(rho=jnp.asarray([rho]), e=e, xn=xn)
        xdot, edot = net.rhs(jnp.asarray([rho]), es.T, xn)
        y[:-1] += h * np.asarray(xdot)[:, 0]
        y[-1] += h * float(edot[0])
    return y


def test_powerlaw_burn_vs_oracle():
    net = PowerLawNetwork(rtilde=10.0, nu=4.0, specific_q_burn=5.0,
                          T_burn_ref=1.0, rho_burn_ref=1.0, f_act=1.0)
    eos = GammaLawEos(gamma=1.4, network=net)
    burn = make_burner(net, eos, rtol=1e-7, atol_x=1e-9, atol_e=1e-9)

    rho = jnp.full((4,), 1.0)
    T0 = jnp.full((4,), 2.0)  # above activation
    xn0 = jnp.zeros((3, 4)).at[0].set(0.8).at[2].set(0.2)
    e0 = eos.rt(rho=rho, T=T0, xn=xn0).e

    dt = 0.02
    xn1, e1, fail = burn(rho, T0, xn0, e0, dt)
    assert not bool(fail.any())

    y_ref = reference_integrate(net, eos, 1.0, 2.0, np.array([0.8, 0.0, 0.2]), 0.02)
    assert np.allclose(np.asarray(xn1[:, 0]), y_ref[:-1], rtol=2e-3, atol=2e-5), (
        np.asarray(xn1[:, 0]), y_ref[:-1])
    assert np.isclose(float(e1[0]), y_ref[-1], rtol=2e-3)

    # mass conservation
    assert np.allclose(np.asarray(xn1).sum(axis=0), 1.0, atol=1e-12)
    # energy release consistent with q * delta X_fuel
    dE = float(e1[0] - e0[0])
    dX = 0.8 - float(xn1[0, 0])
    assert np.isclose(dE, 5.0 * dX, rtol=1e-2)


def test_aprox13_triple_alpha_direction():
    """Pure He at high T/rho burns toward C12 and releases energy."""
    net = Aprox13Network()
    eos = GammaLawEos(gamma=5.0 / 3.0, network=net)
    burn = make_burner(net, eos)

    rho = jnp.asarray([1e6])
    T0 = jnp.asarray([2e9])
    xn0 = jnp.zeros((13, 1)).at[0].set(1.0)
    e0 = eos.rt(rho=rho, T=T0, xn=xn0).e

    xn1, e1, fail = burn(rho, T0, xn0, e0, 1e-6)
    assert not bool(fail.any())
    assert float(xn1[0, 0]) < 1.0  # He consumed
    assert float(xn1[1, 0]) > 0.0  # C12 produced
    assert float(e1[0]) > float(e0[0])  # exothermic
    assert np.isclose(float(jnp.sum(xn1)), 1.0, atol=1e-10)


def test_strang_coupled_burning_box():
    """Uniform reacting box with Strang coupling: composition evolves,
    total mass conserved, no hydro motion develops."""
    from castro_tpu.driver.sim import Simulation
    from castro_tpu.problems.util import fill_from_prim

    p = Params()
    p = p.with_ns("amr", n_cell=(16,))
    p = p.with_ns("geometry", prob_lo=(0.0,), prob_hi=(1.0,), is_periodic=(1,))
    p = p.with_ns("castro", lo_bc=(0,), hi_bc=(0,), do_react=1,
                  small_dens=1e-12, small_temp=1e-12, small_pres=1e-15)
    p = p.with_ns("network", network_name="powerlaw", rtilde=10.0,
                  specific_q_burn=5.0, T_burn_ref=1.0, rho_burn_ref=1.0)
    p = p.with_ns("eos", eos_gamma=1.4)
    p = p.with_ns("tpu", dtype="float64")

    def init(sim, u):
        xn = jnp.zeros((3,) + u.shape[1:]).at[0].set(1.0)
        return fill_from_prim(sim, u, 1.0, (0.0, 0.0, 0.0), T=2.0, xn=xn)

    sim = Simulation(p, problem_init=init)
    sim.init_data()
    L = sim.layout
    x_fuel0 = float(np.asarray(sim.interior())[L.UFS].sum())

    sim.run(max_step=5, stop_time=1e9, verbose=False)
    ui = np.asarray(sim.interior())
    x_fuel1 = ui[L.UFS].sum()
    assert x_fuel1 < x_fuel0  # fuel consumed
    assert np.abs(ui[L.UMX]).max() < 1e-10  # still uniform
    # density unchanged by burning
    assert np.allclose(ui[L.URHO], 1.0, rtol=1e-12)


@pytest.mark.parametrize("tim", [2, 3])
def test_sdc_burning_box(tim):
    """SDC coupling modes advance the reacting box like Strang does
    (reference Detonation inputs-det-x.sdc / .simplified_sdc variants)."""
    from castro_tpu.driver.sim import Simulation
    from castro_tpu.problems.util import fill_from_prim

    p = Params()
    p = p.with_ns("amr", n_cell=(16,))
    p = p.with_ns("geometry", prob_lo=(0.0,), prob_hi=(1.0,))
    p = p.with_ns("castro", lo_bc=(0,), hi_bc=(0,), do_react=1,
                  time_integration_method=tim,
                  small_dens=1e-12, small_temp=1e-12, small_pres=1e-15)
    p = p.with_ns("network", network_name="powerlaw", rtilde=10.0,
                  specific_q_burn=5.0, T_burn_ref=1.0, rho_burn_ref=1.0)
    p = p.with_ns("eos", eos_gamma=1.4)
    p = p.with_ns("tpu", dtype="float64")

    def init(sim, u):
        xn = jnp.zeros((3,) + u.shape[1:]).at[0].set(1.0)
        return fill_from_prim(sim, u, 1.0, (0.0, 0.0, 0.0), T=2.0, xn=xn)

    sim = Simulation(p, problem_init=init)
    sim.init_data()
    L = sim.layout
    x_fuel0 = float(np.asarray(sim.interior())[L.UFS].sum())
    for _ in range(3):
        u_new, status = sim.try_step(2e-3)
        assert status.success, status
        sim.u = u_new
    ui = np.asarray(sim.interior())
    assert ui[L.UFS].sum() < x_fuel0          # fuel burned
    assert np.allclose(ui[L.URHO], 1.0, rtol=1e-10)  # still static/uniform
    assert np.abs(ui[L.UMX]).max() < 1e-8


def test_aprox13_3alpha_rate_value():
    """The triple-alpha energy generation matches the classic analytic
    form eps = 5.09e11 rho^2 X^3 T8^-3 exp(-44.027/T8) erg/g/s
    (Kippenhahn & Weigert eq. 18.68) once the screening factor is
    divided out."""
    net = Aprox13Network()
    rho, T = 1e5, 2e8
    xn = jnp.zeros((13, 1)).at[0].set(1.0)
    xd, ed = net.rhs(jnp.asarray([rho]), jnp.asarray([T]), xn)
    T8 = T / 1e8
    eps_expected = 5.09e11 * rho**2 / T8**3 * np.exp(-44.027 / T8)
    scr = float(ed[0]) / eps_expected
    # weak-screening enhancement: > 1 and modest at this density
    assert 1.0 < scr < 2.0, scr
    # and the C12 production wires the same rate through Q = 7.275 MeV
    q = 7.275 * 1.602176634e-6 * 6.02214076e23 / 12.0  # erg/g per X_C12
    assert np.isclose(float(ed[0]) / float(xd[1, 0]), q, rtol=1e-3)


def test_aprox13_photodisintegration_direction():
    """Reverse (detailed-balance) rates: at NSE-ward temperatures a pure
    Si28 composition photodisintegrates back down the alpha chain —
    dX_He4 > 0, dX_Si28 < 0, and the binding-energy budget absorbs energy
    (edot < 0)."""
    net = Aprox13Network()
    xn = jnp.zeros((13, 1)).at[5].set(1.0)  # pure Si28
    xd, ed = net.rhs(jnp.asarray([1e7]), jnp.asarray([9e9]), xn)
    assert float(xd[0, 0]) > 0.0    # alphas liberated
    assert float(xd[5, 0]) < 0.0    # Si28 destroyed
    assert float(ed[0]) < 0.0       # endothermic
    # mass conservation
    assert abs(float(xd.sum())) < 1e-10 * float(jnp.abs(xd).max())


def test_aprox13_screening_monotonic():
    net = Aprox13Network()
    T = 3e8
    xn = jnp.zeros((13, 2)).at[0].set(1.0)
    rho = jnp.asarray([1e4, 1e6])
    xd, ed = net.rhs(rho, jnp.full((2,), T), xn)
    # per rho^2 normalized rate grows with density only through screening
    r0 = float(ed[0]) / 1e4**2
    r1 = float(ed[1]) / 1e6**2
    assert r1 > r0
