"""iso7 / aprox19 networks + the NSE composition solver (reference:
Microphysics networks iso7, aprox19, nse_tabular; selected per problem
via NETWORK_DIR)."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.eos.gamma_law import GammaLawEos
from castro_tpu.integrators.stiff import make_burner
from castro_tpu.network.iso7 import Iso7Network
from castro_tpu.network.aprox19 import Aprox19Network
from castro_tpu.network.nse import make_nse_solver, nse_ebind


def test_iso7_matches_aprox13_helium_burning():
    """At He-burning conditions the iso7 RHS agrees with aprox13 on the
    shared links (both nets use identical 3a / c12(a,g) machinery)."""
    from castro_tpu.network.aprox13 import Aprox13Network

    n7 = Iso7Network()
    n13 = Aprox13Network()
    rho = jnp.asarray([1e5])
    T = jnp.asarray([3e8])
    x7 = jnp.zeros((7, 1)).at[0].set(0.9).at[1].set(0.1)
    x13 = jnp.zeros((13, 1)).at[0].set(0.9).at[1].set(0.1)
    xd7, ed7 = n7.rhs(rho, T, x7)
    xd13, ed13 = n13.rhs(rho, T, x13)
    # He4, C12, O16 rates identical (screening zeta identical for this
    # composition since only he4/c12 contribute)
    for i in range(3):
        assert np.isclose(float(xd7[i, 0]), float(xd13[i, 0]), rtol=1e-12)
    assert np.isclose(float(ed7[0]), float(ed13[0]), rtol=1e-6)


def test_iso7_silicon_burning_to_ni56():
    """Hot silicon converts toward Ni56 through the effective QSE link,
    releasing energy."""
    net = Iso7Network()
    rho = jnp.asarray([1e7])
    T = jnp.asarray([4e9])
    xn = jnp.zeros((7, 1)).at[5].set(0.9).at[0].set(0.1)
    xd, ed = net.rhs(rho, T, xn)
    assert float(xd[6, 0]) > 0.0  # Ni56 produced
    assert float(xd[5, 0]) < 0.0  # Si28 consumed
    # mass conservation of the RHS
    assert abs(float(jnp.sum(xd))) < 1e-8 * float(jnp.max(jnp.abs(xd)))


def test_iso7_burn_integrates():
    net = Iso7Network()
    eos = GammaLawEos(gamma=5.0 / 3.0, network=net)
    burn = make_burner(net, eos)
    rho = jnp.asarray([1e6])
    T0 = jnp.asarray([2e9])
    xn0 = jnp.zeros((7, 1)).at[0].set(1.0)
    e0 = eos.rt(rho=rho, T=T0, xn=xn0).e
    xn1, e1, fail = burn(rho, T0, xn0, e0, 1e-6)
    assert not bool(fail.any())
    assert float(xn1[1, 0]) > 0.0 and float(e1[0]) > float(e0[0])
    assert np.isclose(float(jnp.sum(xn1)), 1.0, atol=1e-10)


def test_aprox19_pp_chain_hydrogen_burning():
    """Solar-core-like conditions: H burns through He3 toward He4 with
    positive energy generation at roughly the pp-chain magnitude."""
    net = Aprox19Network()
    rho = jnp.asarray([150.0])
    T = jnp.asarray([1.5e7])
    xn = jnp.zeros((19, 1)).at[0].set(0.7).at[2].set(0.3)
    xd, ed = net.rhs(rho, T, xn)
    assert float(xd[0, 0]) < 0.0  # H consumed
    assert float(xd[1, 0]) > 0.0  # He3 builds up
    assert float(ed[0]) > 0.0
    # solar-center eps_pp is O(10) erg/g/s; the bottleneck-only model
    # (no equilibrium He3) undercounts by ~2x at most
    assert 0.5 < float(ed[0]) < 100.0, float(ed[0])
    assert abs(float(jnp.sum(xd))) < 1e-12


def test_aprox19_cno_dominates_at_higher_T():
    """With N14 present, the CNO cycle's steep T dependence overtakes pp
    well below T=3e7 K."""
    net = Aprox19Network()
    rho = jnp.asarray([100.0, 100.0])
    T = jnp.asarray([1.2e7, 3.0e7])
    xn = jnp.zeros((19, 2)).at[0].set(0.7).at[2].set(0.28).at[4].set(0.02)
    xd, ed = net.rhs(rho, T, xn)
    # the T9^~18 CNO scaling: enormous growth between the two temps
    assert float(ed[1]) / float(ed[0]) > 1e4


def test_aprox19_alpha_chain_consistency():
    """He burning at 2e9 K matches the aprox13 3a+chain behavior."""
    net = Aprox19Network()
    rho = jnp.asarray([1e6])
    T = jnp.asarray([2e9])
    xn = jnp.zeros((19, 1)).at[2].set(1.0)
    xd, ed = net.rhs(rho, T, xn)
    assert float(xd[3, 0]) > 0.0  # C12 from 3a
    assert float(ed[0]) > 0.0
    assert abs(float(jnp.sum(xd))) < 1e-8 * float(jnp.max(jnp.abs(xd)))


def test_nse_low_T_favors_iron_group():
    """At T9 ~ 3.5 and high density, NSE is dominated by the most-bound
    nuclei: Ni56 at Ye = 0.5 (for a net with equal-Z/N iron group)."""
    net = Iso7Network()
    nse = make_nse_solver(net)
    rho = jnp.asarray([1e9])
    T = jnp.asarray([3.5e9])
    ye = jnp.asarray([0.5])
    X = nse(rho, T, ye)
    assert float(X[6, 0]) > 0.9, np.asarray(X[:, 0])  # Ni56
    assert np.isclose(float(jnp.sum(X)), 1.0, rtol=1e-6)


def test_nse_high_T_dissociates_to_alphas_and_nucleons():
    """Very hot NSE dissociates heavies: at T9=12 the iron group is gone
    (light particles dominate)."""
    net = Aprox19Network()
    nse = make_nse_solver(net)
    rho = jnp.asarray([1e8, 1e8])
    T = jnp.asarray([4e9, 1.2e10])
    ye = jnp.asarray([0.5, 0.5])
    X = nse(rho, T, ye)
    heavy_cold = float(jnp.sum(X[8:17, 0]))   # si28..ni56 at T9=4
    heavy_hot = float(jnp.sum(X[8:17, 1]))
    assert heavy_cold > 0.5
    assert heavy_hot < 0.1, heavy_hot
    # mass closure in both regimes
    assert np.allclose(np.asarray(jnp.sum(X, axis=0)), 1.0, rtol=1e-6)


def test_nse_respects_ye():
    """The charge constraint holds: sum Z X / A = Ye."""
    net = Aprox19Network()
    nse = make_nse_solver(net)
    rho = jnp.asarray([1e9])
    T = jnp.asarray([6e9])
    ye = jnp.asarray([0.46])
    X = nse(rho, T, ye)
    sh = (-1, 1)
    ye_out = float(jnp.sum(jnp.asarray(net.zion).reshape(sh) /
                           jnp.asarray(net.aion).reshape(sh) * X))
    assert np.isclose(ye_out, 0.46, atol=1e-4), ye_out
    # neutron-rich Ye pulls in Fe54 (Z/A = 0.481) over Ni56 (0.5)
    assert float(X[15, 0]) > float(X[16, 0])


def test_nse_strang_bypass():
    """StrangReactor with network.nse=1: a zone past the thresholds jumps
    to the NSE composition instead of integrating."""
    from castro_tpu.config import Params
    from castro_tpu.reactions.strang import StrangReactor
    from castro_tpu.state import layout_from_params

    p = Params()
    p = p.with_ns("network", network_name="iso7", nspec=7, nse=1,
                  rho_nse=1e7, T_nse=4e9)
    p = p.with_ns("castro", do_react=1)
    p = p.with_ns("amr", n_cell=(4,))
    net = Iso7Network()
    eos = GammaLawEos(gamma=5.0 / 3.0, network=net)
    L = layout_from_params(p)
    reactor = StrangReactor(p, net, eos, L)

    n = 4
    u = jnp.zeros((L.NVAR, n))
    rho = jnp.full((n,), 1e9)
    T = jnp.asarray([3e8, 3e8, 5e9, 5e9])  # two cold, two NSE zones
    xn = jnp.zeros((7, n)).at[5].set(1.0)  # pure Si28
    e = eos.rt(rho=rho, T=T, xn=xn).e
    u = u.at[L.URHO].set(rho)
    u = u.at[L.UTEMP].set(T)
    u = u.at[L.UEINT].set(rho * e)
    u = u.at[L.UEDEN].set(rho * e)
    u = u.at[L.UFS:L.UFS + 7].set(rho[None] * xn)

    u2, wdot, enuc, fail = reactor.react(u, 1e-8)
    assert not bool(fail)
    x_out = np.asarray(u2[L.UFS:L.UFS + 7] / u2[L.URHO][None])
    # NSE zones: Si28 relaxed to the equilibrium mixture (Ni56-dominated
    # at this rho/T), exothermic
    assert x_out[6, 2] > 0.5, x_out[:, 2]
    assert float(u2[L.UEINT, 2]) > float(u[L.UEINT, 2])
    # cold zones essentially untouched
    assert x_out[5, 0] > 0.999


def test_aprox21_matches_aprox19_without_heavies():
    """With X(Cr56) = X(Fe56) = 0 and no free neutrons, aprox21 reduces
    exactly to aprox19 on the shared species (the added links all carry
    zero flux)."""
    import numpy as np
    import jax.numpy as jnp
    from castro_tpu.network.aprox19 import Aprox19Network
    from castro_tpu.network.aprox21 import Aprox21Network

    n19 = Aprox19Network(include_neutrinos=False)
    n21 = Aprox21Network(include_neutrinos=False)
    rho = jnp.asarray(1.0e6)
    T = jnp.asarray(2.0e9)
    xn19 = np.full(19, 1e-8)
    xn19[2] = 0.5   # He4
    xn19[3] = 0.3   # C12
    xn19[5] = 0.2   # O16
    xn19[17] = 0.0  # no free neutrons (else fe54+2n->fe56 carries flux)
    xn19 = jnp.asarray(xn19 / xn19.sum())
    xn21 = jnp.concatenate([xn19, jnp.zeros(2)])
    xd19, ed19 = n19.rhs(rho, T, xn19)
    xd21, ed21 = n21.rhs(rho, T, xn21)
    assert np.allclose(np.asarray(xd21[:19]), np.asarray(xd19), rtol=1e-12)
    assert np.allclose(float(ed21), float(ed19), rtol=1e-12)
    assert np.allclose(np.asarray(xd21[19:]), 0.0)


def test_aprox21_mass_conservation_and_ye_lowering():
    """sum(xdot) = 0 exactly, and the double electron capture moves mass
    Fe56 -> Cr56 (lowering Ye below the Fe54 floor) at high rho*Ye/T."""
    import numpy as np
    import jax.numpy as jnp
    from castro_tpu.network.aprox21 import Aprox21Network, ICR56, IFE56

    net = Aprox21Network(include_neutrinos=False)
    rho = jnp.asarray(5.0e9)
    T = jnp.asarray(6.0e9)
    xn = np.full(21, 1e-8)
    xn[IFE56] = 0.7
    xn[16] = 0.3    # Ni56
    xn = jnp.asarray(xn / xn.sum())
    xd, ed = net.rhs(rho, T, xn)
    assert abs(float(jnp.sum(xd))) < 1e-8 * float(jnp.abs(xd).max())
    assert float(xd[ICR56]) > 0.0
    assert float(xd[IFE56]) < 0.0
    # Ye decreases
    ye_dot = float(jnp.sum(xd * jnp.asarray(net.zion / net.aion)))
    assert ye_dot < 0.0


def test_aprox21_fe54_2n_equilibrium_direction():
    """fe54 + 2n <-> fe56: exothermic forward at moderate T (captures),
    photodisintegration wins at very high T."""
    import numpy as np
    import jax.numpy as jnp
    from castro_tpu.network.aprox21 import (Aprox21Network, IFE56)
    from castro_tpu.network.aprox19 import IFE54, INEUT

    net = Aprox21Network(include_neutrinos=False)
    xn = np.full(21, 1e-8)
    xn[IFE54] = 0.5
    xn[INEUT] = 0.01
    xn[IFE56] = 0.2
    xn = jnp.asarray(xn / xn.sum())
    rho = jnp.asarray(1.0e7)
    xd_lo, _ = net.rhs(rho, jnp.asarray(3.0e9), xn)
    xd_hi, _ = net.rhs(rho, jnp.asarray(1.2e10), xn)
    assert float(xd_lo[IFE56]) > 0.0     # captures build Fe56
    assert float(xd_hi[IFE56]) < float(xd_lo[IFE56])  # photodis. pushes back
