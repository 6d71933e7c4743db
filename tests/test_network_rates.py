"""Rate-level network validation (VERDICT r2 #6): pinned rate values that
catch transcription regressions, (a,p)(p,g) link structure, detailed
balance, and thermal neutrino losses.

The pins freeze the implemented analytic fits (CF88 forms etc. — see
`network/aprox13.py` provenance); published-table cross-checks are limited
by the zero-egress build (the Microphysics submodule is empty), so the
pins' role is regression detection, plus physical sanity asserts
(magnitude, monotonicity, detailed-balance equilibrium)."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.network import aprox13 as a13
from castro_tpu.network import rates_heavy as rh
from castro_tpu.network.aprox13 import Aprox13Network
from castro_tpu.network.neutrino import sneut, sneut_brems, sneut_pair

# frozen N_A<sigma v> values of the implemented CF88 fits [cm^3/mol/s]
_PINS = {
    1.0: {"c12ag": 3.768724e-06, "c12c12": 3.861870e-11,
          "c12o16": 1.423075e-16, "o16o16": 2.268038e-23,
          "o16ag": 4.731875e-03},
    2.0: {"c12ag": 1.850491e-03, "c12c12": 4.331142e-04,
          "o16ag": 5.509078e-01, "ne20ag": 3.429984e+00,
          "mg24ag": 7.960789e-01},
    4.0: {"c12ag": 8.155566e-01, "c12c12": 8.582730e+01,
          "o16o16": 2.612816e-03, "ne20ag": 2.380154e+02,
          "mg24ag": 5.162382e+01},
}


def test_cf88_rate_pins():
    for T9, pins in _PINS.items():
        cf = a13._cf88_rates(jnp.asarray(float(T9)))
        for name, val in pins.items():
            got = float(cf[name])
            assert np.isclose(got, val, rtol=1e-6), (T9, name, got, val)


def test_cf88_sanity_magnitudes():
    """Order-of-magnitude anchors vs the CF88 literature: c12+c12 at
    T9=1 is ~4e-11 cm^3/mol/s; all rates rise steeply with T."""
    cf1 = a13._cf88_rates(jnp.asarray(1.0))
    assert 1e-11 < float(cf1["c12c12"]) < 1e-10
    cf2 = a13._cf88_rates(jnp.asarray(2.0))
    for k in cf1:
        assert float(cf2[k]) > float(cf1[k])


def test_gamow_pin_and_scaling():
    """Pin the WFHZ78 si28(a,g)s32 fit (rates_heavy._AG_FITS) and its
    basic structure: Gamow slopes b grow with the Coulomb barrier up the
    chain, and every rate rises steeply with T."""
    v = float(a13._gamow_ag(5, jnp.asarray(4.0)))  # si28(a,g) @ T9=4
    assert np.isclose(v, 9.6936373746, rtol=1e-6)
    # Gamow slopes sit in the physical window for Z=14..26 alpha captures
    # (the fits trade prefactor against slope, so b is not monotone in k)
    bs = [rh._AG_FITS[k][1] for k in range(5, 12)]
    assert all(55.0 < b < 95.0 for b in bs)
    for k in range(5, 12):
        lo = float(a13._gamow_ag(k, jnp.asarray(3.0)))
        hi = float(a13._gamow_ag(k, jnp.asarray(4.0)))
        assert hi > 3.0 * lo


def test_ap_pg_links_flow_and_balance(monkeypatch):
    """The (a,p)(p,g) links move Si28 -> Ni56 at NSE-ish temperatures and
    conserve mass exactly."""
    net = Aprox13Network(include_neutrinos=False)
    rho = jnp.asarray([1e7])
    T = jnp.asarray([4.5e9])
    xn = jnp.zeros((13, 1)).at[0, 0].set(0.3).at[5, 0].set(0.7)
    xdot_raw, edot = net.rhs(rho, T, xn)
    xdot = np.asarray(xdot_raw)[:, 0]
    # mass conservation: sum X_dot = 0
    assert abs(xdot.sum()) < 1e-8 * np.abs(xdot).max()
    # flow beyond Si28: the upper chain gets populated
    assert xdot[6:].sum() > 0.0
    # with the p-branch killed (frac -> 0 disables the link channel) the
    # upper-chain flow drops to the bare (a,g) rate
    orig = rh.link_flow_terms

    def no_links(k, T9, A, q_ap, q_pg, aI):
        lam_ap, frac, K = orig(k, T9, A, q_ap, q_pg, aI)
        return lam_ap, jnp.zeros_like(frac), K

    monkeypatch.setattr(rh, "link_flow_terms", no_links)
    xdot0, _ = net.rhs(rho, T, xn)
    assert xdot[6:].sum() > 2.0 * np.asarray(xdot0)[6:, 0].sum()


def test_ap_pg_branching_fraction_physical():
    """frac = lam_pg/(lam_pg+lam_pa) must be in [0, 1] and the link
    rates positive, for every link at Si-burning temperatures."""
    for T9v in (3.0, 4.0, 5.0):
        T9 = jnp.asarray(T9v)
        for k, (_n, zI, aI, q_ap, q_pg) in a13._AP_LINKS.items():
            lam_ap, lam_pa, lam_pg, lam_gp = rh.link_rates(
                k, T9, a13._A, q_ap, q_pg, aI)
            assert float(lam_ap) > 0 and float(lam_pg) > 0
            frac = float(lam_pg / (lam_pg + lam_pa))
            assert 0.0 <= frac <= 1.0
            # compensated form is algebraically the fwd/rev form
            _, frac2, K = rh.link_flow_terms(k, T9, a13._A, q_ap, q_pg, aI)
            assert np.isclose(float(frac2), frac, rtol=1e-12)
            rev_ratio = float(lam_gp * (1.0 - frac) /
                              jnp.maximum(lam_ap * frac, 1e-300))
            if frac > 1e-12 and frac < 1.0 - 1e-12:
                assert np.isclose(rev_ratio, float(K), rtol=1e-6)


def test_reverse_coefficients_match_published():
    """Zero-egress cross-check: the computed detailed-balance reverse
    coefficients reproduce the published aprox13 constants to <0.3%
    (rates_heavy module docstring)."""
    assert rh.self_check()


def test_v47_pa_cubic_sensitivity():
    """The v47(p,a)ti44 fit ships with the cubic T-correction zeroed
    (rates_heavy._PA_FITS[9] comment; not recoverable zero-egress).
    Bound its effect with an extreme perturbation — substituting the
    neighboring sc43 fit's entire correction polynomial (a ~33% change
    of the Gamow exponent at T9=4, far larger than any cubic-only
    term): the ti44->cr48 kinetic flow moves by a bounded factor (~19x
    measured; the branching structure caps it — as lam_pa -> inf the
    link flow saturates at the lam_pg-limited value), and the link
    *equilibrium* is exactly invariant because the net-flow form uses
    the analytic Saha constant K, not the polynomial
    (rates_heavy.link_flow_terms)."""
    net = Aprox13Network(include_neutrinos=False)
    rho = jnp.asarray([1e7])
    T = jnp.asarray([4.0e9])
    xn = jnp.zeros((13, 1)).at[0, 0].set(0.2).at[9, 0].set(0.8)
    base = np.asarray(net.rhs(rho, T, xn)[0])[10, 0]
    # equilibrium composition of the ti44 <-> cr48 pair: zero the net
    # link+ag flow analytically via Y_cr48 = rho Y_a Y_ti44 / K
    old = rh._PA_FITS[9]
    P, b, _ = rh._PA_FITS[9]
    try:
        rh._PA_FITS[9] = (P, b, rh._PA_FITS[8][2])  # extreme perturbation
        pert = np.asarray(net.rhs(rho, T, xn)[0])[10, 0]
        # kinetic flow bounded despite the huge exponent perturbation
        assert base > 0 and pert > 0
        assert pert / base < 30.0 and base / pert < 30.0
        # the equilibrium constant is polynomial-invariant
        _, _, K0 = rh.link_flow_terms(
            9, jnp.asarray(4.0), a13._A, *a13._AP_LINKS[9][3:],
            aI=a13._AP_LINKS[9][2])
    finally:
        rh._PA_FITS[9] = old
    _, _, K1 = rh.link_flow_terms(
        9, jnp.asarray(4.0), a13._A, *a13._AP_LINKS[9][3:],
        aI=a13._AP_LINKS[9][2])
    assert float(K0) == float(K1)


def test_neutrino_loss_pins():
    assert np.isclose(float(sneut_pair(1e7, 1e9, 13.7, 6.86)),
                      9.81363e5, rtol=1e-5)
    assert np.isclose(float(sneut_pair(1e7, 3e9, 13.7, 6.86)),
                      4.95788e12, rtol=1e-5)
    assert np.isclose(float(sneut_pair(1e7, 5e9, 13.7, 6.86)),
                      7.14752e14, rtol=1e-5)
    assert np.isclose(float(sneut_brems(1e7, 1e9, 13.7, 6.86)),
                      1.04218e6, rtol=1e-5)


def test_neutrino_loss_physics():
    """Pair losses dominate at high T and rise extremely steeply; total
    loss is nonnegative and monotonic in T."""
    Ts = [5e8, 1e9, 2e9, 4e9]
    vals = [float(sneut(1e7, T, 13.7, 6.86)) for T in Ts]
    assert all(v >= 0 for v in vals)
    assert all(b > a for a, b in zip(vals, vals[1:]))
    assert float(sneut_pair(1e7, 4e9, 13.7, 6.86)) > \
        100 * float(sneut_brems(1e7, 4e9, 13.7, 6.86))


def test_neutrinos_reduce_edot():
    net_on = Aprox13Network(include_neutrinos=True)
    net_off = Aprox13Network(include_neutrinos=False)
    rho = jnp.asarray([1e6])
    T = jnp.asarray([3e9])
    xn = jnp.zeros((13, 1)).at[0, 0].set(1.0)
    _, e_on = net_on.rhs(rho, T, xn)
    _, e_off = net_off.rhs(rho, T, xn)
    assert float(e_on[0]) < float(e_off[0])


def test_detailed_balance_equilibrium_direction():
    """Near-NSE: photodisintegration reverses dominate for an Ni56-rich
    composition at very high T (the chain flows back toward alpha)."""
    net = Aprox13Network(include_neutrinos=False)
    rho = jnp.asarray([1e6])
    T = jnp.asarray([8e9])
    xn = jnp.zeros((13, 1)).at[12, 0].set(1.0)
    xdot, _ = net.rhs(rho, T, xn)
    assert float(xdot[12, 0]) < 0.0  # Ni56 photodisintegrates
    assert float(xdot[0, 0]) > 0.0   # alphas are released
