"""Validation for the rprox / nova / subch networks (reference:
Microphysics networks selected by `Exec/science/{xrb_mixed,nova,
subchandra}/GNUmakefile`).

Pins freeze the implemented analytic fits (regression detection — the
Microphysics submodule is empty in this zero-egress checkout), plus
physical pins with published anchors: measured beta+ half-lives and the
classic beta-limited hot-CNO energy-generation plateau
eps = 5.9e15 * Z_CNO erg/g/s (Wallace & Woosley 1981), which the nova
network must reproduce from its independent rate/energetics plumbing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from castro_tpu.network.nova import (NovaNetwork, cno_rates, _LAM_O14,
                                     _LAM_O15, _LAM_F17, _LAM_N13)
from castro_tpu.network.rprox import RproxNetwork, rprox_rates
from castro_tpu.network.subch import SubchNetwork
from castro_tpu.network.aprox13 import Aprox13Network
from castro_tpu.utils import constants as C

# frozen N_A<sigma v> of the implemented fits [cm^3/mol/s]
_CNO_PINS = {
    0.1: {"c12pg": 2.070561e-05, "n14pg": 1.090296e-06,
          "n15pa": 5.016528e-02, "o16pg": 1.281541e-07},
    0.3: {"c12pg": 1.748473e-01, "n14pg": 6.411872e-01,
          "c13pg": 4.318729e-01, "n13pg": 2.354262e-02},
    1.0: {"c12pg": 8.682217e+02, "n14pg": 1.220944e+02,
          "n15pg": 6.180186e+02, "o16pg": 4.020895e+00},
}
_RPROX_PINS = {
    0.3: {"o14ap": 2.539681e-11, "f17pg": 3.687580e+00},
    1.0: {"o14ap": 2.705209e-01, "o15ag": 2.610353e-07,
          "mg22_chain": 4.015507e-12},
}


def test_cno_rate_pins():
    for T9, pins in _CNO_PINS.items():
        cf = cno_rates(jnp.asarray(float(T9), jnp.float64))
        for name, val in pins.items():
            assert np.isclose(float(cf[name]), val, rtol=1e-5), (T9, name)


def test_rprox_rate_pins():
    for T9, pins in _RPROX_PINS.items():
        rr = rprox_rates(jnp.asarray(float(T9), jnp.float64))
        for name, val in pins.items():
            assert np.isclose(float(rr[name]), val, rtol=1e-5), (T9, name)


def test_cno_rate_hierarchy():
    """Published orderings: n15(p,a)/n15(p,g) branching ~1e3 (the CN
    cycle closes); n14(p,g) is the slowest cold-CNO capture."""
    cf = cno_rates(jnp.asarray(0.03, jnp.float64))
    assert 5e2 < float(cf["n15pa"] / cf["n15pg"]) < 5e4
    for k in ("c12pg", "c13pg", "n15pa"):
        assert float(cf[k]) > float(cf["n14pg"])


def test_beta_half_lives():
    """Measured half-lives (NNDC): O14 70.62 s, O15 122.24 s,
    F17 64.49 s, N13 9.965 min."""
    ln2 = np.log(2.0)
    assert np.isclose(ln2 / _LAM_O14, 70.62)
    assert np.isclose(ln2 / _LAM_O15, 122.24)
    assert np.isclose(ln2 / _LAM_F17, 64.49)
    assert np.isclose(ln2 / _LAM_N13, 597.9)


def _steady_hot_cno(net, rho, T9, Xh, Zcno):
    """Build the beta-limited steady-state composition: CNO mass in
    O14/O15 split by lifetime, capture intermediates at their steady
    trace abundances."""
    cf = {k: float(v) for k, v in
          cno_rates(jnp.asarray(T9, jnp.float64)).items()}
    t14, t15 = 1.0 / _LAM_O14, 1.0 / _LAM_O15
    Y15 = (Zcno / (14.0 * t14 / t15 + 15.0))
    Y14 = Y15 * t14 / t15
    r = Y15 * _LAM_O15  # cycle rate [mol/g/s]
    Yp = Xh / 1.0
    X = np.zeros(net.nspec)
    idx = {s: i for i, s in enumerate(net.spec_names)}
    X[idx["H1"]] = Xh
    X[idx["He4"]] = 1.0 - Xh - Zcno
    X[idx["O14"]] = 14.0 * Y14
    X[idx["O15"]] = 15.0 * Y15
    # trace intermediates at steady state (capture-limited)
    for sp, key, A in (("N14", "n14pg", 14.0), ("N15", "n15pa", 15.0),
                       ("C12", "c12pg", 12.0), ("N13", "n13pg", 13.0)):
        X[idx[sp]] = A * r / (rho * Yp * cf[key])
    return X


def test_nova_hot_cno_plateau():
    """Beta-limited hot-CNO plateau: eps = 5.9e15 * Z_CNO erg/g/s
    (WW81; Wiescher et al. 2010 review eq. 8), independent of rho and T.
    The network must land within 40% from its own independent
    mass-excess/neutrino plumbing."""
    net = NovaNetwork()
    rho, T9, Zcno = 2.0e2, 0.25, 0.01
    X = _steady_hot_cno(net, rho, T9, 0.70, Zcno)
    xdot, edot = net.rhs(jnp.asarray(rho, jnp.float64),
                         jnp.asarray(T9 * 1e9, jnp.float64),
                         jnp.asarray(X, jnp.float64))
    eps = float(edot)
    target = 5.9e15 * Zcno
    assert 0.6 * target < eps < 1.4 * target, eps
    # plateau: x10 density changes eps by <20%
    _, edot2 = net.rhs(jnp.asarray(10 * rho, jnp.float64),
                       jnp.asarray(T9 * 1e9, jnp.float64),
                       jnp.asarray(_steady_hot_cno(net, 10 * rho, T9,
                                                   0.70, Zcno),
                                   jnp.float64))
    assert abs(float(edot2) - eps) < 0.2 * eps


@pytest.mark.parametrize("cls,T,X0", [
    (NovaNetwork, 8e7, {"H1": 0.6, "He4": 0.3, "C12": 0.04, "N14": 0.03,
                        "O16": 0.03}),
    (RproxNetwork, 9e8, {"H1": 0.5, "He4": 0.45, "C12": 0.05}),
    (SubchNetwork, 2.5e9, {"He4": 0.9, "C12": 0.04, "O16": 0.05,
                           "N14": 0.01}),
])
def test_mass_conservation(cls, T, X0):
    net = cls()
    X = np.zeros(net.nspec)
    for s, v in X0.items():
        X[net.spec_names.index(s)] = v
    xdot, edot = net.rhs(jnp.asarray(5e4, jnp.float64),
                         jnp.asarray(T, jnp.float64),
                         jnp.asarray(X, jnp.float64))
    xd = np.asarray(xdot)
    assert abs(xd.sum()) < 1e-8 * np.abs(xd).max()
    assert np.isfinite(float(edot))


def test_rprox_breakout_gating():
    """Below breakout (T9 ~ 0.2) the flow stays in the hot-CNO cycle
    (no Mg22 production); above (T9 ~ 1.5) the alpha chain runs to
    Mg22/S30/Ni56."""
    net = RproxNetwork()
    X = np.zeros(net.nspec)
    for s, v in (("H1", 0.4), ("He4", 0.4), ("C12", 0.02),
                 ("O14", 0.05), ("O15", 0.1), ("F17", 0.03)):
        X[net.spec_names.index(s)] = v
    i_mg = net.spec_names.index("Mg22")
    i_ni = net.spec_names.index("Ni56")
    cold, _ = net.rhs(jnp.asarray(1e5, jnp.float64),
                      jnp.asarray(2e8, jnp.float64),
                      jnp.asarray(X, jnp.float64))
    hot, _ = net.rhs(jnp.asarray(1e5, jnp.float64),
                     jnp.asarray(1.5e9, jnp.float64),
                     jnp.asarray(X, jnp.float64))
    assert float(hot[i_mg]) > 1e6 * max(float(cold[i_mg]), 1e-300)
    X2 = X.copy()
    X2[i_mg] = 0.05
    hot2, _ = net.rhs(jnp.asarray(1e6, jnp.float64),
                      jnp.asarray(2e9, jnp.float64),
                      jnp.asarray(X2, jnp.float64))
    assert float(hot2[net.spec_names.index("S30")] + hot2[i_ni]) > 0.0


def test_subch_bypass_accelerates_c12_burn():
    """The defining subch effect (Shen & Bildsten 2009): an N14
    admixture generates protons (via n14(a,g)f18(a,p)ne21) whose
    c12(p,g)n13(a,p)o16 bypass consumes C12 much faster than bare
    aprox13's c12(a,g) at He-shell ignition temperatures."""
    sub = SubchNetwork()
    a13 = Aprox13Network()
    T, rho = 3.0e8, 1.0e6

    X13 = np.zeros(13)
    X13[0], X13[1] = 0.9, 0.1
    xd13, _ = a13.rhs(jnp.asarray(rho, jnp.float64),
                      jnp.asarray(T, jnp.float64),
                      jnp.asarray(X13, jnp.float64))

    X = np.zeros(17)
    X[0], X[1] = 0.89, 0.1
    X[13] = 0.005                   # N14
    X[16] = 0.005                   # free protons (post-(a,p) release)
    xd, _ = sub.rhs(jnp.asarray(rho, jnp.float64),
                    jnp.asarray(T, jnp.float64),
                    jnp.asarray(X, jnp.float64))
    # C12 consumption accelerated by >10x with the catalytic protons
    assert float(-xd[1]) > 10.0 * float(-xd13[1])
    # and the bypass routes into O16
    assert float(xd[2]) > 0.0


def test_subch_reduces_to_aprox13_without_admixture():
    """With X(N14)=X(H1)=0 the subch RHS equals aprox13 on the shared
    species (the extra links all gate on the admixture)."""
    sub = SubchNetwork()
    a13 = Aprox13Network()
    X13 = np.zeros(13)
    X13[0], X13[1], X13[2] = 0.7, 0.2, 0.1
    X = np.concatenate([X13, np.zeros(4)])
    xd13, ed13 = a13.rhs(jnp.asarray(1e6, jnp.float64),
                         jnp.asarray(2e9, jnp.float64),
                         jnp.asarray(X13, jnp.float64))
    xd, ed = sub.rhs(jnp.asarray(1e6, jnp.float64),
                     jnp.asarray(2e9, jnp.float64),
                     jnp.asarray(X, jnp.float64))
    np.testing.assert_allclose(np.asarray(xd[:13]), np.asarray(xd13),
                               rtol=1e-6, atol=1e-30)


def test_make_network_dispatch():
    from castro_tpu.config import Params
    from castro_tpu.network import make_network

    for name, n in (("rprox", 10), ("nova", 14), ("subch", 17)):
        p = Params().with_ns("network", network_name=name)
        net = make_network(p)
        assert net.nspec == n and net.reactive
        # abar/zbar metadata consistent
        assert np.all(np.asarray(net.aion) >= 1.0)
        assert np.all(np.asarray(net.zion) <= np.asarray(net.aion))
