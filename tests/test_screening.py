"""Strong + weak screening (`network/screening.py`): asymptotics,
continuity, the weak/strong join, and network integration.

Reference behavior: Microphysics `screen5` (Graboske weak + ion-sphere
strong; submodule empty in this checkout) — validated here against the
published limits instead: Debye-Hueckel at Gamma << 1 and the ion-sphere
(Salpeter) linear-mixing limit H12 -> ~0.9 Gamma_e ((Z1+Z2)^{5/3} -
Z1^{5/3} - Z2^{5/3}) at Gamma >> 1.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.network import screening as sc


def test_f_ocp_continuity_and_limits():
    # the two fit branches meet at Gamma = 1 to < 1%
    lo = float(sc.f_ocp(jnp.asarray(1.0 - 1e-9)))
    hi = float(sc.f_ocp(jnp.asarray(1.0 + 1e-9)))
    assert abs(hi - lo) < 0.01
    # Debye-Hueckel limit f -> -Gamma^{3/2}/sqrt(3) as Gamma -> 0
    g = 1e-4
    f = float(sc.f_ocp(jnp.asarray(g)))
    assert np.isclose(f, -g ** 1.5 / np.sqrt(3.0), rtol=0.05)
    # ion-sphere limit: f/Gamma -> A1 ~ -0.9 for large Gamma
    assert np.isclose(float(sc.f_ocp(jnp.asarray(1.0e4))) / 1.0e4,
                      -0.9, rtol=0.02)


def test_h12_strong_ion_sphere_limit():
    """At large Gamma the linear-mixing H12 approaches the Salpeter
    ion-sphere form 0.9 Gamma_e ((Z1+Z2)^{5/3} - Z1^{5/3} - Z2^{5/3})."""
    rho, T9, ye = 1e10, 0.05, 0.5
    ge = float(sc.gamma_e(jnp.asarray(rho), jnp.asarray(T9),
                          jnp.asarray(ye)))
    assert ge > 5.0  # strongly coupled regime
    z1 = z2 = 6.0
    h = float(sc.h12_strong(jnp.asarray(rho), jnp.asarray(T9),
                            jnp.asarray(ye), z1, z2))
    salpeter = 0.9 * ge * ((z1 + z2) ** (5 / 3) - 2 * z1 ** (5 / 3))
    assert np.isclose(h, salpeter, rtol=0.1)
    assert h > 0.0


def test_screen_pair_weak_regime_matches_graboske():
    """At low density the factor reduces to the Graboske weak form (the
    strong branch is larger there, so min() picks weak)."""
    rho, T9 = 1e4, 0.3
    zeta, ye = 1.5, 0.5  # pure He4
    hw = float(sc.h12_weak(jnp.asarray(rho), jnp.asarray(T9), zeta,
                           2.0, 2.0))
    f = float(sc.screen_pair(jnp.asarray(rho), jnp.asarray(T9),
                             zeta, ye, 2.0, 2.0))
    assert np.isclose(f, np.exp(hw), rtol=1e-10)
    assert 1.0 < f < 1.5


def test_screen_pair_strong_regime_capped_and_finite_f32():
    """Deep pycnonuclear conditions: the enhancement is the ion-sphere
    one (weak would wildly overestimate), capped at H_CAP, and finite
    in f32."""
    rho, T9 = jnp.asarray(5e9), jnp.asarray(0.01)
    zeta, ye = 42.0, 0.5  # carbon-ish
    hw = float(sc.h12_weak(rho, T9, zeta, 6.0, 6.0))
    hs = float(sc.h12_strong(rho, T9, ye, 6.0, 6.0))
    assert hs < hw  # strong screening selected
    f = sc.screen_pair(rho, T9, zeta, ye, 6.0, 6.0)
    assert float(f) <= np.exp(sc.H_CAP) * (1 + 1e-6)
    f32 = sc.screen_pair(jnp.asarray(5e9, jnp.float32),
                         jnp.asarray(0.01, jnp.float32),
                         np.float32(42.0), np.float32(0.5),
                         np.float32(6.0), np.float32(6.0))
    assert np.isfinite(float(f32))


def test_network_screening_monotone_in_density():
    """Through aprox13: the per-rho^2 3-alpha rate grows with density via
    screening, and stays finite into the strong regime."""
    from castro_tpu.network.aprox13 import Aprox13Network

    net = Aprox13Network(include_neutrinos=False)
    T = 3e8
    xn = jnp.zeros((13, 3)).at[0].set(1.0)
    rho = jnp.asarray([1e4, 1e6, 1e8])
    xd, ed = net.rhs(rho, jnp.full((3,), T), xn)
    r = [float(ed[i]) / float(rho[i]) ** 2 for i in range(3)]
    assert r[0] < r[1] < r[2]
    assert all(np.isfinite(v) for v in r)


def test_strong_screening_exceeds_old_weak_cap():
    """The previous weak-only implementation capped H12 at 2 (scor <=
    e^2 ~ 7.4); the strong branch correctly exceeds that in dense cold
    matter while staying below the uncapped weak extrapolation."""
    rho, T9 = jnp.asarray(2e9), jnp.asarray(0.08)
    zeta, ye = 42.0, 0.5
    f = float(sc.screen_pair(rho, T9, zeta, ye, 6.0, 6.0))
    assert f > np.exp(2.0)
    assert np.log(f) < float(sc.h12_weak(rho, T9, zeta, 6.0, 6.0))
