"""Helmholtz-class stellar EOS verification: physical limits (ideal gas,
radiation domination, electron degeneracy), inversion roundtrips, and
thermodynamic sanity (reference: Microphysics eos/helmholtz)."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.eos.helmholtz import HelmholtzEos
from castro_tpu.network import GeneralNullNetwork
from castro_tpu.utils import constants as C


@pytest.fixture(scope="module")
def eos():
    net = GeneralNullNetwork(("He4",))
    return HelmholtzEos(network=net)


def _xn(shape=(1,)):
    return jnp.ones((1,) + shape)


def test_ideal_gas_limit(eos):
    """Moderate density/T (gas-pressure dominated): ions + electrons are
    ideal gases."""
    rho = jnp.asarray([1e-2])
    T = jnp.asarray([1e6])
    s = eos.rt(rho=rho, T=T, xn=_xn())
    # He4: abar=4, zbar=2 -> total ideal p = rho kT N_A (1/4 + 2/4)
    p_ideal = float(rho[0]) * C.k_B * C.N_A * float(T[0]) * (0.25 + 0.5)
    assert np.isclose(float(s.p[0]), p_ideal, rtol=0.02), (float(s.p[0]), p_ideal)
    assert 1.5 < float(s.gam1[0]) < 1.72


def test_radiation_dominated(eos):
    """Hot + dilute (below the pair-creation regime): p -> a T^4/3,
    gam1 -> 4/3."""
    rho = jnp.asarray([1e-8])
    T = jnp.asarray([3e8])
    s = eos.rt(rho=rho, T=T, xn=_xn())
    p_rad = C.a_rad * (3e8) ** 4 / 3.0
    assert np.isclose(float(s.p[0]), p_rad, rtol=0.05)
    assert np.isclose(float(s.gam1[0]), 4.0 / 3.0, rtol=0.03)


def test_degenerate_electrons(eos):
    """White-dwarf-like: cold dense He. Pressure ~ the zero-T Chandrasekhar
    expression, nearly independent of T."""
    rho = jnp.asarray([1e6, 1e6])
    T = jnp.asarray([1e7, 3e7])
    s = eos.rt(rho=rho, T=T, xn=_xn((2,)))
    # T-insensitive
    assert abs(float(s.p[1] / s.p[0]) - 1.0) < 0.05
    # non-rel degenerate estimate: P = 1.0036e13 (rho Ye)^(5/3)
    p_deg = 1.0036e13 * (1e6 * 0.5) ** (5.0 / 3.0)
    assert 0.5 < float(s.p[0]) / p_deg < 2.0, (float(s.p[0]), p_deg)


def test_re_inversion_roundtrip(eos):
    rho = jnp.asarray([1e-2, 1e2, 1e6])
    T = jnp.asarray([1e5, 1e7, 5e8])
    s = eos.rt(rho=rho, T=T, xn=_xn((3,)))
    s2 = eos.re(rho=rho, e=s.e, xn=_xn((3,)))
    assert np.allclose(np.asarray(s2.T), np.asarray(T), rtol=1e-5), s2.T
    s3 = eos.rp(rho=rho, p=s.p, xn=_xn((3,)))
    assert np.allclose(np.asarray(s3.T), np.asarray(T), rtol=1e-4), s3.T


def test_thermo_consistency(eos):
    """cv = de/dT matches finite differences of e(T)."""
    rho = jnp.full((1,), 1e3)
    T0 = 2e7
    d = 1e-3
    s0 = eos.rt(rho=rho, T=jnp.asarray([T0]), xn=_xn())
    sp = eos.rt(rho=rho, T=jnp.asarray([T0 * (1 + d)]), xn=_xn())
    sm = eos.rt(rho=rho, T=jnp.asarray([T0 * (1 - d)]), xn=_xn())
    cv_fd = float((sp.e[0] - sm.e[0]) / (2 * d * T0))
    assert np.isclose(float(s0.cv[0]), cv_fd, rtol=0.02), (float(s0.cv[0]), cv_fd)
    assert float(s0.cs[0]) > 0 and np.isfinite(float(s0.cs[0]))


def test_coulomb_corrections():
    """Coulomb corrections (CP98 fit): negative, grow with coupling
    Gamma ~ rho^{1/3}/T, and carry thermodynamically consistent cv
    (reference helmholtz.f90 coulomb section)."""
    net = GeneralNullNetwork(("C12",))
    net.aion = jnp.asarray([12.0])
    net.zion = jnp.asarray([6.0])
    on = HelmholtzEos(network=net, use_coulomb=True)
    off = HelmholtzEos(network=net, use_coulomb=False)
    rho = jnp.asarray([1e6, 1e6])
    T = jnp.asarray([1e7, 1e9])
    s_on = on.rt(rho=rho, T=T, xn=jnp.ones((1, 2)))
    s_off = off.rt(rho=rho, T=T, xn=jnp.ones((1, 2)))
    dp = np.asarray(s_on.p - s_off.p)
    assert (dp < 0).all()  # Coulomb binding lowers the pressure
    # stronger coupling at the lower temperature: bigger relative effect
    rel = -dp / np.asarray(s_off.p)
    assert rel[0] > rel[1]
    assert rel[0] > 1e-3  # percent-level at WD-interior conditions
    # cv consistency: finite-difference de/dT matches s.cv with Coulomb on
    dT = 1e4
    e_p = on.rt(rho=rho[:1], T=T[:1] + dT, xn=jnp.ones((1, 1))).e
    e_m = on.rt(rho=rho[:1], T=T[:1] - dT, xn=jnp.ones((1, 1))).e
    cv_fd = float((e_p[0] - e_m[0]) / (2 * dT))
    assert np.isclose(float(s_on.cv[0]), cv_fd, rtol=0.02), \
        (float(s_on.cv[0]), cv_fd)


def test_coulomb_guard_low_density():
    """In the weak-coupling regime the correction is tiny and never
    drives p negative."""
    net = GeneralNullNetwork(("H",))
    on = HelmholtzEos(network=net, use_coulomb=True)
    rho = jnp.asarray([1e-8])
    T = jnp.asarray([1e5])
    s = on.rt(rho=rho, T=T, xn=jnp.ones((1, 1)))
    assert float(s.p[0]) > 0 and float(s.e[0]) > 0
    assert np.isfinite(float(s.cs[0]))
