"""Core container tests: config parsing, state layout, geometry, EOS."""

import jax.numpy as jnp
import numpy as np
import pytest

from castro_tpu.config import Params, parse_inputs_text
from castro_tpu.eos import GammaLawEos, make_eos
from castro_tpu.geometry import CoordSys, Geometry
from castro_tpu.network import GeneralNullNetwork, make_network
from castro_tpu.state import StateLayout, layout_from_params


def test_parse_inputs():
    text = """
# comment
max_step = 100
stop_time = 0.2
amr.n_cell = 64 64
geometry.prob_lo = 0.0 0.0
geometry.prob_hi = 1.0 1.5
geometry.coord_sys = 0
castro.cfl = 0.5
castro.lo_bc = 2 2
castro.hi_bc = 2 2
problem.p_ambient = 1.e-5
unknown.thing = 3
"""
    p = parse_inputs_text(text)
    assert p.amr.max_step == 100
    assert p.amr.stop_time == 0.2
    assert p.amr.n_cell == (64, 64)
    assert p.dim == 2
    assert p.geometry.prob_hi == (1.0, 1.5)
    assert p.castro.cfl == 0.5
    assert p.castro.lo_bc == (2, 2)
    assert p.problem["p_ambient"] == 1.0e-5
    assert p.extra["unknown.thing"] == 3


def test_layout_indices():
    L = StateLayout(dim=3, nspec=3, naux=1)
    assert L.URHO == 0 and L.UMX == 1 and L.UTEMP == 6
    assert L.UFS == 7
    assert L.UFX == 10
    assert L.NVAR == 11
    assert L.QFS == 8
    assert L.NQ == 8 + 4
    # shock var shifts species
    L2 = StateLayout(dim=3, nspec=2, shock_var=True)
    assert L2.USHK == 7 and L2.UFS == 8 and L2.NVAR == 10


def test_geometry_cartesian():
    g = Geometry(2, CoordSys.CARTESIAN, (0.0, 0.0), (1.0, 2.0), (10, 20), jnp.float64)
    assert np.allclose(g.dx, (0.1, 0.1))
    x = g.cell_centers_1d(0, 2)
    assert x.shape[0] == 14
    assert np.isclose(float(x[2]), 0.05)
    v = g.volume(0)
    assert np.isclose(float(v.ravel()[0]), 0.01)


def test_geometry_spherical_volume():
    g = Geometry(1, CoordSys.SPHERICAL, (0.0,), (1.0,), (10,), jnp.float64)
    v = g.volume(0)
    assert np.isclose(float(jnp.sum(v)), 4.0 / 3.0 * np.pi, rtol=1e-12)
    a = g.face_area(0, 0)
    assert np.isclose(float(a.ravel()[0]), 0.0)


def test_gamma_law_eos_roundtrip():
    net = GeneralNullNetwork(("X",))
    eos = GammaLawEos(gamma=1.4, network=net)
    rho = jnp.array([1.0, 0.1, 10.0])
    T = jnp.array([1e6, 1e7, 1e5])
    xn = jnp.ones((1, 3))
    s = eos.rt(rho=rho, T=T, xn=xn)
    s2 = eos.re(rho=rho, e=s.e, xn=xn)
    assert np.allclose(s2.T, T, rtol=1e-12)
    s3 = eos.rp(rho=rho, p=s.p, xn=xn)
    assert np.allclose(s3.e, s.e, rtol=1e-12)
    # p = rho e (gamma-1)
    assert np.allclose(s.p, rho * s.e * 0.4, rtol=1e-12)
    assert np.allclose(s.cs, np.sqrt(1.4 * s.p / rho), rtol=1e-12)


def test_make_eos_network_from_params():
    p = Params()
    net = make_network(p)
    assert net.nspec == 1
    eos = make_eos(p, net)
    assert isinstance(eos, GammaLawEos)
    L = layout_from_params(p)
    assert L.NVAR == 8
