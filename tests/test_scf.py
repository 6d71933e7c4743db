"""SCF initial model verification (reference scf_tests/single_star):
nonrotating n=1 polytrope vs the Lane-Emden analytic profile
rho(r) = rho_c sin(pi r/R)/(pi r/R); rotating model spins up (Omega > 0)
and flattens."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.config import Params
from castro_tpu.eos import PolytropeEos
from castro_tpu.geometry import geometry_from_params
from castro_tpu.scf import scf_relaxation
from castro_tpu.state import layout_from_params
from castro_tpu.utils import constants as C


def setup(n=48, L=2.0):
    p = Params()
    p = p.with_ns("amr", n_cell=(n, n, n))
    p = p.with_ns("geometry", prob_lo=(-L, -L, -L), prob_hi=(L, L, L))
    p = p.with_ns("castro", lo_bc=(2,) * 3, hi_bc=(2,) * 3, do_grav=1)
    p = p.with_ns("gravity", gravity_type="PoissonGrav")
    p = p.with_ns("tpu", dtype="float64")
    return p, geometry_from_params(p), layout_from_params(p)


def test_scf_nonrotating_lane_emden():
    # n=1 polytrope: R = pi * sqrt(K/(2 pi G)); choose K so R = 1
    R_star = 1.0
    K = (R_star / np.pi) ** 2 * 2.0 * np.pi * C.Gconst
    eos = PolytropeEos(K=K, gamma=2.0)
    p, geom, layout = setup()

    rho_c = 1.0
    rho, phi, omega = scf_relaxation(p, geom, layout, eos, rho_c,
                                     r_A=R_star, n_iters=25)
    assert float(omega) == 0.0

    rho = np.asarray(rho)
    x = np.asarray(geom.cell_centers_1d(0, 0))
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    r = np.sqrt(X**2 + Y**2 + Z**2)
    xi = np.pi * r / R_star
    rho_exact = np.where(r < R_star, rho_c * np.sinc(r / R_star), 0.0)
    mask = (r > 0.1) & (r < 0.8)
    err = np.abs(rho[mask] - rho_exact[mask]).mean()
    assert err < 0.05 * rho_c, err
    # central density is the max
    assert abs(rho.max() - rho_c) < 1e-8


def test_scf_rotating_flattens():
    R_star = 1.0
    K = (R_star / np.pi) ** 2 * 2.0 * np.pi * C.Gconst
    eos = PolytropeEos(K=K, gamma=2.0)
    p, geom, layout = setup(n=32)
    rho, phi, omega = scf_relaxation(p, geom, layout, eos, 1.0,
                                     r_A=1.0, r_B=0.7, n_iters=30)
    assert float(omega) > 0.0
    rho = np.asarray(rho)
    n = rho.shape[0]
    c = n // 2
    # equatorial extent exceeds polar extent
    eq_profile = rho[c:, c, c]
    pol_profile = rho[c, c, c:]
    r_eq = np.argmax(eq_profile < 1e-6)
    r_pol = np.argmax(pol_profile < 1e-6)
    assert r_eq > r_pol, (r_eq, r_pol)


def test_scf_hachisu_virial_balance():
    """The converged rotating Hachisu model satisfies the virial theorem:
    |2T_rot + W + 3 Pi| / |W| small (the standard SCF quality metric;
    reference scf_relax.cpp prints the same diagnostic)."""
    R_star = 1.0
    K = (R_star / np.pi) ** 2 * 2.0 * np.pi * C.Gconst
    eos = PolytropeEos(K=K, gamma=2.0)
    # radii consistent with rho_max=1 for this K (the h-rescale and the
    # prescribed radii over-determine the model otherwise — same
    # semantics as the reference)
    p, geom, layout = setup(n=48)
    rho, phi, omega = scf_relaxation(p, geom, layout, eos, 1.0,
                                     r_A=1.04, r_B=0.94, n_iters=40,
                                     tol=1e-6)
    rho = np.asarray(rho)
    phi = np.asarray(phi)
    w2 = float(omega) ** 2
    dx = np.prod(geom.dx)
    x = np.asarray(geom.cell_centers_1d(0, 0))
    X, Y, _ = np.meshgrid(x, x, x, indexing="ij")
    R2 = X**2 + Y**2
    es = eos.rt(rho=jnp.asarray(rho), T=jnp.ones_like(jnp.asarray(rho)))
    P = np.asarray(es.p)
    m = rho > 1e-6
    T_rot = 0.5 * w2 * (rho * R2)[m].sum() * dx
    W = 0.5 * (rho * phi)[m].sum() * dx
    Pi = P[m].sum() * dx
    virial = abs(2 * T_rot + W + 3 * Pi) / abs(W)
    assert virial < 0.05, virial
    assert float(omega) > 0.0


def test_scf_omega_grows_with_flattening():
    """More flattening (smaller polar/equatorial ratio) requires faster
    rotation (Hachisu sequence monotonicity)."""
    R_star = 1.0
    K = (R_star / np.pi) ** 2 * 2.0 * np.pi * C.Gconst
    eos = PolytropeEos(K=K, gamma=2.0)
    omegas = []
    for rb in (0.9, 0.7):
        p, geom, layout = setup(n=32)
        _, _, om = scf_relaxation(p, geom, layout, eos, 1.0,
                                  r_A=1.0, r_B=rb, n_iters=30)
        omegas.append(float(om))
    assert omegas[1] > omegas[0] > 0.0
