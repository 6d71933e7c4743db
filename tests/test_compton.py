"""Compton inelastic scattering between groups (LLPS85 Kompaneets step).

Reference: Radiation::inelastic_scattering (MGFLD.cpp:1655-1685),
ca_inelastic_sct (Rad_nd.F90:238-284), inelastic_scatter
(RadHydro_nd.F90:9-84).
"""

import jax.numpy as jnp
import numpy as np

from castro_tpu.radiation import compton
from castro_tpu.radiation.fspace import group_structure
from castro_tpu.utils import constants as C


def _groups(ng=16, lo=1e17, hi=1e20):
    gs = group_structure(ng, lo, hi)
    return (jnp.asarray(gs["nugroup"]), jnp.asarray(gs["xnu"]),
            jnp.asarray(gs["dlognu"]))


def _wien(nugroup, T, amp=1.0):
    """Wien spectrum in the u = Er/(nu dlognu) normalization: the exact
    discrete fixed point of the scheme (detailed balance at the group
    centers) when induced scattering is negligible."""
    x = np.asarray(nugroup) * C.hplanck / (C.m_e * C.c_light**2)
    theta = C.k_B * T / (C.m_e * C.c_light**2)
    return amp * x**3 * np.exp(-x / theta)


def test_photon_number_conserved():
    """The tridiagonal update is in flux form over dlognu: photon number
    sum_g u_g dlognu_g is exactly conserved (RadHydro_nd.F90 matrix)."""
    nug, xnu, dln = _groups()
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.uniform(0.5, 2.0, (16, 8)) * 1e-8)
    T = jnp.full((8,), 1e7)
    ks = jnp.full((8,), 5.0)
    u1 = compton.inelastic_scatter(T, u, ks, 1e-6, nug, xnu, dln)
    n0 = jnp.sum(u * dln[:, None], axis=0)
    n1 = jnp.sum(u1 * dln[:, None], axis=0)
    assert np.allclose(np.asarray(n1), np.asarray(n0), rtol=1e-12)
    assert np.all(np.isfinite(np.asarray(u1)))


def test_wien_fixed_point():
    """A Wien spectrum at the matter temperature is an exact fixed point
    (the interface detailed-balance factor bh cancels it identically)
    in the small-occupation limit."""
    T = 5e7
    nug, xnu, dln = _groups(ng=24, lo=1e17, hi=3e19)
    u0 = jnp.asarray(_wien(nug, T, amp=1e-12))[:, None]
    Tf = jnp.full((1,), T)
    ks = jnp.full((1,), 100.0)
    u1 = compton.inelastic_scatter(Tf, u0, ks, 1e-3, nug, xnu, dln)
    assert np.allclose(np.asarray(u1), np.asarray(u0), rtol=1e-9)


def test_relaxes_toward_wien():
    """A monochromatic-ish spectrum redistributes toward the Wien shape
    at fixed photon number under repeated scatterings."""
    T = 5e7
    nug, xnu, dln = _groups(ng=24, lo=1e17, hi=3e19)
    u = np.full((24,), 1e-30)
    u[12] = 1e-12
    u = jnp.asarray(u)[:, None]
    Tf = jnp.full((1,), T)
    ks = jnp.full((1,), 50.0)
    n0 = float(jnp.sum(u[:, 0] * dln))

    def shape_err(uu):
        w = _wien(nug, T)
        a = np.asarray(uu[:, 0])
        # normalize both to unit photon number and compare shapes
        a = a / np.sum(a * np.asarray(dln))
        w = w / np.sum(w * np.asarray(dln))
        return float(np.max(np.abs(a - w) / w.max()))

    e_start = shape_err(u)
    for _ in range(40):
        u = compton.inelastic_scatter(Tf, u, ks, 1e-3, nug, xnu, dln)
    # 18-decade spectrum contrast: the Thomas solve's roundoff caps the
    # conservation check looser than the smooth-spectrum 1e-12 case
    np.testing.assert_allclose(float(jnp.sum(u[:, 0] * dln)), n0,
                               rtol=1e-5)
    e_end = shape_err(u)
    assert e_end < 0.05 * e_start, (e_start, e_end)


def test_energy_exchange_sign_and_bookkeeping():
    """Photons well above the matter temperature downscatter: the
    radiation loses energy (dEr < 0) and apply_inelastic_scattering
    reports exactly the group-summed change (Rad_nd.F90:278-280)."""
    T = 1e6  # cold matter
    nug, xnu, dln = _groups(ng=16, lo=1e18, hi=1e20)
    # hot photons: Wien at 100x the matter temperature
    u0 = jnp.asarray(_wien(nug, 1e8, amp=1e-10))[:, None]
    ersc = (nug * dln)[:, None]
    Er0 = u0 * ersc
    Tf = jnp.full((1,), T)
    ks = jnp.full((1,), 10.0)
    Er1, dEr = compton.apply_inelastic_scattering(
        Er0, Tf, ks, 1e-4, nug, xnu, dln)
    assert float(dEr[0]) < 0.0
    assert np.isclose(float(jnp.sum(Er1 - Er0)), float(dEr[0]), rtol=1e-12)


def test_f32_safe():
    """The expm1/S+ah formulation has no overflow path: extreme group
    spans and cold zones stay finite in f32 and conserve photon number
    to f32 round-off."""
    nug, xnu, dln = _groups(ng=16, lo=1e15, hi=1e21)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.uniform(0.5, 2.0, (16, 4)) * 1e-6,
                    dtype=jnp.float32)
    T = jnp.asarray([1e4, 1e6, 1e8, 1e10], dtype=jnp.float32)
    ks = jnp.full((4,), 1e3, dtype=jnp.float32)
    u1 = compton.inelastic_scatter(T, u, ks, 1e-2,
                                   np.asarray(nug, np.float32),
                                   np.asarray(xnu, np.float32),
                                   np.asarray(dln, np.float32))
    assert u1.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(u1)))
    dl32 = np.asarray(dln, np.float32)[:, None]
    n0 = np.sum(np.asarray(u) * dl32, axis=0)
    n1 = np.sum(np.asarray(u1) * dl32, axis=0)
    assert np.allclose(n1, n0, rtol=2e-5)


def test_sim_step_conserves_total_energy():
    """End-to-end: a multigroup radhydro step with
    radiation.do_inelastic_scattering=1 closes the gas+radiation energy
    budget (the Compton dEr moves between Er and rho e, reference
    Castro_radiation.cpp:38 then computeTemp)."""
    from castro_tpu.config import Params
    from castro_tpu.driver.sim import Simulation
    from castro_tpu.problems.util import fill_from_prim

    n = 16
    p = Params()
    p = p.with_ns("amr", n_cell=(n,))
    p = p.with_ns("geometry", prob_lo=(0.0,), prob_hi=(1.0,))
    p = p.with_ns("castro", lo_bc=(0,), hi_bc=(0,), do_radiation=1,
                  small_dens=1e-12, small_temp=1e-12, small_pres=1e-15,
                  check_cfl_violation=0)
    p = p.with_ns("radiation", ngroups=8, const_kappa_p=1e-6,
                  const_kappa_r=1e-2, do_inelastic_scattering=1,
                  lowest_group_hz=1e16, highest_group_hz=1e20,
                  hydro_coupling=0)
    p = p.with_ns("tpu", dtype="float64")

    def init(sim, u):
        return fill_from_prim(sim, u, 1e-4, (1.0, 0.0, 0.0), T=1e7)

    sim = Simulation(p, problem_init=init)
    sim.init_data()
    L = sim.layout
    assert sim.u_rad.shape[0] == 8
    tot0 = float(np.asarray(sim.interior())[L.UEDEN].sum() +
                 np.asarray(sim.u_rad).sum())
    er_g0 = np.asarray(sim.u_rad).sum(axis=tuple(range(1, sim.u_rad.ndim)))
    for _ in range(3):
        u_new, status = sim.try_step(1e-9)
        assert status.success
        sim.u = u_new
    tot1 = float(np.asarray(sim.interior())[L.UEDEN].sum() +
                 np.asarray(sim.u_rad).sum())
    assert np.isclose(tot0, tot1, rtol=1e-8), (tot0, tot1)
    # the exchange actually moved energy between groups
    er_g1 = np.asarray(sim.u_rad).sum(axis=tuple(range(1, sim.u_rad.ndim)))
    assert not np.allclose(er_g1 / er_g1.sum(), er_g0 / er_g0.sum(),
                           rtol=1e-6)
