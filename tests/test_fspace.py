"""MGFLD frequency-space advection (reference RadHydro.H dudt /
update_one_species + Castro_ctu_rad.cpp:212-325): unit properties of the
group-space scheme and a driver-level multigroup rad-hydro compression
test where the spectrum blueshifts."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.radiation import fspace as F


def test_group_structure_loguniform():
    gs = F.group_structure(8, 1.0e13, 1.0e17)
    assert gs["xnu"][0] == pytest.approx(1.0e13)
    assert gs["xnu"][-1] == pytest.approx(1.0e17, rel=1e-12)
    # log-uniform: constant dlognu, geometric centers
    assert np.allclose(gs["dlognu"], gs["dlognu"][0])
    assert np.allclose(gs["nugroup"],
                       np.sqrt(gs["xnu"][:-1] * gs["xnu"][1:]))
    assert np.allclose(gs["dnugroup"], np.diff(gs["xnu"]))


def test_group_structure_growfactor():
    gs = F.group_structure(6, 0.0, grow_factor=1.5,
                           first_group_width_hz=1.0e12)
    assert np.allclose(gs["dnugroup"],
                       1.0e12 * 1.5 ** np.arange(6))
    # first group anchored at nu=0: center at half width
    assert gs["nugroup"][0] == pytest.approx(0.5e12)


def _gaussian_spectrum(ng, nz, dln):
    g = np.arange(ng)
    u0 = np.exp(-((g - (ng - 1) / 2.0) / 2.0) ** 2)
    return jnp.asarray(np.tile(u0[:, None], (1, nz))) * dln[:, None]


def test_fspace_advect_conserves_and_shifts():
    gs = F.group_structure(16, 1.0e13, 1.0e17)
    nug = jnp.asarray(gs["nugroup"])
    dln = jnp.asarray(gs["dlognu"])
    Er = _gaussian_spectrum(16, 4, dln)
    af = jnp.full(Er.shape, 0.5)

    Er2, nstep = F.advect_in_fspace(Er, af, nug, dln, 2.0, fspace_type=1)
    # zero-flux group boundaries conserve sum(u dlognu) = sum(Er)
    assert float(jnp.sum(Er2)) == pytest.approx(float(jnp.sum(Er)),
                                                rel=1e-12)
    # CFL subcycling engaged (a dt / dlognu = 1.0/0.58 > cfl_fspace)
    assert int(nstep) > 1
    # positive speed advects energy toward higher groups; negative, lower
    idx = jnp.arange(16)[:, None]
    c0 = float(jnp.sum(idx * Er) / jnp.sum(Er))
    c_up = float(jnp.sum(idx * Er2) / jnp.sum(Er2))
    Er3, _ = F.advect_in_fspace(Er, -af, nug, dln, 2.0, fspace_type=1)
    c_dn = float(jnp.sum(idx * Er3) / jnp.sum(Er3))
    assert c_up > c0 + 1.0
    assert c_dn < c0 - 1.0
    assert float(Er2.min()) > -1e-12


def test_fspace_type2_measure():
    """fspace type 2 conserves sum(Er/nu) (photon-number-like measure),
    not sum(Er)."""
    gs = F.group_structure(12, 1.0e13, 1.0e17)
    nug = jnp.asarray(gs["nugroup"])
    dln = jnp.asarray(gs["dlognu"])
    Er = _gaussian_spectrum(12, 2, dln)
    af = jnp.full(Er.shape, 0.4)
    Er2, _ = F.advect_in_fspace(Er, af, nug, dln, 1.0, fspace_type=2)
    q0 = float(jnp.sum(Er / nug[:, None]))
    q1 = float(jnp.sum(Er2 / nug[:, None]))
    assert q1 == pytest.approx(q0, rel=1e-12)


def test_fspace_zero_speed_identity():
    gs = F.group_structure(8, 1.0e13, 1.0e17)
    nug = jnp.asarray(gs["nugroup"])
    dln = jnp.asarray(gs["dlognu"])
    Er = _gaussian_spectrum(8, 3, dln)
    Er2, nstep = F.advect_in_fspace(Er, jnp.zeros_like(Er), nug, dln, 1.0)
    assert int(nstep) == 1
    np.testing.assert_allclose(np.asarray(Er2), np.asarray(Er), rtol=1e-14)


def _mg_compression_params(n=64, ngroups=6):
    from castro_tpu.config import Params

    p = Params()
    p = p.with_ns("amr", n_cell=(n,))
    p = p.with_ns("geometry", prob_lo=(0.0, 0.0, 0.0),
                  prob_hi=(1.0e3, 1.0, 1.0))
    p = p.with_ns("castro", lo_bc=(0,), hi_bc=(0,), do_hydro=1,
                  do_radiation=1, cfl=0.5, small_temp=1.0)
    p = p.with_ns("eos", eos_gamma=5.0 / 3.0)
    p = p.with_ns("tpu", dtype="float64")
    # diffusive regime (lambda -> 1/3) with negligible matter coupling so
    # the spectral shift is purely the comoving f-space advection
    p = p.with_ns("radiation", ngroups=ngroups, lowest_group_hz=1.0e15,
                  highest_group_hz=1.0e18, const_kappa_p=1.0e-12,
                  const_kappa_r=1.0e2, limiter=0, outer_iters=2)
    return p


def _mg_compression_init(sim, u):
    from castro_tpu.problems.util import fill_from_prim

    g = sim.geom
    shape = u.shape[1:]
    x = jnp.broadcast_to(g.cell_centers(0, sim.ng), shape)
    L = g.prob_hi[0] - g.prob_lo[0]
    xc = g.prob_lo[0] + 0.5 * L
    v0 = 2.0e7
    vx = -v0 * jnp.sin(2.0 * jnp.pi * (x - xc) / L)
    rho = jnp.full(shape, 1.0e-5)
    T = jnp.full(shape, 1.0e6)
    return fill_from_prim(sim, u, rho, (vx, 0.0, 0.0), T=T)


def test_multigroup_compression_blueshifts_spectrum():
    """Converging flow (div u < 0 at center) gives a positive
    log-frequency advection speed af = -f1 div u in the diffusion limit,
    shifting the local spectrum toward higher groups (Doppler/compression
    blueshift) while conserving total Er under the group-boundary
    zero-flux condition."""
    from castro_tpu.driver.sim import Simulation

    ngr = 6
    sim = Simulation(_mg_compression_params(ngroups=ngr),
                     problem_init=_mg_compression_init)
    sim.init_data()
    assert sim.u_rad.shape[0] == ngr  # Planck-split equilibrium init
    L = sim.layout
    n = sim.geom.n_cell[0]
    ctr = slice(n // 2 - 4, n // 2 + 4)
    idx = jnp.arange(ngr)[:, None]

    def centroid(Er):
        Ec = Er[:, ctr]
        return float(jnp.sum(idx * Ec) / jnp.sum(Ec))

    u, Er = sim.u, sim.u_rad
    c0 = centroid(Er)
    t = 0.0
    # run through the compression phase (the sine flow rebounds
    # acoustically after ~30 steps and the shift reverses — by design:
    # the f-space advection is adiabatic in divu)
    for _ in range(25):
        dt = float(sim._jit_estdt(u, Er))
        u, Er, _, bad = sim._jit_rad_step(u, Er, dt, t)
        t += dt
        assert not bool(bad)
    c1 = centroid(Er)
    assert np.isfinite(np.asarray(Er)).all()
    # center-of-box spectrum moved toward higher frequency groups
    assert c1 > c0 + 0.12, (c0, c1)
