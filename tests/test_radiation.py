"""Gray FLD radiation verification (reference radiation_tests / A4):
pure diffusion vs the analytic Gaussian, matter-radiation equilibration
with exact energy conservation, multigroup consistency."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.config import Params
from castro_tpu.geometry import geometry_from_params
from castro_tpu.radiation.fld import FLDRadiation, fld_lambda
from castro_tpu.state import layout_from_params
from castro_tpu.utils import constants as C


def make_rad(n=128, kp=-1.0, kr=1e10, dim=1, lo_bc=2, hi_bc=2, limiter=0):
    p = Params()
    p = p.with_ns("amr", n_cell=(n,) * dim)
    p = p.with_ns("geometry", prob_lo=(0.0,) * 3, prob_hi=(1.0,) * 3)
    p = p.with_ns("castro", do_radiation=1, lo_bc=(lo_bc,) * 3, hi_bc=(hi_bc,) * 3)
    p = p.with_ns("radiation", const_kappa_p=kp, const_kappa_r=kr,
                  limiter=limiter, ngroups=1)
    p = p.with_ns("tpu", dtype="float64")
    geom = geometry_from_params(p)
    layout = layout_from_params(p)
    return p, geom, FLDRadiation(p, geom, layout)


def test_flux_limiter_limits():
    R = jnp.asarray([0.0, 1e-6, 1e6])
    lam = fld_lambda(R, 2)
    assert np.isclose(float(lam[0]), 1.0 / 3.0)  # optically thick
    assert np.isclose(float(lam[1]), 1.0 / 3.0, rtol=1e-5)
    assert np.isclose(float(lam[2]), 1.0 / float(R[2]), rtol=1e-3)  # free stream


def test_pure_diffusion_gaussian():
    """kappa_p ~ 0: Er diffuses with D = c/(3 kappa_R); compare to the
    analytic spreading Gaussian."""
    n = 128
    p, geom, rad = make_rad(n=n, kp=1e-30, kr=1e10, limiter=0)
    D = C.c_light / (3.0 * 1e10)

    x = np.asarray(geom.cell_centers_1d(0, 0))
    s0 = 0.03
    Er0 = np.exp(-((x - 0.5) ** 2) / (2 * s0**2))

    rho = jnp.ones(n)
    cv = jnp.ones(n) * 1e8
    T = jnp.ones(n) * 1e-2
    e = cv * T

    t_end = 2e-4
    nsteps = 20
    dt = t_end / nsteps
    Er = jnp.asarray(Er0)
    import jax

    step = jax.jit(rad.gray_update)
    for _ in range(nsteps):
        Er, e, T = step(Er, rho, e, T, cv, dt)

    s2 = s0**2 + 2 * D * t_end
    amp = s0 / np.sqrt(s2)
    Er_exact = amp * np.exp(-((x - 0.5) ** 2) / (2 * s2))
    err = np.abs(np.asarray(Er) - Er_exact).max() / Er_exact.max()
    assert err < 0.02, err
    # radiation energy conserved by diffusion (closed box here)
    assert np.isclose(float(jnp.sum(Er)), Er0.sum(), rtol=1e-8)


def test_matter_radiation_equilibration():
    """Uniform medium: Er and aT^4 relax toward equilibrium; total energy
    rho*e + Er conserved exactly by the exchange."""
    n = 16
    p, geom, rad = make_rad(n=n, kp=1.0, kr=1.0, lo_bc=0, hi_bc=0)

    rho = jnp.ones(n)
    cv = jnp.full(n, 1e8)
    T0 = jnp.full(n, 1e6)
    e0 = cv * T0
    Er0 = jnp.full(n, 1e-3 * C.a_rad * 1e6**4)  # radiation far below equilibrium

    total0 = float(rho[0] * e0[0] + Er0[0])
    Er, e, T = Er0, e0, T0
    import jax

    step = jax.jit(rad.gray_update)
    for _ in range(40):
        Er, e, T = step(Er, rho, e, T, cv, 1e-6)

    total1 = float(rho[0] * e[0] + Er[0])
    assert np.isclose(total0, total1, rtol=1e-10), (total0, total1)
    # approached equilibrium: Er ~ a T^4
    ratio = float(Er[0] / (C.a_rad * T[0] ** 4))
    assert abs(ratio - 1.0) < 0.05, ratio


def test_multigroup_sums_to_gray():
    """A multigroup run with flat opacities relaxes the total radiation
    energy like the gray solver and conserves energy."""
    n = 16
    p, geom, rad = make_rad(n=n, kp=1.0, kr=1.0, lo_bc=0, hi_bc=0)
    ng = 4
    rho = jnp.ones(n)
    cv = jnp.full(n, 1e8)
    T0 = jnp.full(n, 1e6)
    e0 = cv * T0
    Er_tot0 = 1e-3 * C.a_rad * 1e6**4
    Er_g = jnp.full((ng, n), Er_tot0 / ng)
    # group structure in units of k_B T / h-ish: just spread around T
    nu_c = jnp.asarray([0.5e6, 1e6, 2e6, 4e6])
    dnu = jnp.asarray([0.5e6, 1e6, 2e6, 4e6])

    total0 = float(rho[0] * e0[0] + Er_tot0)
    Er_gf, e, T = rad.multigroup_update(Er_g, rho, e0, T0, cv, 20e-6, nu_c, dnu)
    total1 = float(rho[0] * e[0] + jnp.sum(Er_gf[:, 0]))
    assert np.isclose(total0, total1, rtol=1e-9), (total0, total1)
    assert float(jnp.sum(Er_gf[:, 0])) > Er_tot0  # radiation gained energy


def test_radhydro_step_runs_and_conserves():
    """End-to-end coupled step: hydro + Er advection + implicit FLD
    (periodic box, uniform flow): total energy budget closed."""
    import jax
    from castro_tpu.driver.sim import Simulation
    from castro_tpu.problems.util import fill_from_prim

    n = 32
    p = Params()
    p = p.with_ns("amr", n_cell=(n,))
    p = p.with_ns("geometry", prob_lo=(0.0,), prob_hi=(1.0,))
    # uniform advection: stable at any dt, so disable the CFL-violation
    # retry flag and pick dt from the radiation coupling timescale
    p = p.with_ns("castro", lo_bc=(0,), hi_bc=(0,), do_radiation=1,
                  small_dens=1e-12, small_temp=1e-12, small_pres=1e-15,
                  check_cfl_violation=0)
    p = p.with_ns("radiation", const_kappa_p=1e-4, const_kappa_r=1e-2)
    p = p.with_ns("tpu", dtype="float64")

    def init(sim, u):
        return fill_from_prim(sim, u, 1.0, (1.0, 0.0, 0.0), T=1e6)

    sim = Simulation(p, problem_init=init)
    sim.init_data()
    assert sim.u_rad is not None
    L = sim.layout
    tot0 = float(np.asarray(sim.interior())[L.UEDEN].sum() +
                 np.asarray(sim.u_rad).sum())

    for _ in range(5):
        u_new, status = sim.try_step(1e-7)
        assert status.success
        sim.u = u_new
    tot1 = float(np.asarray(sim.interior())[L.UEDEN].sum() +
                 np.asarray(sim.u_rad).sum())
    assert np.isclose(tot0, tot1, rtol=1e-6), (tot0, tot1)


def test_multigroup_outer_converges_fast():
    """The eta-linearized group solves make the outer matter-coupling
    iteration converge geometrically WITHOUT the reference's gray_accel
    (whose job — absorbing the lagged matter linearization — our group
    update does per-solve): 4 iterations reproduce the 40-iteration
    answer to ~1e-9 in the strongly-coupled regime."""
    import dataclasses

    n = 16
    ng = 4
    p, geom, rad = make_rad(n=n, kp=1.0, kr=1.0, lo_bc=0, hi_bc=0)
    rho = jnp.ones(n)
    cv = jnp.full(n, 1e8)
    T0 = jnp.full(n, 1e6)
    e0 = cv * T0
    Er_g = jnp.full((ng, n), 1e-3 * C.a_rad * 1e6**4 / ng)
    nu_c = jnp.asarray([0.5e6, 1e6, 2e6, 4e6])
    dnu = nu_c

    def run(iters):
        rad.outer_iters = iters
        Er, e, T = rad.multigroup_update(Er_g, rho, e0, T0, cv, 20e-6,
                                         nu_c, dnu)
        return np.asarray(Er)

    ref = run(40)
    got = run(4)
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 1e-8, rel
