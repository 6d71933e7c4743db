"""Characteristic rad-hydro coupling (reference trace_ppm_rad +
ctu_rad_consup): physics checks of the coupled 1D gray path."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.config import Params
from castro_tpu.driver.sim import Simulation
from castro_tpu.problems.util import fill_from_prim


def _mk(n=128, kappa_r=1e8, kappa_p=0.0):
    p = Params()
    p = p.with_ns("amr", n_cell=(n,))
    p = p.with_ns("geometry", prob_lo=(0.0,) * 3, prob_hi=(1.0,) * 3)
    p = p.with_ns("castro", lo_bc=(0,), hi_bc=(0,), do_radiation=1,
                  small_dens=1e-12, small_temp=1e-12, small_pres=1e-15,
                  check_cfl_violation=0)
    p = p.with_ns("radiation", const_kappa_p=kappa_p, const_kappa_r=kappa_r,
                  limiter=2)
    p = p.with_ns("eos", eos_gamma=5.0 / 3.0)
    p = p.with_ns("tpu", dtype="float64")
    return p


def test_rad_ctu_reduces_to_pure_hydro():
    """With Er ~ 0 the coupled characteristic path must reproduce the pure
    hydro step."""
    def init(sim, u):
        x = sim.geom.cell_centers(0, sim.ng)
        rho = 1.0 + 0.2 * jnp.sin(2 * jnp.pi * x)
        return fill_from_prim(sim, u, rho, (0.3, 0.0, 0.0), p=1.0)

    p_rad = _mk()
    sim = Simulation(p_rad, problem_init=init)
    sim.init_data()
    sim.u_rad = sim.u_rad * 0.0 + 1e-20

    p_h = p_rad.with_ns("castro", do_radiation=0)
    simh = Simulation(p_h, problem_init=init)
    simh.init_data()

    dt = 1e-3
    u_r = sim.u
    Er = sim.u_rad
    for _ in range(5):
        u_r, Er, mr, bad = sim._jit_rad_step(u_r, Er, dt, 0.0)
        assert not bool(bad)
    u_h = simh.u
    for _ in range(5):
        u_h, _, _ = simh._jit_step(u_h, dt, 0.0)

    L = sim.layout
    a = np.asarray(sim.interior(u_r))
    b = np.asarray(simh.interior(u_h))
    for comp in (L.URHO, L.UMX, L.UEDEN):
        assert np.allclose(a[comp], b[comp], rtol=1e-6, atol=1e-12), \
            (comp, np.abs(a[comp] - b[comp]).max())


def test_rad_acoustic_wave_speed():
    """Optically-thick radiation stiffens the sound speed:
    c_tot^2 = c_gas^2 + gamma_r lambda Er / rho with gamma_r = 4/3,
    lambda = 1/3 in the thick limit. A standing velocity perturbation
    v = eps sin(kx) oscillates as cos(k c_tot t) — measure c_tot."""
    n = 128
    rho0, p0, Er0 = 1.0, 0.6, 5.0
    gam = 5.0 / 3.0

    def init(sim, u):
        x = sim.geom.cell_centers(0, sim.ng)
        v = 1e-4 * jnp.sin(2 * jnp.pi * x)
        return fill_from_prim(sim, u, rho0, (v, 0.0, 0.0), p=p0)

    sim = Simulation(_mk(n=n, kappa_r=1e13), problem_init=init)
    sim.init_data()
    sim.u_rad = sim.u_rad * 0.0 + Er0

    cg = np.sqrt(gam * p0 / rho0)
    c_tot = np.sqrt(cg**2 + (4.0 / 9.0) * Er0 / rho0)

    k = 2 * np.pi
    # run to a quarter period of the RAD-stiffened oscillation
    T4 = 0.25 * 2 * np.pi / (k * c_tot)
    dt = T4 / 40
    u, Er = sim.u, sim.u_rad
    amps = [1e-4]
    for _ in range(40):
        u, Er, mr, bad = sim._jit_rad_step(u, Er, dt, 0.0)
        assert not bool(bad)
        L = sim.layout
        ui = sim.interior(u)
        amps.append(float(jnp.max(jnp.abs(ui[L.UMX] / ui[L.URHO]))))

    # fit the oscillation frequency from the amplitude decay toward the
    # quarter period: A(t) = A0 |cos(k c t)|
    t = np.arange(41) * dt
    A = np.asarray(amps)
    # use the mid-range where cos is well-conditioned
    selm = (A / A[0] > 0.2) & (A / A[0] < 0.95) & (t > 0)
    c_fit = np.median(np.arccos(np.clip(A[selm] / A[0], -1, 1)) /
                      (k * t[selm]))
    # the gas-only speed would give c_fit ~ 1.0; rad-stiffened ~ 1.80
    assert abs(c_fit - c_tot) / c_tot < 0.10, (c_fit, c_tot, cg)


def _mk_nd(n_cell, kappa_r=1e8, kappa_p=0.0):
    dim = len(n_cell)
    p = Params()
    p = p.with_ns("amr", n_cell=tuple(n_cell))
    p = p.with_ns("geometry", prob_lo=(0.0,) * 3, prob_hi=(1.0,) * 3)
    p = p.with_ns("castro", lo_bc=(0,) * dim, hi_bc=(0,) * dim,
                  do_radiation=1, small_dens=1e-12, small_temp=1e-12,
                  small_pres=1e-15, check_cfl_violation=0)
    p = p.with_ns("radiation", const_kappa_p=kappa_p, const_kappa_r=kappa_r,
                  limiter=2)
    p = p.with_ns("eos", eos_gamma=5.0 / 3.0)
    p = p.with_ns("tpu", dtype="float64")
    return p


def test_rad_ctu_2d_matches_1d_along_axis():
    """A y-uniform radiating shock tube stepped with the 2D characteristic
    coupling must stay y-uniform and reproduce the 1D answer along x
    (the reference scheme is dimension-agnostic, trace_ppm_rad.cpp +
    Castro_ctu_rad.cpp)."""
    n = 64

    def init1(sim, u):
        x = sim.geom.cell_centers(0, sim.ng)
        rho = jnp.where(x < 0.5, 1.0, 0.25)
        pres = jnp.where(x < 0.5, 1.0, 0.3)
        return fill_from_prim(sim, u, rho, (0.0, 0.0, 0.0), p=pres)

    def init2(sim, u):
        x = sim.geom.cell_centers(0, sim.ng)
        rho = jnp.broadcast_to(jnp.where(x < 0.5, 1.0, 0.25),
                               sim.grown_shape())
        pres = jnp.broadcast_to(jnp.where(x < 0.5, 1.0, 0.3),
                                sim.grown_shape())
        return fill_from_prim(sim, u, rho, (0.0, 0.0, 0.0), p=pres)

    sim1 = Simulation(_mk_nd((n,)), problem_init=init1)
    sim1.init_data()
    sim1.u_rad = sim1.u_rad * 0.0 + 0.5

    sim2 = Simulation(_mk_nd((n, 8)), problem_init=init2)
    sim2.init_data()
    sim2.u_rad = sim2.u_rad * 0.0 + 0.5

    dt = 2e-3
    u1, E1 = sim1.u, sim1.u_rad
    u2, E2 = sim2.u, sim2.u_rad
    for _ in range(10):
        u1, E1, _, bad1 = sim1._jit_rad_step(u1, E1, dt, 0.0)
        u2, E2, _, bad2 = sim2._jit_rad_step(u2, E2, dt, 0.0)
        assert not bool(bad1) and not bool(bad2)

    L = sim1.layout
    a1 = np.asarray(sim1.interior(u1))
    a2 = np.asarray(sim2.interior(u2))
    E1n = np.asarray(E1)
    E2n = np.asarray(E2)

    # y-uniformity of the 2D run
    assert np.max(np.abs(a2 - a2[..., :1])) < 1e-10
    assert np.max(np.abs(E2n - E2n[..., :1])) < 1e-10

    # Match the 1D answer along the axis. Not bit-exact: the 2D path is a
    # different XLA program, and a last-ulp rounding difference can flip a
    # discrete threshold (flattening / shock-detect) at the shock after a
    # few steps — observed ~1e-7 at one shock cell from step 5 on, with Er
    # still bit-identical.
    for comp in (L.URHO, L.UMX, L.UEDEN, L.UEINT):
        assert np.allclose(a2[comp, :, 0], a1[comp], rtol=1e-5,
                           atol=1e-6), comp
    assert np.allclose(E2n[..., 0], E1n, rtol=1e-5, atol=1e-6)


def test_rad_ctu_3d_symmetric_pulse():
    """3D characteristic coupling: an isotropic Er pulse on a uniform gas
    stays finite, conserves symmetry across the three axes, and pushes
    matter outward through the radiation pressure gradient."""
    n = 16

    def init(sim, u):
        return fill_from_prim(sim, u, 1.0, (0.0, 0.0, 0.0), p=1.0)

    sim = Simulation(_mk_nd((n, n, n), kappa_r=1e4), problem_init=init)
    sim.init_data()
    # cell_centers already returns the per-axis broadcast shape (n,1,1) etc.
    r2 = sum((sim.geom.cell_centers(d, 0) - 0.5) ** 2 for d in range(3))
    sim.u_rad = sim.u_rad * 0.0 + 1e-6 + 5.0 * jnp.exp(-r2 / 0.02)[None]

    dt = 2e-3
    u, Er = sim.u, sim.u_rad
    for _ in range(5):
        u, Er, _, bad = sim._jit_rad_step(u, Er, dt, 0.0)
        assert not bool(bad)

    L = sim.layout
    ui = np.asarray(sim.interior(u))
    Ern = np.asarray(Er)
    if Ern.ndim == 4:  # leading group axis
        Ern = Ern[0]
    assert np.all(np.isfinite(ui)) and np.all(np.isfinite(Ern))
    # symmetry: x/y/z axes are interchangeable for this initial state
    assert np.allclose(ui[L.URHO], ui[L.URHO].transpose(1, 0, 2), atol=1e-11)
    assert np.allclose(ui[L.URHO], ui[L.URHO].transpose(2, 1, 0), atol=1e-11)
    assert np.allclose(Ern, Ern.transpose(1, 0, 2), atol=1e-11)
    # radiation pressure drives outflow: momentum away from the center
    mid = n // 2
    assert float(ui[L.UMX][-2, mid, mid]) > 0.0
    assert float(ui[L.UMX][1, mid, mid]) < 0.0


def test_rad_ctu_spherical_uniform_stays_static():
    """Curvilinear characteristic coupling (1D spherical): a uniform
    equilibrium state is stationary — the dloga trace source vanishes at
    u=0, the radial momentum keeps pressure OUT of the flux
    (mom_flux_has_p), and the area/volume consup telescopes. Previously
    curvilinear runs silently fell back to operator splitting."""
    n = 64
    p = Params()
    p = p.with_ns("amr", n_cell=(n,))
    p = p.with_ns("geometry", prob_lo=(0.2,) * 3, prob_hi=(1.2,) * 3,
                  coord_sys=2)
    p = p.with_ns("castro", lo_bc=(2,), hi_bc=(2,), do_radiation=1,
                  small_dens=1e-12, small_temp=1e-12, small_pres=1e-15,
                  check_cfl_violation=0)
    # zero-flux radiation boundaries: uniform Er is a true equilibrium
    # (the default hydro-derived rad BC builds an Er boundary layer whose
    # lambda-grad-Er force is genuine physics, not a geometry error)
    p = p.with_ns("radiation", const_kappa_p=1e-4, const_kappa_r=1.0,
                  limiter=0, lo_bc=(102, 0, 0), hi_bc=(102, 0, 0))
    p = p.with_ns("eos", eos_gamma=5.0 / 3.0)
    p = p.with_ns("tpu", dtype="float64")

    def init(sim, u):
        return fill_from_prim(sim, u, 1.0, (0.0, 0.0, 0.0), T=1e6)

    sim = Simulation(p, problem_init=init)
    sim.init_data()
    L = sim.layout
    u, Er = sim.u, sim.u_rad
    rho0 = np.asarray(sim.interior()[L.URHO]).copy()
    dt = 1e-9
    for i in range(5):
        u, Er, mr, bad = sim._jit_rad_step(u, Er, dt, i * dt)
        assert not bool(bad)
    ui = np.asarray(sim.interior(u))
    # velocity stays at round-off; density unchanged
    assert np.abs(ui[L.UMX]).max() < 1e-8 * ui[L.URHO].max()
    np.testing.assert_allclose(ui[L.URHO], rho0, rtol=1e-12)


def test_rad_ctu_spherical_pulse_outflow():
    """1D spherical rad-hydro blast through the characteristic path:
    finite, positive, and radiation streams outward (sanity of the
    curvilinear area/volume terms under dynamics)."""
    n = 64
    p = Params()
    p = p.with_ns("amr", n_cell=(n,))
    p = p.with_ns("geometry", prob_lo=(0.0,) * 3, prob_hi=(1.0,) * 3,
                  coord_sys=2)
    p = p.with_ns("castro", lo_bc=(3,), hi_bc=(2,), do_radiation=1,
                  small_dens=1e-12, small_temp=1e-12, small_pres=1e-15,
                  check_cfl_violation=0)
    p = p.with_ns("radiation", const_kappa_p=1e-2, const_kappa_r=10.0,
                  limiter=2, lo_bc=(102, 0, 0), hi_bc=(104, 0, 0))
    p = p.with_ns("eos", eos_gamma=5.0 / 3.0)
    p = p.with_ns("tpu", dtype="float64")

    def init(sim, u):
        r = sim.geom.cell_centers(0, sim.ng)
        T = 1e5 + 1e7 * jnp.exp(-(r / 0.15) ** 2)
        return fill_from_prim(sim, u, 1e-3, (0.0, 0.0, 0.0), T=T)

    sim = Simulation(p, problem_init=init)
    sim.init_data()
    L = sim.layout
    u, Er = sim.u, sim.u_rad
    er_c0 = float(np.asarray(Er)[:8].sum())
    dt = 2e-10
    for i in range(8):
        u, Er, mr, bad = sim._jit_rad_step(u, Er, dt, i * dt)
        assert not bool(bad)
    ui = np.asarray(sim.interior(u))
    assert np.isfinite(ui).all() and np.isfinite(np.asarray(Er)).all()
    assert np.asarray(Er).min() >= 0.0
    assert ui[L.URHO].min() > 0.0
    # central radiation drains outward through diffusion + advection
    assert float(np.asarray(Er)[:8].sum()) < er_c0


def test_rad_ctu_spherical_multigroup_finite():
    """Curvilinear x multigroup composition: the 1D-spherical
    characteristic path with 4 groups (dloga trace source + per-group
    f-space machinery + batched implicit solves) stays finite, positive
    and photon-conserving in the optically-thin ambient."""
    n = 64
    p = Params()
    p = p.with_ns("amr", n_cell=(n,))
    p = p.with_ns("geometry", prob_lo=(0.0,) * 3, prob_hi=(1.0,) * 3,
                  coord_sys=2)
    p = p.with_ns("castro", lo_bc=(3,), hi_bc=(2,), do_radiation=1,
                  small_dens=1e-12, small_temp=1e-12, small_pres=1e-15,
                  check_cfl_violation=0)
    p = p.with_ns("radiation", ngroups=4, const_kappa_p=1e-2,
                  const_kappa_r=10.0, limiter=2,
                  lowest_group_hz=1e13, highest_group_hz=1e17,
                  lo_bc=(102, 0, 0), hi_bc=(104, 0, 0))
    p = p.with_ns("eos", eos_gamma=5.0 / 3.0)
    p = p.with_ns("tpu", dtype="float64")

    def init(sim, u):
        r = sim.geom.cell_centers(0, sim.ng)
        T = 1e5 + 1e7 * jnp.exp(-(r / 0.15) ** 2)
        return fill_from_prim(sim, u, 1e-3, (0.0, 0.0, 0.0), T=T)

    sim = Simulation(p, problem_init=init)
    sim.init_data()
    assert sim.u_rad.shape[0] == 4
    u, Er = sim.u, sim.u_rad
    er_c0 = float(np.asarray(Er)[:, :8].sum())
    dt = 2e-10
    for i in range(6):
        u, Er, mr, bad = sim._jit_rad_step(u, Er, dt, i * dt)
        assert not bool(bad)
    assert np.isfinite(np.asarray(Er)).all()
    assert np.asarray(Er).min() >= 0.0
    # radiation drains outward from the hot center
    assert float(np.asarray(Er)[:, :8].sum()) < er_c0
