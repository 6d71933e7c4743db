"""1D spherical Sedov vs the reference's analytic verification data
(`Exec/hydro_tests/Sedov/Verification/spherical_sedov.dat`, generated
from Timmes' sedov3 solver; reference inputs.1d.sph configuration).

This is the A1 regression check of SURVEY.md Appendix A — the framework's
answer is compared against the official analytic profile at t=0.01."""

import os

import numpy as np
import pytest

from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import sedov

DAT = "/root/reference/Exec/hydro_tests/Sedov/Verification/spherical_sedov.dat"


@pytest.mark.skipif(not os.path.exists(DAT), reason="reference not mounted")
def test_sedov_1d_spherical_vs_analytic():
    # reference inputs.1d.sph: 1D spherical, n=32 base + 2 AMR levels ->
    # effective 128; we run a uniform 256 grid (finer than the reference
    # effective resolution)
    n = 256
    params = sedov.make_params(n=n, dim=1, coord=2, stop_time=0.01,
                               r_init=0.01, p_ambient=1e-5, exp_energy=1.0)
    params = params.with_ns("castro", lo_bc=(3,), hi_bc=(2,), cfl=0.5)
    sim = Simulation(params, problem_init=lambda s, u: sedov.problem_init(
        s, u, center=(0.0,)))
    sim.run(verbose=False)
    assert abs(sim.t - 0.01) < 1e-12

    L = sim.layout
    ui = np.asarray(sim.interior())
    rho = ui[L.URHO]
    vel = ui[L.UMX] / rho
    p = ui[L.UEINT] * (1.4 - 1.0)
    r = np.asarray(sim.geom.cell_centers_1d(0, 0))

    data = np.loadtxt(DAT)
    r_a, rho_a, p_a, v_a = data[:, 1], data[:, 2], data[:, 4], data[:, 5]

    rho_i = np.interp(r, r_a, rho_a)
    v_i = np.interp(r, r_a, v_a)
    p_i = np.interp(r, r_a, p_a)

    # shock position: analytic peak vs numerical peak within 2 cells
    r_shock_a = r_a[np.argmax(rho_a)]
    r_shock_n = r[np.argmax(rho)]
    assert abs(r_shock_a - r_shock_n) < 2.5 / n, (r_shock_a, r_shock_n)

    # peak compression close to the analytic 6x (finite resolution smears)
    assert rho.max() > 3.0, rho.max()

    # integrated profiles agree (L1 relative, away from the origin)
    mask = (r > 0.05) & (r < 0.45)
    err_rho = np.abs(rho - rho_i)[mask].mean() / rho_a.max()
    assert err_rho < 0.05, err_rho
    err_v = np.abs(vel - v_i)[mask].mean() / np.abs(v_a).max()
    assert err_v < 0.05, err_v

    # total energy = deposited energy (conservation on the spherical grid)
    vol = np.asarray(sim.geom.volume(0)).ravel()
    E_tot = float((ui[L.UEDEN] * vol).sum())
    assert abs(E_tot - 1.0) < 0.01, E_tot


def test_sedov_2d_rz_matches_1d_spherical():
    """Spherical blast in 2D cylindrical (r,z) coordinates (reference
    inputs.2d.sph_in_cylcoords): the radial profile must match the 1D
    spherical run — exercises the RZ metric terms in the transverse
    corrections and consup."""
    import jax.numpy as jnp
    from castro_tpu.problems.util import fill_from_prim

    n = 64
    stop = 0.01
    # 1D spherical reference
    p1 = sedov.make_params(n=n, dim=1, coord=2, stop_time=stop,
                           r_init=0.1, p_ambient=1e-5, exp_energy=1.0)
    p1 = p1.with_ns("castro", lo_bc=(3,), hi_bc=(2,), cfl=0.4)
    s1 = Simulation(p1, problem_init=lambda s, u: sedov.problem_init(
        s, u, center=(0.0,)))
    s1.run(verbose=False)
    rho1 = np.asarray(s1.interior())[0]
    r1 = np.asarray(s1.geom.cell_centers_1d(0, 0))

    # 2D RZ: r in [0,1], z in [-1,1], blast at the origin (on the axis)
    p2 = sedov.make_params(n=n, dim=2, coord=1, stop_time=stop,
                           r_init=0.1, p_ambient=1e-5, exp_energy=1.0)
    p2 = p2.with_ns("geometry", coord_sys=1, prob_lo=(0.0, -1.0, 0.0),
                    prob_hi=(1.0, 1.0, 0.0))
    p2 = p2.with_ns("amr", n_cell=(n, 2 * n))
    p2 = p2.with_ns("castro", lo_bc=(3, 2), hi_bc=(2, 2), cfl=0.4)
    s2 = Simulation(p2, problem_init=lambda s, u: sedov.problem_init(
        s, u, center=(0.0, 0.0)))
    s2.run(verbose=False)
    u2 = np.asarray(s2.interior())
    # the z=0 midplane radial cut (average the two rows straddling z=0)
    rho2 = 0.5 * (u2[0][:, n - 1] + u2[0][:, n])

    err = np.abs(rho2 - rho1).mean() / rho1.mean()
    assert err < 0.05, err
    # peak positions agree within 2 cells
    assert abs(np.argmax(rho2) - np.argmax(rho1)) <= 2
    # z-reflection symmetry of the RZ run
    assert np.allclose(u2[0], u2[0][:, ::-1], rtol=1e-8, atol=1e-10)
