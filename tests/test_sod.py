"""Sod shock tube vs the exact Riemann solution (reference verification:
`Docs/source/Verification.rst:8-80`, Exec/hydro_tests/Sod)."""

import numpy as np
import pytest

from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import sod

from exact_riemann import solution


def run_sod(dim, idir, n=128):
    params = sod.make_params(n=n, dim=dim)
    params = params.replace(problem={**sod.DEFAULTS, "idir": idir})
    sim = Simulation(params, problem_init=sod.problem_init)
    sim.run(stop_time=0.2, verbose=False)
    return sim


def check_against_exact(sim, d, tol_rho):
    L = sim.layout
    u = np.asarray(sim.interior())
    # extract a 1D pencil along d
    idx = [0] * sim.layout.dim
    sl = [slice(None) if k == d else u.shape[1 + k] // 2 for k in range(sim.layout.dim)]
    rho = u[(L.URHO,) + tuple(sl)]
    mom = u[(L.momentum_index(d),) + tuple(sl)]
    eint = u[(L.UEINT,) + tuple(sl)]
    vel = mom / rho
    p = eint / rho * rho * (1.4 - 1.0)

    x = np.asarray(sim.geom.cell_centers_1d(d, 0))
    rho_ex, u_ex, p_ex = solution(x, sim.t, 0.5, 1.0, 0.0, 1.0, 0.125, 0.0, 0.1, 1.4)

    err = np.abs(rho - rho_ex).mean() / rho_ex.mean()
    assert err < tol_rho, f"mean rho error {err}"
    # star-region values
    mid = (x > 0.55) & (x < 0.65)
    assert np.allclose(p[mid], 0.30313, rtol=0.03)
    assert np.allclose(vel[mid], 0.92745, rtol=0.03)


def test_sod_x_1d():
    sim = run_sod(1, 1)
    check_against_exact(sim, 0, 0.015)


def test_sod_conservation_1d():
    """Mass/energy conserved to round-off with outflow-free interior."""
    params = sod.make_params(n=64, dim=1)
    sim = Simulation(params, problem_init=sod.problem_init)
    sim.init_data()
    L = sim.layout
    m0 = float(np.sum(np.asarray(sim.interior())[L.URHO]))
    e0 = float(np.sum(np.asarray(sim.interior())[L.UEDEN]))
    sim.run(stop_time=0.1, verbose=False)
    m1 = float(np.sum(np.asarray(sim.interior())[L.URHO]))
    e1 = float(np.sum(np.asarray(sim.interior())[L.UEDEN]))
    # nothing reaches the boundaries by t=0.1
    assert np.isclose(m0, m1, rtol=1e-12)
    assert np.isclose(e0, e1, rtol=1e-12)


def test_sod_y_2d():
    sim = run_sod(2, 2, n=64)
    check_against_exact(sim, 1, 0.03)


@pytest.mark.slow
def test_sod_z_3d():
    sim = run_sod(3, 3, n=32)
    check_against_exact(sim, 2, 0.06)


@pytest.mark.parametrize("opts", [
    dict(ppm_type=0, plm_limiter=2),          # PLM, 4th-order MC
    dict(ppm_type=0, plm_limiter=1),          # PLM, 2nd-order MC
    dict(riemann_solver=1),                   # Colella-Glaz iterative
    dict(riemann_solver=2),                   # HLLC
    dict(hybrid_riemann=1, use_shock_var=1),  # HLL inside shocks
])
def test_sod_solver_variants(opts):
    """Every reconstruction/Riemann option resolves Sod within tolerance
    (reference: castro.ppm_type / riemann_solver / hybrid_riemann knobs)."""
    params = sod.make_params(n=128, dim=1)
    params = params.with_ns("castro", **opts)
    sim = Simulation(params, problem_init=sod.problem_init)
    sim.run(stop_time=0.2, verbose=False)

    L = sim.layout
    u = np.asarray(sim.interior())
    rho = u[L.URHO]
    p = u[L.UEINT] * 0.4
    x = np.asarray(sim.geom.cell_centers_1d(0, 0))
    rho_ex, u_ex, p_ex = solution(x, sim.t, 0.5, 1.0, 0.0, 1.0, 0.125, 0.0, 0.1, 1.4)
    err = np.abs(rho - rho_ex).mean() / rho_ex.mean()
    assert err < 0.02, err
    mid = (x > 0.55) & (x < 0.65)
    assert abs(p[mid].mean() - 0.30313) / 0.30313 < 0.03
