"""Composite (multilevel) gravity + AMR window geometry correctness.

Reference spec: fine AMR levels solve Poisson with Dirichlet boundary data
interpolated from the coarse-level solution (`Gravity.cpp:418-487`), and
multilevel composite solves keep the hierarchy consistent
(`Gravity.cpp:693-781`). Round-2 regression: windows were built on a
wrong-dx geometry (dx = domain_extent / window_shape) which poisoned
fine-level estdt, Poisson solves, and diffusion stencils.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.config import Params
from castro_tpu.driver.amr import AmrSimulation
from castro_tpu.driver.sim import Simulation
from castro_tpu.problems.util import fill_from_prim


def _mk(n, max_level=0, dim=2, grav=True):
    p = Params()
    p = p.with_ns("amr", n_cell=(n,) * dim, max_level=max_level,
                  regrid_int=2, refinement_indicators=("dens",))
    p = p.with_ns("geometry", prob_lo=(-1.0,) * 3, prob_hi=(1.0,) * 3)
    p = p.with_ns("castro", lo_bc=(2,) * dim, hi_bc=(2,) * dim,
                  do_grav=1 if grav else 0, small_dens=1e-8)
    if grav:
        p = p.with_ns("gravity", gravity_type="PoissonGrav",
                      max_multipole_order=4)
    p = p.replace(extra={"amr.dens.field": "density",
                         "amr.dens.value_greater": 0.5})
    return p


def _blob_init(sim, u):
    r = sim.geom.radius(sim.ng, center=(0.0,) * sim.geom.dim)
    rho = 0.01 + 2.0 * jnp.exp(-(r / 0.25) ** 2)
    return fill_from_prim(sim, u, rho, (0.0, 0.0, 0.0), p=1.0)


def test_window_geometry_dx_correct():
    """The fine-window Simulation's geometry must carry the TRUE fine dx
    (domain_extent / (n0 * 2^level)), not domain_extent / window_shape.
    This test FAILS on the round-2 code (33%-class dx error)."""
    amr = AmrSimulation(_mk(32, max_level=1, grav=False),
                        problem_init=_blob_init)
    amr.init_data()
    _, shape = amr.window[1]
    assert shape[0] < 64  # the window must actually be a sub-region
    lev = amr._get_level(1, shape)
    dx_true = 2.0 / 64.0
    assert np.allclose(lev.sim.geom.dx, dx_true, rtol=1e-12), \
        (lev.sim.geom.dx, dx_true)
    # diffusion/estdt inherit the same geometry object
    assert lev.sim.geom.dx == amr.geom_full[1].local_view(
        shape, (0, 0)).dx


def test_fine_level_estdt_uses_fine_dx():
    """Fine-level CFL dt must be ~half the coarse dt for identical data
    (dx halves); the round-2 bug inflated it by domain/window ratio."""
    amr = AmrSimulation(_mk(32, max_level=1, grav=False),
                        problem_init=_blob_init)
    amr.init_data()
    dt0 = float(amr.sim0._jit_estdt(amr.u[0]))
    lev = amr._get_level(1, amr.window[1][1])
    dt1 = float(lev.jit_estdt(amr.u[1]))
    # identical (prolonged) data at half dx: dt1/dt0 must be ~0.5, and
    # certainly below 0.75 (the bug gave dt1 ≈ dt0 * window_ratio > dt0/2)
    assert dt1 < 0.75 * dt0, (dt1, dt0)
    assert dt1 > 0.25 * dt0


def test_composite_level_solve_matches_uniform_fine():
    """Fine-window phi solved with coarse-interpolated Dirichlet BCs
    matches the uniformly-fine whole-domain solve far better than the
    round-2 isolated-window solve could (wrong dx + wrong BCs)."""
    # uniformly fine reference
    fine = Simulation(_mk(64), problem_init=_blob_init)
    fine.init_data()
    grav = next(fn.gravity for fn in fine.source_fns
                if getattr(fn, "name", "") == "grav")
    L = fine.layout
    rho_f = np.asarray(fine.interior())[L.URHO]
    phi_ref = np.asarray(grav._poisson(jnp.asarray(rho_f))[1])

    # 2-level hierarchy
    amr = AmrSimulation(_mk(32, max_level=1), problem_init=_blob_init)
    amr.init_data()
    assert amr._has_poisson
    phi_c = amr._solve_phi(0, amr.u[0])
    amr._cur_grav_bc[1] = amr._window_phi_bc(1, phi_c)
    phi_w = np.asarray(amr._solve_phi(1, amr.u[1]))

    ilo, shape = amr.window[1]
    sl = tuple(slice(int(ilo[k]), int(ilo[k]) + shape[k]) for k in range(2))
    ref_w = phi_ref[sl]
    scale = np.abs(ref_w).max()
    err = np.abs(phi_w - ref_w) / scale
    # BC data carries the coarse solve's O(dx_c^2) discretization error;
    # on this smooth blob that is ~1e-3 of phi. The round-2 code was
    # ~30% off from dx alone.
    assert err.max() < 5e-3, err.max()


def test_amr_gravity_dynamics_tracks_fine():
    """2-level evolution with composite gravity stays close to the
    uniformly-fine run (tighter than the round-2 5% tolerance)."""
    fine = Simulation(_mk(64), problem_init=_blob_init)
    fine.init_data()
    dt = 1e-3
    u = fine.u
    for i in range(4):
        u, _, bad = fine._jit_step(u, dt, i * dt)
        assert not bool(bad)
    rho_fine = np.asarray(fine.interior(u))[fine.layout.URHO]

    amr = AmrSimulation(_mk(32, max_level=1), problem_init=_blob_init)
    amr.init_data()
    for _ in range(4):
        amr.advance(dt)
    comp = np.asarray(amr.composite_interior())[amr.sim0.layout.URHO]

    ilo, shape = amr.window[1]
    m1 = np.zeros(rho_fine.shape, bool)
    m1[tuple(slice(int(ilo[k]), int(ilo[k]) + shape[k])
             for k in range(2))] = np.asarray(amr.masks[1])
    rel = np.abs(comp[m1] - rho_fine[m1]) / np.abs(rho_fine[m1])
    assert np.percentile(rel, 95) < 0.01, np.percentile(rel, 95)


def test_gravity_sync_improves_composite_phi():
    """The delta-phi sync solve (Gravity::gravity_sync,
    Gravity.cpp:488-631): the grad-phi flux-register mismatch at the
    coarse-fine interface feeds a Poisson solve whose correction moves the
    coarse potential TOWARD the true composite (uniformly fine) solution,
    and the improvement persists over subcycled evolution (no drift)."""
    from castro_tpu.ops.interlevel import restrict
    from castro_tpu.ops.stencil import interior_slice

    p = _mk(32, max_level=1).with_ns("tpu", dtype="float64")
    amr = AmrSimulation(p, problem_init=_blob_init)
    amr.init_data()
    assert int(amr.masks[1].sum()) > 0

    # uniformly fine gravity machinery for the truth solves
    fine = Simulation(_mk(64).with_ns("tpu", dtype="float64"),
                      problem_init=_blob_init)
    fine.init_data()
    gf = next(fn.gravity for fn in fine.source_fns
              if getattr(fn, "name", "") == "grav")

    def fine_truth():
        """phi of the CURRENT composite density, solved uniformly fine."""
        rho = amr.composite_interior()[amr.sim0.layout.URHO]
        return np.asarray(restrict(gf._poisson(rho)[1], amr.dim,
                                   comp_axes=0))

    truth = fine_truth()
    scale = np.abs(truth).max()
    err_plain = np.abs(np.asarray(amr._solve_phi(0, amr.u[0]))
                       - truth).max() / scale
    err_sync = np.abs(np.asarray(amr._solve_phi_sync(0, amr.u[0]))
                      - truth).max() / scale
    assert err_sync < 0.9 * err_plain, (err_sync, err_plain)
    assert amr.phi_sync_resid > 0.0

    # and the improvement persists over subcycled steps (no drift)
    for _ in range(4):
        amr.advance(amr.estimate_dt())
    truth2 = fine_truth()
    scale2 = np.abs(truth2).max()
    e_plain2 = np.abs(np.asarray(amr._solve_phi(0, amr.u[0]))
                      - truth2).max() / scale2
    e_sync2 = np.abs(np.asarray(amr._solve_phi_sync(0, amr.u[0]))
                     - truth2).max() / scale2
    # post-evolution the truth metric mixes in hydro-evolution differences,
    # so the sync's edge narrows: require no-harm and boundedness (the
    # "no drift" criterion) rather than a fixed improvement factor
    assert e_sync2 < 1.05 * e_plain2, (e_sync2, e_plain2)
    assert e_sync2 < 2.0 * err_sync  # bounded, no drift

