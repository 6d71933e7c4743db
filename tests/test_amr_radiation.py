"""AMR radiation: 2-level gray FLD with composite window solves
(coarse-Er Dirichlet BCs), window-ring fillpatch, Er avgDown, and the
deferred flux sync (reference Radiation flux registers + deferred_sync,
`Radiation.cpp:247-289,1731-1830`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.config import Params
from castro_tpu.driver.amr import AmrSimulation
from castro_tpu.driver.sim import Simulation
from castro_tpu.problems.util import fill_from_prim


def _mk(n, max_level=0):
    p = Params()
    p = p.with_ns("amr", n_cell=(n, n), max_level=max_level, regrid_int=0,
                  refinement_indicators=("terr",))
    p = p.with_ns("geometry", prob_lo=(0.0,) * 3, prob_hi=(1.0,) * 3)
    p = p.with_ns("castro", do_radiation=1, do_hydro=0,
                  lo_bc=(2, 2), hi_bc=(2, 2), fixed_dt=2e-7)
    # diffusion-dominated: weak coupling, moderate Rosseland opacity
    p = p.with_ns("radiation", const_kappa_p=1e-6, const_kappa_r=50.0,
                  limiter=0, ngroups=1)
    p = p.replace(extra={"amr.terr.field": "Temp",
                         "amr.terr.value_greater": 0.5})
    return p


def _init(sim, u):
    """Hot spot at the center: equilibrium Er = aT^4 follows T."""
    r = sim.geom.radius(sim.ng, center=(0.5, 0.5))
    T = 0.1 + 1.0 * jnp.exp(-(r / 0.12) ** 2)
    return fill_from_prim(sim, u, 1.0, (0.0, 0.0, 0.0), T=T)


def test_amr_rad_runs_and_windows():
    amr = AmrSimulation(_mk(32, max_level=1), problem_init=_init)
    amr.init_data()
    assert amr._has_rad
    assert amr.u_rad[1] is not None
    assert int(amr.masks[1].sum()) > 0
    for _ in range(3):
        amr.advance(2e-7)
    for l in range(2):
        assert np.all(np.isfinite(np.asarray(amr.u_rad[l])))
        assert np.all(np.asarray(amr.u_rad[l]) >= 0.0)
    # the deferred-sync register was created for the next coarse solve
    assert 0 in amr._rad_sync_rhs


def test_amr_rad_matches_uniform_fine():
    """Composite 2-level Er tracks a uniformly fine run in the refined
    region."""
    fine = Simulation(_mk(64), problem_init=_init)
    fine.init_data()
    nsteps, dt = 4, 2e-7
    for _ in range(nsteps):
        fine.advance(dt)
    Er_fine = np.asarray(fine.u_rad)

    amr = AmrSimulation(_mk(32, max_level=1), problem_init=_init)
    amr.init_data()
    for _ in range(nsteps):
        amr.advance(dt)

    ilo, shape = amr.window[1]
    sl = tuple(slice(int(ilo[k]), int(ilo[k]) + shape[k]) for k in range(2))
    m1 = np.asarray(amr.masks[1])
    a = np.asarray(amr.u_rad[1])[m1]
    b = Er_fine[sl][m1]
    scale = np.abs(Er_fine).max()
    err = np.abs(a - b) / scale
    assert err.max() < 0.02, err.max()


def test_amr_rad_energy_conservation():
    """Total (matter + radiation) energy is conserved through the
    coarse-fine machinery (Neumann/reflecting walls, no hydro)."""
    amr = AmrSimulation(_mk(32, max_level=1), problem_init=_init)
    amr.init_data()
    L = amr.sim0.layout

    def total_energy():
        # composite accounting: uncovered coarse + masked fine
        cmask = np.asarray(amr.masks[0]) & ~_covered(amr)
        dxc = float(np.prod(amr.sim0.geom.dx))
        dxf = float(np.prod(amr._get_level(1, amr.window[1][1]).sim.geom.dx))
        uc = np.asarray(amr.interior(0))
        uf = np.asarray(amr.interior(1))
        m1 = np.asarray(amr.masks[1])
        E = (uc[L.UEDEN][cmask].sum() +
             np.asarray(amr.u_rad[0])[cmask].sum()) * dxc
        E += (uf[L.UEDEN][m1].sum() +
              np.asarray(amr.u_rad[1])[m1].sum()) * dxf
        return E

    def _covered(asim):
        from castro_tpu.ops.interlevel import restrict_mask

        cov = np.zeros(np.asarray(asim.masks[0]).shape, bool)
        csl = asim._parent_rel_slice(1)
        cov[csl] = np.asarray(restrict_mask(asim.masks[1], 2))
        return cov

    E0 = total_energy()
    for _ in range(4):
        amr.advance(2e-7)
    E1 = total_energy()
    # the pending (deferred) sync register holds the not-yet-applied
    # mismatch; conservation up to that deferred term + solver tolerance
    assert abs(E1 - E0) / abs(E0) < 5e-3, (E0, E1)


def _mk_mg(n, max_level=0):
    """Multigroup variant (reference MGFLDRadSolver.cpp multilevel
    multigroup solves): 4 groups spanning the thermal peak."""
    p = _mk(n, max_level=max_level)
    p = p.with_ns("radiation", ngroups=4, lowest_group_hz=1.0e13,
                  highest_group_hz=1.0e17)
    return p


def test_amr_rad_multigroup_matches_uniform_fine():
    """2-level MULTIGROUP AMR radiation (per-group window Dirichlet BCs,
    per-group deferred sync) tracks a uniformly fine run."""
    fine = Simulation(_mk_mg(64), problem_init=_init)
    fine.init_data()
    nsteps, dt = 3, 2e-7
    for _ in range(nsteps):
        fine.advance(dt)
    Er_fine = np.asarray(fine.u_rad)  # [ngroups, 64, 64]
    assert Er_fine.ndim == 3

    amr = AmrSimulation(_mk_mg(32, max_level=1), problem_init=_init)
    amr.init_data()
    assert amr._rad_cax == 1
    for _ in range(nsteps):
        amr.advance(dt)
    assert 0 in amr._rad_sync_rhs

    ilo, shape = amr.window[1]
    sl = (slice(None),) + tuple(slice(int(ilo[k]), int(ilo[k]) + shape[k])
                                for k in range(2))
    m1 = np.asarray(amr.masks[1])
    a = np.asarray(amr.u_rad[1])
    b = Er_fine[sl]
    scale = np.abs(Er_fine).max()
    err = np.abs(a - b) / scale
    assert err[:, m1].max() < 0.02, err[:, m1].max()


def test_amr_rad_distributed_matches_single_device():
    """Distributed AMR radiation: the level-0 implicit solve runs under a
    2x2 mesh through the DISTRIBUTED multigrid; answers match the
    single-device 2-level run to solver tolerance (reference: the
    MPI-decomposed Radiation level solve)."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")

    nsteps, dt = 3, 2e-7
    ref = AmrSimulation(_mk(32, max_level=1), problem_init=_init)
    ref.init_data()
    for _ in range(nsteps):
        ref.advance(dt)

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("x", "y"))
    amr = AmrSimulation(_mk(32, max_level=1), problem_init=_init,
                        mesh=mesh)
    amr.init_data()
    for _ in range(nsteps):
        amr.advance(dt)

    for l in range(2):
        a = np.asarray(amr.u_rad[l])
        b = np.asarray(ref.u_rad[l])
        scale = np.abs(b).max()
        assert np.abs(a - b).max() / scale < 1e-5, \
            (l, np.abs(a - b).max() / scale)
    ua = np.asarray(amr.interior(0))
    ub = np.asarray(ref.interior(0))
    assert np.abs(ua - ub).max() / np.abs(ub).max() < 1e-5


def test_amr_rad_characteristic_coupling_with_hydro():
    """AMR radiation with do_hydro=1 runs the CHARACTERISTIC rad-CTU
    coupling on the windows (the reference rad_hydro_combined per level
    under the Amr recursion) — no operator-split fallback — and tracks a
    uniformly fine run."""
    p32 = _mk(32, max_level=1).with_ns("castro", do_hydro=1, cfl=0.5)
    p64 = _mk(64).with_ns("castro", do_hydro=1, cfl=0.5)

    fine = Simulation(p64, problem_init=_init)
    fine.init_data()
    nsteps, dt = 3, 2e-7
    for _ in range(nsteps):
        fine.advance(dt)
    Er_fine = np.asarray(fine.u_rad)

    amr = AmrSimulation(p32, problem_init=_init)
    amr.init_data()
    for _ in range(nsteps):
        amr.advance(dt)
    assert 0 in amr._rad_sync_rhs  # the register path ran

    ilo, shape = amr.window[1]
    sl = tuple(slice(int(ilo[k]), int(ilo[k]) + shape[k]) for k in range(2))
    m1 = np.asarray(amr.masks[1])
    a = np.asarray(amr.u_rad[1])[m1]
    b = Er_fine[sl][m1]
    scale = np.abs(Er_fine).max()
    assert np.isfinite(np.asarray(amr.interior(0))).all()
    assert np.abs(a - b).max() / scale < 0.03, \
        np.abs(a - b).max() / scale


def test_amr_rad_multigroup_compton_composes():
    """Compton inelastic scattering composes with multigroup AMR
    radiation: each level's step applies the LLPS85 exchange after its
    implicit solve (Radiation::inelastic_scattering per level), the
    hierarchy stays finite/positive, and the group spectrum actually
    redistributes on both levels."""
    p = _mk_mg(32, max_level=1).with_ns(
        "radiation", do_inelastic_scattering=1, const_kappa_r=5.0)
    amr = AmrSimulation(p, problem_init=_init)
    amr.init_data()
    frac0 = []
    for l in range(2):
        er = np.asarray(amr.u_rad[l])
        frac0.append(er.sum(axis=tuple(range(1, er.ndim))) / er.sum())
    for _ in range(3):
        amr.advance(2e-7)
    for l in range(2):
        er = np.asarray(amr.u_rad[l])
        assert np.isfinite(er).all()
        assert er.min() >= 0.0
        frac1 = er.sum(axis=tuple(range(1, er.ndim))) / er.sum()
        assert not np.allclose(frac1, frac0[l], rtol=1e-8), l
    assert np.isfinite(np.asarray(amr.interior(0))).all()
    assert np.isfinite(np.asarray(amr.interior(1))).all()
