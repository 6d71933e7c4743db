"""Patch-batch AMR: two separated tagged blobs refine independently
(VERDICT r2 #8; SURVEY §7 / reference BoxArray semantics) — fine FLOPs
scale with the refined volume, not the convex hull."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.driver.amr import AmrSimulation, _cluster_tags
from castro_tpu.driver.sim import Simulation
from castro_tpu.problems.util import fill_from_prim


def _two_blob_params(n=64, max_level=1):
    from castro_tpu.config import Params

    p = Params()
    p = p.with_ns("amr", n_cell=(n, n), max_level=max_level, regrid_int=2,
                  n_error_buf=1, refinement_indicators=("dens",))
    p = p.with_ns("geometry", prob_lo=(0.0,) * 3, prob_hi=(1.0,) * 3)
    p = p.with_ns("castro", lo_bc=(0, 0), hi_bc=(0, 0), small_dens=1e-8)
    return p.replace(extra={"amr.dens.field": "density",
                            "amr.dens.value_greater": 1.3})


def _two_blob_init(sim, u):
    """Two well-separated dense gaussian blobs (opposite corners)."""
    x = sim.geom.cell_centers(0, sim.ng)
    y = sim.geom.cell_centers(1, sim.ng)
    r1 = jnp.sqrt((x - 0.22) ** 2 + (y - 0.22) ** 2)
    r2 = jnp.sqrt((x - 0.78) ** 2 + (y - 0.78) ** 2)
    rho = 1.0 + 1.0 * jnp.exp(-(r1 / 0.06) ** 2) \
        + 1.0 * jnp.exp(-(r2 / 0.06) ** 2)
    return fill_from_prim(sim, u, rho, (0.0, 0.0, 0.0), p=1.0)


def test_cluster_tags_finds_two_components():
    t = np.zeros((32, 32), bool)
    t[4:8, 4:8] = True
    t[24:28, 24:28] = True
    boxes = _cluster_tags(t, merge_gap=4)
    assert len(boxes) == 2
    # nearby boxes merge
    t2 = np.zeros((32, 32), bool)
    t2[4:8, 4:8] = True
    t2[9:12, 9:12] = True
    assert len(_cluster_tags(t2, merge_gap=4)) == 1


def test_two_blobs_get_two_windows():
    amr = AmrSimulation(_two_blob_params(), problem_init=_two_blob_init)
    amr.init_data()
    assert len(amr.extra[1]) == 1, "second blob should get its own window"
    hull_cells = 96 * 96  # the single-hull window would span both corners
    total = int(np.prod(amr.window[1][1])) + sum(
        int(np.prod(e["shape"])) for e in amr.extra[1])
    assert total < 0.6 * hull_cells, (total, hull_cells)
    # both blobs covered by masks
    assert int(amr.masks[1].sum()) > 0
    assert int(amr.extra[1][0]["mask"].sum()) > 0


def test_two_blob_evolution_matches_fine():
    """Both independently-windowed blobs track the uniformly fine run;
    mass is conserved through the per-window refluxing."""
    fine = Simulation(_two_blob_params(n=128, max_level=0),
                      problem_init=_two_blob_init)
    fine.init_data()
    dt = 1e-3
    u = fine.u
    for i in range(4):
        u, _, bad = fine._jit_step(u, dt, i * dt)
        assert not bool(bad)
    rho_fine = np.asarray(fine.interior(u))[fine.layout.URHO]

    amr = AmrSimulation(_two_blob_params(), problem_init=_two_blob_init)
    amr.init_data()
    amr.advance(dt)
    # baseline AFTER the first step: the initial avgDown of fine-res
    # problem data is a one-time re-initialization offset, not a
    # conservation property of the advance
    m0 = float(np.asarray(amr.interior(0))[0].sum())
    for _ in range(3):
        amr.advance(dt)
    comp = np.asarray(amr.composite_interior())[amr.sim0.layout.URHO]

    # each window's masked region matches the fine run
    wins = [(amr.window[1], np.asarray(amr.masks[1]))] + [
        ((e["ilo"], e["shape"]), np.asarray(e["mask"]))
        for e in amr.extra[1]]
    for (ilo, shape), mask in wins:
        sl = tuple(slice(int(ilo[k]), int(ilo[k]) + shape[k])
                   for k in range(2))
        a = comp[sl][mask]
        b = rho_fine[sl][mask]
        rel = np.abs(a - b) / np.abs(b)
        assert np.percentile(rel, 95) < 0.01, np.percentile(rel, 95)

    # conservation (periodic box, refluxed)
    m1 = float(np.asarray(amr.interior(0))[0].sum())
    assert abs(m1 - m0) / m0 < 1e-10, (m0, m1)


def test_two_blob_regrid_migrates_windows():
    amr = AmrSimulation(_two_blob_params(), problem_init=_two_blob_init)
    amr.init_data()
    for _ in range(2):
        amr.advance(1e-3)
    amr.regrid()
    assert len(amr.extra[1]) == 1
    for l in (0, 1):
        assert np.all(np.isfinite(np.asarray(amr.u[l])))
    assert np.all(np.isfinite(np.asarray(amr.extra[1][0]["u"])))


def test_extras_at_deeper_levels():
    """Patch-batch windows at level 2 of a 3-level hierarchy (the
    generalization beyond level-1-only extras): two blobs close enough to
    share one level-1 cluster (gap < merge_gap at level-0 resolution) but
    separate at level-1 resolution split into level-2 extras; the run
    stays finite and conserves mass through subcycled advances."""
    from castro_tpu.config import Params

    p = Params()
    p = p.with_ns("amr", n_cell=(64, 64), max_level=2, regrid_int=0,
                  n_error_buf=1, refinement_indicators=("dens",))
    p = p.with_ns("geometry", prob_lo=(0.0,) * 3, prob_hi=(1.0,) * 3)
    p = p.with_ns("castro", lo_bc=(0, 0), hi_bc=(0, 0), small_dens=1e-8)
    p = p.with_ns("tpu", dtype="float64")
    p = p.replace(extra={"amr.dens.field": "density",
                         "amr.dens.value_greater": 1.8})

    def init(sim, u):
        x = sim.geom.cell_centers(0, sim.ng)
        y = sim.geom.cell_centers(1, sim.ng)
        # separation 0.14 with a tight tag threshold: the tag-box gap is
        # ~7 level-0 cells (< merge_gap 8 -> one level-1 cluster) but
        # ~14 level-1 cells (> merge_gap -> two level-2 windows whose
        # bucketed+margined extents stay disjoint)
        r1 = jnp.sqrt((x - 0.43) ** 2 + (y - 0.5) ** 2)
        r2 = jnp.sqrt((x - 0.57) ** 2 + (y - 0.5) ** 2)
        rho = 1.0 + 1.0 * jnp.exp(-(r1 / 0.03) ** 2) \
            + 1.0 * jnp.exp(-(r2 / 0.03) ** 2)
        return fill_from_prim(sim, u, rho, (0.0, 0.0, 0.0), p=1.0)

    amr = AmrSimulation(p, problem_init=init)
    amr.init_data()
    assert int(amr.masks[2].sum()) > 0
    assert len(amr.extra[1]) == 0, [e["shape"] for e in amr.extra[1]]
    assert len(amr.extra[2]) >= 1, \
        (amr.window[2], [e["shape"] for e in amr.extra[2]])

    vol = (1.0 / 64) ** 2
    # first advance re-baselines covered regions from the fine sampling
    # (one-time O(h^2) init shift); conservation is exact afterwards
    amr.advance(1e-3)
    m0 = float(np.asarray(amr.interior(0))[0].sum()) * vol
    for _ in range(2):
        amr.advance(1e-3)
    m1 = float(np.asarray(amr.interior(0))[0].sum()) * vol
    assert abs(m1 - m0) / m0 < 1e-12, (m0, m1)
    for l in range(3):
        assert np.isfinite(np.asarray(amr.u[l])).all()
    for e in amr.extra[2]:
        assert np.isfinite(np.asarray(e["u"])).all()
