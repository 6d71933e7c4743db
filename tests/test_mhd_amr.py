"""MHD x AMR composition (reference: MHD is just Castro with USE_MHD
under the Amr recursion — subcycling, fillpatch, flux registers with EMF
consistency; `Source/mhd/Castro_mhd.cpp` + `Castro_advance_ctu.cpp:16`).

Checks, on a 2-level hierarchy:
  * div B = 0 to round-off on EVERY level after many subcycled steps with
    refluxing and regrids (the CT register correction is curl(dE), whose
    discrete divergence vanishes identically);
  * covered coarse faces track the restriction of the fine faces (the
    telescoping identity: curl-corrected coarse == fine-face avgDown);
  * uniform flow through a static refined box stays uniform;
  * the composite OrszagTang run stays finite and conserves mass.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.driver.amr import AmrSimulation
from castro_tpu.ops.interlevel import restrict_face
from castro_tpu.ops.stencil import interior_slice
from castro_tpu.problems import orszag_tang
from castro_tpu.problems.util import fill_from_prim


def _ot_params(n=32, max_level=1, regrid_int=0):
    p = orszag_tang.make_params(n=n)
    p = p.with_ns("amr", max_level=max_level, regrid_int=regrid_int,
                  n_error_buf=2)
    return p


def _ot_init(sim, u, b):
    """OrszagTang init against the plain Simulation/window interface
    (sim.geom, sim.ng) rather than the MhdSimulation wrapper."""
    g = sim.geom
    ng = sim.ng
    twopi = 2.0 * math.pi
    GAMMA = orszag_tang.GAMMA
    x = g.cell_centers(0, ng)
    y = g.cell_centers(1, ng)
    rho0 = GAMMA**2 / (4.0 * math.pi)
    p0 = GAMMA / (4.0 * math.pi)
    vx = -jnp.sin(twopi * y) * jnp.ones_like(x)
    vy = jnp.sin(twopi * x) * jnp.ones_like(y)
    u = fill_from_prim(sim, u, rho0, (vx, vy, 0.0), p=p0)

    B0 = 1.0 / math.sqrt(4.0 * math.pi)
    xf = g.faces_1d(0, ng)[:-1]
    yf = g.faces_1d(1, ng)[:-1]
    xc1 = g.cell_centers_1d(0, ng)
    yc1 = g.cell_centers_1d(1, ng)
    shape = u.shape[1:]
    bx = jnp.broadcast_to((-B0 * jnp.sin(twopi * yc1))[None, :]
                          * jnp.ones_like(xf)[:, None], shape)
    by = jnp.broadcast_to((B0 * jnp.sin(2.0 * twopi * xc1))[:, None]
                          * jnp.ones_like(yf)[None, :], shape)
    return u, (bx, by, jnp.zeros(shape))


def _tag_center(sim, u_int, level):
    """Static tag box in the domain center."""
    g = sim.geom
    ng = 0
    x = jnp.asarray(g.cell_centers(0, ng))
    y = jnp.asarray(g.cell_centers(1, ng))
    return ((x > 0.3) & (x < 0.7) & (y > 0.3) & (y < 0.7)
            & jnp.ones(u_int.shape[1:], bool))


def _divb_max(amr, l):
    """Max |div B| over level l's VALID region (masked cells for l>0)."""
    sim = amr._sims_at(l)
    ng, dim = amr.ng, amr.dim
    b = amr.u_b[l]
    div = 0.0
    from castro_tpu.ops.stencil import shifted
    for d in range(dim):
        div = div + (shifted(b[d], 1, d) - b[d]) / sim.geom.dx[d]
    div = div[interior_slice(ng, dim, 0)]
    if l > 0:
        div = jnp.where(amr.masks[l], div, 0.0)
    return float(jnp.abs(div).max())


def test_mhd_amr_divb_and_consistency():
    """2-level OrszagTang: div B = 0 on both levels through subcycled
    advances, and covered coarse faces equal the fine-face restriction
    (reference EMF-consistent reflux, div B preserved across levels)."""
    params = _ot_params(n=32)
    amr = AmrSimulation(params, problem_init=_ot_init,
                        problem_tagging=_tag_center)
    amr.init_data()
    assert int(amr.masks[1].sum()) > 0
    assert _divb_max(amr, 0) < 1e-10
    assert _divb_max(amr, 1) < 1e-10

    for _ in range(4):
        dt = amr.estimate_dt()
        amr.advance(dt)

    scale = 1.0 / math.sqrt(4 * math.pi) * 32  # B0/dx scale
    eps = np.finfo(np.asarray(amr.u[0]).dtype).eps
    tol = 200 * eps * scale
    assert _divb_max(amr, 0) < tol, _divb_max(amr, 0)
    assert _divb_max(amr, 1) < tol, _divb_max(amr, 1)

    # covered coarse faces == restriction of fine faces (telescoping)
    ng, dim = amr.ng, amr.dim
    csl = amr._parent_rel_slice(1)
    from castro_tpu.ops.interlevel import restrict_mask
    cmask = np.asarray(restrict_mask(amr.masks[1], dim))
    for d in range(dim):
        fine_int = amr.u_b[1][d][tuple(
            slice(ng, ng + s + (1 if a == d else 0))
            for a, s in enumerate(amr.window[1][1]))]
        rf = np.asarray(restrict_face(fine_int, d, dim))  # nc+1 along d
        coarse = np.asarray(amr.u_b[0][d])[tuple(
            slice(s.start + ng, s.stop + ng + (1 if a == d else 0))
            for a, s in enumerate(csl))]
        # interior covered faces: both adjacent cells covered
        both = cmask.copy()
        lo = [slice(None)] * dim
        hi = [slice(None)] * dim
        lo[d] = slice(0, -1)
        hi[d] = slice(1, None)
        inner_faces = cmask[tuple(lo)] & cmask[tuple(hi)]
        sel = [slice(None)] * dim
        sel[d] = slice(1, cmask.shape[d])
        err = np.abs(rf[tuple(sel)] - coarse[tuple(sel)])[inner_faces]
        assert err.max() < 5e-3, (d, err.max())


def test_mhd_amr_uniform_field_preserved():
    """Uniform flow + uniform oblique B through a static refined box stays
    exactly uniform (fillpatch + reflux + CT register are all identities
    on constants)."""
    params = _ot_params(n=16)

    def init(sim, u, b):
        u = fill_from_prim(sim, u, 1.0, (1.0, 0.5, 0.0), p=1.0)
        shape = u.shape[1:]
        return u, (jnp.full(shape, 0.3), jnp.full(shape, -0.2),
                   jnp.full(shape, 0.1))

    amr = AmrSimulation(params, problem_init=init,
                        problem_tagging=_tag_center)
    amr.init_data()
    for _ in range(3):
        amr.advance(5e-3)
    u0 = np.asarray(amr.interior(0))
    assert np.allclose(u0[0], 1.0, rtol=1e-6)
    b0 = [np.asarray(amr.u_b[0][d]) for d in range(3)]
    assert np.allclose(b0[0], 0.3, atol=1e-6)
    assert np.allclose(b0[1], -0.2, atol=1e-6)
    assert np.allclose(b0[2], 0.1, atol=1e-6)
    assert _divb_max(amr, 0) < 1e-10
    assert _divb_max(amr, 1) < 1e-10


def test_mhd_amr_orszag_tang_regrid():
    """OT with gradient tagging + regrids: stays finite, conserves mass,
    div B = 0 on both levels after window moves."""
    params = _ot_params(n=32, regrid_int=2)
    params = params.with_ns("amr", refinement_indicators=("magg",))
    params = params.replace(extra={"amr.magg.field": "density",
                                   "amr.magg.relative_gradient": 0.05})
    amr = AmrSimulation(params, problem_init=_ot_init)
    amr.init_data()
    vol0 = float(np.prod([1.0 / 32] * 2))
    m0 = float(np.asarray(amr.interior(0))[0].sum()) * vol0
    for _ in range(6):
        dt = amr.estimate_dt()
        amr.advance(dt)
        if (amr.step_count + 1) % 2 == 0:
            amr.regrid()
        amr.step_count += 1
    m1 = float(np.asarray(amr.interior(0))[0].sum()) * vol0
    assert abs(m1 - m0) / m0 < 1e-10
    ui = np.asarray(amr.interior(0))
    assert np.isfinite(ui).all()
    scale = 1.0 / math.sqrt(4 * math.pi) * 32
    eps = np.finfo(ui.dtype).eps
    assert _divb_max(amr, 0) < 500 * eps * scale
    assert _divb_max(amr, 1) < 500 * eps * scale


def test_mhd_amr_distributed_matches_single_device():
    """Distributed AMR MHD: level 0 advances under a 2x2 mesh (sharded
    CTU-CT + CT registers exported cell-registered); answers match the
    single-device 2-level run to round-off and div B = 0 holds on both
    levels (the reference's MPI-decomposed USE_MHD AMR)."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")

    params = _ot_params(n=32)
    ref = AmrSimulation(params, problem_init=_ot_init,
                        problem_tagging=_tag_center)
    ref.init_data()

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("x", "y"))
    amr = AmrSimulation(params, problem_init=_ot_init,
                        problem_tagging=_tag_center, mesh=mesh)
    amr.init_data()

    for _ in range(2):
        dt = ref.estimate_dt()
        ref.advance(dt)
        amr.advance(dt)

    for l in range(2):
        a = np.asarray(ref.u[l])
        b = np.asarray(amr.u[l])
        scale = max(np.abs(a).max(), 1e-30)
        assert np.abs(a - b).max() / scale < 1e-10, \
            (l, np.abs(a - b).max() / scale)
        for d in range(3):
            ba = np.asarray(ref.u_b[l][d])
            bb = np.asarray(amr.u_b[l][d])
            assert np.abs(ba - bb).max() < 1e-10, (l, d)
    assert _divb_max(amr, 0) < 1e-8
    assert _divb_max(amr, 1) < 1e-8


def test_mhd_amr_checkpoint_restart(tmp_path):
    """AMR MHD checkpoint/restart: face fields, window origins and masks
    restore exactly (incl. a regrid-moved window), and the run continues
    with div B = 0 (reference AmrLevel::checkPoint stores the BoxArray +
    the Mag_Type face StateData)."""
    from castro_tpu.driver import io as io_mod

    params = _ot_params(n=32, regrid_int=2)
    params = params.with_ns("amr", refinement_indicators=("magg",))
    params = params.replace(extra={"amr.magg.field": "density",
                                   "amr.magg.relative_gradient": 0.05})
    amr = AmrSimulation(params, problem_init=_ot_init)
    amr.init_data()
    for _ in range(2):
        amr.advance(amr.estimate_dt())
    amr.regrid()  # move/resize the window before checkpointing
    path = io_mod.write_checkpoint_amr(amr, str(tmp_path / "chk"))

    amr2 = AmrSimulation(params, problem_init=_ot_init)
    amr2.init_data()
    io_mod.restart_amr(amr2, path)
    assert amr2.t == amr.t
    assert tuple(amr2.window[1][1]) == tuple(amr.window[1][1])
    assert np.array_equal(np.asarray(amr2.window[1][0]),
                          np.asarray(amr.window[1][0]))
    for l in range(2):
        assert np.array_equal(np.asarray(amr2.u[l]), np.asarray(amr.u[l]))
        for d in range(3):
            assert np.array_equal(np.asarray(amr2.u_b[l][d]),
                                  np.asarray(amr.u_b[l][d])), (l, d)
    amr2.advance(amr2.estimate_dt())
    assert np.isfinite(np.asarray(amr2.interior(0))).all()
    assert _divb_max(amr2, 0) < 1e-8
    assert _divb_max(amr2, 1) < 1e-8
