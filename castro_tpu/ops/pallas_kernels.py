"""Pallas TPU kernels for the hot hydro stages.

The CTU chain is HBM-bandwidth bound; XLA breaks the long where-chains of
the Riemann solver into several fusions, each a full HBM round trip. These
kernels guarantee ONE pass: block the grid into VMEM tiles, run the whole
pointwise solver on-chip, write flux+Godunov state once.

The Riemann stage is pointwise per face once the neighbor gathers
(gamc/c of the left cell) are hoisted out, so no halo machinery is needed;
the stencil stages (trace/transverse) keep their XLA forms for now.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from castro_tpu.ops import riemann as rm

# Test hook: route pallas_call through the interpreter so the TPU fast
# path is exercised (and parity-checked) on CPU test runs.
INTERPRET = False


def _tiling(grid_shape, dim):
    """Pick tile sizes for the leading spatial dims (minor dim stays whole
    for lane alignment)."""
    def pick(n, want):
        b = want
        while n % b != 0:
            b //= 2
        return max(b, 1)

    if dim == 3:
        bx = pick(grid_shape[0], 16)
        by = pick(grid_shape[1], 16)
        return (grid_shape[0] // bx, grid_shape[1] // by), (bx, by)
    if dim == 2:
        bx = pick(grid_shape[0], 8)
        return (grid_shape[0] // bx,), (bx,)
    return (1,), ()


def _block_spec(ncomp, tiles, grid_shape, dim):
    if dim == 3:
        bx, by = tiles
        block = (ncomp, bx, by, grid_shape[2])
        index = lambda i, j: (0, i, j, 0)
    elif dim == 2:
        (bx,) = tiles
        block = (ncomp, bx, grid_shape[1])
        index = lambda i: (0, i, 0)
    else:
        block = (ncomp, grid_shape[0])
        index = lambda i: (0, 0)
    return pl.BlockSpec(block, index)


def _riemann_block(qm_b, qp_b, gl, gr, cl, cr, d, L, coord,
                   riemann_solver, small_dens, small_pres, bnd_mask=None):
    """Pointwise Riemann + flux assembly on one VMEM block."""
    QUN, QUT, QUTT = rm._riemann_vel_map(L, d)
    csmall = jnp.maximum(rm.SMALL, rm.SMALL * jnp.maximum(cl, cr))
    cavg = 0.5 * (cl + cr)
    ri = rm.RiemannInputs(
        rho_l=jnp.maximum(qm_b[L.QRHO], small_dens),
        un_l=qm_b[QUN], ut_l=qm_b[QUT], utt_l=qm_b[QUTT],
        p_l=qm_b[L.QPRES], rhoe_l=qm_b[L.QREINT], gamc_l=gl,
        rho_r=jnp.maximum(qp_b[L.QRHO], small_dens),
        un_r=qp_b[QUN], ut_r=qp_b[QUT], utt_r=qp_b[QUTT],
        p_r=qp_b[L.QPRES], rhoe_r=qp_b[L.QREINT], gamc_r=gr,
        csmall=csmall, cavg=cavg)
    if riemann_solver == 2:
        gd = rm.riemann_hllc(ri, small_dens, small_pres)
    else:
        gd = rm.riemannus(ri, small_dens, small_pres)
    return rm.compute_flux(gd, qm_b, qp_b, d, L, coord, bnd_mask=bnd_mask)


def _trans_apply_block(q, df, dre_x, dp_b, L, small_pres, reset_density,
                       reset_rhoe):
    """Transverse-correction apply on one VMEM block: the conserved
    update + reset ladder of the reference actual_trans_single/final
    (trans.cpp:67,442) given the precomputed summed bundle."""
    rho = q[L.QRHO]
    uu = q[L.QU]
    vv = q[L.QV]
    ww = q[L.QW]
    reint = q[L.QREINT]
    p = q[L.QPRES]

    rr = rho
    ru, rv, rw = rho * uu, rho * vv, rho * ww
    ekin = 0.5 * rho * (uu * uu + vv * vv + ww * ww)
    re = reint + ekin

    rrnew = rr - df[L.URHO]
    runew = ru - df[L.UMX]
    rvnew = rv - df[L.UMY]
    rwnew = rw - df[L.UMZ]
    renew = re - df[L.UEDEN]
    dreint = df[L.UEINT] + dre_x

    bad = (rrnew < 0.0) if reset_density else jnp.zeros_like(rr, bool)
    rrnew = jnp.where(bad, rr, rrnew)
    runew = jnp.where(bad, ru, runew)
    rvnew = jnp.where(bad, rv, rvnew)
    rwnew = jnp.where(bad, rw, rwnew)
    renew = jnp.where(bad, re, renew)

    rhoinv = 1.0 / rrnew
    rhoeken = 0.5 * (runew**2 + rvnew**2 + rwnew**2) * rhoinv
    reint_new = renew - rhoeken
    if reset_rhoe:
        reint_new = jnp.where(reint_new <= 0.0, reint - dreint, reint_new)
    reint_new = jnp.where(reint_new <= 0.0, reint, reint_new)
    reint_new = jnp.where(bad, reint, reint_new)
    pnew = jnp.where(bad, p, jnp.maximum(p - dp_b, small_pres))

    comps = [None] * L.NQ
    comps[L.QRHO] = rrnew
    comps[L.QU] = runew * rhoinv
    comps[L.QV] = rvnew * rhoinv
    comps[L.QW] = rwnew * rhoinv
    comps[L.QREINT] = reint_new
    comps[L.QPRES] = pnew
    pass_q = list(range(L.QFS, L.QFS + L.nspec)) + (
        list(range(L.QFX, L.QFX + L.naux)) if L.naux > 0 else [])
    pass_u = list(range(L.UFS, L.UFS + L.nspec)) + (
        list(range(L.UFX, L.UFX + L.naux)) if L.naux > 0 else [])
    for qc, uc in zip(pass_q, pass_u):
        val = (rr * q[qc] - df[uc]) / rrnew
        comps[qc] = jnp.where(bad, q[qc], val)
    for i, cpn in enumerate(comps):
        if cpn is None:
            comps[i] = q[i]
    return jnp.stack(comps)


def trans_cmpflx_pallas(qm, qp, df_m, df_p, dre_m, dre_p, dp_m, dp_p,
                        gamc_l, gamc_r, c_l, c_r, d, layout, coord,
                        riemann_solver, small_dens, small_pres,
                        reset_density, reset_rhoe, bnd_mask=None):
    """Fused transverse-correct + Riemann + flux: corrects both interface
    states with their precomputed transverse bundles and solves the Riemann
    problem in ONE VMEM pass — the corrected states are never materialized
    in HBM (the 3D CTU's 6 corner-coupling + 3 final stages all ride this).
    """
    L = layout
    dim = L.dim
    grid_shape = qm.shape[1:]
    grid, tiles = _tiling(grid_shape, dim)
    spec_q = _block_spec(L.NQ, tiles, grid_shape, dim)
    spec_v = _block_spec(L.NVAR, tiles, grid_shape, dim)
    spec_1 = _block_spec(1, tiles, grid_shape, dim)
    with_mask = bnd_mask is not None

    def kernel(*refs):
        if with_mask:
            (qm_ref, qp_ref, dfm_ref, dfp_ref, drem_ref, drep_ref,
             dpm_ref, dpp_ref, gl_ref, gr_ref, cl_ref, cr_ref, msk_ref,
             flux_ref, qe_ref) = refs
            mask = msk_ref[0]
        else:
            (qm_ref, qp_ref, dfm_ref, dfp_ref, drem_ref, drep_ref,
             dpm_ref, dpp_ref, gl_ref, gr_ref, cl_ref, cr_ref,
             flux_ref, qe_ref) = refs
            mask = None
        qm_c = _trans_apply_block(qm_ref[...], dfm_ref[...], drem_ref[0],
                                  dpm_ref[0], L, small_pres, reset_density,
                                  reset_rhoe)
        qp_c = _trans_apply_block(qp_ref[...], dfp_ref[...], drep_ref[0],
                                  dpp_ref[0], L, small_pres, reset_density,
                                  reset_rhoe)
        flux, qgdnv = _riemann_block(qm_c, qp_c, gl_ref[0], gr_ref[0],
                                     cl_ref[0], cr_ref[0], d, L, coord,
                                     riemann_solver, small_dens, small_pres,
                                     bnd_mask=mask)
        flux_ref[...] = flux
        qe_ref[...] = qgdnv

    in_specs = [spec_q, spec_q, spec_v, spec_v, spec_1, spec_1, spec_1,
                spec_1, spec_1, spec_1, spec_1, spec_1]
    args = [qm, qp, df_m, df_p, dre_m[None], dre_p[None], dp_m[None],
            dp_p[None], gamc_l[None], gamc_r[None], c_l[None], c_r[None]]
    if with_mask:
        in_specs.append(spec_1)
        args.append(jnp.broadcast_to(bnd_mask, grid_shape)[None])
    out_shape = (
        jax.ShapeDtypeStruct((L.NVAR,) + grid_shape, qm.dtype),
        jax.ShapeDtypeStruct((L.NGDNV,) + grid_shape, qm.dtype),
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(spec_v, _block_spec(L.NGDNV, tiles, grid_shape, dim)),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(*args)


def cmpflx_pallas(qm, qp, gamc_l, gamc_r, c_l, c_r, d, layout, coord,
                  riemann_solver, small_dens, small_pres):
    """Fused Riemann + flux assembly. Inputs are face-registered full-grid
    arrays; gamc/c already gathered for both sides. Returns (flux, qgdnv)."""
    L = layout
    dim = L.dim
    grid_shape = qm.shape[1:]
    grid, tiles = _tiling(grid_shape, dim)

    def kernel(qm_ref, qp_ref, gl_ref, gr_ref, cl_ref, cr_ref,
               flux_ref, qe_ref):
        flux, qgdnv = _riemann_block(
            qm_ref[...], qp_ref[...], gl_ref[0], gr_ref[0], cl_ref[0],
            cr_ref[0], d, L, coord, riemann_solver, small_dens, small_pres)
        flux_ref[...] = flux
        qe_ref[...] = qgdnv

    out_shape = (
        jax.ShapeDtypeStruct((L.NVAR,) + grid_shape, qm.dtype),
        jax.ShapeDtypeStruct((L.NGDNV,) + grid_shape, qm.dtype),
    )
    gl3 = gamc_l[None]
    gr3 = gamc_r[None]
    cl3 = c_l[None]
    cr3 = c_r[None]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            _block_spec(L.NQ, tiles, grid_shape, dim),
            _block_spec(L.NQ, tiles, grid_shape, dim),
            _block_spec(1, tiles, grid_shape, dim),
            _block_spec(1, tiles, grid_shape, dim),
            _block_spec(1, tiles, grid_shape, dim),
            _block_spec(1, tiles, grid_shape, dim),
        ],
        out_specs=(
            _block_spec(L.NVAR, tiles, grid_shape, dim),
            _block_spec(L.NGDNV, tiles, grid_shape, dim),
        ),
        out_shape=out_shape,
        interpret=INTERPRET,
    )(qm, qp, gl3, gr3, cl3, cr3)


def trans_apply_pallas(q_face, dflux, dreint_extra, dp, layout,
                       small_pres, reset_density, reset_rhoe):
    """Fused pointwise transverse-correction apply.

    The caller precomputes (in one cheap fused XLA pass) the summed
    transverse-term bundle, all registered at the target face:
      dflux[NVAR]   = sum_t cdtdx_t (F_t(hi) - F_t(lo))  [+ radial p fix]
      dreint_extra  = sum_t cdtdx_t pav_t du_t           (rhoe pdV part)
      dp            = sum_t cdtdx_t (dup_t + pav_t du_t (gamc-1))
    This kernel then runs the conserved-update + reset ladder of the
    reference actual_trans_single/actual_trans_final (trans.cpp:67,442)
    in a single VMEM pass. Returns the corrected state [NQ, ...]."""
    L = layout
    dim = L.dim
    grid_shape = q_face.shape[1:]
    grid, tiles = _tiling(grid_shape, dim)

    def kernel(q_ref, df_ref, dre_ref, dp_ref, out_ref):
        q = q_ref[...]
        df = df_ref[...]
        dre_x = dre_ref[0]
        dp_b = dp_ref[0]

        rho = q[L.QRHO]
        uu = q[L.QU]
        vv = q[L.QV]
        ww = q[L.QW]
        reint = q[L.QREINT]
        p = q[L.QPRES]

        rr = rho
        ru, rv, rw = rho * uu, rho * vv, rho * ww
        ekin = 0.5 * rho * (uu * uu + vv * vv + ww * ww)
        re = reint + ekin

        rrnew = rr - df[L.URHO]
        runew = ru - df[L.UMX]
        rvnew = rv - df[L.UMY]
        rwnew = rw - df[L.UMZ]
        renew = re - df[L.UEDEN]
        dreint = df[L.UEINT] + dre_x

        bad = (rrnew < 0.0) if reset_density else jnp.zeros_like(rr, bool)
        rrnew = jnp.where(bad, rr, rrnew)
        runew = jnp.where(bad, ru, runew)
        rvnew = jnp.where(bad, rv, rvnew)
        rwnew = jnp.where(bad, rw, rwnew)
        renew = jnp.where(bad, re, renew)

        rhoinv = 1.0 / rrnew
        rhoeken = 0.5 * (runew**2 + rvnew**2 + rwnew**2) * rhoinv
        reint_new = renew - rhoeken
        if reset_rhoe:
            reint_new = jnp.where(reint_new <= 0.0, reint - dreint, reint_new)
        reint_new = jnp.where(reint_new <= 0.0, reint, reint_new)
        reint_new = jnp.where(bad, reint, reint_new)
        pnew = jnp.where(bad, p, jnp.maximum(p - dp_b, small_pres))

        comps = [None] * L.NQ
        comps[L.QRHO] = rrnew
        comps[L.QU] = runew * rhoinv
        comps[L.QV] = rvnew * rhoinv
        comps[L.QW] = rwnew * rhoinv
        comps[L.QREINT] = reint_new
        comps[L.QPRES] = pnew
        pass_q = list(range(L.QFS, L.QFS + L.nspec)) + (
            list(range(L.QFX, L.QFX + L.naux)) if L.naux > 0 else [])
        pass_u = list(range(L.UFS, L.UFS + L.nspec)) + (
            list(range(L.UFX, L.UFX + L.naux)) if L.naux > 0 else [])
        for qc, uc in zip(pass_q, pass_u):
            val = (rr * q[qc] - df[uc]) / rrnew
            comps[qc] = jnp.where(bad, q[qc], val)
        for i, cpn in enumerate(comps):
            if cpn is None:
                comps[i] = q[i]
        out_ref[...] = jnp.stack(comps)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            _block_spec(L.NQ, tiles, grid_shape, dim),
            _block_spec(L.NVAR, tiles, grid_shape, dim),
            _block_spec(1, tiles, grid_shape, dim),
            _block_spec(1, tiles, grid_shape, dim),
        ],
        out_specs=_block_spec(L.NQ, tiles, grid_shape, dim),
        out_shape=jax.ShapeDtypeStruct((L.NQ,) + grid_shape, q_face.dtype),
        interpret=INTERPRET,
    )(q_face, dflux, dreint_extra[None], dp[None])


def _inblock_shift(a, off, axis):
    """Edge-clamped shift of a VMEM block along an axis the block fully
    covers (block edge == array edge, so the clamp semantics match the
    global `stencil.shifted`)."""
    from castro_tpu.ops.stencil import shifted

    return shifted(a, off, axis)


_FACE_BUDGET = 45 * 1024 * 1024


def _face_sizing(L, gshape, d, naux, with_mask, nterms_tot, n_stages,
                 with_consup, itemsize):
    """Shared block-layout decision for the fused face stage: returns
    (tile_axis, zc, ncomp_wc). zc != gshape[2] means z is chunked (and
    tdir==2 in-kernel shifts are unavailable)."""
    in_block = {2, d}
    tile_axis = next(a for a in (0, 1) if a not in in_block)
    nz = gshape[2]
    ncomp_wc = (2 * L.NQ + naux
                + (1 if with_mask else 0)
                + nterms_tot * (2 * L.NVAR + 4)
                + n_stages * (L.NVAR + L.NGDNV)
                + (3 * L.NVAR + 2 if with_consup else 0))
    bt_floor = 8 if tile_axis == 1 else 1
    zc = nz
    if d != 2 and (ncomp_wc * gshape[d] * bt_floor * nz * itemsize
                   > _FACE_BUDGET):
        for cand in (256, 128, 64, 32):
            if nz % cand == 0 and (ncomp_wc * gshape[d] * bt_floor * cand
                                   * itemsize) <= _FACE_BUDGET:
                zc = cand
                break
        else:
            zc = nz  # no aligned chunk fits: let the bt clamp handle it
    return tile_axis, zc, ncomp_wc


def face_consup_fusable(layout, gshape, d, naux, with_mask, dtype):
    """True when the FINAL face stage for normal d can fold its consup
    pass in-kernel (unchunked-z block layout)."""
    itemsize = jnp.dtype(dtype).itemsize
    _, zc, _ = _face_sizing(layout, gshape, d, naux, with_mask, 2, 1,
                            True, itemsize)
    return zc == gshape[2]


def ctu_face_pallas(qm, qp, qaux, d, terms, layout, coord, riemann_solver,
                    small_dens, small_pres, reset_density, reset_rhoe,
                    dt_terms=None, bnd_mask=None, tile=None, terms2=None,
                    consup=None):
    """One fused CTU face stage: [transverse bundle +] trans-apply +
    Riemann + flux assembly in a single VMEM pass.

    Replaces the separate XLA `_term_bundle` + `trans_cmpflx_pallas` and
    the gamc/c `shifted` prep of `cmpflx_pallas`:

      - f1d stage:    terms = []            (plain Riemann on traced states)
      - corner stage: terms = [t]           (cdtdx = dt/3dx)
      - final stage:  terms = [t1, t2]      (cdtdx = dt/2dx)

    Each term is {'flux': [NVAR,...], 'qe': [NGDNV,...], 't_dir': t,
    'cdtdx': traced scalar}. The block always spans the full minor (z)
    axis and the full normal (d) axis, so the m-state cell shift and the
    gamc/c neighbor gathers happen in VMEM; a term whose transverse axis
    is also in-block computes its flux difference in VMEM, otherwise the
    (+1 along t) values are read from the NEIGHBOR TILE via a second
    BlockSpec with a +1 grid-index map (no materialized shifted copies).

    `terms2` pairs a SECOND corner-coupling stage with the same normal d
    into the same kernel (the two fint stages F^{d|t1}, F^{d|t2} share
    qm/qp/qaux — one HBM read instead of two): returns
    ((flux1, qe1), (flux2, qe2)).

    `consup = dict(hsrc=, div_node=, u=, difmag=, dx=, finalize_dt=)`
    (single-stage final calls only, Cartesian) folds this direction's
    ENTIRE consup pass — artificial viscosity, species-flux
    normalization, flux divergence, p div(u) — onto the freshly solved
    flux in the same kernel: the flux/qe never round-trip through HBM
    before their conservative update. hsrc is accumulated via buffer
    aliasing across the per-dim calls; finalize_dt on the last dim
    emits u + dt*hsrc directly. Returns (flux', qe, hsrc'). Requires
    the unchunked-z block layout (zc == nz).

    Reference behavior: trans.cpp:15/442 + cmpflx_plus_godunov
    (riemann.cpp:16) chained, as orchestrated by Castro_ctu_hydro.cpp.
    """
    L = layout
    gshape = qm.shape[1:]
    dim = L.dim
    assert dim == 3, "fused face stage is the 3D path"

    # choose in-block axes: z (minor) + n; a term with t == 2 is in-block.
    # tile axis: the remaining axis (or the pre-shifted term's axis).
    # Large grids (d != 2): a (full-d x bt x full-z) block set blows the
    # VMEM budget, so z is chunked in lane-aligned pieces and tdir==2
    # terms are demoted to pre-shifted inputs (no in-kernel z shifts).
    import numpy as _np

    nz = gshape[2]
    n_stages = 2 if terms2 is not None else 1
    nterms_tot = len(terms) + (len(terms2) if terms2 is not None else 0)
    itemsize = jnp.dtype(qm.dtype).itemsize
    tile_axis, zc, ncomp_wc = _face_sizing(
        L, gshape, d, qaux.shape[0], bnd_mask is not None, nterms_tot,
        n_stages, consup is not None, itemsize)
    bt_floor = 8 if tile_axis == 1 else 1
    # the axes the block FULLY spans (in-VMEM shifts are exact there):
    # everything but the tile axis, minus z when chunked. For d == 2
    # this adds y (blocks span it fully), which the {2, d} seed missed.
    in_block = {0, 1, 2} - {tile_axis}
    if zc != nz:
        in_block.discard(2)
    consup_requested = consup is not None
    if consup is not None:
        assert terms2 is None, "consup folds single-stage finals only"
        if zc != nz:
            # chunked-z layout (large d!=2 grids): the div node-average
            # would need a second neighbor axis — degrade to the plain
            # final stage; the caller runs consup_pallas separately
            consup = None
    if consup is not None:
        # the in-block transverse axis of d (div node-average partner)
        ib_trans = [a for a in range(3) if a not in (d, tile_axis)][0]
        dxd = float(consup["dx"][d])

    # prepare term inputs
    term_arrays = []   # flat list of input arrays
    term_specs = []    # matching (ncomp, neighbor: bool) list
    term_meta = []     # (t_dir, inblock: bool), per stage
    term_meta2 = []
    cdtdx_vals = []

    def prep(ts, meta):
        for t in ts:
            tdir = t["t_dir"]
            F = t["flux"]
            qe = t["qe"]
            gdu_comp = (L.GDU, L.GDV, L.GDW)[tdir]
            pg = qe[L.GDPRES][None]
            ug = qe[gdu_comp][None]
            cdtdx_vals.append(t["cdtdx"])
            if tdir in in_block:
                term_arrays.extend([F, pg, ug])
                term_specs.extend([(L.NVAR, None), (1, None), (1, None)])
                meta.append((tdir, True))
            else:
                # out-of-block transverse axis: the (+1 along t) values
                # come from the NEIGHBOR TILE, read via a second
                # BlockSpec whose index map is offset +1 along the grid
                # axis (clamped at the last tile) — no materialized
                # shifted copies, no extra HBM writes (the round-4
                # profiler showed ~1ms/step of XLA pad/slice prep here)
                ga = 0 if tdir == tile_axis else 1  # grid axis of tdir
                term_arrays.extend([F, F, pg, pg, ug, ug])
                term_specs.extend([(L.NVAR, None), (L.NVAR, ga),
                                   (1, None), (1, ga),
                                   (1, None), (1, ga)])
                meta.append((tdir, False))

    prep(terms, term_meta)
    if terms2 is not None:
        prep(terms2, term_meta2)

    if tile is None:
        tile = 4 if terms else 8
    nt = gshape[tile_axis]
    bt = tile
    if tile_axis == 1:
        # y is the sublane axis: blocks must be a multiple of 8 (or whole)
        bt = max(tile, 8)
        while nt % bt != 0 and bt % 8 == 0:
            bt -= 8 if bt > 8 else bt
        if bt == 0 or nt % bt != 0:
            bt = nt
    else:
        while nt % bt != 0:
            bt //= 2
        bt = max(bt, 1)

    # VMEM budget: blocks span the in-block axes fully, so large grids
    # must narrow the tile (and/or chunk z, above) instead of falling
    # back to plain XLA (the round-2 36000-in-block-area cap). ~45MB
    # leaves headroom for the pipeline's double buffering within the
    # 100MB scoped-VMEM limit.
    ncomp_total = (2 * L.NQ + qaux.shape[0]
                   + (1 if bnd_mask is not None else 0)
                   + sum(nc for nc, _ in term_specs)
                   + n_stages * (L.NVAR + L.NGDNV)
                   + (3 * L.NVAR + 2 if consup is not None else 0))
    per_bt_cells = (gshape[d] * zc if zc != nz
                    else int(_np.prod(gshape)) // nt)
    per_bt = ncomp_total * per_bt_cells * itemsize
    bt_max = max(1, _FACE_BUDGET // per_bt)
    if bt > bt_max:
        step = 8 if tile_axis == 1 else 1
        cand = max(step, (bt_max // step) * step)
        while cand > step and nt % cand != 0:
            cand -= step
        bt = cand if nt % cand == 0 else (nt if tile_axis == 1 else 1)
    grid = (nt // bt,) if zc == nz else (nt // bt, nz // zc)

    def bs(nc, nbr=None):
        """Block spec; `nbr` = grid axis whose index is offset +1
        (clamped at the last tile) — the NEIGHBOR-TILE view used for
        out-of-block transverse shifts."""
        block = [nc] + list(gshape)
        block[1 + tile_axis] = bt
        nlast = [nt // bt - 1, (nz // zc - 1) if zc != nz else 0]

        def off(i, g):
            if nbr == g:
                return jnp.minimum(i + 1, nlast[g])
            return i

        if zc != nz:
            block[3] = zc

            def index(i, j, *_):
                idx = [0, 0, 0, 0]
                idx[1 + tile_axis] = off(i, 0)
                idx[3] = off(j, 1)
                return tuple(idx)
        else:
            def index(i, *_):
                idx = [0, 0, 0, 0]
                idx[1 + tile_axis] = off(i, 0)
                return tuple(idx)

        return pl.BlockSpec(tuple(block), index)

    with_mask = bnd_mask is not None
    n_ax = 1 + d  # block axis of the normal direction

    def kernel(cdt_ref, *refs):
        qm_b = refs[0][...]
        qp_b = refs[1][...]
        aux_b = refs[2]
        g_b = aux_b[L.QGAMC]
        c_b = aux_b[L.QC]
        pos = 3
        mask = None
        if with_mask:
            mask = refs[pos][0]
            pos += 1

        def nbr_shift(cur, nxt, a, ga):
            """+1 shift along block axis `a` across the tile boundary:
            own rows 1.. + the neighbor tile's row 0 (edge-clamped at
            the last tile along grid axis `ga`)."""
            nloc = cur.shape[a]
            core = lax.slice_in_dim(cur, 1, nloc, axis=a)
            head = lax.slice_in_dim(nxt, 0, 1, axis=a)
            clamp = lax.slice_in_dim(cur, nloc - 1, nloc, axis=a)
            last = pl.program_id(ga) == pl.num_programs(ga) - 1
            tail = jnp.where(last, clamp, head)
            return jnp.concatenate([core, tail], axis=a)

        def apply_terms(meta, pos, kbase):
            # transverse bundles at cell offset 0 (p-state); m = n-shift
            df = jnp.zeros((L.NVAR,) + qm_b.shape[1:], qm_b.dtype)
            dre = jnp.zeros(qm_b.shape[1:], qm_b.dtype)
            dp = jnp.zeros(qm_b.shape[1:], qm_b.dtype)
            for k, (tdir, inb) in enumerate(meta):
                cdtdx = cdt_ref[kbase + k]
                if inb:
                    F = refs[pos][...]
                    pg = refs[pos + 1][0]
                    ug = refs[pos + 2][0]
                    pos += 3
                    ax = 1 + tdir
                    Fhi = _inblock_shift(F, 1, ax)
                    pghi = _inblock_shift(pg, 1, ax - 1)
                    ughi = _inblock_shift(ug, 1, ax - 1)
                else:
                    # +1 along t across the tile boundary (neighbor-tile
                    # BlockSpec, matching global `stencil.shifted`)
                    ga = 0 if tdir == tile_axis else 1
                    ax = 1 + tdir
                    F = refs[pos][...]
                    Fhi = nbr_shift(F, refs[pos + 1][...], ax, ga)
                    pg = refs[pos + 2][0]
                    pghi = nbr_shift(pg, refs[pos + 3][0], ax - 1, ga)
                    ug = refs[pos + 4][0]
                    ughi = nbr_shift(ug, refs[pos + 5][0], ax - 1, ga)
                    pos += 6
                df = df + cdtdx * (Fhi - F)
                du = ughi - ug
                dup = pghi * ughi - pg * ug
                pav = 0.5 * (pghi + pg)
                dre = dre + cdtdx * pav * du
                dp = dp + cdtdx * (dup + pav * du * (g_b - 1.0))
            df_m = _inblock_shift(df, -1, n_ax)
            dre_m = _inblock_shift(dre, -1, n_ax - 1)
            dp_m = _inblock_shift(dp, -1, n_ax - 1)
            qm_c = _trans_apply_block(qm_b, df_m, dre_m, dp_m, L,
                                      small_pres, reset_density,
                                      reset_rhoe)
            qp_c = _trans_apply_block(qp_b, df, dre, dp, L, small_pres,
                                      reset_density, reset_rhoe)
            return qm_c, qp_c, pos

        gl = _inblock_shift(g_b, -1, n_ax - 1)
        cl = _inblock_shift(c_b, -1, n_ax - 1)

        if terms:
            qm_c, qp_c, pos = apply_terms(term_meta, pos, 0)
        else:
            qm_c, qp_c = qm_b, qp_b
        flux, qgdnv = _riemann_block(qm_c, qp_c, gl, g_b, cl, c_b, d, L,
                                     coord, riemann_solver, small_dens,
                                     small_pres, bnd_mask=mask)
        if terms2 is not None:
            qm_c2, qp_c2, pos = apply_terms(term_meta2, pos,
                                            len(term_meta))
            flux2, qgdnv2 = _riemann_block(
                qm_c2, qp_c2, gl, g_b, cl, c_b, d, L, coord,
                riemann_solver, small_dens, small_pres, bnd_mask=mask)
            refs[pos][...] = flux
            refs[pos + 1][...] = qgdnv
            refs[pos + 2][...] = flux2
            refs[pos + 3][...] = qgdnv2
        elif consup is not None:
            # fold this direction's consup pass onto the fresh solution
            # (math identical to consup_pallas, pg/ug taken from the
            # just-computed Godunov state instead of re-read from HBM)
            hs_b = refs[pos][...]
            dv = refs[pos + 1][0]
            dvn = refs[pos + 2][0]
            ub = refs[pos + 3][...]
            dvs = nbr_shift(dv, dvn, tile_axis, 0)
            a1 = 0.5 * (dv + dvs)
            div1 = 0.5 * (a1 + _inblock_shift(a1, 1, ib_trans))
            coeff = consup["difmag"] * jnp.minimum(div1, 0.0) * dxd
            du = ub - _inblock_shift(ub, -1, 1 + d)
            av = coeff[None] * du
            skip = [L.UTEMP] + ([L.USHK] if L.shock_var else [])
            comps = [flux[c] if c in skip else flux[c] + av[c]
                     for c in range(L.NVAR)]
            if L.nspec > 0:
                sumn = comps[L.UFS]
                for c in range(L.UFS + 1, L.UFS + L.nspec):
                    sumn = sumn + comps[c]
                fac = jnp.where(
                    sumn != 0.0,
                    comps[L.URHO] / jnp.where(sumn == 0.0, 1.0, sumn),
                    1.0)
                for c in range(L.UFS, L.UFS + L.nspec):
                    comps[c] = comps[c] * fac
            flc = jnp.stack(comps)
            contrib = -(_inblock_shift(flc, 1, 1 + d) - flc) * (1.0 / dxd)
            pgb = qgdnv[L.GDPRES]
            ugb = qgdnv[(L.GDU, L.GDV, L.GDW)[d]]
            pdivu = 0.5 * (_inblock_shift(pgb, 1, d) + pgb) * (
                _inblock_shift(ugb, 1, d) - ugb) * (1.0 / dxd)
            rows = [contrib[c] - pdivu if c == L.UEINT else contrib[c]
                    for c in range(L.NVAR)]
            htot = hs_b + jnp.stack(rows)
            if with_fin:
                htot = ub + cdt_ref[n_cdt] * htot
            refs[pos + 4][...] = flc
            refs[pos + 5][...] = qgdnv
            refs[pos + 6][...] = htot
        else:
            refs[pos][...] = flux
            refs[pos + 1][...] = qgdnv

    in_specs = [bs(L.NQ), bs(L.NQ), bs(qaux.shape[0])]
    args = [qm, qp, qaux]
    if with_mask:
        in_specs.append(bs(1))
        args.append(jnp.broadcast_to(bnd_mask, gshape)[None])
    in_specs += [bs(nc, nbr) for nc, nbr in term_specs]
    args += term_arrays

    aliases = {}
    if consup is not None:
        # hsrc (aliased in/out), div (identity + neighbor tile), u
        hsrc_idx = 1 + len(args)  # +1: the scalar-prefetch cdt vector
        in_specs += [bs(L.NVAR), bs(1), bs(1, 0), bs(L.NVAR)]
        dvn = consup["div_node"][None]
        args += [consup["hsrc"], dvn, dvn, consup["u"]]
        aliases = {hsrc_idx: 2}
        ncomps_out = (L.NVAR, L.NGDNV, L.NVAR)
    elif terms2 is not None:
        ncomps_out = (L.NVAR, L.NGDNV, L.NVAR, L.NGDNV)
    else:
        ncomps_out = (L.NVAR, L.NGDNV)
    out_shape = tuple(jax.ShapeDtypeStruct((nc,) + gshape, qm.dtype)
                      for nc in ncomps_out)
    n_cdt = len(cdtdx_vals)
    fin = consup.get("finalize_dt") if consup is not None else None
    with_fin = fin is not None
    cdt_list = [jnp.asarray(v, qm.dtype) for v in cdtdx_vals]
    if with_fin:
        cdt_list.append(jnp.asarray(fin, qm.dtype))
    cdt_arr = (jnp.stack(cdt_list) if cdt_list
               else jnp.zeros((1,), qm.dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=[bs(nc) for nc in ncomps_out],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(cdt_arr, *args)
    if consup is not None:
        return (out[0], out[1]), out[2]
    if consup_requested:
        return (out[0], out[1]), None  # degraded: caller runs consup
    if terms2 is not None:
        return (out[0], out[1]), (out[2], out[3])
    return out[0], out[1]


def prim_aux_pallas(u, layout, eos, small_dens, small_temp, dx,
                    with_divu=True, tile=8, courant_dt=None):
    """Fused ctoprim (+ node-centered velocity divergence) — one VMEM pass.

    The EOS runs inside the kernel (requires `eos.pallas_safe`: pure
    arithmetic, e.g. gamma-law). divu needs {0,-1} shifts along every
    axis; x and z are spanned by the block, the y (tiled) shift arrives as
    a pre-shifted copy of (rho, mom) — 4 extra single-component reads.
    Reference: advection_util.cpp:27 (ctoprim) + :367 (divu)."""
    L = layout
    gshape = u.shape[1:]
    from castro_tpu.ops.stencil import shifted

    tile_axis = 1
    nt = gshape[tile_axis]
    bt = max(tile, 8)
    while nt % bt != 0 and bt > 8:
        bt -= 8
    if nt % bt != 0:
        bt = nt
    grid = (nt // bt,)

    def bs(nc):
        block = [nc] + list(gshape)
        block[1 + tile_axis] = bt

        def index(i, *_):
            idx = [0, 0, 0, 0]
            idx[1 + tile_axis] = i
            return tuple(idx)

        return pl.BlockSpec(tuple(block), index)

    mom_comps = [L.URHO, L.UMX, L.UMY, L.UMZ]
    dxv = [float(x) for x in dx]
    dxv2 = dxv
    if with_divu:
        u_s = shifted(u[jnp.array(mom_comps)], -1, 1 + tile_axis)

    def _ctoprim_block(ub):
        # stack-based ctoprim (advection_util.cpp:27) — the .at[].set form
        # lowers to scatter, which Mosaic does not support
        rho = jnp.maximum(ub[L.URHO], small_dens)
        rhoinv = 1.0 / rho
        vx = ub[L.UMX] * rhoinv
        vy = ub[L.UMY] * rhoinv
        vz = ub[L.UMZ] * rhoinv
        e = jnp.maximum(ub[L.UEINT], 1e-200 * rho) * rhoinv
        xn = ub[L.UFS: L.UFS + L.nspec] * rhoinv[None]
        es = eos.re(rho=rho, e=e, xn=xn)
        qc = [None] * L.NQ
        qc[L.QRHO] = rho
        qc[L.QU], qc[L.QV], qc[L.QW] = vx, vy, vz
        qc[L.QPRES] = es.p
        qc[L.QREINT] = rho * e
        qc[L.QTEMP] = es.T
        qc[L.QGAME] = es.p / (rho * e) + 1.0
        for i in range(L.nspec):
            qc[L.QFS + i] = xn[i]
        for i in range(L.naux):
            qc[L.QFX + i] = ub[L.UFX + i] * rhoinv
        for i, cv in enumerate(qc):
            if cv is None:
                qc[i] = jnp.zeros_like(rho)
        ac = [None] * L.NQAUX
        ac[L.QDPDR] = es.dpdr_e
        ac[L.QDPDE] = es.dpde
        ac[L.QGAMC] = es.gam1
        ac[L.QC] = es.cs
        for i, cv in enumerate(ac):
            if cv is None:
                ac[i] = jnp.zeros_like(rho)
        return jnp.stack(qc), jnp.stack(ac)

    with_courant = courant_dt is not None

    def kernel(*refs):
        if with_courant:
            dt_ref, refs = refs[0], refs[1:]
        if with_divu:
            u_ref, us_ref = refs[0], refs[1]
            outs = refs[2:]
        else:
            u_ref = refs[0]
            outs = refs[1:]
        q_ref, aux_ref = outs[0], outs[1]
        ub = u_ref[...]
        q, qaux = _ctoprim_block(ub)
        q_ref[...] = q
        aux_ref[...] = qaux
        if with_courant:
            # whole-grid CFL reduction (check_for_cfl_violation analog)
            # folded into this pass; accumulated across grid blocks
            cou_ref = outs[-1]
            dt_s = dt_ref[0]
            c_b = qaux[L.QC]
            cou = jnp.zeros_like(c_b)
            for dd in range(3):
                v = q[(L.QU, L.QV, L.QW)[dd]]
                cou = jnp.maximum(cou, (jnp.abs(v) + c_b) * (dt_s / dxv2[dd]))
            m = jnp.max(cou)
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                cou_ref[0, 0] = m

            @pl.when(i > 0)
            def _():
                cou_ref[0, 0] = jnp.maximum(cou_ref[0, 0], m)
        if with_divu:
            div_ref = outs[2]
            us = us_ref[...]
            rsi = 1.0 / jnp.maximum(us[0], small_dens)
            vel = [q[L.QU], q[L.QV], q[L.QW]]
            vel_s = [us[1] * rsi, us[2] * rsi, us[3] * rsi]
            out = 0.0
            for d in range(3):
                if d == tile_axis:
                    dv = (vel[d] - vel_s[d]) / dxv[d]
                    dv_t = None
                else:
                    dv = (vel[d] - _inblock_shift(vel[d], -1, d)) / dxv[d]
                    # tile-shifted twin, carried through in-block averages
                    # until the tile axis itself is averaged in
                    dv_t = (vel_s[d] - _inblock_shift(vel_s[d], -1, d)) \
                        / dxv[d]
                for od in range(3):
                    if od == d:
                        continue
                    if od == tile_axis:
                        dv = 0.5 * (dv + dv_t)
                        dv_t = None
                    else:
                        dv = 0.5 * (dv + _inblock_shift(dv, -1, od))
                        if dv_t is not None:
                            dv_t = 0.5 * (dv_t + _inblock_shift(dv_t, -1, od))
                out = out + dv
            div_ref[...] = out[None]

    outs = [jax.ShapeDtypeStruct((L.NQ,) + gshape, u.dtype),
            jax.ShapeDtypeStruct((L.NQAUX,) + gshape, u.dtype)]
    out_specs = [bs(L.NQ), bs(L.NQAUX)]
    in_specs = [bs(L.NVAR)]
    args = [u]
    if with_divu:
        in_specs.append(bs(4))
        args.append(u_s)
        outs.append(jax.ShapeDtypeStruct((1,) + gshape, u.dtype))
        out_specs.append(bs(1))
    if with_courant:
        outs.append(jax.ShapeDtypeStruct((1, 1), u.dtype))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=out_specs)
        call = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=tuple(outs),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=INTERPRET)
        res = call(jnp.asarray(courant_dt, u.dtype).reshape(1), *args)
    else:
        res = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(outs),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=INTERPRET,
        )(*args)
    res = list(res) if isinstance(res, (tuple, list)) else [res]
    q, qaux = res[0], res[1]
    ret = [q, qaux]
    if with_divu:
        ret.append(res[2][0])
    if with_courant:
        ret.append(res[-1][0, 0])
    return tuple(ret)


def flatten_pallas(q, layout, tile=8):
    """Miller-Colella flattening via three per-direction pencil kernels
    (each direction's +/-3 stencil lives fully in VMEM) + one XLA min.
    Bitwise the same math as `flatten.uflatten` (flatten.cpp:13-167)."""
    from castro_tpu.ops.flatten import (SHKTST, ZCUT1, DZCUT, SMALL_PRES)

    L = layout
    gshape = q.shape[1:]
    small = max(SMALL_PRES, float(jnp.finfo(q.dtype).tiny))

    def one_dir(d):
        tile_axis = {0: 1, 1: 0, 2: 0}[d]
        nt = gshape[tile_axis]
        bt = max(tile, 8) if tile_axis == 1 else tile
        while nt % bt != 0 and bt > 1:
            bt = bt - 8 if (tile_axis == 1 and bt > 8) else bt // 2
        if nt % bt != 0:
            bt = nt
        grid = (nt // bt,)

        def bs(nc):
            block = [nc] + list(gshape)
            block[1 + tile_axis] = bt

            def index(i, *_):
                idx = [0, 0, 0, 0]
                idx[1 + tile_axis] = i
                return tuple(idx)

            return pl.BlockSpec(tuple(block), index)

        def kernel(p_ref, v_ref, out_ref):
            p = p_ref[0]
            vel = v_ref[0]
            sh = lambda a, o: _inblock_shift(a, o, d)  # noqa: E731
            dp = sh(p, 1) - sh(p, -1)
            denom = jnp.maximum(small, jnp.abs(sh(p, 2) - sh(p, -2)))
            zeta = jnp.abs(dp) / denom
            z = jnp.clip(DZCUT * (zeta - ZCUT1), 0.0, 1.0)
            tst = jnp.where(sh(vel, -1) - sh(vel, 1) >= 0.0, 1.0, 0.0)
            tmp = jnp.minimum(sh(p, 1), sh(p, -1))
            chi = jnp.where(jnp.abs(dp) > SHKTST * tmp, tst, 0.0)
            zchi = chi * z
            zchi2 = jnp.where(dp > 0.0, sh(zchi, -1), sh(zchi, 1))
            out_ref[...] = (1.0 - jnp.maximum(zchi, zchi2))[None]

        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bs(1), bs(1)],
            out_specs=bs(1),
            out_shape=jax.ShapeDtypeStruct((1,) + gshape, q.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=INTERPRET,
        )(q[L.QPRES][None], q[L.velocity_index(d)][None])[0]

    f = one_dir(0)
    for d in (1, 2):
        f = jnp.minimum(f, one_dir(d))
    return f


_WALL = (3, 4, 5)  # SYMMETRY, SLIPWALL, NOSLIPWALL


def clean_fill_pallas(u, layout, eos, lo_bc, hi_bc, ng, small_dens,
                      small_temp, dual_energy_eta2, do_normalize_species,
                      tile=8, with_status=False):
    """Fused clean_state + ghost fill in one VMEM pass (3D, arithmetic
    EOS, Cartesian fills: periodic / clamp / mirror — no problem hook).

    clean_state (Castro.cpp:4238 ladder) is pointwise; the ghost fill
    (Castro_bc_fill_nd.cpp) runs on the cleaned block in x,y,z order.
    y/z span the block so all their source rows are in VMEM; x is tiled,
    so the first/last blocks special-case their ghost rows (clamp/mirror
    sources sit inside those blocks for tile >= 2*ng; periodic-x wrap
    slabs arrive as small extra inputs, cleaned in-kernel)."""
    from castro_tpu.driver.clean import clean_state

    L = layout
    gshape = u.shape[1:]
    assert L.dim == 3
    nx = gshape[0]

    tile_axis = 0
    bt = max(tile, 2 * ng)
    while nx % bt != 0 and bt < nx:
        bt += 1
    if nx % bt != 0:
        bt = nx
    grid = (nx // bt,)
    nblk = grid[0]

    x_periodic = lo_bc[0] == 0
    args = [u]
    if x_periodic and nblk > 1:
        # wrap slabs (hi interior rows feed lo ghosts and vice versa)
        args += [u[:, nx - 2 * ng: nx - ng], u[:, ng: 2 * ng]]

    def bs_tiled(nc):
        block = (nc, bt) + gshape[1:]

        def index(i, *_):
            return (0, i, 0, 0)

        return pl.BlockSpec(block, index)

    def bs_slab(nc):
        return pl.BlockSpec((nc, ng) + gshape[1:], lambda i: (0, 0, 0, 0))

    def _clean(b):
        return clean_state(b, L, eos, small_dens=small_dens,
                           small_temp=small_temp,
                           dual_energy_eta2=dual_energy_eta2,
                           do_normalize_species=do_normalize_species)

    def _axis_fill(b, axis, lo, hi, n_ax):
        """Ghost fill along a fully-in-block axis via slice+concat."""
        ax = 1 + axis
        core = jax.lax.slice_in_dim(b, ng, n_ax + ng, axis=ax)

        if lo == 0:  # periodic
            gl = jax.lax.slice_in_dim(b, n_ax, n_ax + ng, axis=ax)
        elif lo in _WALL:
            gl = jnp.flip(jax.lax.slice_in_dim(b, ng, 2 * ng, axis=ax),
                          axis=ax)
        else:  # clamp (outflow/inflow baseline)
            edge = jax.lax.slice_in_dim(b, ng, ng + 1, axis=ax)
            gl = jnp.concatenate([edge] * ng, axis=ax)
        if hi == 0:
            gh = jax.lax.slice_in_dim(b, ng, 2 * ng, axis=ax)
        elif hi in _WALL:
            gh = jnp.flip(jax.lax.slice_in_dim(b, n_ax, n_ax + ng, axis=ax),
                          axis=ax)
        else:
            edge = jax.lax.slice_in_dim(b, n_ax + ng - 1, n_ax + ng, axis=ax)
            gh = jnp.concatenate([edge] * ng, axis=ax)
        out = jnp.concatenate([gl, core, gh], axis=ax)
        # reflection-odd sign flips on wall faces
        if lo in _WALL or hi in _WALL:
            N = n_ax + 2 * ng
            pos = jax.lax.broadcasted_iota(jnp.int32, out.shape[1:], axis)
            flips_lo = {L.momentum_index(axis)} if lo in _WALL else set()
            flips_hi = {L.momentum_index(axis)} if hi in _WALL else set()
            if lo == 5:
                flips_lo |= {L.momentum_index(k) for k in range(3)}
            if hi == 5:
                flips_hi |= {L.momentum_index(k) for k in range(3)}
            rows = []
            for c in range(L.NVAR):
                sv = jnp.ones(out.shape[1:], out.dtype)
                if c in flips_lo:
                    sv = jnp.where(pos < ng, -sv, sv)
                if c in flips_hi:
                    sv = jnp.where(pos >= N - ng, -sv, sv)
                if c in flips_lo or c in flips_hi:
                    rows.append(out[c] * sv)
                else:
                    rows.append(out[c])
            out = jnp.stack(rows)
        return out

    def kernel(*refs):
        if x_periodic and nblk > 1:
            u_ref, wlo_ref, whi_ref = refs[:3]
            outs = refs[3:]
        else:
            u_ref = refs[0]
            outs = refs[1:]
        out_ref = outs[0]
        raw = u_ref[...]
        if with_status:
            # pre-clean validity checks (Castro_advance_ctu.cpp:64-68):
            # interior min-rho and the finiteness probe, folded into this
            # pass instead of separate strided-slice reductions
            min_ref, sum_ref = outs[1], outs[2]
            i = pl.program_id(0)
            gx = jax.lax.broadcasted_iota(jnp.int32, raw.shape[1:], 0) \
                + i * bt
            gy = jax.lax.broadcasted_iota(jnp.int32, raw.shape[1:], 1)
            gz = jax.lax.broadcasted_iota(jnp.int32, raw.shape[1:], 2)
            mask = ((gx >= ng) & (gx < nx - ng)
                    & (gy >= ng) & (gy < gshape[1] - ng)
                    & (gz >= ng) & (gz < gshape[2] - ng))
            big = jnp.asarray(jnp.finfo(raw.dtype).max, raw.dtype)
            mrho = jnp.min(jnp.where(mask, raw[L.URHO], big))
            tot = jnp.sum(jnp.where(mask[None], raw, 0.0))

            @pl.when(i == 0)
            def _():
                min_ref[0, 0] = mrho
                sum_ref[0, 0] = tot

            @pl.when(i > 0)
            def _():
                min_ref[0, 0] = jnp.minimum(min_ref[0, 0], mrho)
                sum_ref[0, 0] = sum_ref[0, 0] + tot
        b = _clean(raw)

        # x fill: only the first/last block hold ghost rows
        i = pl.program_id(0)

        def fill_x(b):
            nloc = b.shape[1]
            rows_lo = None
            rows_hi = None
            if lo_bc[0] == 0:
                rows_lo = (_clean(wlo_ref[...]) if nblk > 1
                           else jax.lax.slice_in_dim(b, nx - 2 * ng,
                                                     nx - ng, axis=1))
            elif lo_bc[0] in _WALL:
                rows_lo = jnp.flip(
                    jax.lax.slice_in_dim(b, ng, 2 * ng, axis=1), axis=1)
            else:
                edge = jax.lax.slice_in_dim(b, ng, ng + 1, axis=1)
                rows_lo = jnp.concatenate([edge] * ng, axis=1)
            if hi_bc[0] == 0:
                rows_hi = (_clean(whi_ref[...]) if nblk > 1
                           else jax.lax.slice_in_dim(b, ng, 2 * ng, axis=1))
            elif hi_bc[0] in _WALL:
                rows_hi = jnp.flip(
                    jax.lax.slice_in_dim(b, nloc - 2 * ng, nloc - ng,
                                         axis=1), axis=1)
            else:
                edge = jax.lax.slice_in_dim(b, nloc - ng - 1, nloc - ng,
                                            axis=1)
                rows_hi = jnp.concatenate([edge] * ng, axis=1)
            # sign flips for x walls
            def flipped(rows, side_lo):
                bc = lo_bc[0] if side_lo else hi_bc[0]
                if bc not in _WALL:
                    return rows
                flips = {L.momentum_index(0)}
                if bc == 5:
                    flips |= {L.momentum_index(k) for k in range(3)}
                rws = [(-rows[c] if c in flips else rows[c])
                       for c in range(L.NVAR)]
                return jnp.stack(rws)
            rows_lo = flipped(rows_lo, True)
            rows_hi = flipped(rows_hi, False)
            core_lo = jax.lax.slice_in_dim(b, ng, nloc, axis=1)
            core_hi = jax.lax.slice_in_dim(b, 0, nloc - ng, axis=1)
            b_first = jnp.concatenate([rows_lo, core_lo], axis=1)
            b_last = jnp.concatenate([core_hi, rows_hi], axis=1)
            if nblk == 1:
                return jnp.concatenate(
                    [rows_lo, jax.lax.slice_in_dim(b, ng, nloc - ng, axis=1),
                     rows_hi], axis=1)
            b2 = jnp.where(i == 0, b_first, b)
            return jnp.where(i == nblk - 1, b_last, b2)

        b = fill_x(b)
        b = _axis_fill(b, 1, lo_bc[1], hi_bc[1], gshape[1] - 2 * ng)
        b = _axis_fill(b, 2, lo_bc[2], hi_bc[2], gshape[2] - 2 * ng)
        out_ref[...] = b

    in_specs = [bs_tiled(L.NVAR)]
    if x_periodic and nblk > 1:
        in_specs += [bs_slab(L.NVAR), bs_slab(L.NVAR)]
    if with_status:
        out_specs = (bs_tiled(L.NVAR),
                     pl.BlockSpec(memory_space=pltpu.SMEM),
                     pl.BlockSpec(memory_space=pltpu.SMEM))
        out_shape = (jax.ShapeDtypeStruct(u.shape, u.dtype),
                     jax.ShapeDtypeStruct((1, 1), u.dtype),
                     jax.ShapeDtypeStruct((1, 1), u.dtype))
        out, mrho, tot = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=INTERPRET,
        )(*args)
        return out, mrho[0, 0], ~jnp.isfinite(tot[0, 0])
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=bs_tiled(L.NVAR),
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(*args)


def consup_pallas(hsrc, flux, pg, ug, div_node, u, d, layout, difmag,
                  dx, tile=8, finalize_dt=None):
    """Fused per-direction conservative update (3D Cartesian): artificial
    viscosity (apply_av), species-flux normalization, the flux divergence
    accumulation into hsrc, and the p div(u) internal-energy term — one
    VMEM pass per direction instead of ~4 XLA passes over [NVAR]-fields.

    hsrc is accumulated across the three per-dim calls via buffer aliasing.
    Returns (hsrc + contribution_d, av-corrected normalized flux_d).
    Reference: advection_util.cpp:483,578 + consup_hydro (Castro_ctu.cpp:12).
    """
    L = layout
    gshape = flux.shape[1:]
    # in-block axes: d and the minor axis (2); plus y for d==2. The node
    # average of div needs {0,+1} shifts along both transverse dims: the
    # tiled one arrives as a pre-shifted copy (div_s).
    tile_axis = {0: 1, 1: 0, 2: 0}[d]
    ib_trans = [a for a in range(3) if a not in (d, tile_axis)][0]
    from castro_tpu.ops.stencil import shifted

    div_s = shifted(div_node, 1, tile_axis)

    nt = gshape[tile_axis]
    bt = max(tile, 8) if tile_axis == 1 else tile
    while nt % bt != 0 and bt > 1:
        bt = bt - 8 if (tile_axis == 1 and bt > 8) else bt // 2
    if nt % bt != 0:
        bt = nt
    grid = (nt // bt,)

    def bs(nc):
        block = [nc] + list(gshape)
        block[1 + tile_axis] = bt

        def index(i, *_):
            idx = [0, 0, 0, 0]
            idx[1 + tile_axis] = i
            return tuple(idx)

        return pl.BlockSpec(tuple(block), index)

    dxd = float(dx[d])
    skip = [L.UTEMP] + ([L.USHK] if L.shock_var else [])
    with_fin = finalize_dt is not None

    def kernel(*refs):
        if with_fin:
            dt_ref = refs[0]
            refs = refs[1:]
        (hs_ref, fl_ref, pg_ref, ug_ref, dv_ref, dvs_ref, u_ref,
         hout_ref, fout_ref) = refs
        fl = fl_ref[...]
        dv = dv_ref[0]
        dvs = dvs_ref[0]
        ub = u_ref[...]
        # node average, matching apply_av's ascending-axis order: the
        # tile-axis shift is always the first transverse axis here
        a1 = 0.5 * (dv + dvs)
        div1 = 0.5 * (a1 + _inblock_shift(a1, 1, ib_trans))
        coeff = difmag * jnp.minimum(div1, 0.0) * dxd
        du = ub - _inblock_shift(ub, -1, 1 + d)
        av = coeff[None] * du
        comps = []
        for c in range(L.NVAR):
            comps.append(fl[c] if c in skip else fl[c] + av[c])
        # species-flux normalization (sum -> density flux)
        if L.nspec > 0:
            sumn = comps[L.UFS]
            for c in range(L.UFS + 1, L.UFS + L.nspec):
                sumn = sumn + comps[c]
            fac = jnp.where(sumn != 0.0,
                            comps[L.URHO] / jnp.where(sumn == 0.0, 1.0, sumn),
                            1.0)
            for c in range(L.UFS, L.UFS + L.nspec):
                comps[c] = comps[c] * fac
        flc = jnp.stack(comps)
        contrib = -(_inblock_shift(flc, 1, 1 + d) - flc) * (1.0 / dxd)
        pgb = pg_ref[0]
        ugb = ug_ref[0]
        pdivu = 0.5 * (_inblock_shift(pgb, 1, d) + pgb) * (
            _inblock_shift(ugb, 1, d) - ugb) * (1.0 / dxd)
        rows = [contrib[c] - pdivu if c == L.UEINT else contrib[c]
                for c in range(L.NVAR)]
        htot = hs_ref[...] + jnp.stack(rows)
        if with_fin:
            # fold the conservative update u^{n+1} = u + dt * hsrc into
            # the last per-dim pass (saves a full-array XLA add)
            hout_ref[...] = ub + dt_ref[0] * htot
        else:
            hout_ref[...] = htot
        fout_ref[...] = flc

    out_shape = (
        jax.ShapeDtypeStruct((L.NVAR,) + gshape, flux.dtype),
        jax.ShapeDtypeStruct((L.NVAR,) + gshape, flux.dtype),
    )
    in_specs = [bs(L.NVAR), bs(L.NVAR), bs(1), bs(1), bs(1), bs(1),
                bs(L.NVAR)]
    args = (hsrc, flux, pg[None], ug[None], div_node[None], div_s[None], u)
    if with_fin:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=[bs(L.NVAR), bs(L.NVAR)])
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            input_output_aliases={1: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=INTERPRET,
        )(jnp.asarray(finalize_dt, flux.dtype).reshape(1), *args)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(bs(L.NVAR), bs(L.NVAR)),
        out_shape=out_shape,
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(*args)


def _pencil_spec(ncomp, d, gshape, bt, target=None):
    """BlockSpec covering the FULL axis d (the stencil direction); BOTH
    remaining axes are tiled — the sublane-adjacent axis in multiples of
    8 and the minor (lane) axis in lane-aligned chunks — sized so the
    block spatial volume stays near the 128^3-grid working point
    (~131072 cells, overridable via `target`). Large grids otherwise
    spill the tracing temporaries out of VMEM (measured: 55MB of
    register-allocator spill at 192^3 with a full-minor block).
    Returns (spec, grid_tuple)."""
    TARGET = 131072 if target is None else target
    nz = gshape[2]
    if d == 2:
        # stencil along the minor axis: z stays full, tile x and y
        by = 8 if gshape[1] % 8 == 0 else gshape[1]
        bx = max(1, TARGET // (by * nz))
        while gshape[0] % bx != 0:
            bx -= 1
        block = [ncomp, bx, by, nz]
        grid = (gshape[0] // bx, gshape[1] // by)

        def index(i, j, *_s):
            return (0, i, j, 0)
    else:
        ta = 1 - d  # the other major axis
        bta = 8 if gshape[ta] % 8 == 0 else gshape[ta]
        # lane-aligned z chunk fitting the budget
        zc = nz
        for cand in (256, 128, 64, 32):
            if nz % cand == 0 and gshape[d] * bta * cand <= TARGET:
                zc = cand
                break
        if gshape[d] * bta * nz <= TARGET:
            zc = nz
        block = [ncomp] + list(gshape)
        block[1 + ta] = bta
        block[3] = zc
        grid = (gshape[ta] // bta, nz // zc)

        def index(i, j, *_s):
            idx = [0, 0, 0, 0]
            idx[1 + ta] = i
            idx[3] = j
            return tuple(idx)

    return pl.BlockSpec(tuple(block), index), grid


def trace_ppm_pallas(q, qaux, srcQ, flatn, d, dt, dx_d, layout,
                     small_dens, small_pres, small_ener, dloga=None, bt=8,
                     fuse_riemann=None):
    """Fused per-direction PPM characteristic tracing (3D): the whole
    reconstruct + integrate + project chain of `trace_ppm` runs on pencil
    blocks held in VMEM — ONE HBM read of (q, qaux, flatn[, srcQ]) and one
    write of (qm, qp) per direction, instead of the many-fusion XLA chain.
    Bitwise-identical math to `castro_tpu.ops.trace_ppm.trace_ppm`.

    `fuse_riemann = dict(coord=, riemann_solver=, bnd_mask=)` chains the
    1D Riemann + flux assembly onto the freshly traced states in the
    SAME kernel (blocks span the full normal axis, so the left-cell
    gamc/c gathers are exact in VMEM) and returns (qm, qp, flux, qe) —
    the traced states never round-trip through HBM before their 1D
    solve (round-5 profile: the separate 1D face kernels re-read
    2NQ+4 components, ~0.45ms/step each at 120^3)."""
    from castro_tpu.ops.trace_ppm import trace_ppm

    assert dloga is None, "curvilinear tracing stays on the XLA path"
    L = layout
    gshape = q.shape[1:]
    # NOTE on block sizing: for d in (0,1) the minimum lane-aligned
    # pencil block is d_full x 8 x 128 = 131072 cells (the y-block must
    # be a multiple of 8, the z-block of 128), so the fused variant
    # keeps the standard budget and absorbs its +14 output components
    # within the 100MB scoped-VMEM limit.
    target = None
    spec_q, grid = _pencil_spec(L.NQ, d, gshape, bt, target=target)
    spec_aux, _ = _pencil_spec(qaux.shape[0], d, gshape, bt, target=target)
    spec_1, _ = _pencil_spec(1, d, gshape, bt, target=target)

    with_src = srcQ is not None
    mask = fuse_riemann.get("bnd_mask") if fuse_riemann is not None \
        else None
    with_mask = mask is not None

    def kernel(dt_ref, *refs):
        dt_s = dt_ref[0]
        pos = 3
        src_b = None
        if with_src:
            src_b = refs[pos][...]
            pos += 1
        mask_b = None
        if with_mask:
            mask_b = refs[pos][0]
            pos += 1
        qm, qp = trace_ppm(refs[0][...], refs[1][...], src_b, refs[2][0],
                           d, dt_s, dx_d, L, small_dens, small_pres,
                           small_ener, dloga=None)
        refs[pos][...] = qm
        refs[pos + 1][...] = qp
        if fuse_riemann is not None:
            g_b = refs[1][L.QGAMC]
            c_b = refs[1][L.QC]
            gl = _inblock_shift(g_b, -1, d)
            cl = _inblock_shift(c_b, -1, d)
            flux, qe = _riemann_block(
                qm, qp, gl, g_b, cl, c_b, d, L, fuse_riemann["coord"],
                fuse_riemann["riemann_solver"], small_dens, small_pres,
                bnd_mask=mask_b)
            refs[pos + 2][...] = flux
            refs[pos + 3][...] = qe

    in_specs = [spec_q, spec_aux, spec_1] + ([spec_q] if with_src else [])
    args = [q, qaux, flatn[None]] + ([srcQ] if with_src else [])
    if with_mask:
        in_specs.append(spec_1)
        args.append(jnp.broadcast_to(mask, gshape)[None])
    out_shape = [
        jax.ShapeDtypeStruct((L.NQ,) + gshape, q.dtype),
        jax.ShapeDtypeStruct((L.NQ,) + gshape, q.dtype),
    ]
    out_specs = [spec_q, spec_q]
    if fuse_riemann is not None:
        out_shape += [jax.ShapeDtypeStruct((L.NVAR,) + gshape, q.dtype),
                      jax.ShapeDtypeStruct((L.NGDNV,) + gshape, q.dtype)]
        out_specs += [_pencil_spec(L.NVAR, d, gshape, bt, target=target)[0],
                      _pencil_spec(L.NGDNV, d, gshape, bt,
                                   target=target)[0]]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
    )
    dt_arr = jnp.asarray(dt, q.dtype).reshape(1)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        # the tracing chain holds many live temporaries per pencil block;
        # raise the scoped-VMEM budget above the 16MB default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(dt_arr, *args)
    return out
