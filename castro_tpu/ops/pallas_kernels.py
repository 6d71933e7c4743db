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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from castro_tpu.ops import riemann as rm


def _tiling(grid_shape, dim):
    """Pick tile sizes for the leading spatial dims (minor dim stays whole
    for lane alignment)."""
    def pick(n, want):
        b = want
        while n % b != 0:
            b //= 2
        return max(b, 1)

    if dim == 3:
        bx = pick(grid_shape[0], 8)
        by = pick(grid_shape[1], 8)
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


def cmpflx_pallas(qm, qp, gamc_l, gamc_r, c_l, c_r, d, layout, coord,
                  riemann_solver, small_dens, small_pres):
    """Fused Riemann + flux assembly. Inputs are face-registered full-grid
    arrays; gamc/c already gathered for both sides. Returns (flux, qgdnv)."""
    L = layout
    dim = L.dim
    grid_shape = qm.shape[1:]
    grid, tiles = _tiling(grid_shape, dim)

    QUN, QUT, QUTT = rm._riemann_vel_map(L, d)

    def kernel(qm_ref, qp_ref, gl_ref, gr_ref, cl_ref, cr_ref,
               flux_ref, qe_ref):
        qm_b = qm_ref[...]
        qp_b = qp_ref[...]
        gl = gl_ref[0]
        gr = gr_ref[0]
        cl = cl_ref[0]
        cr = cr_ref[0]
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
        flux, qgdnv = rm.compute_flux(gd, qm_b, qp_b, d, L, coord)
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
    )(q_face, dflux, dreint_extra[None], dp[None])
