"""Piecewise-linear characteristic tracing (reference `trace_plm`,
`Source/hydro/trace_plm.cpp:1-339`): project limited slopes onto the
{u-c, u, u+c} eigensystem and trace only waves moving toward each edge,
with 0.5*dt source participation and the optional well-balanced pslope.

Face convention identical to trace_ppm: face i == interface i-1/2;
qm[i] from cell i-1's right edge, qp[i] from cell i's left edge."""

from __future__ import annotations

import jax.numpy as jnp

from castro_tpu.ops.slope import pslope, uslope
from castro_tpu.ops.stencil import shifted
from castro_tpu.ops.trace_ppm import _vel_map


def trace_plm(q, qaux, srcQ, flatn, d, dt, dx_d, layout, small_dens,
              small_pres, plm_iorder=4, use_pslope=False,
              pslope_cutoff_density=-1e20, dloga=None):
    L = layout
    ax = d
    QUN, QUT, QUTT = _vel_map(L, d)

    rho = q[L.QRHO]
    un = q[QUN]
    p = q[L.QPRES]
    rhoe = q[L.QREINT]
    cc = qaux[L.QC]
    csq = cc * cc
    dtdx = dt / dx_d
    hdt = 0.5 * dt

    order = 4 if plm_iorder == 2 or plm_iorder == 4 else 2
    # (reference plm_limiter: 1 -> 2nd order MC, 2 -> 4th order MC)

    drho = uslope(rho, flatn, ax, order)
    dun = uslope(un, flatn, ax, order)
    dut = uslope(q[QUT], flatn, ax, order)
    dutt = uslope(q[QUTT], flatn, ax, order)
    drhoe = uslope(rhoe, flatn, ax, order)
    if use_pslope and srcQ is not None:
        dp = pslope(p, rho, srcQ[QUN], flatn, ax, dx_d, pslope_cutoff_density)
    else:
        dp = uslope(p, flatn, ax, order)

    # characteristic amplitudes alpha_k = l_k . dq
    alpham = 0.5 * (dp / (rho * cc) - dun) * rho / cc
    alphap = 0.5 * (dp / (rho * cc) + dun) * rho / cc
    alpha0r = drho - dp / csq
    alpha0e = drhoe - dp * (rhoe + p) / (rho * csq)

    lam_m = un - cc
    lam_0 = un
    lam_p = un + cc

    def edge_states(sign):
        """sign=+1: right-edge state (qm_cell); -1: left-edge (qp_cell).
        Only waves moving toward the edge contribute, each with the
        (1 -/+ dtdx*lambda) fraction of its slope."""
        def w(lam):
            moving = lam >= 0.0 if sign > 0 else lam <= 0.0
            frac = 0.5 * (sign - dtdx * lam)
            return jnp.where(moving, frac, 0.0)

        wm, w0, wp = w(lam_m), w(lam_0), w(lam_p)
        rho_e = rho + wm * alpham + w0 * alpha0r + wp * alphap
        un_e = un + (wp * alphap - wm * alpham) * cc / rho
        p_e = p + (wp * alphap + wm * alpham) * csq
        rhoe_e = (rhoe + (wp * alphap + wm * alpham) * (rhoe + p) / rho
                  + w0 * alpha0e)
        ut_e = q[QUT] + w0 * dut
        utt_e = q[QUTT] + w0 * dutt
        if srcQ is not None:
            rho_e = rho_e + hdt * srcQ[L.QRHO]
            un_e = un_e + hdt * srcQ[QUN]
            p_e = p_e + hdt * srcQ[L.QPRES]
            rhoe_e = rhoe_e + hdt * srcQ[L.QREINT]
            ut_e = ut_e + hdt * srcQ[QUT]
            utt_e = utt_e + hdt * srcQ[QUTT]
        return (jnp.maximum(rho_e, small_dens), un_e,
                jnp.maximum(p_e, small_pres), rhoe_e, ut_e, utt_e)

    qm_vals = edge_states(+1)
    qp_vals = edge_states(-1)

    def assemble(vals):
        rho_e, un_e, p_e, rhoe_e, ut_e, utt_e = vals
        out = q
        out = out.at[L.QRHO].set(rho_e)
        out = out.at[QUN].set(un_e)
        out = out.at[QUT].set(ut_e)
        out = out.at[QUTT].set(utt_e)
        out = out.at[L.QPRES].set(p_e)
        out = out.at[L.QREINT].set(rhoe_e)
        return out

    qm_cell = assemble(qm_vals)
    qp_cell = assemble(qp_vals)

    # geometry source for 1D/2D curvilinear x-states (same as trace_ppm)
    if dloga is not None and d == 0:
        courn = dtdx * (cc + jnp.abs(un))
        safe = jnp.where(dloga == 0.0, 1.0, dloga)
        eta = (1.0 - courn) / (cc * dt * jnp.abs(safe))
        dlogatmp = jnp.where(dloga == 0.0, 0.0, jnp.minimum(eta, 1.0) * dloga)
        sourcr = -0.5 * dt * rho * dlogatmp * un
        sourcp = sourcr * csq
        source = sourcp * ((p + rhoe) / rho) / csq
        for arr_name, src_add in ((L.QRHO, sourcr), (L.QPRES, sourcp),
                                  (L.QREINT, source)):
            qm_cell = qm_cell.at[arr_name].add(src_add)
            qp_cell = qp_cell.at[arr_name].add(src_add)
        qm_cell = qm_cell.at[L.QRHO].max(small_dens)
        qp_cell = qp_cell.at[L.QRHO].max(small_dens)

    # passives: upwind with the contact fraction
    npass = L.nspec + L.naux
    if npass > 0:
        comps = list(range(L.QFS, L.QFS + L.nspec)) + (
            list(range(L.QFX, L.QFX + L.naux)) if L.naux > 0 else [])
        for comp in comps:
            dX = uslope(q[comp], flatn, ax, order)
            wm = jnp.where(lam_0 >= 0.0, 0.5 * (1.0 - dtdx * lam_0), 0.0)
            wp = jnp.where(lam_0 <= 0.0, 0.5 * (-1.0 - dtdx * lam_0), 0.0)
            qm_cell = qm_cell.at[comp].set(q[comp] + wm * dX)
            qp_cell = qp_cell.at[comp].set(q[comp] + wp * dX)

    qm_face = shifted(qm_cell, -1, 1 + ax)
    return qm_face, qp_cell
