"""Characteristic tracing of PPM parabolae to zone edges.

Behavior matches the reference (`Source/hydro/trace_ppm.cpp:16-596`):
reference state = integral under the fastest wave toward each edge,
characteristic projection of (rho, u_n, p, rho e) jumps with the
{u-c, u, u+c} eigensystem, transverse velocities and passives carried by the
contact only, hdt*source participation, and the 1D/2D `dloga` geometry source.

Face convention here: face index i == interface i-1/2.
`qm[i]` (minus/left state) comes from cell i-1 tracing to its right edge;
`qp[i]` (plus/right state) comes from cell i tracing to its left edge.
"""

from __future__ import annotations

import jax.numpy as jnp

from castro_tpu.ops.ppm import ppm_int_profile, ppm_int_profile_single, ppm_reconstruct
from castro_tpu.ops.stencil import shifted


def _vel_map(layout, d):
    if d == 0:
        return layout.QU, layout.QV, layout.QW
    if d == 1:
        return layout.QV, layout.QW, layout.QU
    return layout.QW, layout.QU, layout.QV


def trace_ppm(q, qaux, srcQ, flatn, d, dt, dx_d, layout, small_dens, small_pres,
              small_ener=1e-200, dloga=None):
    """Returns (qm_face, qp_face), both [NQ, grid] on faces i-1/2 stored at i."""
    L = layout
    ax = d  # grid-only arrays: spatial axis d

    QUN, QUT, QUTT = _vel_map(L, d)

    un = q[QUN]
    cc = qaux[L.QC]
    csq = cc * cc
    dtdx = dt / dx_d
    hdt = 0.5 * dt

    def recon(s):
        return ppm_reconstruct(s, flatn, ax)

    def ppm3(s):
        sm, sp = recon(s)
        return ppm_int_profile(sm, sp, s, un, cc, dtdx)

    def ppm1(s):
        sm, sp = recon(s)
        return ppm_int_profile_single(sm, sp, s, un, dtdx)

    Ip_rho, Im_rho = ppm3(q[L.QRHO])
    Ip_un, Im_un = ppm3(un)
    Ip_p, Im_p = ppm3(q[L.QPRES])
    Ip_re, Im_re = ppm3(q[L.QREINT])
    Ip_gc, Im_gc = ppm3(qaux[L.QGAMC])
    Ip_ut, Im_ut = ppm1(q[QUT])
    Ip_utt, Im_utt = ppm1(q[QUTT])

    if srcQ is not None:
        Ip_srho, Im_srho = ppm3(srcQ[L.QRHO])
        Ip_sun, Im_sun = ppm3(srcQ[QUN])
        Ip_sp, Im_sp = ppm3(srcQ[L.QPRES])
        Ip_sre, Im_sre = ppm3(srcQ[L.QREINT])
        Ip_sut, Im_sut = ppm1(srcQ[QUT])
        Ip_sutt, Im_sutt = ppm1(srcQ[QUTT])
    else:
        z = jnp.zeros_like(un)
        Ip_srho = Im_srho = Ip_sun = Im_sun = Ip_sp = Im_sp = Ip_sre = Im_sre = (z, z, z)
        Ip_sut = Im_sut = Ip_sutt = Im_sutt = z

    def build_state(I_rho, I_un, I_p, I_re, I_gc, I_ut, I_utt,
                    I_srho, I_sun, I_sp, I_sre, I_sut, I_sutt, is_plus):
        """is_plus: plus state (left edge, ref wave = u-c, index 0);
        else minus state (right edge, ref wave = u+c, index 2)."""
        r = 0 if is_plus else 2
        rho_ref = jnp.maximum(I_rho[r] + hdt * I_srho[r], small_dens)
        un_ref = I_un[r] + hdt * I_sun[r]
        p_ref = jnp.maximum(I_p[r] + hdt * I_sp[r], small_pres)
        rhoe_ref = I_re[r] + hdt * I_sre[r]
        gam_ref = I_gc[r]

        rho_ref_inv = 1.0 / rho_ref
        csq_ref = gam_ref * p_ref * rho_ref_inv
        cc_ref = jnp.sqrt(csq_ref)
        cc_ref_inv = 1.0 / cc_ref
        h_ref = (p_ref + rhoe_ref) * rho_ref_inv

        dum = un_ref - I_un[0] - hdt * I_sun[0]
        dptotm = p_ref - I_p[0] - hdt * I_sp[0]
        drho = rho_ref - I_rho[1] - hdt * I_srho[1]
        dptot = p_ref - I_p[1] - hdt * I_sp[1]
        drhoe = rhoe_ref - I_re[1] - hdt * I_sre[1]
        dup = un_ref - I_un[2] - hdt * I_sun[2]
        dptotp = p_ref - I_p[2] - hdt * I_sp[2]

        alpham = 0.5 * (dptotm * rho_ref_inv * cc_ref_inv - dum) * rho_ref * cc_ref_inv
        alphap = 0.5 * (dptotp * rho_ref_inv * cc_ref_inv + dup) * rho_ref * cc_ref_inv
        alpha0r = drho - dptot / csq_ref
        alpha0e = drhoe - dptot * h_ref / csq_ref

        # Wave-side weights. The reference uses one-sided ternaries
        # (`un > 0 ? ...`, trace_ppm.cpp:444-447,516-519); at exactly zero
        # wave speed that tie-break is left/right asymmetric and seeds
        # mirror-symmetry violations in at-rest data. We give a stationary
        # wave half weight to each side — identical for any nonzero speed,
        # exactly symmetry-preserving for u == 0.
        def wside(speed):
            w_minus = 0.5 * (1.0 - jnp.sign(speed))  # weight seen by qp
            return w_minus if is_plus else (1.0 - w_minus)

        alpham = -alpham * wside(un - cc)
        alphap = -alphap * wside(un + cc)
        w0 = wside(un)
        alpha0r = -alpha0r * w0
        alpha0e = -alpha0e * w0

        out_rho = jnp.maximum(small_dens, rho_ref + alphap + alpham + alpha0r)
        out_un = un_ref + (alphap - alpham) * cc_ref * rho_ref_inv
        out_re = jnp.maximum(small_dens * small_ener,
                             rhoe_ref + (alphap + alpham) * h_ref + alpha0e)
        out_p = jnp.maximum(small_pres, p_ref + (alphap + alpham) * csq_ref)
        out_ut = I_ut + hdt * I_sut
        out_utt = I_utt + hdt * I_sutt
        return out_rho, out_un, out_p, out_re, out_ut, out_utt

    qp_rho, qp_un, qp_p, qp_re, qp_ut, qp_utt = build_state(
        Im_rho, Im_un, Im_p, Im_re, Im_gc, Im_ut, Im_utt,
        Im_srho, Im_sun, Im_sp, Im_sre, Im_sut, Im_sutt, True)
    qm_rho, qm_un, qm_p, qm_re, qm_ut, qm_utt = build_state(
        Ip_rho, Ip_un, Ip_p, Ip_re, Ip_gc, Ip_ut, Ip_utt,
        Ip_srho, Ip_sun, Ip_sp, Ip_sre, Ip_sut, Ip_sutt, False)

    # 1D/2D geometry source on x-states (reference trace_ppm.cpp:573-596)
    if dloga is not None and d == 0:
        rho_c = q[L.QRHO]
        p_c = q[L.QPRES]
        re_c = q[L.QREINT]
        courn = dtdx * (cc + jnp.abs(un))
        safe_dloga = jnp.where(dloga == 0.0, 1.0, dloga)
        eta = (1.0 - courn) / (cc * dt * jnp.abs(safe_dloga))
        dlogatmp = jnp.where(dloga == 0.0, 0.0, jnp.minimum(eta, 1.0) * dloga)
        sourcr = -0.5 * dt * rho_c * dlogatmp * un
        sourcp = sourcr * csq
        source = sourcp * ((p_c + re_c) / rho_c) / csq
        qm_rho = jnp.maximum(qm_rho + sourcr, small_dens)
        qm_p = qm_p + sourcp
        qm_re = qm_re + source
        qp_rho = jnp.maximum(qp_rho + sourcr, small_dens)
        qp_p = qp_p + sourcp
        qp_re = qp_re + source

    # assemble full NQ interface states (cell-registered); built as
    # component lists + stack so the same code lowers inside Pallas blocks
    # (scatter-free) and fuses cleanly under XLA
    qp_comps = [q[i] for i in range(L.NQ)]  # QTEMP/QGAME copied through
    qm_comps = [q[i] for i in range(L.NQ)]
    for comps, vals in ((qp_comps, (qp_rho, qp_un, qp_p, qp_re, qp_ut,
                                    qp_utt)),
                        (qm_comps, (qm_rho, qm_un, qm_p, qm_re, qm_ut,
                                    qm_utt))):
        rho_v, un_v, p_v, re_v, ut_v, utt_v = vals
        comps[L.QRHO] = rho_v
        comps[QUN] = un_v
        comps[QUT] = ut_v
        comps[QUTT] = utt_v
        comps[L.QPRES] = p_v
        comps[L.QREINT] = re_v

    # passives (species + aux): carried by the contact only
    npass = L.nspec + L.naux
    if npass > 0:
        for comp in list(range(L.QFS, L.QFS + L.nspec)) + (
            list(range(L.QFX, L.QFX + L.naux)) if L.naux > 0 else []
        ):
            Ipp, Imp = ppm1(q[comp])
            qp_comps[comp] = Imp
            qm_comps[comp] = Ipp

    qp_cell = jnp.stack(qp_comps)
    qm_cell = jnp.stack(qm_comps)

    # register on faces: qm at face i comes from cell i-1's right-edge state
    qm_face = shifted(qm_cell, -1, 1 + ax)
    qp_face = qp_cell
    return qm_face, qp_face
