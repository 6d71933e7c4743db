"""Gray radiation-hydrodynamics characteristic coupling for the CTU scheme.

Reference: `Source/radiation/trace_ppm_rad.cpp` (radiation in the PPM
characteristic eigensystem: total pressure/sound speed, per-group Er
riding the contact family), the RADIATION branches of `riemannus`
(`Source/hydro/riemann_solvers.H:599+`: star states for both the total
and gas subsystems, upwinded flux limiters), `compute_flux_q`
(`Source/hydro/riemann.H`: gas-only momentum/energy fluxes + the
Eddington-weighted radiation advective flux), and `Castro::ctu_rad_consup`
(`Source/hydro/Castro_ctu_rad.cpp`: Er flux divergence, radiation pressure
gradient on the momenta with kinetic-energy bookkeeping, and the comoving
-frame work terms -(f1 div u + f2 nn:Gradu) Er).

Scope (round 2): gray (1 group), 1D drivers (the Rad2Tshock-class
benchmarks); multi-D radiation remains operator-split in the main driver.
"""

from __future__ import annotations

import jax.numpy as jnp

from castro_tpu.geometry import CoordSys, Geometry
from castro_tpu.ops.ppm import ppm_int_profile, ppm_int_profile_single, ppm_reconstruct
from castro_tpu.ops.riemann import SMALL, SMALLU
from castro_tpu.ops.stencil import shifted


def edd_factor(lam, limiter=2, closure=3):
    """Eddington factor f(lambda) (reference fluxlimiter.H Edd_factor)."""
    if closure == 0:
        return lam
    if closure == 1:
        return jnp.full_like(lam, 1.0 / 3.0)
    if closure == 2:
        return 1.0 - 2.0 * lam
    # closure 3 (default): lambda + (lambda R)^2
    if limiter == 0:
        return jnp.full_like(lam, 1.0 / 3.0)
    # approximate LP family
    x = jnp.maximum(0.0, 1.0 - 3.0 * lam)
    f = 0.5 * x + jnp.sqrt(x * (1.0 + 5.0 * lam))
    return lam + f * f


def compute_ptot_ctot(lam_g, q, cg, layout, comoving=True, limiter=2,
                      closure=3):
    """(ptot, ctot, gamc_tot) from gas state + per-group (lam, Er)
    (reference rad_util.H compute_ptot_ctot)."""
    L = layout
    prad = 0.0
    csrad2 = 0.0
    for g in range(L.ngroups):
        er = q[L.QRAD + g]
        lam = lam_g[g]
        if comoving:
            gamr = (3.0 - edd_factor(lam, limiter, closure)) / 2.0
        else:
            gamr = lam + 1.0
        prad = prad + lam * er
        csrad2 = csrad2 + gamr * (lam * er) / q[L.QRHO]
    ptot = q[L.QPRES] + prad
    ctot2 = cg * cg + csrad2
    gamc_tot = ctot2 * q[L.QRHO] / ptot
    return ptot, jnp.sqrt(ctot2), gamc_tot


def trace_ppm_rad(q, qaux, srcQ, flatn, d, dt, dx_d, layout, small_dens,
                  small_pres, dloga=None):
    """Radiation PPM characteristic tracing (trace_ppm_rad.cpp:16-691).

    Same structure as `trace_ppm` but: the acoustic eigensystem acts on
    the TOTAL pressure with the total sound speed; the gas pressure
    evolves with cgas^2 minus the lambda-weighted radiation jumps; each
    group's Er rides the contact with enthalpy weight
    h_r = (lam+1) Er / rho.  `dloga` enables the 1D/2D curvilinear
    geometry source on the x-states (the reference's dloga block,
    trace_ppm.cpp:567-591, compiles unchanged in RADIATION builds with
    cc = the TOTAL sound speed)."""
    L = layout
    ax = d
    ng = L.ngroups

    if d == 0:
        QUN, QUT, QUTT = L.QU, L.QV, L.QW
    elif d == 1:
        QUN, QUT, QUTT = L.QV, L.QW, L.QU
    else:
        QUN, QUT, QUTT = L.QW, L.QU, L.QV

    un = q[QUN]
    cc = qaux[L.QC]        # total sound speed
    csq = cc * cc
    cgassq = qaux[L.QCG] ** 2
    rho = q[L.QRHO]
    p = q[L.QPRES]
    rhoe_g = q[L.QREINT]
    h_g = ((p + rhoe_g) / rho) / csq
    lam0 = [qaux[L.QLAMS + g] for g in range(ng)]
    hr = [(lam0[g] + 1.0) * q[L.QRAD + g] / rho for g in range(ng)]

    dtdx = dt / dx_d
    hdt = 0.5 * dt

    def ppm3(s):
        sm, sp = ppm_reconstruct(s, flatn, ax)
        return ppm_int_profile(sm, sp, s, un, cc, dtdx)

    def ppm1(s):
        sm, sp = ppm_reconstruct(s, flatn, ax)
        return ppm_int_profile_single(sm, sp, s, un, dtdx)

    Ip = {}
    Im = {}
    for comp in [L.QRHO, QUN, L.QPRES, L.QREINT, L.QPTOT] + \
            [L.QRAD + g for g in range(ng)]:
        Ip[comp], Im[comp] = ppm3(q[comp])
    Ip_ut, Im_ut = ppm1(q[QUT])
    Ip_utt, Im_utt = ppm1(q[QUTT])

    if srcQ is not None:
        Ip_s, Im_s = {}, {}
        for comp in (L.QRHO, QUN, L.QPRES, L.QREINT):
            Ip_s[comp], Im_s[comp] = ppm3(srcQ[comp])
        Ip_sut, Im_sut = ppm1(srcQ[QUT])
        Ip_sutt, Im_sutt = ppm1(srcQ[QUTT])
    else:
        z = jnp.zeros_like(un)
        z3 = (z, z, z)
        Ip_s = Im_s = {c: z3 for c in (L.QRHO, QUN, L.QPRES, L.QREINT)}
        Ip_sut = Im_sut = Ip_sutt = Im_sutt = z

    def build(I, I_ut, I_utt, Isrc, s_ut, s_utt, is_plus):

        def S(comp, r):
            return Isrc[comp][r]

        r = 0 if is_plus else 2
        rho_ref = jnp.maximum(I[L.QRHO][r], small_dens)
        un_ref = I[QUN][r]
        p_ref = jnp.maximum(I[L.QPRES][r], small_pres)
        rhoe_g_ref = I[L.QREINT][r]
        ptot_ref = I[L.QPTOT][r]
        er_ref = [I[L.QRAD + g][r] for g in range(ng)]

        dum = un_ref - I[QUN][0] - hdt * S(QUN, 0)
        dptotm = ptot_ref - I[L.QPTOT][0] - hdt * S(L.QPRES, 0)
        drho = rho_ref - I[L.QRHO][1] - hdt * S(L.QRHO, 1)
        dptot = ptot_ref - I[L.QPTOT][1] - hdt * S(L.QPRES, 1)
        drhoe_g = rhoe_g_ref - I[L.QREINT][1] - hdt * S(L.QREINT, 1)
        der = [er_ref[g] - I[L.QRAD + g][1] for g in range(ng)]
        dup = un_ref - I[QUN][2] - hdt * S(QUN, 2)
        dptotp = ptot_ref - I[L.QPTOT][2] - hdt * S(L.QPRES, 2)

        alpham = 0.5 * (dptotm / (rho * cc) - dum) * rho / cc
        alphap = 0.5 * (dptotp / (rho * cc) + dup) * rho / cc
        alpha0r = drho - dptot / csq
        alpha0e_g = drhoe_g - dptot * h_g
        alphar = [der[g] - dptot / csq * hr[g] for g in range(ng)]

        def wside(speed):
            w_minus = 0.5 * (1.0 - jnp.sign(speed))
            return w_minus if is_plus else (1.0 - w_minus)

        alpham = -alpham * wside(un - cc)
        alphap = -alphap * wside(un + cc)
        w0 = wside(un)
        alpha0r = -alpha0r * w0
        alpha0e_g = -alpha0e_g * w0
        alphar = [-a * w0 for a in alphar]

        out_rho = jnp.maximum(small_dens,
                              rho_ref + alphap + alpham + alpha0r)
        out_un = un_ref + (alphap - alpham) * cc / rho
        out_re = rhoe_g_ref + (alphap + alpham) * h_g * csq + alpha0e_g
        out_p = p_ref + (alphap + alpham) * cgassq
        for g in range(ng):
            out_p = out_p - lam0[g] * alphar[g]
        out_p = jnp.maximum(small_pres, out_p)
        out_ptot = ptot_ref + (alphap + alpham) * csq
        out_er = [er_ref[g] + (alphap + alpham) * hr[g] + alphar[g]
                  for g in range(ng)]
        # negative-group reset (trace_ppm_rad.cpp:432-440)
        out_reitot = out_re
        for g in range(ng):
            neg = out_er[g] < 0.0
            out_ptot = out_ptot + jnp.where(neg, -lam0[g] * out_er[g], 0.0)
            out_er[g] = jnp.maximum(out_er[g], 0.0)
            out_reitot = out_reitot + out_er[g]

        out_ut = I_ut + hdt * s_ut
        out_utt = I_utt + hdt * s_utt
        return (out_rho, out_un, out_p, out_re, out_ptot, out_reitot,
                out_er, out_ut, out_utt)

    # plus state (left edge of cell i): uses Im
    qp_vals = build(Im, Im_ut, Im_utt, Im_s, Im_sut, Im_sutt, True)
    qm_vals = build(Ip, Ip_ut, Ip_utt, Ip_s, Ip_sut, Ip_sutt, False)

    # 1D/2D geometry source on x-states (trace_ppm.cpp:567-591; the
    # sourcp*csq / source/csq pair cancels, leaving sourcr*(p+rhoe)/rho
    # — the block touches only rho / gas p / gas rhoe, as the reference
    # does in RADIATION builds)
    if dloga is not None and d == 0:
        courn = dtdx * (cc + jnp.abs(un))
        safe_dloga = jnp.where(dloga == 0.0, 1.0, dloga)
        eta = (1.0 - courn) / (cc * dt * jnp.abs(safe_dloga))
        dlogatmp = jnp.where(dloga == 0.0, 0.0,
                             jnp.minimum(eta, 1.0) * dloga)
        sourcr = -0.5 * dt * rho * dlogatmp * un
        sourcp = sourcr * csq
        source = sourcp * ((p + rhoe_g) / rho) / csq

        def addsrc(vals):
            (rho_v, un_v, p_v, re_v, ptot_v, reitot_v, er_v, ut_v,
             utt_v) = vals
            return (jnp.maximum(rho_v + sourcr, small_dens), un_v,
                    p_v + sourcp, re_v + source, ptot_v, reitot_v,
                    er_v, ut_v, utt_v)

        qp_vals = addsrc(qp_vals)
        qm_vals = addsrc(qm_vals)

    def assemble(vals, is_plus):
        (rho_v, un_v, p_v, re_v, ptot_v, reitot_v, er_v, ut_v, utt_v) = vals
        comps = [q[i] for i in range(L.NQ)]
        comps[L.QRHO] = rho_v
        comps[QUN] = un_v
        comps[QUT] = ut_v
        comps[QUTT] = utt_v
        comps[L.QPRES] = p_v
        comps[L.QREINT] = re_v
        comps[L.QPTOT] = ptot_v
        comps[L.QREITOT] = reitot_v
        for g in range(ng):
            comps[L.QRAD + g] = er_v[g]
        # passives ride the contact (same as pure hydro)
        for comp in list(range(L.QFS, L.QFS + L.nspec)) + (
                list(range(L.QFX, L.QFX + L.naux)) if L.naux > 0 else []):
            Ipp, Imp = ppm1(q[comp])
            comps[comp] = Imp if is_plus else Ipp
        return jnp.stack(comps)

    qp_cell = assemble(qp_vals, True)
    qm_cell = assemble(qm_vals, False)
    qm_face = shifted(qm_cell, -1, 1 + ax)
    return qm_face, qp_cell


def riemannus_rad(qm, qp, qaux, d, layout, small_dens, small_pres):
    """CGF solver with radiation (riemann_solvers.H RADIATION branches).
    Returns the Godunov interface dict with gas and total quantities."""
    L = layout
    ng = L.ngroups
    ax = d
    if d == 0:
        QUN, QUT, QUTT = L.QU, L.QV, L.QW
    elif d == 1:
        QUN, QUT, QUTT = L.QV, L.QW, L.QU
    else:
        QUN, QUT, QUTT = L.QW, L.QU, L.QV

    c = qaux[L.QC]
    c_m = shifted(c, -1, ax)
    csmall = jnp.maximum(SMALL, SMALL * jnp.maximum(c, c_m))

    rho_l = jnp.maximum(qm[L.QRHO], small_dens)
    rho_r = jnp.maximum(qp[L.QRHO], small_dens)
    un_l, un_r = qm[QUN], qp[QUN]
    # total/gas states
    pt_l, pt_r = qm[L.QPTOT], qp[L.QPTOT]
    ret_l, ret_r = qm[L.QREITOT], qp[L.QREITOT]
    pg_l, pg_r = qm[L.QPRES], qp[L.QPRES]
    reg_l, reg_r = qm[L.QREINT], qp[L.QREINT]
    gamc_l = shifted(qaux[L.QGAMC], -1, ax)
    gamc_r = qaux[L.QGAMC]
    gamcg_l = shifted(qaux[L.QGAMCG], -1, ax)
    gamcg_r = qaux[L.QGAMCG]
    lam_l = [shifted(qaux[L.QLAMS + g], -1, ax) for g in range(ng)]
    lam_r = [qaux[L.QLAMS + g] for g in range(ng)]
    er_l = [qm[L.QRAD + g] for g in range(ng)]
    er_r = [qp[L.QRAD + g] for g in range(ng)]

    wsmall = small_dens * csmall
    wl = jnp.maximum(wsmall, jnp.sqrt(jnp.abs(gamc_l * pt_l * rho_l)))
    wr = jnp.maximum(wsmall, jnp.sqrt(jnp.abs(gamc_r * pt_r * rho_r)))
    wwinv = 1.0 / (wl + wr)
    pstar = jnp.maximum(small_pres,
                        ((wr * pt_l + wl * pt_r) +
                         wl * wr * (un_l - un_r)) * wwinv)
    ustar = ((wl * un_l + wr * un_r) + (pt_l - pt_r)) * wwinv
    ustar = jnp.where(
        jnp.abs(ustar) < SMALLU * 0.5 * (jnp.abs(un_l) + jnp.abs(un_r)),
        0.0, ustar)
    sgnm = jnp.sign(ustar)
    fp = 0.5 * (1.0 + sgnm)
    fm = 0.5 * (1.0 - sgnm)

    ro = jnp.maximum(small_dens, fp * rho_l + fm * rho_r)
    uo = fp * un_l + fm * un_r
    po = fp * pt_l + fm * pt_r
    reo = fp * ret_l + fm * ret_r
    gamco = fp * gamc_l + fm * gamc_r
    lam_int = [jnp.where(
        ustar == 0.0,
        2.0 * lam_l[g] * lam_r[g] / (lam_l[g] + lam_r[g] + 1e-50),
        fp * lam_l[g] + fm * lam_r[g]) for g in range(ng)]
    po_g = fp * pg_l + fm * pg_r
    reo_r = [fp * er_l[g] + fm * er_r[g] for g in range(ng)]
    po_r = [lam_int[g] * reo_r[g] for g in range(ng)]
    reo_g = fp * reg_l + fm * reg_r
    gamco_g = fp * gamcg_l + fm * gamcg_r

    roinv = 1.0 / ro
    co = jnp.maximum(csmall, jnp.sqrt(jnp.abs(gamco * po * roinv)))
    co2inv = 1.0 / (co * co)
    ut = fp * qm[QUT] + fm * qp[QUT]
    utt = fp * qm[QUTT] + fm * qp[QUTT]

    drho = (pstar - po) * co2inv
    rstar = jnp.maximum(small_dens, ro + drho)
    estar_g = reo_g + drho * (reo_g + po_g) * roinv
    co_g = jnp.maximum(csmall, jnp.sqrt(jnp.abs(gamco_g * po_g * roinv)))
    pstar_g = jnp.maximum(small_pres, po_g + drho * co_g * co_g)
    estar_r = [reo_r[g] + drho * (reo_r[g] + po_r[g]) * roinv
               for g in range(ng)]
    cstar = jnp.maximum(csmall, jnp.sqrt(jnp.abs(gamco * pstar / rstar)))

    spout = co - sgnm * uo
    spin = cstar - sgnm * ustar
    ushock = 0.5 * (spin + spout)
    is_shock = pstar - po > 0.0
    spin = jnp.where(is_shock, ushock, spin)
    spout = jnp.where(is_shock, ushock, spout)
    cavg = 0.5 * (c + c_m)
    scr = jnp.where(spout - spin == 0.0, SMALL * cavg, spout - spin)
    frac = jnp.clip(0.5 * (1.0 + (spout + spin) / scr), 0.0, 1.0)

    def pick(star, o):
        v = frac * star + (1.0 - frac) * o
        v = jnp.where(spout < 0.0, o, v)
        v = jnp.where(spin >= 0.0, star, v)
        return v

    rho_g_ = pick(rstar, ro)
    un_g_ = pick(ustar, uo)
    p_t = pick(pstar, po)
    p_gdn = pick(pstar_g, po_g)
    re_gdn = pick(estar_g, reo_g)
    er_gdn = [jnp.maximum(pick(estar_r[g], reo_r[g]), 0.0)
              for g in range(ng)]

    return dict(rho=rho_g_, un=un_g_, ut=ut, utt=utt, p_g=p_gdn,
                rhoe_g=re_gdn, ptot=jnp.maximum(p_t, small_pres),
                er=er_gdn, lam=lam_int, ustar=ustar)


def rad_flux_and_qe(gd, qm, qp, d, layout, coord, limiter, closure,
                    fspace_type=1):
    """Gas conserved flux + radiation advective flux + Godunov state
    (reference compute_flux_q RADIATION branch)."""
    from castro_tpu.ops.riemann import mom_flux_has_p

    L = layout
    ng = L.ngroups
    un = gd["un"]
    frho = gd["rho"] * un
    zero = jnp.zeros_like(frho)

    comps = [None] * L.NVAR
    comps[L.URHO] = frho
    im1 = L.momentum_index(d)
    if d == 0:
        im2, im3 = L.UMY, L.UMZ
    elif d == 1:
        im2, im3 = L.UMX, L.UMZ
    else:
        im2, im3 = L.UMX, L.UMY
    fm1 = frho * un
    if mom_flux_has_p(d, coord):
        fm1 = fm1 + gd["p_g"]
    comps[im1] = fm1
    comps[im2] = frho * gd["ut"]
    comps[im3] = frho * gd["utt"]
    rhoetot = gd["rhoe_g"] + 0.5 * gd["rho"] * (
        un * un + gd["ut"] ** 2 + gd["utt"] ** 2)
    comps[L.UEDEN] = un * (rhoetot + gd["p_g"])
    comps[L.UEINT] = un * gd["rhoe_g"]
    comps[L.UTEMP] = zero
    if L.shock_var:
        comps[L.USHK] = zero
    sgnm = jnp.sign(un)
    fp = 0.5 * (1.0 + sgnm)
    fm = 0.5 * (1.0 - sgnm)
    for qc, uc in zip(
        list(range(L.QFS, L.QFS + L.nspec)) +
        (list(range(L.QFX, L.QFX + L.naux)) if L.naux > 0 else []),
        list(range(L.UFS, L.UFS + L.nspec)) +
        (list(range(L.UFX, L.UFX + L.naux)) if L.naux > 0 else []),
    ):
        comps[uc] = frho * (fp * qm[qc] + fm * qp[qc])
    for i, cpn in enumerate(comps):
        if cpn is None:
            comps[i] = zero
    flux = jnp.stack(comps)

    # radiation advective flux (fspace_type 1: (1 + f1) Er u)
    rf = []
    for g in range(ng):
        if fspace_type == 1:
            eddf = edd_factor(gd["lam"][g], limiter, closure)
            f1 = 0.5 * (1.0 - eddf)
            rf.append((1.0 + f1) * gd["er"][g] * un)
        else:
            rf.append(gd["er"][g] * un)
    rad_flux = jnp.stack(rf)

    gcomps = [None] * L.NGDNV
    gcomps[L.GDRHO] = gd["rho"]
    gd_comp = {0: (L.GDU, L.GDV, L.GDW), 1: (L.GDV, L.GDU, L.GDW),
               2: (L.GDW, L.GDU, L.GDV)}[d]
    gcomps[gd_comp[0]] = un
    gcomps[gd_comp[1]] = gd["ut"]
    gcomps[gd_comp[2]] = gd["utt"]
    gcomps[L.GDPRES] = gd["p_g"]
    gcomps[L.GDGAME] = gd["p_g"] / jnp.maximum(
        gd["rhoe_g"], jnp.finfo(un.dtype).tiny) + 1.0
    for g in range(ng):
        gcomps[L.GDLAMS + g] = gd["lam"][g]
        gcomps[L.GDERADS + g] = gd["er"][g]
    for i, cpn in enumerate(gcomps):
        if cpn is None:
            gcomps[i] = zero
    qgdnv = jnp.stack(gcomps)
    return flux, rad_flux, qgdnv


def rad_flatten(q, layout, flatten_pp_threshold=-1.0):
    """Radiation flattening: the product of the gas-pressure and
    total-pressure flattening profiles, with the optional pp-threshold
    zeroing in converging flow (Castro_ctu_hydro.cpp:234-258)."""
    from castro_tpu.ops.flatten import uflatten

    L = layout
    flatn = uflatten(q, L) * uflatten(q, L, pres_comp=L.QPTOT)
    if flatten_pp_threshold > 0.0:
        conv = 0.0
        for d in range(L.dim):
            vel = q[L.velocity_index(d)]
            ax = vel.ndim - L.dim + d
            conv = conv + shifted(vel, -1, ax) - shifted(vel, 1, ax)
        zero = (conv > 0.0) & (q[L.QPRES] <
                               flatten_pp_threshold * q[L.QPTOT])
        flatn = jnp.where(zero, 0.0, flatn)
    return flatn


def apply_av_rad(rflux, d, div_node, er_grown, layout, difmag, dx):
    """Artificial viscosity on the per-group radiation flux
    (reference `apply_av_rad`, advection_util.cpp:533-573)."""
    L = layout
    dim = L.dim
    base_ndim = er_grown.ndim - 1
    ax = base_ndim - dim + d
    div1 = div_node
    for od in range(dim):
        if od == d:
            continue
        oax = base_ndim - dim + od
        div1 = 0.5 * (div1 + shifted(div1, 1, oax))
    coeff = difmag * jnp.minimum(div1, 0.0) * dx[d]
    der = er_grown - shifted(er_grown, -1, ax + 1)
    return rflux + coeff[None] * der


def ctu_rad_consup(u_new, Er, rfluxes, qes, dt, geom: Geometry, layout, ng,
                   limiter, closure, fspace_type, comoving,
                   nugroup=None, dlognu=None):
    """Multi-D radiation conservative update (`Castro::ctu_rad_consup`,
    Castro_ctu_rad.cpp:13-340): per-group Er flux divergence, the
    sum-lambda-grad-Er radiation pressure gradient on every momentum with
    kinetic-energy bookkeeping on UEDEN, and (comoving frame) the
    -(f1 div u + f2 nn:grad u) Er work terms with fspace type-1
    u . grad(f1 Er) transport, followed by frequency-space advection for
    multigroup.

    `u_new` is the grown hydro-updated state (modified interior in the
    return); `Er` is the INTERIOR per-group array; `rfluxes`/`qes` are
    grown face-registered per-dim arrays. Returns (u_new, Er_out)."""
    from castro_tpu.ops.stencil import interior_slice

    L = layout
    dim = L.dim
    ngr = L.ngroups
    dx = geom.dx
    grid_shape = u_new.shape[1:]
    inner = interior_slice(ng, dim)
    sl = inner[1:]

    vol = jnp.broadcast_to(geom.volume(ng), grid_shape)[sl]

    # ---- Er flux divergence (Castro_ctu_rad.cpp:72-85) ------------------
    Er_out = Er
    for d in range(dim):
        area = geom.face_area(d, ng)
        rf = rfluxes[d]
        # RATIO area/vol first (f32 range; see ctu.py consup note)
        volg = jnp.broadcast_to(geom.volume(ng), grid_shape)
        av_lo = jnp.broadcast_to(area, grid_shape) / volg
        aF_lo = av_lo[None] * rf
        if geom.coord != CoordSys.CARTESIAN and d == 0:
            av_hi = jnp.broadcast_to(shifted(area, 1, d), grid_shape) / volg
            aF_hi = av_hi[None] * shifted(rf, 1, 1 + d)
        else:
            aF_hi = shifted(aF_lo, 1, 1 + d)
        Er_out = Er_out + dt * (aF_lo[(slice(None),) + sl] -
                                aF_hi[(slice(None),) + sl])

    # ---- face-registered lam/er/u at the cell's lo/hi faces -------------
    def faces(arr, d):
        lo = arr[sl]
        hi = shifted(arr, 1, arr.ndim - dim + d)[sl]
        return lo, hi

    lam_f = [[faces(qes[d][L.GDLAMS + g], d) for d in range(dim)]
             for g in range(ngr)]
    er_f = [[faces(qes[d][L.GDERADS + g], d) for d in range(dim)]
            for g in range(ngr)]

    lamc = [sum(lo + hi for lo, hi in lam_f[g]) / (2.0 * dim)
            for g in range(ngr)]

    # ---- radiation pressure gradient on the momenta ---------------------
    dprd = []
    for d in range(dim):
        acc = 0.0
        for g in range(ngr):
            lo, hi = er_f[g][d]
            acc = acc + lamc[g] * (hi - lo) / dx[d]
        dprd.append(acc)

    urho = u_new[(L.URHO,) + sl]
    moms = [u_new[(L.momentum_index(c),) + sl] for c in range(3)]
    ek1 = (moms[0] ** 2 + moms[1] ** 2 + moms[2] ** 2) / (2.0 * urho)
    for d in range(dim):
        moms[d] = moms[d] - dt * dprd[d]
        u_new = u_new.at[(L.momentum_index(d),) + sl].set(moms[d])
    ek2 = (moms[0] ** 2 + moms[1] ** 2 + moms[2] ** 2) / (2.0 * urho)
    dek = ek2 - ek1
    u_new = u_new.at[(L.UEDEN,) + sl].add(dek)

    if not comoving:
        # mixed frame (single group): the lab-frame Er absorbs the
        # kinetic-energy exchange (Castro_ctu_rad.cpp:162-166)
        Er_out = Er_out.at[0].add(-dek)
        return u_new, jnp.maximum(Er_out, 0.0)

    # ---- comoving-frame work terms (Castro_ctu_rad.cpp:171-325) ---------
    ubar = []
    dud = [[0.0] * 3 for _ in range(dim)]  # dud[j][c] = d(u_c)/dx_j
    for j in range(dim):
        for c in range(3):
            lo, hi = faces(qes[j][L.GDU + c], j)
            if c == j:
                ubar.append(0.5 * (lo + hi))
            dud[j][c] = (hi - lo) / dx[j]
    divu = sum(dud[j][j] for j in range(dim))

    af = []
    for g in range(ngr):
        nhat = [(er_f[g][c][1] - er_f[g][c][0]) / dx[c] for c in range(dim)]
        # nn = n.(grad u).n with n = nhat/|nhat| is scale-invariant in
        # nhat — normalize BEFORE squaring: with cgs Er ~ 1e-15 the raw
        # h*h (and a 1e-50 floor) underflow float32 to 0/0 = NaN
        tiny = jnp.asarray(jnp.finfo(nhat[0].dtype).tiny, nhat[0].dtype)
        nscale = nhat[0] * 0.0
        for h in nhat:
            nscale = jnp.maximum(nscale, jnp.abs(h))
        nunit = [h / jnp.maximum(nscale, tiny) for h in nhat]
        GnDotu = [sum(nunit[c] * dud[j][c] for c in range(dim))
                  for j in range(dim)]
        nn = sum(nunit[j] * GnDotu[j] for j in range(dim)) / (
            sum(h * h for h in nunit) + tiny)
        eddf = edd_factor(lamc[g], limiter, closure)
        f1 = 0.5 * (1.0 - eddf)
        f2 = 0.5 * (3.0 * eddf - 1.0)
        af.append(-(f1 * divu + f2 * nn))

        if fspace_type == 1:
            adv = 0.0
            for d in range(dim):
                lam_lo, lam_hi = lam_f[g][d]
                f1_lo = 0.5 * (1.0 - edd_factor(lam_lo, limiter, closure))
                f1_hi = 0.5 * (1.0 - edd_factor(lam_hi, limiter, closure))
                er_lo, er_hi = er_f[g][d]
                Gf1E = (f1_hi * er_hi - f1_lo * er_lo) / dx[d]
                adv = adv + ubar[d] * Gf1E
            Egdc = sum(lo + hi for lo, hi in er_f[g]) / (2.0 * dim)
            Er_out = Er_out.at[g].add(dt * adv - dt * f2 * Egdc * nn)

    if ngr > 1 and dlognu is not None:
        from castro_tpu.radiation.fspace import advect_in_fspace

        Er_out, _ = advect_in_fspace(Er_out, jnp.stack(af), nugroup,
                                     dlognu, dt, fspace_type)
    return u_new, jnp.maximum(Er_out, 0.0)


def ctu_rad_hydro(u, Er, q, qaux, srcQ, dt, geom: Geometry, layout, cfg,
                  limiter, closure, nugroup=None, dlognu=None,
                  fspace_type=1, comoving=1, flatten_pp_threshold=-1.0,
                  keep_fluxes=False):
    """Dimension-generic CTU radiation-hydro advance: characteristic
    tracing with the radiation eigensystem in every direction, the rad
    Riemann solve, radiation-aware transverse corrections (2D single-pass,
    3D full corner coupling — the RADIATION branches of trans.cpp), the
    gas conservative update, and the ctu_rad_consup radiation terms.

    Mirrors the pure-hydro `ctu_hydro` stage structure
    (Castro_ctu_hydro.cpp with RADIATION defined). Returns
    (u_new grown, Er_new interior [ngroups, n...]); keep_fluxes
    additionally returns the final (gas, radiation-advective) face
    fluxes on the grown grid for the AMR flux registers."""
    from castro_tpu.ops import advection_util as au
    from castro_tpu.ops.riemann import mom_flux_has_p
    from castro_tpu.ops.trans import trans_final, trans_single

    L = layout
    dim = L.dim
    ng = cfg.ng
    dx = geom.dx
    grid_shape = q.shape[1:]
    dtype = q.dtype

    flatn = rad_flatten(q, L, flatten_pp_threshold) if cfg.use_flattening \
        else jnp.ones(grid_shape, dtype)

    rad = dict(limiter=limiter, closure=closure, fspace_t=fspace_type,
               comov=comoving)

    from castro_tpu.ops.ctu import _dloga

    dloga = _dloga(geom, ng)

    def trace(d):
        return trace_ppm_rad(q, qaux, srcQ, flatn, d, dt, dx[d], L,
                             cfg.small_dens, cfg.small_pres,
                             dloga=dloga if d == 0 else None)

    def solve(qm, qp, d):
        gd = riemannus_rad(qm, qp, qaux, d, L, cfg.small_dens,
                           cfg.small_pres)
        return rad_flux_and_qe(gd, qm, qp, d, L, geom.coord, limiter,
                               closure, fspace_type)

    states = [trace(d) for d in range(dim)]

    if dim == 1:
        sol = [solve(states[0][0], states[0][1], 0)]

    elif dim == 2:
        f0 = solve(states[0][0], states[0][1], 0)
        f1 = solve(states[1][0], states[1][1], 1)
        hdt = 0.5 * dt
        rz = geom.coord == CoordSys.CYLINDRICAL
        if rz:
            geom_r = {"area": geom.face_area(0, ng), "vol": geom.volume(ng)}
            geom_z = {"area": geom.face_area(1, ng), "vol": geom.volume(ng)}
        else:
            geom_r = geom_z = None
        qxm, qxp = trans_single(
            states[0][0], states[0][1], f1[0], f1[2], qaux, 0, 1,
            hdt / dx[1], L, cfg.small_pres,
            cfg.transverse_reset_density, cfg.transverse_reset_rhoe,
            geom_terms=geom_z, hdt=hdt, rflux_t=f1[1], rad=rad)
        qym, qyp = trans_single(
            states[1][0], states[1][1], f0[0], f0[2], qaux, 1, 0,
            hdt / dx[0], L, cfg.small_pres,
            cfg.transverse_reset_density, cfg.transverse_reset_rhoe,
            geom_terms=geom_r, hdt=hdt,
            radial_p_fix=rz and not mom_flux_has_p(0, geom.coord),
            rflux_t=f0[1], rad=rad)
        sol = [solve(qxm, qxp, 0), solve(qym, qyp, 1)]

    else:
        third = dt / 3.0
        hdt = 0.5 * dt
        f1d = [solve(states[d][0], states[d][1], d) for d in range(3)]
        fint = {}
        for n in range(3):
            for t in range(3):
                if t == n:
                    continue
                qm_c, qp_c = trans_single(
                    states[n][0], states[n][1], f1d[t][0], f1d[t][2],
                    qaux, n, t, third / dx[t], L, cfg.small_pres,
                    cfg.transverse_reset_density, cfg.transverse_reset_rhoe,
                    rflux_t=f1d[t][1], rad=rad)
                fint[(n, t)] = solve(qm_c, qp_c, n)
        sol = []
        for n in range(3):
            t1, t2 = [d for d in range(3) if d != n]
            qm_f, qp_f = trans_final(
                states[n][0], states[n][1],
                fint[(t1, t2)][0], fint[(t1, t2)][2],
                fint[(t2, t1)][0], fint[(t2, t1)][2],
                qaux, n, t1, t2, hdt / dx[t1], hdt / dx[t2], L,
                cfg.small_pres, cfg.transverse_reset_density,
                cfg.transverse_reset_rhoe,
                rflux_t1=fint[(t1, t2)][1], rflux_t2=fint[(t2, t1)][1],
                rad=rad)
            sol.append(solve(qm_f, qp_f, n))

    fluxes = [s[0] for s in sol]
    rfluxes = [s[1] for s in sol]
    qes = [s[2] for s in sol]

    # artificial viscosity (gas + radiation) + species normalization
    div_node = au.divu_node(q, dx, L)
    er_grown = q[L.QRAD:L.QRAD + L.ngroups]
    for d in range(dim):
        fluxes[d] = au.apply_av(fluxes[d], d, div_node, u, L, cfg.difmag,
                                dx)
        rfluxes[d] = apply_av_rad(rfluxes[d], d, div_node, er_grown, L,
                                  cfg.difmag, dx)
        fluxes[d] = au.normalize_species_fluxes(fluxes[d], L)

    # gas conservative update (consup_hydro behavior)
    vol = geom.volume(ng)
    volinv = 1.0 / vol
    hsrc = jnp.zeros_like(u)
    pdivu = jnp.zeros(grid_shape, dtype)
    for d in range(dim):
        area = geom.face_area(d, ng)
        # RATIO area/vol first: area*flux overflows f32 in cgs 3D
        av_lo_r = area * volinv
        av_hi_r = shifted(area, 1, d) * volinv \
            if (geom.coord != CoordSys.CARTESIAN and d == 0) else av_lo_r
        hsrc = hsrc + (av_lo_r * fluxes[d]
                       - av_hi_r * shifted(fluxes[d], 1, 1 + d))

        gdu = qes[d][(L.GDU, L.GDV, L.GDW)[d]]
        gdp = qes[d][L.GDPRES]
        pdivu = pdivu + 0.5 * (shifted(gdp, 1, d) + gdp) * (
            shifted(gdu, 1, d) * av_hi_r - gdu * av_lo_r)

    hsrc = hsrc.at[L.UEINT].add(-pdivu)
    hsrc = hsrc.at[L.UTEMP].set(0.0)
    if not mom_flux_has_p(0, geom.coord):
        gdp0 = qes[0][L.GDPRES]
        hsrc = hsrc.at[L.UMX].add(-(shifted(gdp0, 1, 0) - gdp0) / dx[0])
    u_new = u + dt * hsrc

    out = ctu_rad_consup(u_new, Er, rfluxes, qes, dt, geom, L, ng,
                          limiter, closure, fspace_type, comoving,
                          nugroup=nugroup, dlognu=dlognu)
    if keep_fluxes:
        return out + (fluxes, rfluxes)
    return out


def ctu_rad_hydro_1d(u, Er, q, qaux, srcQ, dt, geom: Geometry, layout, cfg,
                     limiter, closure, nugroup=None, dlognu=None,
                     fspace_type=1, comoving=1):
    """Backwards-compatible 1D entry: delegates to the dimension-generic
    driver and returns (u_new, Er_new interior)."""
    return ctu_rad_hydro(u, Er, q, qaux, srcQ, dt, geom, layout, cfg,
                         limiter, closure, nugroup=nugroup, dlognu=dlognu,
                         fspace_type=fspace_type, comoving=comoving)
