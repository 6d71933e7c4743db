"""Riemann solvers + interface flux assembly.

Behavior matches the reference:
- CGF two-shock approximate solver `riemannus`
  (`Source/hydro/riemann_solvers.H:599-817`): star state from Lagrangian
  impedances, contact sampling, rarefaction interpolation via frac.
- flux assembly `compute_flux_q` (`riemann_solvers.H:16-120`): pressure in
  the normal momentum flux only where `mom_flux_has_p` (not the radial
  direction in curvilinear coords, where consup applies a pressure-gradient
  source instead).
- passives upwinded on the interface velocity
  (`Source/hydro/riemann.cpp:106-135`).
- HLLC (`riemann_solvers.H:993+`) as riemann_solver=2.

Face convention: all face arrays are registered at face i-1/2 = index i;
left state from cell i-1, right state from cell i.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from castro_tpu.geometry import CoordSys
from castro_tpu.ops.stencil import shifted

SMALL = 1.0e-8
SMALLU = 1.0e-12


def _riemann_vel_map(layout, d):
    """(normal, transverse1, transverse2) primitive velocity components.

    Matches `load_input_states` (`riemann.H:64-130`): for d=1 the first
    transverse is QU (so flux[UMX] pairs with qint.ut in compute_flux_q);
    note this differs from the tracing order in trace_ppm, where transverse
    ordering is irrelevant (both ride the contact).
    """
    if d == 0:
        return layout.QU, layout.QV, layout.QW
    if d == 1:
        return layout.QV, layout.QU, layout.QW
    return layout.QW, layout.QU, layout.QV


class RiemannInputs(NamedTuple):
    rho_l: jnp.ndarray
    un_l: jnp.ndarray
    ut_l: jnp.ndarray
    utt_l: jnp.ndarray
    p_l: jnp.ndarray
    rhoe_l: jnp.ndarray
    gamc_l: jnp.ndarray
    rho_r: jnp.ndarray
    un_r: jnp.ndarray
    ut_r: jnp.ndarray
    utt_r: jnp.ndarray
    p_r: jnp.ndarray
    rhoe_r: jnp.ndarray
    gamc_r: jnp.ndarray
    csmall: jnp.ndarray
    cavg: jnp.ndarray


class GodunovState(NamedTuple):
    rho: jnp.ndarray
    un: jnp.ndarray
    ut: jnp.ndarray
    utt: jnp.ndarray
    p: jnp.ndarray
    rhoe: jnp.ndarray
    ustar: jnp.ndarray  # contact speed, for passive upwinding


def load_inputs(qm, qp, qaux, d, layout, small_dens) -> RiemannInputs:
    """Gather left/right interface states (reference `load_input_states`,
    `Source/hydro/riemann.H:64-130`)."""
    L = layout
    ax = d
    QUN, QUT, QUTT = _riemann_vel_map(L, d)
    c = qaux[L.QC]
    c_m = shifted(c, -1, ax)
    return RiemannInputs(
        rho_l=jnp.maximum(qm[L.QRHO], small_dens),
        un_l=qm[QUN],
        ut_l=qm[QUT],
        utt_l=qm[QUTT],
        p_l=qm[L.QPRES],
        rhoe_l=qm[L.QREINT],
        gamc_l=shifted(qaux[L.QGAMC], -1, ax),
        rho_r=jnp.maximum(qp[L.QRHO], small_dens),
        un_r=qp[QUN],
        ut_r=qp[QUT],
        utt_r=qp[QUTT],
        p_r=qp[L.QPRES],
        rhoe_r=qp[L.QREINT],
        gamc_r=qaux[L.QGAMC],
        csmall=jnp.maximum(SMALL, SMALL * jnp.maximum(c, c_m)),
        cavg=0.5 * (c + c_m),
    )


def riemannus(ri: RiemannInputs, small_dens, small_pres) -> GodunovState:
    """Colella-Glaz-Ferguson two-shock solver (riemann_solvers.H:599)."""
    wsmall = small_dens * ri.csmall
    wl = jnp.maximum(wsmall, jnp.sqrt(jnp.abs(ri.gamc_l * ri.p_l * ri.rho_l)))
    wr = jnp.maximum(wsmall, jnp.sqrt(jnp.abs(ri.gamc_r * ri.p_r * ri.rho_r)))

    wwinv = 1.0 / (wl + wr)
    pstar = ((wr * ri.p_l + wl * ri.p_r) + wl * wr * (ri.un_l - ri.un_r)) * wwinv
    ustar = ((wl * ri.un_l + wr * ri.un_r) + (ri.p_l - ri.p_r)) * wwinv
    pstar = jnp.maximum(pstar, small_pres)

    # symmetry preservation: tiny ustar -> 0
    ustar = jnp.where(
        jnp.abs(ustar) < SMALLU * 0.5 * (jnp.abs(ri.un_l) + jnp.abs(ri.un_r)),
        0.0,
        ustar,
    )

    sgnm = jnp.sign(ustar)
    fp = 0.5 * (1.0 + sgnm)
    fm = 0.5 * (1.0 - sgnm)

    ro = jnp.maximum(small_dens, fp * ri.rho_l + fm * ri.rho_r)
    uo = fp * ri.un_l + fm * ri.un_r
    po = fp * ri.p_l + fm * ri.p_r
    reo = fp * ri.rhoe_l + fm * ri.rhoe_r
    gamco = fp * ri.gamc_l + fm * ri.gamc_r

    roinv = 1.0 / ro
    co = jnp.maximum(ri.csmall, jnp.sqrt(jnp.abs(gamco * po * roinv)))
    co2inv = 1.0 / (co * co)

    ut = fp * ri.ut_l + fm * ri.ut_r
    utt = fp * ri.utt_l + fm * ri.utt_r

    drho = (pstar - po) * co2inv
    rstar = jnp.maximum(small_dens, ro + drho)
    entho = (reo + po) * roinv * co2inv
    estar = reo + (pstar - po) * entho
    cstar = jnp.maximum(ri.csmall, jnp.sqrt(jnp.abs(gamco * pstar / rstar)))

    spout = co - sgnm * uo
    spin = cstar - sgnm * ustar
    ushock = 0.5 * (spin + spout)
    is_shock = pstar - po > 0.0
    spin = jnp.where(is_shock, ushock, spin)
    spout = jnp.where(is_shock, ushock, spout)

    scr = jnp.where(spout - spin == 0.0, SMALL * ri.cavg, spout - spin)
    frac = jnp.clip(0.5 * (1.0 + (spout + spin) / scr), 0.0, 1.0)

    rho_g = frac * rstar + (1.0 - frac) * ro
    un_g = frac * ustar + (1.0 - frac) * uo
    p_g = frac * pstar + (1.0 - frac) * po
    re_g = frac * estar + (1.0 - frac) * reo

    # outer state on the interface
    rho_g = jnp.where(spout < 0.0, ro, rho_g)
    un_g = jnp.where(spout < 0.0, uo, un_g)
    p_g = jnp.where(spout < 0.0, po, p_g)
    re_g = jnp.where(spout < 0.0, reo, re_g)
    # star state on the interface
    rho_g = jnp.where(spin >= 0.0, rstar, rho_g)
    un_g = jnp.where(spin >= 0.0, ustar, un_g)
    p_g = jnp.where(spin >= 0.0, pstar, p_g)
    re_g = jnp.where(spin >= 0.0, estar, re_g)

    p_g = jnp.maximum(p_g, small_pres)
    return GodunovState(rho=rho_g, un=un_g, ut=ut, utt=utt, p=p_g, rhoe=re_g, ustar=ustar)


def _wsqge(p, tau, gam, gdot, gmin, gmax, csq, pstar):
    """CG approximate Lagrangian wave speed squared + predicted gamma_e
    across the wave (reference `wsqge`, riemann.H: CG Eq. 31 & 34)."""
    SMLP1 = 1.0e-10
    gstar = (pstar - p) * gdot / (pstar + p) + gam
    gstar = jnp.clip(gstar, gmin, gmax)
    alpha = pstar - (gstar - 1.0) * p / (gam - 1.0)
    alpha = jnp.where(alpha == 0.0, SMLP1 * (pstar + p), alpha)
    beta = pstar + 0.5 * (gstar - 1.0) * (pstar + p)
    wsq = (pstar - p) * beta / (tau * alpha)
    wsq = jnp.where(jnp.abs(pstar - p) < SMLP1 * (pstar + p), csq, wsq)
    wsq = jnp.maximum(wsq, (0.5 * (gam - 1.0) / gam) * csq)
    return wsq, gstar


def riemanncg(ri: RiemannInputs, small_dens, small_pres,
              maxiter=12, cg_tol=1.0e-5) -> GodunovState:
    """The Colella & Glaz (1985) iterative two-shock solver (reference
    `riemanncg`, riemann_solvers.H:227-599): secant iteration on pstar
    with the CG gamma-model wave speeds (`wsqge`), the two-shock estimate
    as the non-convergence fallback (cg_blend=1), and CG contact sampling
    with the interpolated interface gamma_e."""
    WEAKWV = 1.0e-3
    taul = 1.0 / ri.rho_l
    taur = 1.0 / ri.rho_r
    clsql = ri.gamc_l * ri.p_l * ri.rho_l
    clsqr = ri.gamc_r * ri.p_r * ri.rho_r

    # gamma_e built from the interface (rho e) (see reference note)
    gamel = ri.p_l / ri.rhoe_l + 1.0
    gamer = ri.p_r / ri.rhoe_r + 1.0
    gmin = jnp.minimum(jnp.minimum(gamel, gamer), 1.0)
    gmax = jnp.maximum(jnp.maximum(gamel, gamer), 2.0)
    game_bar = 0.5 * (gamel + gamer)
    gamc_bar = 0.5 * (ri.gamc_l + ri.gamc_r)
    gdot = 2.0 * (1.0 - game_bar / gamc_bar) * (game_bar - 1.0)

    wsmall = small_dens * ri.csmall
    wl = jnp.maximum(wsmall, jnp.sqrt(jnp.abs(clsql)))
    wr = jnp.maximum(wsmall, jnp.sqrt(jnp.abs(clsqr)))

    # two-shock initial guess
    pstar = ri.p_l + ((ri.p_r - ri.p_l) - wr * (ri.un_r - ri.un_l)) \
        * wl / (wl + wr)
    pstar = jnp.maximum(pstar, small_pres)
    pstar_two_shock = pstar

    wlsq, _ = _wsqge(ri.p_l, taul, gamel, gdot, gmin, gmax, clsql, pstar)
    wrsq, _ = _wsqge(ri.p_r, taur, gamer, gdot, gmin, gmax, clsqr, pstar)
    pstar_old = pstar
    wl = jnp.sqrt(wlsq)
    wr = jnp.sqrt(wrsq)
    ustar_l = ri.un_l - (pstar - ri.p_l) / wl
    ustar_r = ri.un_r + (pstar - ri.p_r) / wr

    # secant iteration (CG Eq. 18), fixed count with converged masking
    converged = jnp.zeros_like(pstar, dtype=bool)
    for _ in range(max(maxiter, 2)):
        wlsq, _ = _wsqge(ri.p_l, taul, gamel, gdot, gmin, gmax, clsql, pstar)
        wrsq, _ = _wsqge(ri.p_r, taur, gamer, gdot, gmin, gmax, clsqr, pstar)
        wl_i = 1.0 / jnp.sqrt(wlsq)  # inverse wave speeds
        wr_i = 1.0 / jnp.sqrt(wrsq)
        ustar_r_old = ustar_r
        ustar_l_old = ustar_l
        ustar_r_new = ri.un_r - (ri.p_r - pstar) * wr_i
        ustar_l_new = ri.un_l + (ri.p_l - pstar) * wl_i
        dpditer = jnp.abs(pstar_old - pstar)
        zp = jnp.abs(ustar_l_new - ustar_l_old)
        zp = jnp.where(zp - WEAKWV * ri.cavg <= 0.0, dpditer * wl_i, zp)
        zm = jnp.abs(ustar_r_new - ustar_r_old)
        zm = jnp.where(zm - WEAKWV * ri.cavg <= 0.0, dpditer * wr_i, zm)
        denom = dpditer / jnp.maximum(zp + zm, SMALL * ri.cavg)
        pstar_new = jnp.maximum(
            pstar - denom * (ustar_r_new - ustar_l_new), small_pres)
        err = jnp.abs(pstar_new - pstar)
        # freeze converged zones (the reference exits its while loop)
        upd = ~converged
        ustar_l = jnp.where(upd, ustar_l_new, ustar_l)
        ustar_r = jnp.where(upd, ustar_r_new, ustar_r)
        pstar_old = jnp.where(upd, pstar, pstar_old)
        pstar = jnp.where(upd, pstar_new, pstar)
        converged = converged | (err < cg_tol * pstar)

    # cg_blend=1 fallback: revert non-converged zones to the two-shock
    # estimate (riemann_solvers.H:394)
    pstar = jnp.where(converged, pstar, pstar_two_shock)

    wlsq, _ = _wsqge(ri.p_l, taul, gamel, gdot, gmin, gmax, clsql, pstar)
    wrsq, _ = _wsqge(ri.p_r, taur, gamer, gdot, gmin, gmax, clsqr, pstar)
    wl_i = 1.0 / jnp.sqrt(wlsq)
    wr_i = 1.0 / jnp.sqrt(wrsq)
    ustar_r = ri.un_r - (ri.p_r - pstar) * wr_i
    ustar_l = ri.un_l + (ri.p_l - pstar) * wl_i
    ustar = 0.5 * (ustar_l + ustar_r)
    ustar = jnp.where(
        jnp.abs(ustar) < SMALLU * 0.5 * (jnp.abs(ri.un_l) + jnp.abs(ri.un_r)),
        0.0, ustar)

    # contact sampling with the CG gamma model (riemann_solvers.H:460-590)
    fp = jnp.where(ustar > 0.0, 1.0, jnp.where(ustar < 0.0, 0.0, 0.5))
    fm = 1.0 - fp
    ro = fp * ri.rho_l + fm * ri.rho_r
    uo = fp * ri.un_l + fm * ri.un_r
    po = fp * ri.p_l + fm * ri.p_r
    tauo = fp * taul + fm * taur
    gamco = fp * ri.gamc_l + fm * ri.gamc_r
    gameo = fp * gamel + fm * gamer

    ro = jnp.maximum(small_dens, 1.0 / tauo)
    tauo = 1.0 / ro
    co = jnp.maximum(ri.csmall, jnp.sqrt(jnp.abs(gamco * po * tauo)))
    clsq = (co * ro) ** 2
    wosq, gamstar = _wsqge(po, tauo, gameo, gdot, gmin, gmax, clsq, pstar)

    sgnm = jnp.where(ustar < 0.0, -1.0, 1.0)
    wo = jnp.sqrt(wosq)
    dpjmp = pstar - po
    rstar = 1.0 - ro * dpjmp / wosq
    rstar = jnp.maximum(small_dens, ro / rstar)
    cstar = jnp.maximum(ri.csmall, jnp.sqrt(jnp.abs(gamco * pstar / rstar)))

    spout = co - sgnm * uo
    spin = cstar - sgnm * ustar
    ushock = wo * tauo - sgnm * uo
    is_shock = dpjmp >= 0.0
    spin = jnp.where(is_shock, ushock, spin)
    spout = jnp.where(is_shock, ushock, spout)
    frac = 0.5 * (1.0 + (spin + spout) / jnp.maximum(
        jnp.maximum(spout - spin, spin + spout), SMALL * ri.cavg))

    ut = fp * ri.ut_l + fm * ri.ut_r
    utt = fp * ri.utt_l + fm * ri.utt_r

    rho_g = frac * rstar + (1.0 - frac) * ro
    un_g = frac * ustar + (1.0 - frac) * uo
    p_g = frac * pstar + (1.0 - frac) * po
    game_g = frac * gamstar + (1.0 - frac) * gameo

    rho_g = jnp.where(spout < 0.0, ro, rho_g)
    un_g = jnp.where(spout < 0.0, uo, un_g)
    p_g = jnp.where(spout < 0.0, po, p_g)
    game_g = jnp.where(spout < 0.0, gameo, game_g)
    rho_g = jnp.where(spin >= 0.0, rstar, rho_g)
    un_g = jnp.where(spin >= 0.0, ustar, un_g)
    p_g = jnp.where(spin >= 0.0, pstar, p_g)
    game_g = jnp.where(spin >= 0.0, gamstar, game_g)

    p_g = jnp.maximum(p_g, small_pres)
    re_g = p_g / (game_g - 1.0)
    return GodunovState(rho=rho_g, un=un_g, ut=ut, utt=utt, p=p_g,
                        rhoe=re_g, ustar=ustar)


def hll_flux(ri: RiemannInputs, d, layout, small_dens, small_pres,
             coord=CoordSys.CARTESIAN):
    """Einfeldt HLLE flux from interface states (reference `HLL`,
    riemann_solvers.H:817+; used by hybrid_riemann inside shocks).

    The pressure enters the normal momentum flux only where
    `mom_flux_has_p` (reference riemann_solvers.H:932): in the radial
    direction of curvilinear coords, consup applies the pressure gradient
    as a separate source, so including p here would double-count it."""
    L = layout
    cl = jnp.maximum(ri.csmall, jnp.sqrt(jnp.abs(ri.gamc_l * ri.p_l / ri.rho_l)))
    cr = jnp.maximum(ri.csmall, jnp.sqrt(jnp.abs(ri.gamc_r * ri.p_r / ri.rho_r)))
    SL = jnp.minimum(ri.un_l - cl, ri.un_r - cr)
    SR = jnp.maximum(ri.un_l + cl, ri.un_r + cr)
    p_in_mn = 1.0 if mom_flux_has_p(d, coord) else 0.0

    def cons_and_flux(rho, un, ut, utt, p, rhoe):
        E = rhoe + 0.5 * rho * (un**2 + ut**2 + utt**2)
        U = jnp.stack([rho, rho * un, rho * ut, rho * utt, E, rhoe])
        F = jnp.stack([rho * un, rho * un * un + p_in_mn * p, rho * ut * un,
                       rho * utt * un, un * (E + p), un * rhoe])
        return U, F

    UL, FL = cons_and_flux(ri.rho_l, ri.un_l, ri.ut_l, ri.utt_l, ri.p_l, ri.rhoe_l)
    UR, FR = cons_and_flux(ri.rho_r, ri.un_r, ri.ut_r, ri.utt_r, ri.p_r, ri.rhoe_r)
    SLc = jnp.minimum(SL, 0.0)
    SRc = jnp.maximum(SR, 0.0)
    Fh = (SRc * FL - SLc * FR + SLc * SRc * (UR - UL)) / (SRc - SLc)
    return Fh  # rotated order: [rho, mn, mt1, mt2, E, rhoe]


def riemann_hllc(ri: RiemannInputs, small_dens, small_pres) -> GodunovState:
    """HLLC interface state (reference HLLC, `riemann_solvers.H:993`),
    expressed as a sampled state like the CGF solver so the same flux
    assembly applies."""
    cl = jnp.maximum(ri.csmall, jnp.sqrt(jnp.abs(ri.gamc_l * ri.p_l / ri.rho_l)))
    cr = jnp.maximum(ri.csmall, jnp.sqrt(jnp.abs(ri.gamc_r * ri.p_r / ri.rho_r)))

    # wave speed estimates (Batten et al. via two-shock pstar estimate)
    wl = jnp.maximum(small_dens * ri.csmall, jnp.sqrt(jnp.abs(ri.gamc_l * ri.p_l * ri.rho_l)))
    wr = jnp.maximum(small_dens * ri.csmall, jnp.sqrt(jnp.abs(ri.gamc_r * ri.p_r * ri.rho_r)))
    wwinv = 1.0 / (wl + wr)
    pstar = jnp.maximum(small_pres,
                        ((wr * ri.p_l + wl * ri.p_r) + wl * wr * (ri.un_l - ri.un_r)) * wwinv)

    def q_fac(p, gamc):
        r = pstar / p
        return jnp.where(r > 1.0, jnp.sqrt(1.0 + (gamc + 1.0) / (2.0 * gamc) * (r - 1.0)), 1.0)

    sl = ri.un_l - cl * q_fac(ri.p_l, ri.gamc_l)
    sr = ri.un_r + cr * q_fac(ri.p_r, ri.gamc_r)
    sm = (ri.p_r - ri.p_l + ri.rho_l * ri.un_l * (sl - ri.un_l)
          - ri.rho_r * ri.un_r * (sr - ri.un_r)) / (
        ri.rho_l * (sl - ri.un_l) - ri.rho_r * (sr - ri.un_r))

    # star-region states
    def star(rho, un, p, rhoe, s):
        f = rho * (s - un) / (s - sm)
        p_s = p + rho * (un - s) * (un - sm)
        re_s = (rhoe / rho + (sm - un) * (sm + p / (rho * (s - un)))) * f
        return f, p_s, re_s

    rho_ls, p_ls, re_ls = star(ri.rho_l, ri.un_l, ri.p_l, ri.rhoe_l, sl)
    rho_rs, p_rs, re_rs = star(ri.rho_r, ri.un_r, ri.p_r, ri.rhoe_r, sr)

    use_l = sl >= 0.0
    use_ls = (sl < 0.0) & (sm >= 0.0)
    use_rs = (sm < 0.0) & (sr > 0.0)

    def pick(l, ls, rs, r):
        return jnp.where(use_l, l, jnp.where(use_ls, ls, jnp.where(use_rs, rs, r)))

    rho_g = jnp.maximum(small_dens, pick(ri.rho_l, rho_ls, rho_rs, ri.rho_r))
    un_g = pick(ri.un_l, sm, sm, ri.un_r)
    p_g = jnp.maximum(small_pres, pick(ri.p_l, p_ls, p_rs, ri.p_r))
    re_g = pick(ri.rhoe_l, re_ls, re_rs, ri.rhoe_r)
    ut = jnp.where(sm >= 0.0, ri.ut_l, ri.ut_r)
    utt = jnp.where(sm >= 0.0, ri.utt_l, ri.utt_r)
    return GodunovState(rho=rho_g, un=un_g, ut=ut, utt=utt, p=p_g, rhoe=re_g, ustar=sm)


def mom_flux_has_p(d: int, coord: CoordSys) -> bool:
    """Pressure belongs in the momentum flux except in the radial direction
    of curvilinear coordinates (reference `mom_flux_has_p`)."""
    return coord == CoordSys.CARTESIAN or d != 0


def compute_flux(gd: GodunovState, qm, qp, d, layout, coord: CoordSys, bnd_mask=None):
    """Assemble conserved flux [NVAR, faces] + Godunov state [NGDNV, faces]."""
    L = layout
    un = gd.un if bnd_mask is None else gd.un * bnd_mask
    frho = gd.rho * un
    zero = jnp.zeros_like(frho)

    comps = [None] * L.NVAR
    comps[L.URHO] = frho
    im1 = L.momentum_index(d)
    # transverse momentum axes in Castro order
    if d == 0:
        im2, im3 = L.UMY, L.UMZ
    elif d == 1:
        im2, im3 = L.UMX, L.UMZ
    else:
        im2, im3 = L.UMX, L.UMY
    fm1 = frho * un
    if mom_flux_has_p(d, coord):
        fm1 = fm1 + gd.p
    comps[im1] = fm1
    comps[im2] = frho * gd.ut
    comps[im3] = frho * gd.utt

    rhoetot = gd.rhoe + 0.5 * gd.rho * (un * un + gd.ut * gd.ut + gd.utt * gd.utt)
    comps[L.UEDEN] = un * (rhoetot + gd.p)
    comps[L.UEINT] = un * gd.rhoe
    comps[L.UTEMP] = zero
    if L.shock_var:
        comps[L.USHK] = zero

    # passives: upwind on the interface velocity (riemann.cpp:106-135)
    sgnm = jnp.sign(un)
    fp = 0.5 * (1.0 + sgnm)
    fm = 0.5 * (1.0 - sgnm)
    pass_comps_q = list(range(L.QFS, L.QFS + L.nspec)) + (
        list(range(L.QFX, L.QFX + L.naux)) if L.naux > 0 else []
    )
    pass_comps_u = list(range(L.UFS, L.UFS + L.nspec)) + (
        list(range(L.UFX, L.UFX + L.naux)) if L.naux > 0 else []
    )
    for qc, uc in zip(pass_comps_q, pass_comps_u):
        x_int = fp * qm[qc] + fm * qp[qc]
        # when un == 0, average (sgnm==0 -> fp=fm=0.5)
        comps[uc] = frho * x_int
    for i, cpn in enumerate(comps):
        if cpn is None:
            comps[i] = zero
    flux = jnp.stack(comps)

    gcomps = [None] * L.NGDNV
    gcomps[L.GDRHO] = gd.rho
    gd_comp = {0: (L.GDU, L.GDV, L.GDW), 1: (L.GDV, L.GDU, L.GDW),
               2: (L.GDW, L.GDU, L.GDV)}[d]
    gcomps[gd_comp[0]] = un
    gcomps[gd_comp[1]] = gd.ut
    gcomps[gd_comp[2]] = gd.utt
    gcomps[L.GDPRES] = gd.p
    gcomps[L.GDGAME] = gd.p / jnp.maximum(
        gd.rhoe, jnp.finfo(gd.p.dtype).tiny) + 1.0
    for i, cpn in enumerate(gcomps):
        if cpn is None:
            gcomps[i] = zero
    qgdnv = jnp.stack(gcomps)
    return flux, qgdnv


def cmpflx(qm, qp, qaux, d, layout, coord, riemann_solver=0,
           small_dens=1e-200, small_pres=1e-200, bnd_mask=None,
           hybrid_riemann=False, shk=None, use_pallas=False):
    """Riemann solve + flux on every face (reference `cmpflx_plus_godunov`,
    `Source/hydro/riemann.cpp:16`). With hybrid_riemann, faces inside
    detected shocks use the HLLE flux (carbuncle suppression).

    use_pallas routes the pointwise solve through the fused TPU kernel
    (one VMEM pass instead of several XLA fusions)."""
    L = layout
    if (use_pallas and bnd_mask is None and not hybrid_riemann
            and riemann_solver in (0, 2)):
        from castro_tpu.ops.pallas_kernels import cmpflx_pallas

        ax = d
        c = qaux[L.QC]
        g = qaux[L.QGAMC]
        return cmpflx_pallas(qm, qp, shifted(g, -1, ax), g,
                             shifted(c, -1, ax), c, d, layout, coord,
                             riemann_solver, small_dens, small_pres)
    ri = load_inputs(qm, qp, qaux, d, layout, small_dens)
    if riemann_solver == 0:
        gd = riemannus(ri, small_dens, small_pres)
    elif riemann_solver == 1:
        gd = riemanncg(ri, small_dens, small_pres)
    elif riemann_solver == 2:
        gd = riemann_hllc(ri, small_dens, small_pres)
    else:
        raise ValueError(f"riemann_solver={riemann_solver}")
    flux, qgdnv = compute_flux(gd, qm, qp, d, layout, coord, bnd_mask=bnd_mask)

    if hybrid_riemann and shk is not None:
        shk_face = jnp.maximum(shk, shifted(shk, -1, d)) > 0.0
        Fh = hll_flux(ri, d, layout, small_dens, small_pres, coord=coord)
        mom = {0: (L.momentum_index(0), L.UMY, L.UMZ),
               1: (L.UMY, L.UMX, L.UMZ),
               2: (L.UMZ, L.UMX, L.UMY)}[d]
        hyb = flux
        hyb = hyb.at[L.URHO].set(Fh[0])
        hyb = hyb.at[mom[0]].set(Fh[1])
        hyb = hyb.at[mom[1]].set(Fh[2])
        hyb = hyb.at[mom[2]].set(Fh[3])
        hyb = hyb.at[L.UEDEN].set(Fh[4])
        hyb = hyb.at[L.UEINT].set(Fh[5])
        flux = jnp.where(shk_face[None], hyb, flux)
    return flux, qgdnv
