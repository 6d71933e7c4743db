"""CTU transverse corrections (corner coupling).

Behavior matches the reference (`Source/hydro/trans.cpp`):
- `trans_single` (:15/:67): add one transverse flux difference to the
  normal-direction interface states (used by 2D CTU, and the 6
  corner-coupling passes of 3D CTU with cdtdx = dt/(3dx)).
- `trans_final` (:442): add two corner-coupled transverse flux differences
  (3D CTU final pass, cdtdx = dt/(2dx)).

The prim interface state is converted to conserved form, the transverse
flux divergence subtracted, a p-evolution-equation update applied to the
pressure, with the reference's reset ladder: negative-density reset,
optional rhoe rediscretization, fall back to the untouched state.

Face convention: all face arrays registered at i = interface i-1/2.
For the plus state (from cell i) cell_shift=0; for the minus state (from
cell i-1) cell_shift=-1 (reference `d` variable, trans.cpp:90-96).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from castro_tpu.ops.stencil import shifted


def _trans_apply(q_face, cell_shift, n_ax, terms, qaux, layout,
                 small_pres, transverse_reset_density=True,
                 transverse_reset_rhoe=False, use_eos=None,
                 radial_p_fix=None, rad=None):
    """Apply one or two transverse flux-difference corrections.

    terms: list of dicts with keys:
      flux   : [NVAR, grid] face-registered transverse flux
      qe     : [NGDNV, grid] face-registered transverse Godunov state
      t_ax   : transverse spatial axis (grid axis index)
      t_dir  : transverse direction index (0/1/2) for GDU lookup
      cdtdx  : scalar dt factor
      area/vol : optional 2D-RZ metric arrays (area face-registered along
               t_ax, vol cell-registered; hdt weighting used instead of
               cdtdx)
      radial_p_fix : subtract cdtdx*(pgp-pgm) from the radial momentum when
               the radial flux lacks the pressure term (2D RZ,
               trans.cpp:303-306)
      rflux  : [ngroups, grid] face-registered radiation flux (rad only)

    rad: None for pure hydro; else a dict {limiter, closure, fspace_t,
    comov} enabling the RADIATION branches of trans.cpp — the lambda-
    weighted rad pressure on the transverse momentum, the u.lamge work
    term on the energy, the comoving der[g] terms, and the per-group Er
    interface update with QPTOT/QREITOT reassembly (trans.cpp:192-268,
    313-334, 419-436, 676-722 behavior)."""
    L = layout

    def C(arr, t_ax=None, t_off=0):
        """Register an array at the state's cell: shift by cell_shift along
        the normal axis (+ optional transverse face offset)."""
        out = arr
        comp_off = out.ndim - len(q_face.shape[1:])  # leading comp axes
        if t_off:
            out = shifted(out, t_off, comp_off + t_ax)
        if cell_shift:
            out = shifted(out, cell_shift, comp_off + n_ax)
        return out

    rho = q_face[L.QRHO]
    u = q_face[L.QU]
    v = q_face[L.QV]
    w = q_face[L.QW]
    reint = q_face[L.QREINT]
    p = q_face[L.QPRES]

    rr = rho
    ru, rv, rw = rho * u, rho * v, rho * w
    ekin = 0.5 * rho * (u * u + v * v + w * w)
    re = reint + ekin

    drr = 0.0
    dru = 0.0
    drv = 0.0
    drw = 0.0
    dre_tot = 0.0
    dreint = 0.0
    dp = 0.0
    dpass = {}
    pass_q = list(range(L.QFS, L.QFS + L.nspec)) + (
        list(range(L.QFX, L.QFX + L.naux)) if L.naux > 0 else []
    )
    pass_u = list(range(L.UFS, L.UFS + L.nspec)) + (
        list(range(L.UFX, L.UFX + L.naux)) if L.naux > 0 else []
    )
    for qc in pass_q:
        dpass[qc] = 0.0

    # with radiation the p-evolution equation uses the GAS gamma_1
    # (trans.cpp:216-222)
    gamc = C(qaux[L.QGAMCG if rad is not None else L.QGAMC])
    ngr = L.ngroups if rad is not None else 0
    if rad is not None:
        lam_c = [C(qaux[L.QLAMS + g]) for g in range(ngr)]
        ern = [q_face[L.QRAD + g] for g in range(ngr)]
        dmom = [0.0, 0.0, 0.0]   # per-direction lambda-grad-Er momentum
        dre_rad = 0.0
        dern = [0.0] * ngr

    for t in terms:
        F = t["flux"]
        qe = t["qe"]
        t_ax = t["t_ax"]
        cdtdx = t["cdtdx"]
        # 2D-RZ metric: `area` is face-registered along t_ax, `vol` is
        # cell-registered; both broadcastable 1D radial profiles
        if t.get("area") is not None:
            area_lo = C(t["area"], t_ax=t_ax, t_off=0)
            area_hi = C(t["area"], t_ax=t_ax, t_off=1)
            volinv = 1.0 / C(t["vol"])
        else:
            area_lo = area_hi = volinv = None

        def dflux(comp):
            flo = C(F[comp], t_ax=t_ax, t_off=0)
            fhi = C(F[comp], t_ax=t_ax, t_off=1)
            if volinv is not None:
                return t["hdt"] * (area_hi * fhi - area_lo * flo) * volinv
            return cdtdx * (fhi - flo)

        gdu_comp = (L.GDU, L.GDV, L.GDW)[t["t_dir"]]
        pgm = C(qe[L.GDPRES], t_ax=t_ax, t_off=0)
        pgp = C(qe[L.GDPRES], t_ax=t_ax, t_off=1)
        ugm = C(qe[gdu_comp], t_ax=t_ax, t_off=0)
        ugp = C(qe[gdu_comp], t_ax=t_ax, t_off=1)

        if volinv is not None:
            dup = area_hi * pgp * ugp - area_lo * pgm * ugm
            du = area_hi * ugp - area_lo * ugm
        else:
            dup = pgp * ugp - pgm * ugm
            du = ugp - ugm
        pav = 0.5 * (pgp + pgm)

        drr = drr + dflux(L.URHO)
        dru = dru + dflux(L.UMX)
        drv = drv + dflux(L.UMY)
        drw = drw + dflux(L.UMZ)
        dre_tot = dre_tot + dflux(L.UEDEN)
        dreint = dreint + dflux(L.UEINT) + (
            (t["hdt"] * pav * du * volinv) if volinv is not None else (cdtdx * pav * du)
        )
        if volinv is not None:
            dp = dp + t["hdt"] * (dup + pav * du * (gamc - 1.0)) * volinv
        else:
            dp = dp + cdtdx * (dup + pav * du * (gamc - 1.0))
        for qc, uc in zip(pass_q, pass_u):
            dpass[qc] = dpass[qc] + dflux(uc)

        if t.get("radial_p_fix", False):
            dru = dru + cdtdx * (pgp - pgm)

        if rad is not None:
            # RADIATION transverse terms (trans.cpp:192-268). We apply the
            # lambda grad-Er momentum term to the TRANSVERSE direction's
            # momentum (matching the 2D branch and trans_final; the
            # reference 3D trans_single adds it to UMX unconditionally —
            # vestigial, normalized here).
            from castro_tpu.ops.rad_hydro import edd_factor as _edf

            # dmom/dre_rad/dern are ADDED to the conserved interface state
            # (reference sign convention: dmom = -cdtdx lamge, etc.)
            rF = t["rflux"]
            uav = 0.5 * (ugp + ugm)
            for g in range(ngr):
                ergm = C(qe[L.GDERADS + g], t_ax=t_ax, t_off=0)
                ergp = C(qe[L.GDERADS + g], t_ax=t_ax, t_off=1)
                lamge = lam_c[g] * (ergp - ergm)
                luge = uav * lamge
                if volinv is not None and t["t_dir"] == 0:
                    # RZ radial transverse: area-weighted form
                    # (trans.cpp:315-321)
                    dmom[0] = dmom[0] - 0.5 * t["hdt"] * (
                        area_hi + area_lo) * lamge * volinv
                else:
                    dmom[t["t_dir"]] = dmom[t["t_dir"]] - cdtdx * lamge
                dre_rad = dre_rad - cdtdx * luge
                eddf = _edf(lam_c[g], rad["limiter"], rad["closure"])
                f1 = 0.5 * (1.0 - eddf)
                if rad["fspace_t"] == 1 and rad["comov"]:
                    der = cdtdx * uav * f1 * (ergp - ergm)
                elif rad["fspace_t"] == 2:
                    der = cdtdx * f1 * 0.5 * (ergp + ergm) * (ugm - ugp)
                else:  # mixed frame
                    der = cdtdx * luge
                rflo = C(rF[g], t_ax=t_ax, t_off=0)
                rfhi = C(rF[g], t_ax=t_ax, t_off=1)
                if volinv is not None:
                    dern[g] = dern[g] - t["hdt"] * (
                        area_hi * rfhi - area_lo * rflo) * volinv + der
                else:
                    dern[g] = dern[g] - cdtdx * (rfhi - rflo) + der

    rrnew = rr - drr
    runew = ru - dru
    rvnew = rv - drv
    rwnew = rw - drw
    renew = re - dre_tot
    if rad is not None:
        runew = runew + dmom[0]
        rvnew = rvnew + dmom[1]
        rwnew = rwnew + dmom[2]
        renew = renew + dre_rad
        ernew = [ern[g] + dern[g] for g in range(ngr)]

    # negative-density reset (trans.cpp:355-372)
    bad = (rrnew < 0.0) if transverse_reset_density else jnp.zeros_like(rr, dtype=bool)
    rrnew = jnp.where(bad, rr, rrnew)
    runew = jnp.where(bad, ru, runew)
    rvnew = jnp.where(bad, rv, rvnew)
    rwnew = jnp.where(bad, rw, rwnew)
    renew = jnp.where(bad, re, renew)

    out = q_face
    out = out.at[L.QRHO].set(rrnew)
    rhoinv = 1.0 / rrnew
    out = out.at[L.QU].set(runew * rhoinv)
    out = out.at[L.QV].set(rvnew * rhoinv)
    out = out.at[L.QW].set(rwnew * rhoinv)

    rhoeken = 0.5 * (runew**2 + rvnew**2 + rwnew**2) * rhoinv
    reint_new = renew - rhoeken
    if transverse_reset_rhoe:
        reint_new = jnp.where(reint_new <= 0.0, reint - dreint, reint_new)
    # fall back to the untouched interface value if still non-positive
    reint_new = jnp.where(reint_new <= 0.0, reint, reint_new)
    reint_new = jnp.where(bad, reint, reint_new)
    out = out.at[L.QREINT].set(reint_new)

    pnew = jnp.where(bad, p, jnp.maximum(p - dp, small_pres))
    out = out.at[L.QPRES].set(pnew)

    for qc in pass_q:
        comp = rr * q_face[qc] - dpass[qc]
        out = out.at[qc].set(jnp.where(bad, q_face[qc], comp / rrnew))

    if rad is not None:
        # per-group Er + total-pressure/energy reassembly
        # (trans.cpp:419-436, 843-857)
        ptot = out[L.QPRES]
        reitot = out[L.QREINT]
        for g in range(ngr):
            er_g = jnp.where(bad, ern[g], ernew[g])
            out = out.at[L.QRAD + g].set(er_g)
            ptot = ptot + lam_c[g] * er_g
            reitot = reitot + er_g
        out = out.at[L.QPTOT].set(ptot)
        out = out.at[L.QREITOT].set(reitot)

    if use_eos is not None:
        # transverse_use_eos=1 (reference edge_util.cpp
        # reset_edge_state_thermo): recompute the interface (p, rho e)
        # thermodynamically from (rho, e, X) after the corrections
        xn = out[L.QFS: L.QFS + L.nspec]
        es = use_eos.re(rho=out[L.QRHO],
                        e=jnp.maximum(out[L.QREINT] / out[L.QRHO], 1e-300),
                        xn=xn)
        out = out.at[L.QREINT].set(out[L.QRHO] * es.e)
        out = out.at[L.QPRES].set(jnp.maximum(es.p, small_pres))
    return out


def _term_bundle(terms, qaux, n_ax, cell_shift, layout, radial_fix_cdtdx=None):
    """Precompute the summed transverse bundle (dflux [NVAR], dreint_extra,
    dp) registered at the target state's cell (for the fused Pallas apply).
    Cartesian-only (no RZ area weighting)."""
    L = layout
    import jax.numpy as jnp

    def C(arr, t_ax=None, t_off=0):
        out = arr
        comp_off = out.ndim - (qaux.ndim - 1)
        if t_off:
            out = shifted(out, t_off, comp_off + t_ax)
        if cell_shift:
            out = shifted(out, cell_shift, comp_off + n_ax)
        return out

    gamc = C(qaux[L.QGAMC])
    dflux = 0.0
    dre = 0.0
    dp = 0.0
    for t in terms:
        F, qe, t_ax, cdtdx = t["flux"], t["qe"], t["t_ax"], t["cdtdx"]
        gdu_comp = (L.GDU, L.GDV, L.GDW)[t["t_dir"]]
        dflux = dflux + cdtdx * (C(F, t_ax=t_ax, t_off=1) - C(F, t_ax=t_ax))
        pgm = C(qe[L.GDPRES], t_ax=t_ax)
        pgp = C(qe[L.GDPRES], t_ax=t_ax, t_off=1)
        ugm = C(qe[gdu_comp], t_ax=t_ax)
        ugp = C(qe[gdu_comp], t_ax=t_ax, t_off=1)
        dup = pgp * ugp - pgm * ugm
        du = ugp - ugm
        pav = 0.5 * (pgp + pgm)
        dre = dre + cdtdx * pav * du
        dp = dp + cdtdx * (dup + pav * du * (gamc - 1.0))
        if t.get("radial_p_fix", False):
            dflux = dflux.at[L.UMX].add(cdtdx * (pgp - pgm))
    return dflux, dre, dp


def trans_single(qm, qp, flux_t, qe_t, qaux, n_dir, t_dir, cdtdx, layout,
                 small_pres, reset_density=True, reset_rhoe=False,
                 geom_terms: Optional[dict] = None, radial_p_fix=False,
                 hdt=None, use_pallas=False, use_eos=None,
                 rflux_t=None, rad=None):
    """Single transverse correction of both interface states
    (reference `trans_single`, trans.cpp:15)."""
    if use_pallas and geom_terms is None and not radial_p_fix \
            and rad is None:
        from castro_tpu.ops.pallas_kernels import trans_apply_pallas

        term = {"flux": flux_t, "qe": qe_t, "t_ax": t_dir, "t_dir": t_dir,
                "cdtdx": cdtdx}
        out = []
        for q_face, cshift in ((qp, 0), (qm, -1)):
            df, dre, dp = _term_bundle([term], qaux, n_dir, cshift, layout)
            out.append(trans_apply_pallas(q_face, df, dre, dp, layout,
                                          small_pres, reset_density,
                                          reset_rhoe))
        return out[1], out[0]
    n_ax, t_ax = n_dir, t_dir
    base = {
        "flux": flux_t,
        "qe": qe_t,
        "t_ax": t_ax,
        "t_dir": t_dir,
        "cdtdx": cdtdx,
        "hdt": hdt,
        "radial_p_fix": radial_p_fix,
        "rflux": rflux_t,
    }
    if geom_terms:
        base.update(geom_terms)  # keys: area (face-reg along t_ax), vol

    qpo = _trans_apply(qp, 0, n_ax, [base], qaux, layout, small_pres,
                       reset_density, reset_rhoe, use_eos=use_eos, rad=rad)
    qmo = _trans_apply(qm, -1, n_ax, [base], qaux, layout, small_pres,
                       reset_density, reset_rhoe, use_eos=use_eos, rad=rad)
    return qmo, qpo


def trans_final(qm, qp, flux_t1, qe_t1, flux_t2, qe_t2, qaux,
                n_dir, t1_dir, t2_dir, cdtdx_t1, cdtdx_t2, layout,
                small_pres, reset_density=True, reset_rhoe=False,
                use_pallas=False, use_eos=None,
                rflux_t1=None, rflux_t2=None, rad=None):
    """Double transverse correction (reference `trans_final`, trans.cpp:442)."""
    if use_pallas and rad is None:
        from castro_tpu.ops.pallas_kernels import trans_apply_pallas

        terms_p = [
            {"flux": flux_t1, "qe": qe_t1, "t_ax": t1_dir, "t_dir": t1_dir,
             "cdtdx": cdtdx_t1},
            {"flux": flux_t2, "qe": qe_t2, "t_ax": t2_dir, "t_dir": t2_dir,
             "cdtdx": cdtdx_t2},
        ]
        out = []
        for q_face, cshift in ((qp, 0), (qm, -1)):
            df, dre, dp = _term_bundle(terms_p, qaux, n_dir, cshift, layout)
            out.append(trans_apply_pallas(q_face, df, dre, dp, layout,
                                          small_pres, reset_density,
                                          reset_rhoe))
        return out[1], out[0]
    terms = [
        {"flux": flux_t1, "qe": qe_t1, "t_ax": t1_dir, "t_dir": t1_dir,
         "cdtdx": cdtdx_t1, "hdt": None, "rflux": rflux_t1},
        {"flux": flux_t2, "qe": qe_t2, "t_ax": t2_dir, "t_dir": t2_dir,
         "cdtdx": cdtdx_t2, "hdt": None, "rflux": rflux_t2},
    ]
    qpo = _trans_apply(qp, 0, n_dir, terms, qaux, layout, small_pres,
                       reset_density, reset_rhoe, use_eos=use_eos, rad=rad)
    qmo = _trans_apply(qm, -1, n_dir, terms, qaux, layout, small_pres,
                       reset_density, reset_rhoe, rad=rad)
    return qmo, qpo
