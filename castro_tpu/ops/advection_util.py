"""Hydro support kernels: cons<->prim, shock detection, divergence,
artificial viscosity, species-flux normalization.

Reference: `Source/hydro/advection_util.cpp` (ctoprim :27, shock :204,
divu :367, apply_av :483, normalize_species_fluxes :578) — re-expressed as
whole-array XLA ops over grown fields.
"""

from __future__ import annotations

import jax.numpy as jnp

from castro_tpu.ops.stencil import shifted


def ctoprim(u, layout, eos, small_dens=1e-200, small_temp=1e-200,
            Er=None, lam=None, rad_limiter=2, rad_closure=3):
    """Conserved -> primitive (+ aux thermodynamics).

    Returns (q[NQ,...], qaux[NQAUX,...]). Assumes `u` has been cleaned
    (positive rho, consistent UEINT) — reference `ctoprim`,
    `advection_util.cpp:27`. With radiation (layout.radiation and Er/lam
    grown arrays [ngroups, grid] given), fills QPTOT/QREITOT/QRAD and the
    total sound speed / gamc in qaux (advection_util.cpp:163-192)."""
    L = layout
    rho = jnp.maximum(u[L.URHO], small_dens)
    rhoinv = 1.0 / rho
    vx = u[L.UMX] * rhoinv
    vy = u[L.UMY] * rhoinv
    vz = u[L.UMZ] * rhoinv
    e = jnp.maximum(u[L.UEINT], 1e-200 * rho) * rhoinv
    xn = u[L.UFS : L.UFS + L.nspec] * rhoinv[None]

    es = eos.re(rho=rho, e=e, xn=xn)

    q = jnp.empty((L.NQ,) + rho.shape, dtype=u.dtype)
    q = q.at[L.QRHO].set(rho)
    q = q.at[L.QU].set(vx)
    q = q.at[L.QV].set(vy)
    q = q.at[L.QW].set(vz)
    q = q.at[L.QPRES].set(es.p)
    q = q.at[L.QREINT].set(rho * e)
    q = q.at[L.QTEMP].set(es.T)
    q = q.at[L.QGAME].set(es.p / (rho * e) + 1.0)
    q = q.at[L.QFS : L.QFS + L.nspec].set(xn)
    if L.naux > 0:
        q = q.at[L.QFX : L.QFX + L.naux].set(u[L.UFX : L.UFX + L.naux] * rhoinv[None])

    qaux = jnp.empty((L.NQAUX,) + rho.shape, dtype=u.dtype)
    qaux = qaux.at[L.QDPDR].set(es.dpdr_e)
    qaux = qaux.at[L.QDPDE].set(es.dpde)
    if L.radiation and Er is not None:
        from castro_tpu.ops.rad_hydro import compute_ptot_ctot

        # cast: a problem may hand in f64 Er/lam (x64-built spectra) in
        # an f32 run — scatter would reject the unsafe cast
        q = q.at[L.QRAD:L.QRAD + L.ngroups].set(Er.astype(q.dtype))
        qaux = qaux.at[L.QGAMCG].set(es.gam1)
        qaux = qaux.at[L.QCG].set(es.cs)
        qaux = qaux.at[L.QLAMS:L.QLAMS + L.ngroups].set(
            lam.astype(qaux.dtype))
        lam_list = [lam[g] for g in range(L.ngroups)]
        ptot, ctot, gamc_tot = compute_ptot_ctot(
            lam_list, q, es.cs, L, comoving=True, limiter=rad_limiter,
            closure=rad_closure)
        q = q.at[L.QPTOT].set(ptot)
        q = q.at[L.QREITOT].set(
            q[L.QREINT] + jnp.sum(Er, axis=0))
        qaux = qaux.at[L.QC].set(ctot)
        qaux = qaux.at[L.QGAMC].set(gamc_tot)
    else:
        qaux = qaux.at[L.QGAMC].set(es.gam1)
        qaux = qaux.at[L.QC].set(es.cs)
    return q, qaux


def src_to_prim(q, qaux, src, layout):
    """Conserved source terms -> primitive sources for tracing
    (reference `src_to_prim`, `Source/hydro/Castro_ctu_hydro.cpp:315`)."""
    L = layout
    rho = q[L.QRHO]
    rhoinv = 1.0 / rho
    srcq = jnp.zeros((L.NQ,) + rho.shape, dtype=q.dtype)
    srcq = srcq.at[L.QRHO].set(src[L.URHO])
    srcq = srcq.at[L.QU].set((src[L.UMX] - q[L.QU] * src[L.URHO]) * rhoinv)
    srcq = srcq.at[L.QV].set((src[L.UMY] - q[L.QV] * src[L.URHO]) * rhoinv)
    srcq = srcq.at[L.QW].set((src[L.UMZ] - q[L.QW] * src[L.URHO]) * rhoinv)
    srcq = srcq.at[L.QREINT].set(src[L.UEINT])
    e = q[L.QREINT] * rhoinv
    srcq = srcq.at[L.QPRES].set(
        qaux[L.QDPDE] * (srcq[L.QREINT] - e * srcq[L.QRHO]) * rhoinv
        + qaux[L.QDPDR] * srcq[L.QRHO]
    )
    return srcq


def shock(q, dx, layout, threshold=2.0 / 3.0):
    """Multidimensional shock detector (reference `shock`,
    `advection_util.cpp:204`): flag zones with converging flow and a
    pressure jump above `threshold` relative to the local minimum pressure.
    """
    L = layout
    dim = L.dim
    p = q[L.QPRES]
    div_u = jnp.zeros_like(p)
    for d in range(dim):
        vel = q[L.velocity_index(d)]
        ax = p.ndim - dim + d
        div_u = div_u + 0.5 * (shifted(vel, 1, ax) - shifted(vel, -1, ax)) / dx[d]

    dp2 = jnp.zeros_like(p)
    p_min = p
    for d in range(dim):
        ax = p.ndim - dim + d
        pp, pm = shifted(p, 1, ax), shifted(p, -1, ax)
        dp2 = dp2 + (0.5 * (pp - pm)) ** 2
        p_min = jnp.minimum(p_min, jnp.minimum(pp, pm))
    gradp_dx = jnp.sqrt(dp2)

    return jnp.where((div_u < 0.0) & (gradp_dx / p_min > threshold), 1.0, 0.0)


def divu_node(q, dx, layout):
    """Node-centered velocity divergence for artificial viscosity
    (reference `divu`, `advection_util.cpp:367`). Node (i-1/2,j-1/2,k-1/2)
    is stored at cell index (i,j,k)."""
    L = layout
    dim = L.dim
    out = 0.0
    base_ndim = q.ndim - 1
    for d in range(dim):
        vel = q[L.velocity_index(d)]
        ax = base_ndim - dim + d
        dv = (vel - shifted(vel, -1, ax)) / dx[d]
        # average over the {0,-1} shifts in the other dims (corner nodes)
        for od in range(dim):
            if od == d:
                continue
            oax = base_ndim - dim + od
            dv = 0.5 * (dv + shifted(dv, -1, oax))
        out = out + dv
    return out


def apply_av(flux, d, div_node, u, layout, difmag, dx):
    """Flux-based artificial viscosity (reference `apply_av`,
    `advection_util.cpp:483`): flux += dx*difmag*min(0,div1)*(u_R - u_L)
    on every component except temperature and the shock flag."""
    L = layout
    dim = L.dim
    base_ndim = u.ndim - 1
    ax = base_ndim - dim + d
    # average node divergence over the face's nodes: shifts {0,+1} in other dims
    div1 = div_node
    for od in range(dim):
        if od == d:
            continue
        oax = base_ndim - dim + od
        div1 = 0.5 * (div1 + shifted(div1, 1, oax))
    coeff = difmag * jnp.minimum(div1, 0.0) * dx[d]
    du = u - shifted(u, -1, ax + 1)  # +1: u has leading component axis
    av = coeff[None] * du
    skip = [L.UTEMP] + ([L.USHK] if L.shock_var else [])
    mask = jnp.ones((L.NVAR,) + (1,) * dim, dtype=u.dtype)
    for c in skip:
        mask = mask.at[c].set(0.0)
    return flux + mask * av


def normalize_species_fluxes(flux, layout):
    """Scale species fluxes so they sum to the density flux
    (reference `normalize_species_fluxes`, `advection_util.cpp:578`)."""
    L = layout
    if L.nspec == 0:
        return flux
    sumn = jnp.sum(flux[L.UFS : L.UFS + L.nspec], axis=0)
    fac = jnp.where(sumn != 0.0, flux[L.URHO] / jnp.where(sumn == 0.0, 1.0, sumn), 1.0)
    return flux.at[L.UFS : L.UFS + L.nspec].multiply(fac[None])


def _cell_flux(u, q, d, coord, layout):
    """Cell-centered flux vector in direction d from (conserved, primitive)
    cell states (reference `dflux`, advection_util.H:12); used to build the
    Lax-Friedrichs fallback flux for the positivity limiters."""
    from castro_tpu.ops.riemann import mom_flux_has_p

    L = layout
    v = q[L.velocity_index(d)]
    f = jnp.zeros_like(u)
    f = f.at[L.URHO].set(u[L.URHO] * v)
    f = f.at[L.UMX].set(u[L.UMX] * v)
    f = f.at[L.UMY].set(u[L.UMY] * v)
    f = f.at[L.UMZ].set(u[L.UMZ] * v)
    f = f.at[L.UEDEN].set((u[L.UEDEN] + q[L.QPRES]) * v)
    f = f.at[L.UEINT].set(u[L.UEINT] * v)
    if mom_flux_has_p(d, coord):
        f = f.at[L.momentum_index(d)].add(q[L.QPRES])
    for uc in range(L.UFS, L.UFS + L.nspec):
        f = f.at[uc].set(u[uc] * v)
    if L.naux > 0:
        for uc in range(L.UFX, L.UFX + L.naux):
            f = f.at[uc].set(u[uc] * v)
    return f


def _shift_maybe(a, off, axis):
    """Shift a broadcast-shaped metric array only along non-degenerate axes."""
    return shifted(a, off, axis) if a.shape[axis] > 1 else a


def _lf_setup(flux, d, u, q, geom, layout, dt, cfl, ng):
    """Shared pieces of the Hu-Adams-Shu flux limiters: left/right cell
    states, Lax-Friedrichs flux, and the per-side update coefficients."""
    L = layout
    ax = 1 + d
    uL = shifted(u, -1, ax)
    uR = u
    qL = shifted(q, -1, ax)
    fL = _cell_flux(uL, qL, d, geom.coord, L)
    fR = _cell_flux(uR, q, d, geom.coord, L)
    alpha = 1.0 / L.dim
    dtdx = dt / geom.dx[d]
    fluxLF = 0.5 * (fL + fR + (cfl / dtdx / alpha) * (uL - uR))
    area = geom.face_area(d, ng)
    vol = geom.volume(ng)
    volL = _shift_maybe(vol, -1, d)
    coefR = 2.0 * (dt / alpha) * area / vol
    coefL = 2.0 * (dt / alpha) * area / volL
    return uL, uR, fluxLF, coefL, coefR


def _safe_div(a, b):
    tiny = jnp.finfo(a.dtype).tiny
    return a / jnp.where(jnp.abs(b) < tiny, jnp.where(b < 0, -tiny, tiny), b)


def limit_hydro_fluxes_on_small_dens(flux, d, u, q, geom, layout, dt, cfl,
                                     small_dens, ng):
    """Positivity-preserving flux limiter (Hu, Adams & Shu 2013 as adapted
    by the reference, `advection_util.cpp:662`): blend each face flux toward
    the Lax-Friedrichs flux so no single face update can push a density
    below the (padded) floor; then hard-scale as a backstop."""
    L = layout
    density_floor = small_dens * 1.1 * 2 * L.dim
    uL, uR, fluxLF, coefL, coefR = _lf_setup(flux, d, u, q, geom, layout,
                                             dt, cfl, ng)

    rhoL0 = uL[L.URHO]
    rhoR0 = uR[L.URHO]
    drhoL = coefL * flux[L.URHO]
    drhoR = coefR * flux[L.URHO]
    rhoL = rhoL0 - drhoL
    rhoR = rhoR0 + drhoR

    rhoLF_L = rhoL0 - coefL * fluxLF[L.URHO]
    rhoLF_R = rhoR0 + coefR * fluxLF[L.URHO]
    thetaL = _safe_div(density_floor - rhoLF_L, rhoL - rhoLF_L)
    thetaR = _safe_div(density_floor - rhoLF_R, rhoR - rhoLF_R)
    theta = jnp.where(rhoL < density_floor, thetaL,
                      jnp.where(rhoR < density_floor, thetaR, 1.0))
    theta = jnp.clip(theta, 0.0, 1.0)

    out = (1.0 - theta)[None] * fluxLF + theta[None] * flux
    out = out.at[L.UTEMP].set(0.0)
    if L.shock_var:
        out = out.at[L.USHK].set(0.0)

    # backstop: scale the final flux so the floor cannot be crossed
    drhoR2 = coefR * out[L.URHO]
    drhoL2 = coefL * out[L.URHO]
    scale = jnp.where(
        rhoR0 + drhoR2 < density_floor,
        jnp.abs(_safe_div(density_floor - rhoR0, drhoR2)),
        jnp.where(rhoL0 - drhoL2 < density_floor,
                  jnp.abs(_safe_div(density_floor - rhoL0, drhoL2)), 1.0))
    out = out * scale[None]

    # a side already below the floor: zero the flux and wait for a reset
    bad = (rhoL0 < density_floor) | (rhoR0 < density_floor)
    return jnp.where(bad[None], 0.0, out)


def limit_hydro_fluxes_on_large_vel(flux, d, u, q, geom, layout, dt, cfl,
                                    speed_limit, ng):
    """Velocity analog of the density limiter (reference
    `advection_util.cpp:897`): blend toward Lax-Friedrichs when a face
    update would push |rho u| past rho * speed_limit."""
    if speed_limit <= 0.0:
        return flux
    L = layout
    uL, uR, fluxLF, coefL, coefR = _lf_setup(flux, d, u, q, geom, layout,
                                             dt, cfl, ng)
    lim = speed_limit / (2 * L.dim)

    theta = jnp.ones_like(flux[L.URHO])
    drhoL = coefL * flux[L.URHO]
    rhoL = uL[L.URHO] - drhoL
    drhoR = coefR * flux[L.URHO]
    rhoR = uR[L.URHO] + drhoR
    for UM in (L.UMX, L.UMY, L.UMZ):
        rhouL = jnp.abs(uL[UM] - coefL * flux[UM])
        rhouR = jnp.abs(uR[UM] + coefR * flux[UM])
        rhouLF_L = jnp.abs(uL[UM] - coefL * fluxLF[UM])
        rhouLF_R = jnp.abs(uR[UM] + coefR * fluxLF[UM])
        thL = jnp.abs(_safe_div(rhoL * lim - rhouLF_L, rhouL - rhouLF_L))
        thR = jnp.abs(_safe_div(rhoR * lim - rhouLF_R, rhouR - rhouLF_R))
        th = jnp.where(rhouL > rhoL * lim, thL,
                       jnp.where(rhouR > rhoR * lim, thR, 1.0))
        theta = jnp.minimum(theta, th)
    theta = jnp.clip(theta, 0.0, 1.0)

    out = (1.0 - theta)[None] * fluxLF + theta[None] * flux
    out = out.at[L.UTEMP].set(0.0)
    if L.shock_var:
        out = out.at[L.USHK].set(0.0)
    return out


def max_courant(q, qaux, dt, geom, layout, ng, whole_grid=False):
    """Max interior Courant number over all directions (reference
    `check_for_cfl_violation`, Castro_hydro.cpp:234); > 1 means the CTU
    characteristic tracing was invalid and the step should be retried.

    whole_grid=True skips the interior slicing and reduces over the grown
    array — valid whenever ghost values are wrap/clamp/mirror images of
    interior data (every BC except problem-supplied inflow), and one fused
    reduction on TPU instead of strided-slice passes."""
    from castro_tpu.ops.stencil import interior_slice

    L = layout
    if whole_grid:
        c = qaux[L.QC]
        courant = jnp.zeros_like(c)
        for d in range(L.dim):
            v = q[L.velocity_index(d)]
            courant = jnp.maximum(courant,
                                  (jnp.abs(v) + c) * (dt / geom.dx[d]))
        return jnp.max(courant)
    inner = interior_slice(ng, L.dim)
    c = qaux[L.QC][inner[1:]]
    courant = jnp.zeros_like(c)
    for d in range(L.dim):
        v = q[L.velocity_index(d)][inner[1:]]
        courant = jnp.maximum(courant, (jnp.abs(v) + c) * (dt / geom.dx[d]))
    return jnp.max(courant)
