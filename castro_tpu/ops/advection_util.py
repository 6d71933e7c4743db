"""Hydro support kernels: cons<->prim, shock detection, divergence,
artificial viscosity, species-flux normalization.

Reference: `Source/hydro/advection_util.cpp` (ctoprim :27, shock :204,
divu :367, apply_av :483, normalize_species_fluxes :578) — re-expressed as
whole-array XLA ops over grown fields.
"""

from __future__ import annotations

import jax.numpy as jnp

from castro_tpu.ops.stencil import shifted


def ctoprim(u, layout, eos, small_dens=1e-200, small_temp=1e-200):
    """Conserved -> primitive (+ aux thermodynamics).

    Returns (q[NQ,...], qaux[NQAUX,...]). Assumes `u` has been cleaned
    (positive rho, consistent UEINT) — reference `ctoprim`,
    `advection_util.cpp:27`.
    """
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
    qaux = qaux.at[L.QGAMC].set(es.gam1)
    qaux = qaux.at[L.QC].set(es.cs)
    qaux = qaux.at[L.QDPDR].set(es.dpdr_e)
    qaux = qaux.at[L.QDPDE].set(es.dpde)
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
