"""State cleaning: density floors, species normalization, dual-energy
reset, temperature computation.

Reference: `Castro::clean_state` (`Source/driver/Castro.cpp:4238`),
`enforce_min_density`, `normalize_species` (:2902), `reset_internal_energy`
+ `computeTemp` (:3575), dual-energy parameters eta1/eta2
(`Docs/source/FlowChart.rst:89-107`).
"""

from __future__ import annotations

import jax.numpy as jnp


def enforce_min_density(u, layout, small_dens, small_temp, eos):
    """Floor density; zones reset to small_dens get zero velocity and
    small_temp internal energy (reference density_reset_method=1 analog)."""
    L = layout
    rho = u[L.URHO]
    bad = rho < small_dens
    any_shape = rho.shape

    rho_new = jnp.where(bad, small_dens, rho)
    u = u.at[L.URHO].set(rho_new)
    for c in (L.UMX, L.UMY, L.UMZ):
        u = u.at[c].set(jnp.where(bad, 0.0, u[c]))
    # species: keep mass fractions, rescale to new density
    xn = u[L.UFS : L.UFS + L.nspec] / jnp.where(bad, rho, rho_new)[None]
    xn = jnp.where(bad[None], 1.0 / L.nspec, xn)
    u = u.at[L.UFS : L.UFS + L.nspec].set(xn * rho_new[None])
    es = eos.rt(rho=rho_new, T=jnp.full(any_shape, small_temp, u.dtype), xn=xn)
    u = u.at[L.UEINT].set(jnp.where(bad, rho_new * es.e, u[L.UEINT]))
    u = u.at[L.UEDEN].set(jnp.where(bad, rho_new * es.e, u[L.UEDEN]))
    return u


def normalize_species(u, layout, small_x=1e-30):
    """Clip mass fractions to [small_x, 1] and renormalize to sum 1
    (reference `Castro::normalize_species`, Castro.cpp:2902)."""
    L = layout
    if L.nspec == 0:
        return u
    rho = u[L.URHO]
    rx = jnp.clip(u[L.UFS : L.UFS + L.nspec], small_x * rho[None], rho[None])
    s = jnp.sum(rx, axis=0)
    return u.at[L.UFS : L.UFS + L.nspec].set(rx * (rho / s)[None])


def reset_internal_energy(u, layout, eos, dual_energy_eta2=1e-4,
                          small_temp=1e-200):
    """Dual-energy: sync UEINT from UEDEN-KE when trustworthy; rescue
    non-positive UEINT with the small_temp energy
    (reference `reset_internal_energy`)."""
    L = layout
    rho = u[L.URHO]
    ke = 0.5 * (u[L.UMX] ** 2 + u[L.UMY] ** 2 + u[L.UMZ] ** 2) / rho
    rho_eint = u[L.UEDEN] - ke

    eint = jnp.where(
        (rho_eint > 0.0) & (rho_eint / jnp.maximum(u[L.UEDEN], 1e-300) > dual_energy_eta2),
        rho_eint,
        u[L.UEINT],
    )

    # rescue: non-positive internal energy -> small_temp
    xn = u[L.UFS : L.UFS + L.nspec] / rho[None]
    es_small = eos.rt(rho=rho, T=jnp.full(rho.shape, small_temp, u.dtype), xn=xn)
    rescue = eint <= 0.0
    eint = jnp.where(rescue, rho * es_small.e, eint)

    u = u.at[L.UEINT].set(eint)
    u = u.at[L.UEDEN].set(jnp.where(rescue, eint + ke, u[L.UEDEN]))
    return u


def compute_temp(u, layout, eos, small_temp=1e-200):
    """T from (rho, e, X) (reference `Castro::computeTemp`, Castro.cpp:3575)."""
    L = layout
    rho = u[L.URHO]
    e = u[L.UEINT] / rho
    xn = u[L.UFS : L.UFS + L.nspec] / rho[None]
    es = eos.re(rho=rho, e=e, xn=xn)
    T = jnp.maximum(es.T, small_temp)
    return u.at[L.UTEMP].set(T)


def enforce_speed_limit(u, layout, speed_limit):
    """Cap |v| at castro.speed_limit, removing the corresponding kinetic
    energy (reference Castro::enforce_speed_limit, Castro.cpp:3050)."""
    L = layout
    rho = u[L.URHO]
    rhoinv = 1.0 / rho
    v2 = 0.0
    for UM in (L.UMX, L.UMY, L.UMZ):
        v2 = v2 + (u[UM] * rhoinv) ** 2
    v = jnp.sqrt(v2)
    fac = jnp.where(v > speed_limit, speed_limit / jnp.maximum(v, 1e-300),
                    1.0)
    ke_old = 0.5 * rho * v2
    for UM in (L.UMX, L.UMY, L.UMZ):
        u = u.at[UM].multiply(fac)
    u = u.at[L.UEDEN].add(-(ke_old - ke_old * fac * fac))
    return u


def clean_state(u, layout, eos, small_dens=1e-200, small_temp=1e-200,
                dual_energy_eta2=1e-4, do_normalize_species=True,
                speed_limit=0.0):
    """Full ladder (reference `Castro::clean_state`, Castro.cpp:4238).

    Fused single-pass form of the enforce_min_density -> speed_limit ->
    normalize_species -> reset_internal_energy -> computeTemp ladder: all
    components are computed then stacked ONCE, instead of ~15 whole-array
    `.at[].set` updates (each a full HBM copy on TPU). Math is identical
    to the step-by-step functions above (parity-tested)."""
    L = layout
    rho0 = u[L.URHO]
    bad = rho0 < small_dens
    rho = jnp.where(bad, small_dens, rho0)
    mom = [jnp.where(bad, 0.0, u[c]) for c in (L.UMX, L.UMY, L.UMZ)]

    # species after the density reset (mass fractions kept, bad zones even)
    if L.nspec > 0:
        xn = u[L.UFS: L.UFS + L.nspec] / jnp.where(bad, rho0, rho)[None]
        xn = jnp.where(bad[None], 1.0 / L.nspec, xn)
        es_floor = eos.rt(rho=rho, T=jnp.full(rho.shape, small_temp, u.dtype),
                          xn=xn)
    else:
        xn = jnp.zeros((0,) + rho.shape, u.dtype)
        es_floor = eos.rt(rho=rho, T=jnp.full(rho.shape, small_temp, u.dtype),
                          xn=xn)
    ueint = jnp.where(bad, rho * es_floor.e, u[L.UEINT])
    ueden = jnp.where(bad, rho * es_floor.e, u[L.UEDEN])

    if speed_limit > 0.0:
        rhoinv = 1.0 / rho
        v2 = sum((m * rhoinv) ** 2 for m in mom)
        v = jnp.sqrt(v2)
        fac = jnp.where(v > speed_limit,
                        speed_limit / jnp.maximum(v, 1e-300), 1.0)
        ke_old = 0.5 * rho * v2
        mom = [m * fac for m in mom]
        ueden = ueden - (ke_old - ke_old * fac * fac)

    if do_normalize_species and L.nspec > 0:
        rx = jnp.clip(xn * rho[None], 1e-30 * rho[None], rho[None])
        s = jnp.sum(rx, axis=0)
        rxn = rx * (rho / s)[None]
        xn2 = rxn / rho[None]
    else:
        rxn = xn * rho[None]
        xn2 = xn

    # dual-energy reset (reference reset_internal_energy)
    ke = 0.5 * (mom[0] ** 2 + mom[1] ** 2 + mom[2] ** 2) / rho
    rho_eint = ueden - ke
    eint = jnp.where(
        (rho_eint > 0.0)
        & (rho_eint / jnp.maximum(ueden, 1e-300) > dual_energy_eta2),
        rho_eint, ueint)
    es_small = eos.rt(rho=rho, T=jnp.full(rho.shape, small_temp, u.dtype),
                      xn=xn2)
    rescue = eint <= 0.0
    eint = jnp.where(rescue, rho * es_small.e, eint)
    ueden = jnp.where(rescue, eint + ke, ueden)

    es = eos.re(rho=rho, e=eint / rho, xn=xn2)
    T = jnp.maximum(es.T, small_temp)

    comps = [None] * L.NVAR
    comps[L.URHO] = rho
    comps[L.UMX], comps[L.UMY], comps[L.UMZ] = mom
    comps[L.UEINT] = eint
    comps[L.UEDEN] = ueden
    comps[L.UTEMP] = T
    for i in range(L.nspec):
        comps[L.UFS + i] = rxn[i]
    for i, cval in enumerate(comps):
        if cval is None:
            comps[i] = u[i]
    return jnp.stack(comps)


def update_hybrid_momenta(u, layout, geom, ng):
    """Keep the hybrid momenta (radial/angular/perpendicular about the
    domain center, reference `Source/hydro/hybrid.H:1-162`
    linear_to_hybrid) consistent with the linear momenta.

    Round-1 parity note: the reference can optionally advect these
    independently for exact angular-momentum conservation
    (hybrid_hydro); here they are derived fields refreshed every clean."""
    L = layout
    if not L.hybrid_momentum:
        return u
    dim = L.dim
    center = [0.5 * (geom.prob_lo[d] + geom.prob_hi[d]) for d in range(dim)]
    shape = u.shape[1:]
    x = jnp.broadcast_to(geom.cell_centers(0, ng) - center[0], shape)
    y = (jnp.broadcast_to(geom.cell_centers(1, ng) - center[1], shape)
         if dim > 1 else jnp.zeros(shape, u.dtype))
    px, py, pz = u[L.UMX], u[L.UMY], u[L.UMZ]
    R = jnp.maximum(jnp.sqrt(x * x + y * y), 1e-30)
    u = u.at[L.UMR].set((x * px + y * py) / R)
    u = u.at[L.UML].set(x * py - y * px)
    u = u.at[L.UMP].set(pz)
    return u
