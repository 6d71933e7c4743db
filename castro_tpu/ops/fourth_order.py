"""Fourth-order finite-volume machinery (McCorquodale & Colella).

Reference: `Source/hydro/fourth_order.cpp` (929 LoC: fourth_interfaces,
states, avg<->center conversions) + `Source/hydro/fourth_center_average.cpp`
+ the MOL assembly in `Castro_mol_hydro.cpp` (sdc_order == 4 branch).

All conversions use the dimensionless second difference
Delta_d a = a_{i+1} - 2 a_i + a_{i-1}; cell-average <-> cell-center and
face-average <-> face-center transforms differ at O(dx^2) by lap/24.
Cartesian only (the reference's 4th-order support is likewise
single-level Cartesian)."""

from __future__ import annotations

import jax.numpy as jnp

from castro_tpu.ops.stencil import shifted


def lap2(a, axis):
    """Second difference along axis (dimensionless Laplacian term)."""
    return shifted(a, 1, axis) - 2.0 * a + shifted(a, -1, axis)


def cell_avg_to_center(a, dim, comp_axes=1):
    """<a> -> a(center): subtract lap/24 over all spatial axes
    (fourth_center_average.cpp compute_lap_term)."""
    out = a
    for d in range(dim):
        out = out - lap2(a, comp_axes + d) / 24.0
    return out


def cell_center_to_avg(a, dim, comp_axes=1):
    out = a
    for d in range(dim):
        out = out + lap2(a, comp_axes + d) / 24.0
    return out


def fourth_interface(a, d, comp_axes=1):
    """Single-valued 4th-order interface average at face i-1/2 @ i:
    a_f = 7/12 (a_{i-1} + a_i) - 1/12 (a_{i-2} + a_{i+1})
    (fourth_order.cpp fourth_interfaces)."""
    ax = comp_axes + d
    return (7.0 / 12.0) * (shifted(a, -1, ax) + a) \
        - (1.0 / 12.0) * (shifted(a, -2, ax) + shifted(a, 1, ax))


def face_avg_to_center(f, d, dim, comp_axes=1):
    """<f>_face -> f(face center): subtract transverse lap/24."""
    out = f
    for t in range(dim):
        if t == d:
            continue
        out = out - lap2(f, comp_axes + t) / 24.0
    return out


def face_center_to_avg_correction(f, d, dim, comp_axes=1):
    """The +lap/24 transverse correction used on fluxes:
    <F> = F(center) + 1/24 sum_t Delta_t F(<q>_face)."""
    out = jnp.zeros_like(f)
    for t in range(dim):
        if t == d:
            continue
        out = out + lap2(f, comp_axes + t) / 24.0
    return out


def fourth_avisc(q, qaux, d, dim, dx, layout, beta=0.3):
    """Face-centered 4th-order artificial viscosity coefficient
    (McCorquodale-Colella Eq. 35-36; fourth_order.cpp:750-845): a face
    divergence with a quadratic switch that vanishes as O(divu^3) in
    smooth flow, so the formal order is preserved."""
    L = layout
    VEL = (L.QU, L.QV, L.QW)
    avis = (q[VEL[d]] - shifted(q[VEL[d]], -1, d)) / dx[d]
    for t in range(dim):
        if t == d:
            continue
        vt = q[VEL[t]]
        term = (shifted(vt, 1, t) - shifted(vt, -1, t)
                + shifted(shifted(vt, 1, t), -1, d)
                - shifted(shifted(vt, -1, t), -1, d))
        avis = avis + 0.25 * term / dx[t]
    c = qaux[L.QC]
    cmin = jnp.minimum(c, shifted(c, -1, d))
    coeff = jnp.minimum(
        1.0, (dx[d] * avis) ** 2 / (beta * cmin * cmin))
    return jnp.where(avis < 0.0, dx[d] * avis * coeff, 0.0)


def mol4_hydro(u_avg, geom, layout, cfg, eos, small_temp):
    """4th-order MOL advective operator A(U) = -div<F> on cell averages.

    Pipeline (Castro_mol_hydro.cpp sdc_order==4 + fourth_order.cpp):
      u_cc = <U> - lap/24           -> q_cc (pointwise ctoprim)
      <q>  = q_cc + lap(q_cc)/24
      per dir: <q>_f (fourth_interfaces), q_f,cc (transverse lap),
      F_cc = F(q_f,cc), <F> = F_cc + lap_t(F(<q>_f))/24,
      A = -(1/dx) d<F>.
    The interface states are single-valued (smooth 4th-order path); where
    the flattening coefficient drops below 1 they are blended toward the
    2nd-order PLM states (simplified analog of limit_fourth_order=1).
    Returns (adv [NVAR,...], fluxes, qes)."""
    from castro_tpu.geometry import CoordSys
    from castro_tpu.ops import advection_util as au
    from castro_tpu.ops.flatten import uflatten
    from castro_tpu.ops.mol import _plm_interface_states
    from castro_tpu.ops.riemann import cmpflx

    L = layout
    dim = L.dim
    assert geom.coord == CoordSys.CARTESIAN, \
        "4th-order MOL is Cartesian-only (matches the reference)"
    dx = geom.dx

    lap_u = jnp.zeros_like(u_avg)
    for d in range(dim):
        lap_u = lap_u + lap2(u_avg, 1 + d)
    u_cc = u_avg - lap_u / 24.0

    q_cc, qaux = au.ctoprim(u_cc, L, eos, cfg.small_dens, small_temp)
    q_avg = cell_center_to_avg(q_cc, dim)

    flatn = (uflatten(q_cc, L) if cfg.use_flattening
             else jnp.ones_like(q_cc[L.QRHO]))
    avisc_coeff = 0.3 * (cfg.difmag / 0.1)

    fluxes = []
    qes = []
    adv = jnp.zeros_like(u_avg)
    for d in range(dim):
        qf_avg = fourth_interface(q_avg, d)
        # blend toward limited PLM states where flattening activates
        qm2, qp2 = _plm_interface_states(q_cc, flatn, d, L, 4)
        w = 0.5 * (flatn + shifted(flatn, -1, d))  # face-registered
        qm_avg = w * qf_avg + (1.0 - w) * qm2
        qp_avg = w * qf_avg + (1.0 - w) * qp2

        qf_cc_m = face_avg_to_center(qm_avg, d, dim)
        qf_cc_p = face_avg_to_center(qp_avg, d, dim)

        F_cc, qe = cmpflx(qf_cc_m, qf_cc_p, qaux, d, L, geom.coord,
                          riemann_solver=cfg.riemann_solver,
                          small_dens=cfg.small_dens,
                          small_pres=cfg.small_pres)
        F_avg_states, _ = cmpflx(qm_avg, qp_avg, qaux, d, L, geom.coord,
                                 riemann_solver=cfg.riemann_solver,
                                 small_dens=cfg.small_dens,
                                 small_pres=cfg.small_pres)
        F = F_cc + face_center_to_avg_correction(F_avg_states, d, dim)

        # 4th-order-preserving artificial viscosity (MC Eq. 35-36)
        avis = fourth_avisc(q_cc, qaux, d, dim, dx, L)
        du = u_avg - shifted(u_avg, -1, 1 + d)
        skip = jnp.ones((L.NVAR,) + (1,) * dim, u_avg.dtype)
        skip = skip.at[L.UTEMP].set(0.0)
        if L.shock_var:
            skip = skip.at[L.USHK].set(0.0)
        F = F + skip * (avisc_coeff * avis)[None] * du
        F = au.normalize_species_fluxes(F, L)
        fluxes.append(F)
        qes.append(qe)
        adv = adv + (F - shifted(F, 1, 1 + d)) / dx[d]

    adv = adv.at[L.UTEMP].set(0.0)
    if L.shock_var:
        adv = adv.at[L.USHK].set(0.0)
    return adv, fluxes, qes
