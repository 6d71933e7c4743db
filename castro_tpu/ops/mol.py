"""Method-of-lines hydro: advective RHS without characteristic tracing.

Reference: `construct_mol_hydro_source` (`Source/hydro/Castro_mol_hydro.cpp:
20-767`) — PLM/PPM interface states with NO dt-dependence, Riemann solve per
face, flux divergence. Used by the true-SDC integrator (`do_advance_sdc`)
and as a plain RK integrator path (castro.do_ctu=0 analog).

The 4th-order (McCorquodale-Colella) variant is TODO; this is the 2nd-order
path (sdc_order=2)."""

from __future__ import annotations

import jax.numpy as jnp

from castro_tpu.geometry import CoordSys
from castro_tpu.ops import advection_util as au
from castro_tpu.ops.flatten import uflatten
from castro_tpu.ops.riemann import cmpflx, mom_flux_has_p
from castro_tpu.ops.slope import uslope
from castro_tpu.ops.stencil import shifted
from castro_tpu.ops.trace_ppm import _vel_map


def _plm_interface_states(q, flatn, d, layout, order=4):
    """dt-free PLM states: qm[i] = q_{i-1} + slope/2, qp[i] = q_i - slope/2."""
    L = layout
    nq = q.shape[0]
    sl = jnp.stack([uslope(q[c], flatn, d, order) for c in range(nq)])
    qp = q - 0.5 * sl
    qm = shifted(q + 0.5 * sl, -1, 1 + d)
    return qm, qp


def mol_hydro(u, q, qaux, dt_unused, geom, layout, cfg):
    """Advective RHS A(U) = -div F + geometric terms. Returns
    (adv [NVAR,...], fluxes, qes)."""
    L = layout
    dim = L.dim
    dx = geom.dx
    grid_shape = q.shape[1:]
    dtype = q.dtype

    flatn = uflatten(q, L) if cfg.use_flattening else jnp.ones(grid_shape, dtype)
    div_node = au.divu_node(q, dx, L)

    fluxes = []
    qes = []
    for d in range(dim):
        qm, qp = _plm_interface_states(q, flatn, d, L, cfg.plm_iorder * 2)
        f, qe = cmpflx(qm, qp, qaux, d, L, geom.coord,
                       riemann_solver=cfg.riemann_solver,
                       small_dens=cfg.small_dens, small_pres=cfg.small_pres)
        f = au.apply_av(f, d, div_node, u, L, cfg.difmag, dx)
        f = au.normalize_species_fluxes(f, L)
        fluxes.append(f)
        qes.append(qe)

    vol = geom.volume(cfg.ng)
    volinv = 1.0 / vol
    adv = jnp.zeros_like(u)
    pdivu = jnp.zeros(grid_shape, dtype)
    for d in range(dim):
        area = geom.face_area(d, cfg.ng)
        # multiply by the RATIO area/vol (~1/dx): area*flux overflows f32
        # in cgs 3D (see ctu.py consup note)
        av_lo = area * volinv
        av_hi = shifted(area, 1, d) * volinv \
            if (geom.coord != CoordSys.CARTESIAN and d == 0) else av_lo
        adv = adv + (av_lo * fluxes[d]
                     - av_hi * shifted(fluxes[d], 1, 1 + d))
        gdu = qes[d][(L.GDU, L.GDV, L.GDW)[d]]
        gdp = qes[d][L.GDPRES]
        pdivu = pdivu + 0.5 * (shifted(gdp, 1, d) + gdp) * (
            shifted(gdu, 1, d) * av_hi - gdu * av_lo)
    adv = adv.at[L.UEINT].add(-pdivu)
    adv = adv.at[L.UTEMP].set(0.0)
    if not mom_flux_has_p(0, geom.coord):
        gdp0 = qes[0][L.GDPRES]
        adv = adv.at[L.UMX].add(-(shifted(gdp0, 1, 0) - gdp0) / dx[0])
    return adv, fluxes, qes
