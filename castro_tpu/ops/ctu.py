"""The CTU (corner transport upwind) unsplit Godunov hydro update.

Behavior matches the reference driver `construct_ctu_hydro_source`
(`Source/hydro/Castro_ctu_hydro.cpp:17-1528`):

  ctoprim -> flatten -> shock detect -> src_to_prim -> PPM trace per dim ->
  dim-by-dim Riemann + transverse corrections (2D: 2 passes; 3D: full
  corner coupling, 12 Riemann solves) -> artificial viscosity -> species
  flux normalization -> conservative update (consup) with p div(u) and the
  curvilinear radial pressure-gradient term.

TPU-first design: the whole pipeline is one traced XLA program over
full-shape grown arrays; no tiling/MFIter — XLA fuses the chain, and the
hot inner pieces can be swapped for Pallas kernels without changing this
orchestration.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from castro_tpu.geometry import CoordSys, Geometry
from castro_tpu.ops import advection_util as au
from castro_tpu.ops.flatten import uflatten
from castro_tpu.ops.riemann import cmpflx, mom_flux_has_p
from castro_tpu.ops.stencil import shifted
from castro_tpu.ops.trace_ppm import trace_ppm
from castro_tpu.ops.trans import trans_final, trans_single
from castro_tpu.ops.fill import SYMMETRY, SLIPWALL, NOSLIPWALL


class HydroConfig(NamedTuple):
    """Static hydro knobs (subset of castro.* params used by the CTU chain)."""

    use_flattening: bool = True
    difmag: float = 0.1
    riemann_solver: int = 0
    small_dens: float = 1e-200
    small_pres: float = 1e-200
    small_ener: float = 1e-200
    transverse_reset_density: bool = True
    transverse_reset_rhoe: bool = False
    ppm_type: int = 1
    use_shock_var: bool = False
    shock_threshold: float = 2.0 / 3.0
    hybrid_riemann: bool = False
    use_pslope: bool = False
    plm_iorder: int = 2
    pslope_cutoff_density: float = -1.0e20
    use_pallas: bool = False
    hybrid_hydro: bool = False
    limit_fluxes_on_small_dens: bool = False
    speed_limit: float = 0.0
    cfl: float = 0.8
    lo_bc: Tuple[int, ...] = (0, 0, 0)
    hi_bc: Tuple[int, ...] = (0, 0, 0)
    ng: int = 4
    # mesh axis name sharding each spatial dim (None = unsharded); when set,
    # wall-face masks become shard-position-aware
    mesh_axes: Tuple[Optional[str], ...] = (None, None, None)


def _bnd_masks(grid_shape, dim, ng, lo_bc, hi_bc, dtype, mesh_axes):
    """Per-direction face masks zeroing interface velocity on symmetry/wall
    domain faces (reference bnd_fac, `riemann.cpp:55-61`). Under shard_map
    the mask applies only on shards owning the domain edge."""
    from jax import lax

    masks = []
    wall = (SYMMETRY, SLIPWALL, NOSLIPWALL)
    for d in range(dim):
        lo_wall = lo_bc[d] in wall
        hi_wall = hi_bc[d] in wall
        if not (lo_wall or hi_wall):
            masks.append(None)
            continue
        n = grid_shape[d]
        shape = [1] * dim
        shape[d] = n
        name = mesh_axes[d] if d < len(mesh_axes) else None

        def onehot_mask(pos):
            m = np.ones(n, dtype=np.float64)
            m[pos] = 0.0
            return jnp.asarray(m.reshape(shape), dtype=dtype)

        if name is None:
            m = np.ones(n, dtype=np.float64)
            if lo_wall:
                m[ng] = 0.0
            if hi_wall:
                m[n - ng] = 0.0
            masks.append(jnp.asarray(m.reshape(shape), dtype=dtype))
        else:
            idx = lax.axis_index(name)
            sz = lax.axis_size(name)
            m = jnp.ones(tuple(shape), dtype=dtype)
            if lo_wall:
                m = m * jnp.where(idx == 0, onehot_mask(ng), 1.0)
            if hi_wall:
                m = m * jnp.where(idx == sz - 1, onehot_mask(n - ng), 1.0)
            masks.append(m)
    return masks


def _dloga(geom: Geometry, ng: int):
    """d(ln A)/dx for the radial direction in curvilinear coords
    (reference dloga metric used by trace_ppm geometry source)."""
    if geom.coord == CoordSys.CARTESIAN:
        return None
    r = geom.cell_centers(0, ng)
    if geom.coord == CoordSys.CYLINDRICAL:
        return 1.0 / r
    return 2.0 / r  # spherical


def ctu_hydro(u, q, qaux, srcQ, dt, geom: Geometry, layout, cfg: HydroConfig,
              div_node=None, fold_update_dt=None, trans_eos=None):
    """Compute the CTU hydro update.

    All inputs are grown arrays (ng ghost cells), ghost-filled.
    Returns (hydro_src [NVAR,...] = -div(F) + geometric terms, so that
    u_new = u + dt*hydro_src; fluxes per dim [NVAR faces]; qe per dim
    [NGDNV faces]; shk shock flag).
    Interior validity: the central (n - 0) cells; ghost margin garbage.
    """
    L = layout
    dim = L.dim
    dx = geom.dx
    grid_shape = q.shape[1:]
    dtype = q.dtype

    if cfg.use_flattening:
        if cfg.use_pallas and dim == 3:
            from castro_tpu.ops.pallas_kernels import flatten_pallas

            flatn = flatten_pallas(q, L)
        else:
            flatn = uflatten(q, L)
    else:
        flatn = jnp.ones(grid_shape, dtype)
    need_shk = cfg.use_shock_var or cfg.hybrid_riemann
    shk = au.shock(q, dx, L, cfg.shock_threshold) if need_shk else None
    if div_node is None:
        div_node = au.divu_node(q, dx, L)
    dloga = _dloga(geom, cfg.ng)
    masks = _bnd_masks(grid_shape, dim, cfg.ng, cfg.lo_bc, cfg.hi_bc, dtype,
                       cfg.mesh_axes)

    rz = geom.coord == CoordSys.CYLINDRICAL and dim == 2

    def trace(d):
        if cfg.ppm_type == 0:
            from castro_tpu.ops.trace_plm import trace_plm

            return trace_plm(q, qaux, srcQ, flatn, d, dt, dx[d], L,
                             cfg.small_dens, cfg.small_pres,
                             plm_iorder=cfg.plm_iorder,
                             use_pslope=cfg.use_pslope,
                             pslope_cutoff_density=cfg.pslope_cutoff_density,
                             dloga=dloga)
        if cfg.use_pallas and dim == 3 and dloga is None:
            from castro_tpu.ops.pallas_kernels import trace_ppm_pallas

            flatn_arr = flatn if cfg.use_flattening else \
                jnp.ones(grid_shape, dtype)
            return trace_ppm_pallas(q, qaux, srcQ, flatn_arr, d, dt, dx[d],
                                    L, cfg.small_dens, cfg.small_pres,
                                    cfg.small_ener)
        return trace_ppm(q, qaux, srcQ, flatn, d, dt, dx[d], L,
                         cfg.small_dens, cfg.small_pres, cfg.small_ener,
                         dloga=dloga)

    def solve(qm, qp, d):
        return cmpflx(qm, qp, qaux, d, L, geom.coord,
                      riemann_solver=cfg.riemann_solver,
                      small_dens=cfg.small_dens, small_pres=cfg.small_pres,
                      bnd_mask=masks[d],
                      hybrid_riemann=cfg.hybrid_riemann, shk=shk,
                      use_pallas=cfg.use_pallas)

    # 3D fused fast path: trace + the 1D Riemann chained in one kernel
    # per direction (the traced states feed their 1D solve in VMEM)
    fused_trace1d = None
    if (dim == 3 and cfg.use_pallas and not cfg.hybrid_riemann
            and cfg.riemann_solver in (0, 2) and cfg.ppm_type != 0
            and dloga is None):
        from castro_tpu.ops.pallas_kernels import trace_ppm_pallas

        flatn_arr = flatn if cfg.use_flattening else \
            jnp.ones(grid_shape, dtype)
        res = [trace_ppm_pallas(
            q, qaux, srcQ, flatn_arr, d_, dt, dx[d_], L,
            cfg.small_dens, cfg.small_pres, cfg.small_ener,
            fuse_riemann=dict(coord=geom.coord,
                              riemann_solver=cfg.riemann_solver,
                              bnd_mask=masks[d_]))
            for d_ in range(3)]
        states = [(r[0], r[1]) for r in res]
        fused_trace1d = [(r[2], r[3]) for r in res]
    else:
        states = [trace(d) for d in range(dim)]

    fused_hsrc = None  # set by the 3D fused path when consup is folded

    if dim == 1:
        fluxes_qe = [solve(states[0][0], states[0][1], 0)]

    elif dim == 2:
        # 1D fluxes from the normal predictor states
        f0 = solve(states[0][0], states[0][1], 0)
        f1 = solve(states[1][0], states[1][1], 1)

        hdt = 0.5 * dt
        if rz:
            geom_r = {"area": geom.face_area(0, cfg.ng), "vol": geom.volume(cfg.ng)}
            geom_z = {"area": geom.face_area(1, cfg.ng), "vol": geom.volume(cfg.ng)}
        else:
            geom_r = geom_z = None

        # correct x-states with y-fluxes and vice versa (reference 2D pass,
        # Castro_ctu_hydro.cpp:575-696)
        qxm, qxp = trans_single(
            states[0][0], states[0][1], f1[0], f1[1], qaux, 0, 1,
            hdt / dx[1], L, cfg.small_pres,
            cfg.transverse_reset_density, cfg.transverse_reset_rhoe,
            geom_terms=geom_z, hdt=hdt, use_pallas=cfg.use_pallas,
            use_eos=trans_eos)
        qym, qyp = trans_single(
            states[1][0], states[1][1], f0[0], f0[1], qaux, 1, 0,
            hdt / dx[0], L, cfg.small_pres,
            cfg.transverse_reset_density, cfg.transverse_reset_rhoe,
            geom_terms=geom_r, hdt=hdt,
            radial_p_fix=rz and not mom_flux_has_p(0, geom.coord),
            use_pallas=cfg.use_pallas, use_eos=trans_eos)
        fluxes_qe = [solve(qxm, qxp, 0), solve(qym, qyp, 1)]

    else:
        # 3D full corner coupling (reference Castro_ctu_hydro.cpp:700-1150)
        third = dt / 3.0
        hdt = 0.5 * dt
        use_fused = (cfg.use_pallas and not cfg.hybrid_riemann
                     and cfg.riemann_solver in (0, 2))
        if use_fused:
            # every face stage (1D, corner-coupled, final) runs as ONE
            # VMEM pass: transverse bundles, the m/p trans-apply ladder,
            # and the Riemann solve never round-trip through HBM
            from castro_tpu.ops.pallas_kernels import ctu_face_pallas

            def fused_solve(qm_s, qp_s, terms, n, terms2=None,
                            consup=None):
                return ctu_face_pallas(
                    qm_s, qp_s, qaux, n, terms, L, geom.coord,
                    cfg.riemann_solver, cfg.small_dens, cfg.small_pres,
                    cfg.transverse_reset_density, cfg.transverse_reset_rhoe,
                    bnd_mask=masks[n], terms2=terms2, consup=consup)

            if fused_trace1d is not None:
                # the trace kernels already emitted the 1D fluxes
                # (trace + Riemann in one VMEM pass)
                f1d = fused_trace1d
            else:
                f1d = [fused_solve(states[d][0], states[d][1], [], d)
                       for d in range(3)]
            fint = {}
            for n in range(3):
                t1, t2 = [t for t in range(3) if t != n]

                def term(t):
                    return {"flux": f1d[t][0], "qe": f1d[t][1],
                            "t_dir": t, "cdtdx": third / dx[t]}

                # both corner-coupling stages with normal n share one
                # HBM read of (qm, qp, qaux) — paired into one kernel
                fint[(n, t1)], fint[(n, t2)] = fused_solve(
                    states[n][0], states[n][1], [term(t1)], n,
                    terms2=[term(t2)])
            want_consup = (
                geom.coord == CoordSys.CARTESIAN
                and not cfg.limit_fluxes_on_small_dens
                and cfg.speed_limit <= 0.0)
            fluxes_qe = []
            fused_hsrc = jnp.zeros_like(u) if want_consup else None
            for n in range(3):
                t1, t2 = [d for d in range(3) if d != n]
                terms = [
                    {"flux": fint[(t1, t2)][0], "qe": fint[(t1, t2)][1],
                     "t_dir": t1, "cdtdx": hdt / dx[t1]},
                    {"flux": fint[(t2, t1)][0], "qe": fint[(t2, t1)][1],
                     "t_dir": t2, "cdtdx": hdt / dx[t2]},
                ]
                if not want_consup:
                    fluxes_qe.append(fused_solve(
                        states[n][0], states[n][1], terms, n))
                    continue
                # fold direction n's consup pass (av + species normalize
                # + flux divergence + pdivu, hsrc accumulated via buffer
                # aliasing) onto the final solve — the flux/qe never
                # round-trip through HBM before their conservative
                # update. Dims whose block layout cannot host the fold
                # (chunked z) run the standalone consup kernel in the
                # same 0,1,2 accumulation order.
                from castro_tpu.ops.pallas_kernels import (
                    consup_pallas, face_consup_fusable)

                fin = fold_update_dt if n == 2 else None
                if face_consup_fusable(L, grid_shape, n, qaux.shape[0],
                                       masks[n] is not None, q.dtype):
                    fq, fused_hsrc = fused_solve(
                        states[n][0], states[n][1], terms, n,
                        consup=dict(hsrc=fused_hsrc, div_node=div_node,
                                    u=u, difmag=cfg.difmag, dx=dx,
                                    finalize_dt=fin))
                    fluxes_qe.append(fq)
                else:
                    fq = fused_solve(states[n][0], states[n][1], terms, n)
                    gdu = fq[1][(L.GDU, L.GDV, L.GDW)[n]]
                    fused_hsrc, fl = consup_pallas(
                        fused_hsrc, fq[0], fq[1][L.GDPRES], gdu,
                        div_node, u, n, L, cfg.difmag, dx,
                        finalize_dt=fin)
                    fluxes_qe.append((fl, fq[1]))
        else:
            f1d = [solve(states[d][0], states[d][1], d) for d in range(3)]
            # corner-coupled states q{n}|{t}
            cc = {}
            for n in range(3):
                for t in range(3):
                    if t == n:
                        continue
                    cc[(n, t)] = trans_single(
                        states[n][0], states[n][1], f1d[t][0], f1d[t][1],
                        qaux, n, t, third / dx[t], L, cfg.small_pres,
                        cfg.transverse_reset_density,
                        cfg.transverse_reset_rhoe,
                        use_pallas=cfg.use_pallas, use_eos=trans_eos)

            # intermediate fluxes F^{d|t} from q{d}|{t}
            fint = {}
            for (n, t), (qm_c, qp_c) in cc.items():
                fint[(n, t)] = solve(qm_c, qp_c, n)

            # final states: q{n} corrected by F^{t1|t2} and F^{t2|t1}
            fluxes_qe = []
            for n in range(3):
                t1, t2 = [d for d in range(3) if d != n]
                qm_f, qp_f = trans_final(
                    states[n][0], states[n][1],
                    fint[(t1, t2)][0], fint[(t1, t2)][1],
                    fint[(t2, t1)][0], fint[(t2, t1)][1],
                    qaux, n, t1, t2, hdt / dx[t1], hdt / dx[t2], L,
                    cfg.small_pres, cfg.transverse_reset_density,
                    cfg.transverse_reset_rhoe, use_pallas=cfg.use_pallas,
                    use_eos=trans_eos)
                fluxes_qe.append(solve(qm_f, qp_f, n))

    fluxes = [fq[0] for fq in fluxes_qe]
    qes = [fq[1] for fq in fluxes_qe]

    def _apply_hybrid(target, factor):
        """Add the hybrid-momentum flux divergence (hybrid_hydro=1,
        Castro_hybrid.cpp / hybrid.H compute_hybrid_flux) into `target`
        (hsrc with factor=1, or the folded u+dt*hsrc with factor=dt);
        also records the hybrid rows in `fluxes` for refluxing."""
        from castro_tpu.ops.hybrid import R_MIN, _loc, hybrid_flux

        for d_ in range(dim):
            fr, fl, fp = hybrid_flux(qes[d_], d_, geom, L, cfg.ng)
            for comp, F in ((L.UMR, fr), (L.UML, fl), (L.UMP, fp)):
                div = (F - shifted(F, 1, d_)) / dx[d_]
                target = target.at[comp].add(factor * div)
                fluxes[d_] = fluxes[d_].at[comp].set(F)
        # radial pressure-gradient term on UMR from the face Godunov
        # pressures (Castro_ctu_hydro.cpp:1280-1300)
        loc = _loc(geom, L, cfg.ng, grid_shape, dtype)
        R = jnp.maximum(jnp.sqrt(loc[0] ** 2 + loc[1] ** 2), R_MIN)
        gradp = 0.0
        for d_ in range(min(dim, 2)):
            gdp = qes[d_][L.GDPRES]
            gradp = gradp + (loc[d_] / R) * (
                shifted(gdp, 1, d_) - gdp) / dx[d_]
        target = target.at[L.UMR].add(-factor * gradp)
        return target

    use_hybrid = (cfg.hybrid_hydro and L.hybrid_momentum
                  and geom.coord == CoordSys.CARTESIAN)

    use_fused_consup = (
        dim == 3 and cfg.use_pallas and geom.coord == CoordSys.CARTESIAN
        and not cfg.limit_fluxes_on_small_dens and cfg.speed_limit <= 0.0)
    if use_fused_consup:
        # av + species normalize + flux divergence + pdivu per direction,
        # accumulated into hsrc via buffer aliasing (one VMEM pass per
        # dim); with fold_update_dt the final pass emits u + dt*hsrc
        # directly. The fused-face path already folded consup onto the
        # final solves (fused_hsrc) — fluxes there are final too.
        if fused_hsrc is not None:
            hsrc = fused_hsrc
        else:
            from castro_tpu.ops.pallas_kernels import consup_pallas

            hsrc = jnp.zeros_like(u)
            for d in range(dim):
                gdu = qes[d][(L.GDU, L.GDV, L.GDW)[d]]
                fin = fold_update_dt if d == dim - 1 else None
                hsrc, fluxes[d] = consup_pallas(
                    hsrc, fluxes[d], qes[d][L.GDPRES], gdu, div_node, u,
                    d, L, cfg.difmag, dx, finalize_dt=fin)
        if fold_update_dt is None:
            hsrc = hsrc.at[L.UTEMP].set(0.0)
            if cfg.use_shock_var and shk is not None:
                hsrc = hsrc.at[L.USHK].set(
                    (shk - u[L.USHK]) / jnp.maximum(dt, 1e-300))
        elif cfg.use_shock_var and shk is not None:
            hsrc = hsrc.at[L.USHK].set(shk)
        if use_hybrid:
            hsrc = _apply_hybrid(
                hsrc, 1.0 if fold_update_dt is None else fold_update_dt)
        return hsrc, fluxes, qes, shk

    # artificial viscosity + positivity flux limiters + species flux
    # normalization (reference flux-clean block, Castro_ctu_hydro.cpp:1150)
    for d in range(dim):
        fluxes[d] = au.apply_av(fluxes[d], d, div_node, u, L, cfg.difmag, dx)
        if cfg.limit_fluxes_on_small_dens:
            fluxes[d] = au.limit_hydro_fluxes_on_small_dens(
                fluxes[d], d, u, q, geom, L, dt, cfg.cfl, cfg.small_dens,
                cfg.ng)
        if cfg.speed_limit > 0.0:
            fluxes[d] = au.limit_hydro_fluxes_on_large_vel(
                fluxes[d], d, u, q, geom, L, dt, cfg.cfl, cfg.speed_limit,
                cfg.ng)
        fluxes[d] = au.normalize_species_fluxes(fluxes[d], L)

    # conservative update (reference consup_hydro, Castro_ctu.cpp:12).
    # Always multiply fluxes by the RATIO area/volume (~1/dx): in cgs 3D
    # the product area*flux reaches ~1e42 and overflows float32 (the
    # production TPU dtype) if formed before the volume division.
    vol = geom.volume(cfg.ng)
    volinv = 1.0 / vol
    hsrc = jnp.zeros_like(u)
    pdivu = jnp.zeros(grid_shape, dtype)
    for d in range(dim):
        area = geom.face_area(d, cfg.ng)
        # area is face-registered only along the radial axis in curvilinear
        # coords; for Cartesian it broadcasts. face hi = shifted(-index +1)
        av_lo = area * volinv
        if geom.coord != CoordSys.CARTESIAN and d == 0:
            # radial faces: area varies along the face axis; the hi face
            # needs area at i+1 (volume stays the cell's own)
            av_hi = shifted(area, 1, d) * volinv
        else:
            av_hi = av_lo
        hsrc = hsrc + (av_lo * fluxes[d]
                       - av_hi * shifted(fluxes[d], 1, 1 + d))

        gdu = qes[d][(L.GDU, L.GDV, L.GDW)[d]]
        gdp = qes[d][L.GDPRES]
        pdivu = pdivu + 0.5 * (shifted(gdp, 1, d) + gdp) * (
            shifted(gdu, 1, d) * av_hi - gdu * av_lo)

    hsrc = hsrc.at[L.UEINT].add(-pdivu)
    hsrc = hsrc.at[L.UTEMP].set(0.0)

    if not mom_flux_has_p(0, geom.coord):
        gdp0 = qes[0][L.GDPRES]
        hsrc = hsrc.at[L.UMX].add(-(shifted(gdp0, 1, 0) - gdp0) / dx[0])

    if cfg.use_shock_var and shk is not None:
        # USHK is set, not fluxed (consup_hydro n==USHK branch)
        hsrc = hsrc.at[L.USHK].set((shk - u[L.USHK]) / jnp.maximum(dt, 1e-300))

    if use_hybrid:
        hsrc = _apply_hybrid(hsrc, 1.0)
    if fold_update_dt is not None:
        hsrc = u + fold_update_dt * hsrc
    return hsrc, fluxes, qes, shk
