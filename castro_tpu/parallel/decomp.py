"""Spatial domain decomposition over a jax.sharding.Mesh.

TPU-native replacement for AMReX BoxArray + DistributionMapping (SURVEY.md
P1/P2): the global interior grid [NVAR, N1, N2, N3] is sharded over mesh
axes; the step runs under shard_map, with halo exchange over ICI
(`castro_tpu/parallel/halo.py`) replacing FillBoundary, physical BCs
applied on edge shards, and ALL physics running through the same
`Simulation._step_impl` as single-device runs — sources (old + new-time
corrector), reactions, clean/fill ordering, and the distributed elliptic
solves (`solvers/multigrid.py` axis_names mode) included. Reductions
(min-rho, NaN, burn-fail) ride `lax.pmin/pmax` (the reference's
`ParallelDescriptor::ReduceReal*`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from castro_tpu.driver.sim import StepCtx
from castro_tpu.parallel.halo import exchange_and_fill, exchange_face, shrink


def spatial_axis_names(sim, mesh: Mesh) -> Tuple[Optional[str], ...]:
    """Mesh axis name for each spatial dim (None if absent or size 1)."""
    names = []
    for d in range(sim.layout.dim):
        cand = sim.params.tpu.mesh_axes[d] if d < len(sim.params.tpu.mesh_axes) else None
        if cand in mesh.axis_names and mesh.shape[cand] > 1:
            names.append(cand)
        else:
            names.append(None)
    return tuple(names)


def state_sharding(sim, mesh: Mesh) -> NamedSharding:
    names = spatial_axis_names(sim, mesh)
    return NamedSharding(mesh, P(None, *names))


def make_step_ctx(sim, names: Tuple[Optional[str], ...],
                  n_loc: Optional[Tuple[int, ...]] = None) -> StepCtx:
    """Build the shard-local StepCtx for use inside shard_map: halo-exchange
    ghost fills, collective reductions, and a position-correct local
    geometry view."""
    L = sim.layout
    ng = sim.ng
    spatial = tuple(n for n in names if n is not None)

    def fill(u_grown, t=0.0):
        return exchange_and_fill(shrink(u_grown, ng, L.dim), L, ng, names,
                                 sim.cfg.lo_bc, sim.cfg.hi_bc,
                                 problem_fill=sim.problem_fill, t=t)

    if spatial:
        pmin = lambda x: lax.pmin(jnp.min(x), spatial)  # noqa: E731
        pany = lambda b: lax.pmax(  # noqa: E731
            jnp.asarray(b, jnp.int32), spatial) > 0
        psum = lambda x: lax.psum(x, spatial)  # noqa: E731
    else:
        pmin, pany, psum = jnp.min, (lambda b: b), (lambda x: x)

    geom = _local_geom(sim, names, n_loc) if n_loc is not None else sim.geom
    return StepCtx(fill=fill, pmin=pmin, pany=pany, psum=psum,
                   geom=geom, axis_names=names)


def _local_geom(sim, names, n_loc):
    """Shard-local geometry view (traced global offsets from axis_index)."""
    ilo = []
    for d in range(sim.layout.dim):
        if names[d] is not None:
            ilo.append(lax.axis_index(names[d]) * n_loc[d])
        else:
            ilo.append(0)
    return sim.geom.local_view(n_loc, tuple(ilo))


def make_sharded_mhd_step(sim, mesh: Mesh, keep_ct: bool = False):
    """Jitted MHD driver step over the mesh (reference: MHD is just Castro
    with USE_MHD under the same MPI domain decomposition,
    `Source/mhd/Castro_mhd.cpp` + SURVEY P1/P2).

    State crosses the boundary WITHOUT ghosts: u [NVAR, N...] and the
    three face fields b[d] [N...] (face i-1/2 registered at cell i; on a
    non-periodic hi domain edge the boundary face is reconstructed by the
    clamp BC, same information content as the single-device fill). The
    full `_mhd_step_impl` — Strang reactions, old/new source corrector,
    CTU-CT or RK2-CT — runs under shard_map with halo-exchange fills for
    both the gas and the face fields.

    Returns step(u, b_tuple, dt, t) -> (u, b_tuple, min_rho, bad).
    keep_ct=True (distributed AMR MHD) additionally returns
    (fluxes, E_tuple, FB_tuple): gas fluxes + edge EMFs + cell-B fluxes,
    all CELL-REGISTERED global interior arrays (entry i holds face/edge
    i-1/2; the global hi planes are reconstructed by the AMR driver's
    wrap/edge padding adapter).
    """
    L = sim.layout
    ng = sim.ng
    dim = L.dim
    names = spatial_axis_names(sim, mesh)
    spec_u = P(None, *names)
    spec_b = P(*names)
    e_keys = {3: (0, 1, 2), 2: (2,), 1: ()}[dim]
    fb_keys = tuple((d, c) for c in range(dim, 3) for d in range(dim))

    def local_step(u_loc, b_loc, dt, t):
        ctx = make_step_ctx(sim, names, n_loc=u_loc.shape[1:])
        ctx.fill_b = lambda b: tuple(
            exchange_face(shrink(bb, ng, L.dim), L.dim, ng, names,
                          sim.cfg.lo_bc, sim.cfg.hi_bc,
                          df=(i if i < L.dim else -1))
            for i, bb in enumerate(b))
        pads_u = [(0, 0)] + [(ng, ng)] * L.dim
        u = jnp.pad(u_loc, pads_u)
        b = tuple(jnp.pad(bb, [(ng, ng)] * L.dim) for bb in b_loc)
        out = sim._mhd_step_impl(u, b, dt, t, ctx=ctx, keep_ct=keep_ct)
        if not keep_ct:
            u_new, b_new, min_rho, bad = out
            return (shrink(u_new, ng, L.dim),
                    tuple(shrink(bb, ng, L.dim) for bb in b_new),
                    min_rho, bad)
        u_new, b_new, min_rho, bad, fint, ct = out
        fluxes = []
        for d in range(dim):
            trim = [slice(None)] * (1 + dim)
            trim[1 + d] = slice(0, fint[d].shape[1 + d] - 1)
            fluxes.append(fint[d][tuple(trim)])
        isl = tuple(slice(ng, s - ng) for s in b[0].shape)
        E = tuple(ct["E"][k][isl] for k in e_keys)
        FB = tuple(ct["FB"][key][isl] for key in fb_keys)
        return (shrink(u_new, ng, L.dim),
                tuple(shrink(bb, ng, L.dim) for bb in b_new),
                min_rho, bad, fluxes, E, FB)

    out_specs = (spec_u, (spec_b,) * 3, P(), P())
    if keep_ct:
        out_specs = out_specs + ([P(None, *names)] * dim,
                                 (spec_b,) * len(e_keys),
                                 (spec_b,) * len(fb_keys))
    mapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(spec_u, (spec_b,) * 3, P(), P()),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0, 1))


def make_sharded_sdc_step(sim, mesh: Mesh):
    """Jitted TRUE-SDC step over the mesh: the node advection evaluations
    and node clean/fills run with halo-exchange ghost fills inside
    shard_map (a composition the reference cannot express at all — its
    SDC solvers "do not support multilevel or AMR",
    Docs/source/FlowChart.rst:593, let alone distribution).

    Maps (u_int, dt, t) -> (u_new_int, min_rho, bad, fluxes) with
    cell-registered global fluxes (the level-0 sharded convention)."""
    L = sim.layout
    ng = sim.ng
    dim = L.dim
    names = spatial_axis_names(sim, mesh)
    spec_u = P(None, *names)

    def local_step(u_loc, dt, t):
        ctx = make_step_ctx(sim, names, n_loc=u_loc.shape[1:])
        pads = [(0, 0)] + [(ng, ng)] * dim
        u = jnp.pad(u_loc, pads)
        u_new, fail, fl = sim.sdc.advance(u, dt, t, keep_fluxes=True,
                                          ctx=ctx)
        inner = [slice(None)] + [slice(ng, -ng)] * dim
        ui = u_new[tuple(inner)]
        min_rho = ctx.pmin(ui[L.URHO])
        bad = ctx.pany(~jnp.isfinite(jnp.sum(ui)) | fail)
        fluxes = []
        for d in range(dim):
            idx = [slice(None)] + [slice(ng, -ng)] * dim
            idx[1 + d] = slice(ng, u.shape[1 + d] - ng)  # cell-registered
            fluxes.append(fl[d][tuple(idx)])
        return shrink(u_new, ng, dim), min_rho, bad, fluxes

    out_fl = [P(None, *names)] * dim
    mapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(spec_u, P(), P()),
        out_specs=(spec_u, P(), P(), out_fl),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def make_sharded_window_step(sim, mesh: Mesh, geom_full):
    """Jitted SHARDED step for an AMR fine window (amr.distribute_fine=1):
    the window's `_step_impl` under shard_map over the mesh, so the
    refined level's FLOPs distribute across devices instead of computing
    replicated (the reference distributes fine-level grids exactly like
    level 0 — the BoxArray/DistributionMapping model; SURVEY P5).

    Maps (u_int_global, dt, t, ilo) -> (u_new_int, min_rho, bad, fluxes)
    with cell-registered global fluxes (the level-0 sharded convention;
    the appended hi plane is never read because the mask boundary sits
    inside the MARGIN ring). Gravity-BC windows (composite Poisson) fall
    back to the replicated path — the Dirichlet face planes would need
    per-shard scattering."""
    L = sim.layout
    ng = sim.ng
    dim = L.dim
    names = spatial_axis_names(sim, mesh)
    spec_u = P(None, *names)

    def local_step(u_loc, dt, t, ilo):
        n_loc = u_loc.shape[1:]
        ctx = make_step_ctx(sim, names, n_loc=n_loc)
        # position-correct window geometry for the LOCAL shard: the
        # window origin ilo plus this shard's offset inside the window
        ilo_loc = list(ilo)
        for d in range(dim):
            if names[d] is not None:
                idx = jax.lax.axis_index(names[d])
                ilo_loc[d] = ilo_loc[d] + idx * n_loc[d]
        geom = geom_full.local_view(n_loc, tuple(ilo_loc))
        ctx.geom = geom
        pads = [(0, 0)] + [(ng, ng)] * dim
        u = jnp.pad(u_loc, pads)
        keep = sim.keep_fluxes
        sim.keep_fluxes = True
        try:
            out = sim._step_impl(u, dt, t, ctx=ctx)
        finally:
            sim.keep_fluxes = keep
        u_new, min_rho, bad = out[0], out[1], out[2]
        fint = out[3]
        fluxes = []
        for d in range(dim):
            trim = [slice(None)] * (1 + dim)
            trim[1 + d] = slice(0, fint[d].shape[1 + d] - 1)
            fluxes.append(fint[d][tuple(trim)])
        return shrink(u_new, ng, dim), min_rho, bad, fluxes

    out_fl = [P(None, *names)] * dim
    mapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(spec_u, P(), P(), P()),
        out_specs=(spec_u, P(), P(), out_fl),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def make_sharded_rad_step(sim, mesh: Mesh, keep_fluxes: bool = False):
    """Jitted radiation driver step over the mesh: the full
    `_rad_step_impl` — hydro advance, Er advection (1-ghost halo exchange
    via ctx.fill_rad), implicit FLD solve through the DISTRIBUTED
    multigrid (axis_names mode) — under shard_map (the reference's
    MPI-decomposed Radiation level solve, `Radiation.cpp` + Hypre's own
    domain decomposition).

    Maps (u_int, Er_int, dt, t, rhs_extra) -> (u_new_int, Er_new, min_rho,
    bad[, hyd_fluxes]). Radiation register fluxes are NOT computed here —
    the AMR driver re-derives them globally with `fld.level_fluxes` on the
    sharded output field."""
    L = sim.layout
    ng = sim.ng
    dim = L.dim
    names = spatial_axis_names(sim, mesh)
    spec_u = P(None, *names)
    mgq = L.ngroups > 1
    spec_er = P(None, *names) if mgq else P(*names)

    def local_step(u_loc, Er_loc, dt, t, rhs_extra):
        ctx = make_step_ctx(sim, names, n_loc=u_loc.shape[1:])

        def fill_rad1(Er, ngr=1):
            # ngr=1 serves the operator-split upwind advection; the
            # characteristic CTU rad chain asks for the full hydro ghost
            # ring (ngr=sim.ng)
            if Er.ndim > dim:
                return jax.vmap(lambda e: exchange_face(
                    e, dim, ngr, names, sim.cfg.lo_bc, sim.cfg.hi_bc))(Er)
            return exchange_face(Er, dim, ngr, names, sim.cfg.lo_bc,
                                 sim.cfg.hi_bc)

        ctx.fill_rad = fill_rad1
        pads = [(0, 0)] + [(ng, ng)] * dim
        u = jnp.pad(u_loc, pads)
        keep = sim.keep_fluxes
        sim.keep_fluxes = keep_fluxes
        try:
            out = sim._rad_step_impl(u, Er_loc, dt, t, ctx=ctx,
                                     rad_rhs_extra=rhs_extra)
        finally:
            sim.keep_fluxes = keep
        u_new, Er_new, min_rho, bad = out[0], out[1], out[2], out[3]
        res = (shrink(u_new, ng, dim), Er_new, min_rho, bad)
        if keep_fluxes:
            fint = out[4]
            fluxes = []
            for d in range(dim):
                trim = [slice(None)] * (1 + dim)
                trim[1 + d] = slice(0, fint[d].shape[1 + d] - 1)
                fluxes.append(fint[d][tuple(trim)])
            res = res + (fluxes,)
        return res

    out_specs = (spec_u, spec_er, P(), P())
    if keep_fluxes:
        out_specs = out_specs + ([P(None, *names)] * dim,)
    mapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(spec_u, spec_er, P(), P(), spec_er),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def make_phased_sharded_step(sim, mesh: Mesh):
    """Build the full-physics step over the mesh as THREE separately
    jitted shard_map programs — Strang half-burn / hydro+sources middle /
    half-burn — chained on device (arrays stay sharded between programs).

    The burn program is compiled ONCE and reused for both halves, and no
    single XLA module contains the whole step: cold compile drops from
    tens of minutes (monolithic full-physics module on CPU) to the sum of
    the small parts. Math is identical to `make_sharded_step` — the same
    `_step_impl` body runs, sliced by its `phase` argument."""
    L = sim.layout
    ng = sim.ng
    names = spatial_axis_names(sim, mesh)
    spec_u = P(None, *names)

    def local_phase(phase):
        def fn(u_loc, dt, t):
            ctx = make_step_ctx(sim, names, n_loc=u_loc.shape[1:])
            pads = [(0, 0)] + [(ng, ng)] * L.dim
            u = jnp.pad(u_loc, pads)
            out = sim._step_impl(u, dt, t, ctx=ctx, phase=phase)
            if phase == "burn":
                return shrink(out[0], ng, L.dim), out[1]
            return (shrink(out[0], ng, L.dim),) + tuple(out[1:3])
        return fn

    out_specs = {"burn": (spec_u, P()), "mid": (spec_u, P(), P())}
    progs = {}
    for phase in ("burn", "mid") if sim.reactor is not None else ("mid",):
        progs[phase] = jax.jit(shard_map(
            local_phase(phase), mesh=mesh,
            in_specs=(spec_u, P(), P()),
            out_specs=out_specs[phase],
            check_vma=False,
        ), donate_argnums=(0,))

    def step(u, dt, t):
        fail = jnp.asarray(False)
        if "burn" in progs:
            u, fail = progs["burn"](u, dt, t)
        u, min_rho, bad = progs["mid"](u, dt, t)
        if "burn" in progs:
            u, fail2 = progs["burn"](u, dt, t + dt)
            fail = fail | fail2
        return u, min_rho, bad | fail

    return step


def make_sharded_step(sim, mesh: Mesh, with_status: bool = True,
                      keep_fluxes: bool = False):
    """Build a jitted whole-level step over the mesh.

    The returned fn maps (u_interior_global, dt, t) -> (u_new, min_rho, bad)
    with u stored WITHOUT ghosts (ghosts are transient inside the shard_map).
    It is the full `Simulation._step_impl` — reactions, old/new source
    corrector, clean/fill — under spatial decomposition.

    keep_fluxes=True additionally returns per-dim CELL-REGISTERED face
    fluxes (global interior shape; face i-1/2 stored at cell i — the
    global hi-domain face plane is dropped) for AMR flux registers: the
    distributed analog of the reference FluxRegister CrseInit
    (`Castro.cpp:2549-2700`).
    """
    L = sim.layout
    ng = sim.ng
    names = spatial_axis_names(sim, mesh)
    spec_u = P(None, *names)

    def local_step(u_loc, dt, t):
        ctx = make_step_ctx(sim, names, n_loc=u_loc.shape[1:])
        pads = [(0, 0)] + [(ng, ng)] * L.dim
        u = jnp.pad(u_loc, pads)  # ghosts filled by the step's ctx.fill
        keep = sim.keep_fluxes
        sim.keep_fluxes = keep_fluxes  # trace-time toggle (jit captures it)
        try:
            out = sim._step_impl(u, dt, t, ctx=ctx)
        finally:
            sim.keep_fluxes = keep
        if keep_fluxes:
            u_new, min_rho, bad = out[0], out[1], out[2]
            # re-derive cell-registered local fluxes is not possible from
            # the trimmed fint; _step_impl's fint along d has n_loc+1 faces
            # (shard-local). Trim the duplicated hi face: global faces are
            # reconstructed cell-registered (face i-1/2 at cell i).
            fint = out[3]
            fluxes = []
            for d in range(L.dim):
                trim = [slice(None)] * (1 + L.dim)
                trim[1 + d] = slice(0, fint[d].shape[1 + d] - 1)
                fluxes.append(fint[d][tuple(trim)])
            return (shrink(u_new, ng, L.dim), min_rho, bad, fluxes)
        u_new, min_rho, bad = out[0], out[1], out[2]
        return shrink(u_new, ng, L.dim), min_rho, bad

    out_fl = [P(None, *names)] * L.dim
    # check_vma=False: Pallas kernels inside the shard inherit no varying-
    # axis metadata; the decomposition-invariance tests are the correctness
    # oracle for the collective structure instead
    mapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(spec_u, P(), P()),
        out_specs=((spec_u, P(), P(), out_fl) if keep_fluxes
                   else (spec_u, P(), P())),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))
