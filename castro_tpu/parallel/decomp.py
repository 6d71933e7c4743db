"""Spatial domain decomposition over a jax.sharding.Mesh.

TPU-native replacement for AMReX BoxArray + DistributionMapping (SURVEY.md
P1/P2): the global interior grid [NVAR, N1, N2, N3] is sharded over mesh
axes; the step runs under shard_map, with halo exchange over ICI
(`castro_tpu/parallel/halo.py`) replacing FillBoundary, and physical BCs
applied on edge shards.

Restriction (round 1): sharded mode is Cartesian-only (curvilinear metric
arrays are global-position-dependent).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from castro_tpu.geometry import CoordSys
from castro_tpu.ops.advection_util import ctoprim, src_to_prim
from castro_tpu.ops.ctu import ctu_hydro
from castro_tpu.parallel.halo import exchange_and_fill, shrink
from castro_tpu.driver import clean as clean_mod
from castro_tpu.ops.stencil import interior_slice


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


def make_sharded_step(sim, mesh: Mesh, with_status: bool = True):
    """Build a jitted whole-level step over the mesh.

    The returned fn maps (u_interior_global, dt, t) -> (u_new, min_rho, nan)
    with u stored WITHOUT ghosts (ghosts are transient inside the shard_map).
    """
    assert sim.geom.coord == CoordSys.CARTESIAN, "sharded mode: Cartesian only"
    L = sim.layout
    ng = sim.ng
    names = spatial_axis_names(sim, mesh)
    cfg = dataclasses.replace(sim.cfg, mesh_axes=names) if dataclasses.is_dataclass(sim.cfg) \
        else sim.cfg._replace(mesh_axes=names)
    c = sim.params.castro

    spec_u = P(None, *names)

    def local_step(u_loc, dt, t):
        u = exchange_and_fill(u_loc, L, ng, names, cfg.lo_bc, cfg.hi_bc,
                              problem_fill=sim.problem_fill)
        q, qaux = ctoprim(u, L, sim.eos, cfg.small_dens, max(c.small_temp, 1e-200))
        src = None
        if sim.source_fns:
            src = jnp.zeros_like(u)
            for fn in sim.source_fns:
                src = src + fn(sim, u, q, qaux, t, dt)
        srcQ = None if src is None else src_to_prim(q, qaux, src, L)
        hsrc, _, _, _ = ctu_hydro(u, q, qaux, srcQ, dt, sim.geom, L, cfg)
        u_new = u + dt * hsrc
        if src is not None:
            u_new = u_new + dt * src

        inner = interior_slice(ng, L.dim)
        min_rho = jax.lax.pmin(
            jnp.min(u_new[inner][L.URHO]),
            tuple(n for n in names if n is not None)) if any(names) else jnp.min(
            u_new[inner][L.URHO])
        nan_flag = ~jnp.isfinite(jnp.sum(u_new[inner]))
        if any(names):
            nan_flag = jax.lax.pmax(
                nan_flag.astype(jnp.int32),
                tuple(n for n in names if n is not None)) > 0

        u_new = clean_mod.clean_state(
            u_new, L, sim.eos, small_dens=cfg.small_dens,
            small_temp=max(c.small_temp, 1e-200),
            dual_energy_eta2=c.dual_energy_eta2,
            do_normalize_species=bool(c.normalize_species))
        return shrink(u_new, ng, L.dim), min_rho, nan_flag

    mapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(spec_u, P(), P()),
        out_specs=(spec_u, P(), P()),
    )
    return jax.jit(mapped, donate_argnums=(0,))
