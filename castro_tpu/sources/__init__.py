"""Source-term framework.

Reference: ordered source list thermo/diff/hybrid/grav/rot/sponge/ext/geom
(`Source/driver/Castro.H:100-118`), old-time sources from S^n and
time-centered new-time correctors
(`Source/sources/Castro_sources.cpp:123,185`).

Each source is a callable (sim, u, q, qaux, t, dt) -> src[NVAR, grown grid].
The driver applies dt*S_old during the hydro step (and traces it into the
interface states via src_to_prim) and then the corrector
0.5*dt*(S_new - S_old) after (do_new_sources)."""

from __future__ import annotations

import jax.numpy as jnp

from castro_tpu.sources.gravity_src import GravitySource
from castro_tpu.sources.sponge import SpongeSource
from castro_tpu.sources.rotation_src import RotationSource
from castro_tpu.sources.diffusion_src import DiffusionSource
from castro_tpu.sources.geom_src import GeomSource
from castro_tpu.sources.thermo_src import ThermoSource


def build_sources(params, geom, layout, ng, ext_src=None):
    """Assemble the active source list from params (reference
    Castro::read_params toggles)."""
    srcs = []
    c = params.castro
    if c.do_thermal_diffusion or c.diffuse_temp:
        srcs.append(DiffusionSource(params, geom, layout, ng))
    if c.do_grav:
        from castro_tpu.gravity import Gravity

        srcs.append(GravitySource(Gravity(params, geom, layout, ng)))
    if c.do_rotation:
        srcs.append(RotationSource(params, geom, layout, ng))
    if c.do_sponge:
        srcs.append(SpongeSource(params, geom, layout, ng))
    if c.hybrid_hydro and layout.hybrid_momentum:
        # geometric source on the radial momentum: (1/rho) L^2/R^3
        # (Castro_hybrid.cpp construct_old/new_hybrid_source)
        from castro_tpu.ops.hybrid import hybrid_geom_source

        def hybrid_src(sim, u, q, qaux, t, dt, ctx=None):
            g = ctx.geom if ctx is not None else sim.geom
            return hybrid_geom_source(u, g, sim.layout, sim.ng)

        hybrid_src.name = "hybrid"
        srcs.append(hybrid_src)
    if c.add_ext_src and ext_src is not None:
        srcs.append(ext_src)
    from castro_tpu.geometry import CoordSys

    if geom.coord == CoordSys.CYLINDRICAL and geom.dim == 2:
        srcs.append(GeomSource(params, geom, layout, ng))
    if params.castro.time_integration_method in (2,) and False:
        # the MOL path applies pdivu through its Godunov states; the
        # explicit thermo source is available for problem use
        srcs.append(ThermoSource(params, geom, layout, ng))
    return srcs


def pad_to_grown(arr, ng, dim):
    """Edge-pad an interior array to the grown shape (sources only need
    NUM_GROW_SRC=3 valid ghosts; edge clamp is the outflow-consistent
    default, problem fills may refine)."""
    pads = [(0, 0)] * (arr.ndim - dim) + [(ng, ng)] * dim
    return jnp.pad(arr, pads, mode="edge")
