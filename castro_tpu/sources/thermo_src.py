"""Thermodynamic source (reference `Source/sources/Castro_thermo.cpp`,
construct_old/new_thermo_source `Castro_sources.H:252-276`): the -p div(u)
term applied as an explicit source when the time integration handles
(rho e) outside the CTU pdivu machinery (MOL / SDC paths)."""

from __future__ import annotations

import jax.numpy as jnp

from castro_tpu.ops.stencil import shifted


class ThermoSource:
    name = "thermo"

    def __init__(self, params, geom, layout, ng):
        self.geom = geom
        self.layout = layout
        self.ng = ng

    def __call__(self, sim, u, q, qaux, t, dt, ctx=None):
        L = self.layout
        div = jnp.zeros_like(u[L.URHO])
        for d in range(L.dim):
            v = q[L.velocity_index(d)]
            div = div + (shifted(v, 1, d) - shifted(v, -1, d)) / (2 * self.geom.dx[d])
        src = jnp.zeros_like(u)
        src = src.at[L.UEINT].set(-q[L.QPRES] * div)
        return src
