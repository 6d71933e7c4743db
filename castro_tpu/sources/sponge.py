"""Sponge: velocity damping in radius/density/pressure bands
(reference `Source/sources/Castro_sponge.cpp`): smooth ramp between
lower/upper bounds, timescale tau, optional target velocity."""

from __future__ import annotations

import math

import jax.numpy as jnp


def _ramp(x, lo, hi):
    """0 below lo, 1 above hi, smooth-cosine between (reference sponge
    factor)."""
    t = (x - lo) / jnp.maximum(hi - lo, 1e-300)
    t = jnp.clip(t, 0.0, 1.0)
    return 0.5 * (1.0 - jnp.cos(math.pi * t))


class SpongeSource:
    name = "sponge"

    def __init__(self, params, geom, layout, ng):
        self.p = params.castro
        self.geom = geom
        self.layout = layout
        self.ng = ng

    def __call__(self, sim, u, q, qaux, t, dt, ctx=None):
        L = self.layout
        c = self.p
        geom = ctx.geom if ctx is not None else self.geom
        fac = jnp.zeros_like(u[L.URHO])

        if c.sponge_upper_radius > 0.0:
            r = geom.radius(self.ng)
            r = jnp.broadcast_to(r, u[L.URHO].shape)
            fac = jnp.maximum(fac, _ramp(r, c.sponge_lower_radius,
                                         c.sponge_upper_radius))
        if c.sponge_lower_density > 0.0:
            # density sponge: full strength BELOW lower_density
            fac = jnp.maximum(fac, 1.0 - _ramp(u[L.URHO], c.sponge_upper_density,
                                               c.sponge_lower_density))
        if c.sponge_lower_pressure > 0.0:
            fac = jnp.maximum(fac, 1.0 - _ramp(q[L.QPRES], c.sponge_upper_pressure,
                                               c.sponge_lower_pressure))

        tau = c.sponge_timescale if c.sponge_timescale > 0.0 else dt
        rho = u[L.URHO]
        target = (c.sponge_target_x_velocity, c.sponge_target_y_velocity,
                  c.sponge_target_z_velocity)
        src = jnp.zeros_like(u)
        e_src = 0.0
        for d in range(3):
            mom = u[(L.UMX, L.UMY, L.UMZ)[d]]
            f = -fac / tau * (mom - rho * target[d])
            if c.sponge_implicit:
                # implicit damping: equivalent source for the update
                f = f / (1.0 + fac * dt / tau)
            src = src.at[(L.UMX, L.UMY, L.UMZ)[d]].set(f)
            e_src = e_src + (mom / rho) * f
        src = src.at[L.UEDEN].set(e_src)
        return src
