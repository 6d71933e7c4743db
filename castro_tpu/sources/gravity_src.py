"""Gravity source terms (reference `Source/gravity/Castro_gravity.cpp`:
construct_old/new_gravity :14,116 + construct_old/new_gravity_source
:234,384).

Momentum: rho*g. Energy: rho*u.g (grav_source_type=2 form; the reference
default type 4 uses mass fluxes for exact conservation — TODO with the
flux-register/AMR work). The old/new time centering comes from the driver's
source-corrector pattern."""

from __future__ import annotations

import jax.numpy as jnp


class GravitySource:
    name = "grav"

    def __init__(self, gravity):
        self.gravity = gravity

    def grav_field(self, sim, u, ctx=None):
        """g[3, grown grid] for the current state."""
        from castro_tpu.ops.stencil import interior_slice
        from castro_tpu.sources import pad_to_grown

        L = sim.layout
        rho_i = u[(L.URHO,) + interior_slice(sim.ng, L.dim, 0)]
        g3, phi = self.gravity.grav_vector(rho_i, ctx)
        return pad_to_grown(g3, sim.ng, L.dim), phi

    def __call__(self, sim, u, q, qaux, t, dt, ctx=None):
        L = sim.layout
        g3, _ = self.grav_field(sim, u, ctx)
        src = jnp.zeros_like(u)
        rho = u[L.URHO]
        e_src = 0.0
        for d in range(3):
            src = src.at[(L.UMX, L.UMY, L.UMZ)[d]].set(rho * g3[d])
            e_src = e_src + u[(L.UMX, L.UMY, L.UMZ)[d]] * g3[d]
        src = src.at[L.UEDEN].set(e_src)
        return src
