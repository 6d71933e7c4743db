"""2D axisymmetric geometric momentum sources (reference
`Source/sources/Castro_geom.cpp`, Bernand-Champmartin): the inertial terms
for the azimuthal momentum in r-z geometry, where UMZ carries rho*v_theta:

    S(UMR) = rho v_theta^2 / r        (centrifugal of the azimuthal flow)
    S(UM_theta) = -rho u_r v_theta / r  (angular momentum conservation)
"""

from __future__ import annotations

import jax.numpy as jnp


class GeomSource:
    name = "geom"

    def __init__(self, params, geom, layout, ng):
        self.geom = geom
        self.layout = layout
        self.ng = ng

    def __call__(self, sim, u, q, qaux, t, dt, ctx=None):
        L = self.layout
        geom = ctx.geom if ctx is not None else self.geom
        r = jnp.maximum(geom.cell_centers(0, self.ng), 1e-30)
        rho = u[L.URHO]
        ur = u[L.UMX] / rho
        vth = u[L.UMZ] / rho
        src = jnp.zeros_like(u)
        src = src.at[L.UMX].set(rho * vth * vth / r)
        src = src.at[L.UMZ].set(-rho * ur * vth / r)
        return src
