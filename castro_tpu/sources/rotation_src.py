"""Rotating-frame sources: Coriolis + centrifugal
(reference `Source/rotation/`: `rotational_acceleration` Rotation.H:38,
`construct_old/new_rotation_source` rotation_sources.cpp).

Omega = 2*pi/rotational_period about rot_axis. Momentum source
rho*(-2 Omega x v - Omega x (Omega x r)); energy source v . F_centrifugal
(Coriolis does no work)."""

from __future__ import annotations

import math

import jax.numpy as jnp


class RotationSource:
    name = "rot"

    def __init__(self, params, geom, layout, ng):
        self.c = params.castro
        self.geom = geom
        self.layout = layout
        self.ng = ng
        period = self.c.rotational_period
        self.omega_mag = 2.0 * math.pi / period if period > 0 else 0.0
        self.axis = self.c.rot_axis - 1  # 1-based in inputs

    def _omega(self):
        w = [0.0, 0.0, 0.0]
        w[self.axis] = self.omega_mag
        return w

    def _coords(self, shape, geom=None):
        geom = geom if geom is not None else self.geom
        center = [0.5 * (geom.prob_lo[d] + geom.prob_hi[d]) for d in range(geom.dim)]
        xs = []
        for d in range(3):
            if d < geom.dim:
                x = geom.cell_centers(d, self.ng) - center[d]
                xs.append(jnp.broadcast_to(x, shape))
            else:
                xs.append(jnp.zeros(shape))
        return xs

    def __call__(self, sim, u, q, qaux, t, dt, ctx=None):
        L = self.layout
        rho = u[L.URHO]
        v = [u[(L.UMX, L.UMY, L.UMZ)[d]] / rho for d in range(3)]
        w = self._omega()
        x = self._coords(rho.shape, ctx.geom if ctx is not None else None)

        def cross(a, b):
            return [a[1] * b[2] - a[2] * b[1],
                    a[2] * b[0] - a[0] * b[2],
                    a[0] * b[1] - a[1] * b[0]]

        acc = [0.0, 0.0, 0.0]
        if self.c.rotation_include_coriolis:
            cor = cross(w, v)
            acc = [a - 2.0 * cv for a, cv in zip(acc, cor)]
        cent_acc = [0.0, 0.0, 0.0]
        if self.c.rotation_include_centrifugal:
            wxr = cross(w, x)
            cent = cross(w, wxr)
            cent_acc = [-cc for cc in cent]
            acc = [a + ca for a, ca in zip(acc, cent_acc)]

        src = jnp.zeros_like(u)
        e_src = 0.0
        for d in range(3):
            src = src.at[(L.UMX, L.UMY, L.UMZ)[d]].set(rho * acc[d])
            e_src = e_src + rho * v[d] * cent_acc[d]
        src = src.at[L.UEDEN].set(e_src)
        return src
