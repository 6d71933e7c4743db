"""Explicit thermal diffusion source: div(k grad T)
(reference `Source/diffusion/`: `construct_old/new_diff_source`
Castro_diffusion.cpp; conductivity fill diffusion_util.cpp; the operator is
AMReX MLABecLaplacian applyop — here a direct face-flux stencil).

Conductivity models: constant or powerlaw k = k0 * T^nu (reference
Microphysics conductivity/{constant,powerlaw})."""

from __future__ import annotations

import jax.numpy as jnp

from castro_tpu.ops.stencil import shifted


class DiffusionSource:
    name = "diff"

    def __init__(self, params, geom, layout, ng, cond_const=None, cond_exponent=0.0):
        self.geom = geom
        self.layout = layout
        self.ng = ng
        self.c = params.castro
        self.k0 = params.extra.get("conductivity.const_conductivity",
                                   cond_const if cond_const is not None else 1.0)
        self.nu = params.extra.get("conductivity.cond_exponent", cond_exponent)

    def conductivity(self, rho, T):
        if self.nu == 0.0:
            return jnp.full_like(T, self.k0)
        return self.k0 * T ** self.nu

    def __call__(self, sim, u, q, qaux, t, dt, ctx=None):
        L = self.layout
        dim = L.dim
        T = u[L.UTEMP]
        rho = u[L.URHO]
        k = self.conductivity(rho, T)
        cutoff = self.c.diffuse_cutoff_density
        if cutoff > -1e19:
            k = jnp.where(rho < cutoff, 0.0, k)

        div = jnp.zeros_like(T)
        for d in range(dim):
            dxd = self.geom.dx[d]
            k_lo = 0.5 * (k + shifted(k, -1, d))  # face i-1/2
            flux_lo = k_lo * (T - shifted(T, -1, d)) / dxd
            flux_hi = shifted(flux_lo, 1, d)
            div = div + (flux_hi - flux_lo) / dxd

        src = jnp.zeros_like(u)
        src = src.at[L.UEINT].set(div)
        src = src.at[L.UEDEN].set(div)
        return src
