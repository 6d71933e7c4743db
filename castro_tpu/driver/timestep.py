"""Timestep estimators (reference `Source/driver/timestep.cpp`):
CFL (:31), burning (:354), diffusion (:262). Reductions run over the valid
interior only (ghost margin holds garbage by design).
"""

from __future__ import annotations

import jax.numpy as jnp

from castro_tpu.ops.stencil import interior_slice


def estdt_cfl(u, layout, eos, geom, ng, cfl):
    """dt = cfl * min over zones and dims of dx_d/(|u_d| + c)
    (reference `estdt_cfl`, timestep.cpp:31)."""
    L = layout
    inner = interior_slice(ng, L.dim, comp_ndim=1)
    ui = u[inner]
    rho = ui[L.URHO]
    rhoinv = 1.0 / rho
    e = ui[L.UEINT] * rhoinv
    xn = ui[L.UFS : L.UFS + L.nspec] * rhoinv[None]
    cs = eos.re(rho=rho, e=e, xn=xn).cs

    dt = jnp.inf
    for d in range(L.dim):
        vel = jnp.abs(ui[L.momentum_index(d)]) * rhoinv
        dt = jnp.minimum(dt, jnp.min(geom.dx[d] / (vel + cs)))
    return cfl * dt


def estdt_burning(u, layout, eos, network, ng, dtnuc_e, dtnuc_X, dtnuc_X_threshold):
    """Nuclear-burning dt limiters Delta-e/edot and Delta-X/Xdot
    (reference `estdt_burning`, timestep.cpp:354)."""
    L = layout
    if network is None or not network.reactive or (dtnuc_e > 1e199 and dtnuc_X > 1e199):
        return jnp.inf
    inner = interior_slice(ng, L.dim, comp_ndim=1)
    ui = u[inner]
    rho = ui[L.URHO]
    rhoinv = 1.0 / rho
    T = ui[L.UTEMP]
    xn = ui[L.UFS : L.UFS + L.nspec] * rhoinv[None]
    e = ui[L.UEINT] * rhoinv
    xdot, edot = network.rhs(rho, T, xn, e)
    dt = jnp.inf
    if dtnuc_e < 1e199:
        dt = jnp.minimum(dt, dtnuc_e * jnp.min(e / jnp.maximum(jnp.abs(edot), 1e-50)))
    if dtnuc_X < 1e199:
        big = xn > dtnuc_X_threshold
        rate = jnp.where(big, jnp.abs(xdot), 0.0)
        dt = jnp.minimum(dt, dtnuc_X * jnp.min(
            jnp.where(big, xn, jnp.inf) / jnp.maximum(rate, 1e-50)))
    return dt


def estdt_temp_diffusion(u, layout, eos, geom, ng, diffusion_src, cfl=0.5):
    """Explicit-conduction stability limit dt <= 0.5 dx^2/D with
    D = k/(rho c_v) (reference `estdt_temp_diffusion`, timestep.cpp:262)."""
    if diffusion_src is None:
        return jnp.inf
    L = layout
    inner = interior_slice(ng, L.dim, comp_ndim=1)
    ui = u[inner]
    rho = ui[L.URHO]
    T = ui[L.UTEMP]
    xn = ui[L.UFS : L.UFS + L.nspec] / rho[None]
    es = eos.re(rho=rho, e=ui[L.UEINT] / rho, xn=xn)
    k = diffusion_src.conductivity(rho, T)
    D = k / jnp.maximum(rho * es.cv, 1e-300)
    dt = jnp.inf
    for d in range(L.dim):
        dt = jnp.minimum(dt, jnp.min(0.5 * geom.dx[d] ** 2 / jnp.maximum(D, 1e-300)))
    return cfl * dt
