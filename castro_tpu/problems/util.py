"""Helpers for problem initialization."""

from __future__ import annotations

import jax.numpy as jnp


def fill_from_prim(sim, u, rho, vel, p=None, T=None, xn=None):
    """Fill the conserved state (everywhere, ghosts included) from primitive
    fields. `vel` is a 3-tuple of arrays/scalars; `xn` [nspec, ...] mass
    fractions (default: first species = 1)."""
    L = sim.layout
    shape = u.shape[1:]
    rho = jnp.broadcast_to(jnp.asarray(rho, u.dtype), shape)
    vx, vy, vz = (jnp.broadcast_to(jnp.asarray(v, u.dtype), shape) for v in vel)
    if xn is None:
        xn = jnp.zeros((L.nspec,) + shape, u.dtype).at[0].set(1.0)
    else:
        xn = jnp.broadcast_to(jnp.asarray(xn, u.dtype), (L.nspec,) + shape)

    if p is not None:
        es = sim.eos.rp(rho=rho, p=jnp.broadcast_to(jnp.asarray(p, u.dtype), shape), xn=xn)
    else:
        es = sim.eos.rt(rho=rho, T=jnp.broadcast_to(jnp.asarray(T, u.dtype), shape), xn=xn)

    ke = 0.5 * rho * (vx * vx + vy * vy + vz * vz)
    u = u.at[L.URHO].set(rho)
    u = u.at[L.UMX].set(rho * vx)
    u = u.at[L.UMY].set(rho * vy)
    u = u.at[L.UMZ].set(rho * vz)
    u = u.at[L.UEINT].set(rho * es.e)
    u = u.at[L.UEDEN].set(rho * es.e + ke)
    u = u.at[L.UTEMP].set(es.T)
    u = u.at[L.UFS : L.UFS + L.nspec].set(xn * rho[None])
    if L.naux > 0:
        u = u.at[L.UFX : L.UFX + L.naux].set(0.0)
    return u
