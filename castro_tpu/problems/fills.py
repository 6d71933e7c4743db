"""Problem-level boundary fill hooks.

Reference: `Source/problems/hse_fill.cpp` (hydrostatic-equilibrium
extrapolation BCs used by flame_wave etc., zl_ext_bc_type=1),
`ambient.cpp`/`ambient_fill.cpp` (fixed ambient-state boundaries).

These return `problem_fill(u)` callables to pass to Simulation."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def make_ambient_fill(sim, ambient_state, faces: Sequence[tuple]):
    """Fill ghost zones on the given (dim, side) faces with a fixed
    conserved ambient state vector [NVAR]."""
    amb = jnp.asarray(ambient_state, dtype=sim.dtype)
    ng = sim.ng
    dim = sim.layout.dim

    def fill(u):
        for d, side in faces:
            axis = u.ndim - dim + d
            n = u.shape[axis] - 2 * ng
            idx = [slice(None)] * u.ndim
            idx[axis] = slice(0, ng) if side == "lo" else slice(n + ng, n + 2 * ng)
            shape = list(u[tuple(idx)].shape)
            vals = amb.reshape([-1] + [1] * (len(shape) - 1))
            u = u.at[tuple(idx)].set(jnp.broadcast_to(vals, shape))
        return u

    return fill


def make_hse_fill(sim, faces: Sequence[tuple], const_grav: float,
                  isothermal=True):
    """Hydrostatic-equilibrium ghost fill along the gravity direction:
    integrate p_{ghost} = p_int -/+ rho g dz outward with constant-T
    (isothermal) density. Matches the role of `hse_fill.cpp` (the reference
    also offers isentropic/constant-density variants)."""
    L = sim.layout
    ng = sim.ng
    dim = L.dim
    eos = sim.eos

    def fill(u):
        for d, side in faces:
            axis = u.ndim - dim + d
            n = u.shape[axis] - 2 * ng
            dz = sim.geom.dx[d]
            sgn = -1.0 if side == "lo" else 1.0  # outward direction

            def cell(i):
                idx = [slice(None)] * u.ndim
                idx[axis] = slice(i, i + 1)
                return tuple(idx)

            # start from the first interior cell
            i_int = ng if side == "lo" else n + ng - 1
            base = u[cell(i_int)]
            rho_b = base[L.URHO]
            xn_b = base[L.UFS:L.UFS + L.nspec] / rho_b[None]
            e_b = base[L.UEINT] / rho_b
            es_b = eos.re(rho=rho_b, e=e_b, xn=xn_b)
            p = es_b.p
            T = es_b.T
            rho = rho_b
            for k in range(1, ng + 1):
                ig = i_int - k if side == "lo" else i_int + k
                # hydrostatic step outward: z changes by sgn*dz, so
                # dp = rho * g * (sgn*dz)
                p = p + sgn * rho * const_grav * dz
                p = jnp.maximum(p, 1e-30)
                es = eos.tp(T=T, p=p, xn=xn_b) if isothermal else \
                    eos.rp(rho=rho, p=p, xn=xn_b)
                rho = es.rho
                g = u[cell(ig)]
                g = g.at[L.URHO].set(rho)
                g = g.at[L.UMX].set(0.0)
                g = g.at[L.UMY].set(0.0)
                g = g.at[L.UMZ].set(0.0)
                g = g.at[L.UEINT].set(rho * es.e)
                g = g.at[L.UEDEN].set(rho * es.e)
                g = g.at[L.UTEMP].set(es.T)
                g = g.at[L.UFS:L.UFS + L.nspec].set(rho[None] * xn_b)
                u = u.at[cell(ig)].set(g)
        return u

    return fill
