"""Derived plotfile quantities (reference `Source/driver/Derive.cpp` +
`Castro_setup.cpp` derive_lst registrations, ~45 fields).

Each derive: fn(sim, u_interior) -> array. Registered by name so plotfiles
can request them via amr.derive_plot_vars, like the reference."""

from __future__ import annotations

import jax.numpy as jnp

from castro_tpu.utils import constants as C


def _prim(sim, u):
    L = sim.layout
    rho = u[L.URHO]
    rhoinv = 1.0 / rho
    vel = [u[L.UMX] * rhoinv, u[L.UMY] * rhoinv, u[L.UMZ] * rhoinv]
    e = u[L.UEINT] * rhoinv
    xn = u[L.UFS : L.UFS + L.nspec] * rhoinv[None]
    es = sim.eos.re(rho=rho, e=e, xn=xn)
    return rho, vel, e, xn, es


def derive_pressure(sim, u):
    return _prim(sim, u)[4].p


def derive_soundspeed(sim, u):
    return _prim(sim, u)[4].cs


def derive_machnumber(sim, u):
    rho, vel, e, xn, es = _prim(sim, u)
    magvel = jnp.sqrt(sum(v * v for v in vel))
    return magvel / es.cs


def derive_velocity(d):
    def fn(sim, u):
        L = sim.layout
        return u[(L.UMX, L.UMY, L.UMZ)[d]] / u[L.URHO]

    return fn


def derive_magvel(sim, u):
    L = sim.layout
    rhoinv = 1.0 / u[L.URHO]
    return jnp.sqrt(sum((u[c] * rhoinv) ** 2 for c in (L.UMX, L.UMY, L.UMZ)))


def derive_magmom(sim, u):
    L = sim.layout
    return jnp.sqrt(sum(u[c] ** 2 for c in (L.UMX, L.UMY, L.UMZ)))


def derive_kineng(sim, u):
    L = sim.layout
    return 0.5 * sum(u[c] ** 2 for c in (L.UMX, L.UMY, L.UMZ)) / u[L.URHO]


def derive_eint_e(sim, u):
    L = sim.layout
    return u[L.UEINT] / u[L.URHO]


def derive_eint_E(sim, u):
    L = sim.layout
    ke = derive_kineng(sim, u)
    return (u[L.UEDEN] - ke) / u[L.URHO]


def derive_entropy(sim, u):
    """Ideal-gas entropy proxy s = p / rho^gamma (gamma-law EOSes)."""
    rho, vel, e, xn, es = _prim(sim, u)
    return es.p / rho ** es.gam1


def derive_radvel(sim, u):
    L = sim.layout
    g = sim.geom
    rho = u[L.URHO]
    c = [0.5 * (g.prob_lo[d] + g.prob_hi[d]) for d in range(g.dim)]
    num = 0.0
    r2 = 0.0
    for d in range(g.dim):
        x = g.cell_centers(d, 0) - c[d]
        x = jnp.broadcast_to(x, rho.shape)
        num = num + x * u[(L.UMX, L.UMY, L.UMZ)[d]] / rho
        r2 = r2 + x * x
    return num / jnp.maximum(jnp.sqrt(r2), 1e-30)


def derive_spec(i):
    def fn(sim, u):
        L = sim.layout
        return u[L.UFS + i] / u[L.URHO]

    return fn


def derive_enuc(sim, u):
    """Instantaneous nuclear energy generation rate (erg/g/s)."""
    rho, vel, e, xn, es = _prim(sim, u)
    if not sim.network.reactive:
        return jnp.zeros_like(rho)
    _, edot = sim.network.rhs(rho, es.T, xn, e)
    return edot


def derive_divu(sim, u):
    from castro_tpu.ops.stencil import shifted

    L = sim.layout
    rho = u[L.URHO]
    out = jnp.zeros_like(rho)
    for d in range(sim.layout.dim):
        v = u[(L.UMX, L.UMY, L.UMZ)[d]] / rho
        out = out + (shifted(v, 1, d) - shifted(v, -1, d)) / (2 * sim.geom.dx[d])
    return out


def derive_angular_momentum(d):
    def fn(sim, u):
        L = sim.layout
        g = sim.geom
        rho = u[L.URHO]
        c = [0.5 * (g.prob_lo[k] + g.prob_hi[k]) for k in range(g.dim)]
        x = []
        for k in range(3):
            if k < g.dim:
                x.append(jnp.broadcast_to(g.cell_centers(k, 0) - c[k], rho.shape))
            else:
                x.append(jnp.zeros_like(rho))
        mom = [u[L.UMX], u[L.UMY], u[L.UMZ]]
        j, k = [(1, 2), (2, 0), (0, 1)][d]
        return x[j] * mom[k] - x[k] * mom[j]

    return fn


def registry(sim):
    """Name -> derive fn, built for a sim's layout (reference derive_lst)."""
    reg = {
        "pressure": derive_pressure,
        "soundspeed": derive_soundspeed,
        "MachNumber": derive_machnumber,
        "x_velocity": derive_velocity(0),
        "y_velocity": derive_velocity(1),
        "z_velocity": derive_velocity(2),
        "magvel": derive_magvel,
        "magmom": derive_magmom,
        "kineng": derive_kineng,
        "eint_e": derive_eint_e,
        "eint_E": derive_eint_E,
        "entropy": derive_entropy,
        "radvel": derive_radvel,
        "enuc": derive_enuc,
        "divu": derive_divu,
        "angular_momentum_x": derive_angular_momentum(0),
        "angular_momentum_y": derive_angular_momentum(1),
        "angular_momentum_z": derive_angular_momentum(2),
    }
    for i, name in enumerate(sim.network.spec_names):
        reg[f"X({name})"] = derive_spec(i)
    return reg
