"""Double Mach reflection (reference `Exec/hydro_tests/double_mach_reflection`):
a Mach-10 shock inclined 60 degrees to a reflecting wall (Woodward &
Colella 1984). Exercises time-dependent inflow boundaries — the y-hi ghost
zones track the analytic shock position
xs(y, t) = 1/6 + y/tan(60) + (10/sin(60)) t
(reference `problem_bc_fill.H`), the x-lo face feeds the post-shock state,
and the y-lo face is post-shock for x < 1/6 and a reflecting wall beyond.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from castro_tpu.config import Params

# post(l)/pre(r)-shock states (reference _prob_params)
P_L, U_L, V_L, RHO_L = 116.5, 7.1447096, -4.125, 8.0
P_R, U_R, V_R, RHO_R = 1.0, 0.0, 0.0, 1.4
GAMMA = 1.4
TAN60 = math.tan(math.pi / 3.0)
SHOCK_SPEED = 10.0 / math.sin(math.pi / 3.0)


def make_params(n=(256, 64), dtype="float64"):
    p = Params()
    p = p.with_ns("amr", n_cell=tuple(n), stop_time=0.2, max_step=100000)
    p = p.with_ns("geometry", prob_lo=(0.0, 0.0, 0.0),
                  prob_hi=(4.0, 1.0, 1.0))
    # outflow bases everywhere; the problem fill drives the real BCs
    # (matches the reference inputs.2d lo_bc/hi_bc = 2)
    p = p.with_ns("castro", lo_bc=(2, 2), hi_bc=(2, 2), cfl=0.9,
                  init_shrink=0.01, change_max=1.1, riemann_solver=2,
                  ppm_type=1, small_dens=1e-8, small_temp=1e-12,
                  small_pres=1e-12)
    p = p.with_ns("eos", eos_gamma=GAMMA)
    p = p.with_ns("tpu", dtype=dtype)
    return p


def _conserved(sim, rho, u, v, p):
    """Conserved tuple for a constant gamma-law state."""
    rhoe = p / (GAMMA - 1.0)
    return (rho, rho * u, rho * v,
            rhoe + 0.5 * rho * (u * u + v * v), rhoe)


def problem_init(sim, u):
    L = sim.layout
    ng = sim.ng
    x = sim.geom.cell_centers(0, ng)
    y = sim.geom.cell_centers(1, ng)
    X = jnp.broadcast_to(x, u.shape[1:])
    Y = jnp.broadcast_to(y, u.shape[1:])
    post = Y >= TAN60 * (X - 1.0 / 6.0)

    def mix(lv, rv):
        return jnp.where(post, lv, rv)

    rl, mxl, myl, El, rel = _conserved(sim, RHO_L, U_L, V_L, P_L)
    rr, mxr, myr, Er, rer = _conserved(sim, RHO_R, U_R, V_R, P_R)
    u = u.at[L.URHO].set(mix(rl, rr))
    u = u.at[L.UMX].set(mix(mxl, mxr))
    u = u.at[L.UMY].set(mix(myl, myr))
    u = u.at[L.UEDEN].set(mix(El, Er))
    u = u.at[L.UEINT].set(mix(rel, rer))
    u = u.at[L.UTEMP].set(1.0)
    u = u.at[L.UFS].set(u[L.URHO])
    return u


def make_problem_fill(sim_holder):
    """Build the (u, t) ghost-fill closure. `sim_holder` is a dict that the
    caller populates with {'sim': sim} after construction (the fill needs
    layout/geometry from the sim it serves)."""

    def problem_fill(u, t=0.0):
        sim = sim_holder["sim"]
        L = sim.layout
        ng = sim.ng
        nx = u.shape[1] - 2 * ng
        ny = u.shape[2] - 2 * ng
        x = sim.geom.cell_centers(0, ng)
        y = sim.geom.cell_centers(1, ng)
        X = jnp.broadcast_to(x, u.shape[1:])
        Y = jnp.broadcast_to(y, u.shape[1:])

        ii = jnp.arange(u.shape[1]).reshape(-1, 1)
        jj = jnp.arange(u.shape[2]).reshape(1, -1)
        in_xlo = ii < ng
        in_ylo = jj < ng
        in_yhi = jj >= ny + ng

        rl, mxl, myl, El, rel = _conserved(sim, RHO_L, U_L, V_L, P_L)
        rr, mxr, myr, Er, rer = _conserved(sim, RHO_R, U_R, V_R, P_R)

        # y-hi: analytic moving shock
        shock_x = 1.0 / 6.0 + Y / TAN60 + SHOCK_SPEED * t
        post = X < shock_x

        def pick(lv, rv):
            return jnp.where(post, lv, rv)

        # y-lo for x > 1/6: reflect off the wall (mirror interior rows,
        # odd UMY); for x < 1/6: post-shock inflow
        wall = X >= 1.0 / 6.0

        out = u
        for comp, lv, rv in ((L.URHO, rl, rr), (L.UMX, mxl, mxr),
                             (L.UMY, myl, myr), (L.UEDEN, El, Er),
                             (L.UEINT, rel, rer), (L.UTEMP, 1.0, 1.0)):
            f = out[comp]
            # x-lo: post-shock
            f = jnp.where(in_xlo, lv, f)
            # y-hi: moving-shock split
            f = jnp.where(in_yhi, pick(lv, rv), f)
            # y-lo: mirror rows ng..2ng-1 -> ghosts (reflection), with the
            # post-shock state where x < 1/6
            mirror = jnp.flip(f[:, ng:2 * ng], axis=1)
            sgn = -1.0 if comp == L.UMY else 1.0
            refl = jnp.concatenate([sgn * mirror, f[:, ng:]], axis=1)
            f = jnp.where(in_ylo, jnp.where(wall, refl, lv), f)
            out = out.at[comp].set(f)
        out = out.at[L.UFS].set(out[L.URHO])
        return out

    return problem_fill


def build(n=(256, 64), dtype="float64"):
    """Construct the configured Simulation."""
    from castro_tpu.driver.sim import Simulation

    holder = {}
    sim = Simulation(make_params(n=n, dtype=dtype),
                     problem_init=problem_init,
                     problem_fill=make_problem_fill(holder))
    holder["sim"] = sim
    return sim
