"""flame_wave (reference `Exec/science/flame_wave`, BASELINE A5): a helium
flame spreading through an accreted layer on a neutron star — the
reference's headline scaling benchmark (CTU hydro + Helmholtz EOS +
alpha-chain reactions + thermal conduction + constant gravity + HSE lower
boundary).

This setup builds the hydrostatic He layer directly (isothermal
atmosphere integrated through the Helmholtz EOS, standing in for the
reference's initial-model file) with a hot ignition patch at the base."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from castro_tpu.config import Params

DENS_BASE = 2.0e6      # g/cc at the layer base
T_BASE = 2.0e8         # K
T_HOT = 4.0e8          # ignition patch
G_CONST = -1.5e14      # cm/s^2 (neutron-star surface gravity)
GAMMA = 5.0 / 3.0


def make_params(n=(128, 64), height=1.0e3, width=2.0e3, dtype="float64"):
    p = Params()
    p = p.with_ns("amr", n_cell=tuple(n))
    p = p.with_ns("geometry", prob_lo=(0.0, 0.0, 0.0),
                  prob_hi=(width, height, height))
    # x: periodic flame direction; y: HSE base (inflow-class, problem
    # fill) + outflow top
    p = p.with_ns("castro", lo_bc=(0, 1), hi_bc=(0, 2), do_grav=1,
                  do_react=1, do_thermal_diffusion=1,
                  small_dens=1e-5, small_temp=1e6, small_pres=1e10,
                  dtnuc_e=0.25, cfl=0.5)
    p = p.with_ns("gravity", gravity_type="ConstantGrav", const_grav=G_CONST)
    p = p.with_ns("eos", eos_name="helmholtz")
    p = p.with_ns("network", network_name="aprox13")
    p = p.replace(extra={"conductivity.const_conductivity": 1.0e18})
    p = p.with_ns("tpu", dtype=dtype)
    return p


def _hse_column(eos, xn_col, z, rho0, T):
    """Integrate an isothermal HSE column upward through the EOS."""
    import numpy as _np

    n = z.shape[0]
    rho = _np.zeros(n)
    p = _np.zeros(n)
    rho[0] = rho0
    es = eos.rt(rho=jnp.asarray([rho0]), T=jnp.asarray([T]), xn=xn_col)
    p[0] = float(es.p[0])
    dz = float(z[1] - z[0])
    for i in range(1, n):
        r = rho[i - 1]
        for _ in range(12):  # Newton on p(rho, T) = p_{i-1} + rho_avg g dz
            es = eos.rt(rho=jnp.asarray([r]), T=jnp.asarray([T]), xn=xn_col)
            pi = float(es.p[0])
            f = pi - (p[i - 1] + 0.5 * (rho[i - 1] + r) * G_CONST * dz)
            dpdr = float(es.dpdr_e[0]) + float(es.dpdT[0]) * 0.0
            df = dpdr - 0.5 * G_CONST * dz
            r = max(r - f / df, 1e-5)
        rho[i] = r
        es = eos.rt(rho=jnp.asarray([r]), T=jnp.asarray([T]), xn=xn_col)
        p[i] = float(es.p[0])
    return rho, p


def problem_init(sim, u):
    L = sim.layout
    ng = sim.ng
    geom = sim.geom
    z1 = np.asarray(geom.cell_centers_1d(1, ng))
    x1 = np.asarray(geom.cell_centers_1d(0, ng))

    xn_col = jnp.zeros((L.nspec, 1)).at[0].set(1.0)  # pure He4
    rho_col, p_col = _hse_column(sim.eos, xn_col, z1 - z1[0], DENS_BASE,
                                 T_BASE)

    shape = u.shape[1:]
    rho = jnp.broadcast_to(jnp.asarray(rho_col)[None, :], shape)
    X = jnp.broadcast_to(jnp.asarray(x1)[:, None], shape)
    Z = jnp.broadcast_to(jnp.asarray(z1)[None, :], shape)

    # hot ignition patch at the base, centered in x
    x0 = 0.25 * float(geom.prob_hi[0])
    r2 = ((X - x0) / 150.0) ** 2 + ((Z - z1[ng]) / 100.0) ** 2
    T = T_BASE + (T_HOT - T_BASE) * jnp.exp(-r2)

    xn = jnp.zeros((L.nspec,) + shape).at[0].set(1.0)
    es = sim.eos.rt(rho=rho, T=T, xn=xn)
    u = u.at[L.URHO].set(rho)
    u = u.at[L.UMX].set(0.0)
    u = u.at[L.UMY].set(0.0)
    u = u.at[L.UMZ].set(0.0)
    u = u.at[L.UEINT].set(rho * es.e)
    u = u.at[L.UEDEN].set(rho * es.e)
    u = u.at[L.UTEMP].set(T)
    u = u.at[L.UFS:L.UFS + L.nspec].set(rho[None] * xn)
    return u


def build(n=(128, 64), dtype="float64"):
    from castro_tpu.driver.sim import Simulation
    from castro_tpu.problems.fills import make_hse_fill

    holder = {}

    def fill(u, t=0.0):
        return holder["hse"](u)

    sim = Simulation(make_params(n=n, dtype=dtype),
                     problem_init=problem_init, problem_fill=fill)
    holder["hse"] = make_hse_fill(sim, [(1, "lo")], G_CONST)
    return sim
