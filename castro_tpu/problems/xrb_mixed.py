"""xrb_mixed (reference `Exec/science/xrb_mixed`): mixed H/He burning on
a neutron-star surface — the toy_xrb accreted layer (hot ash substrate,
tanh transition to an H/He fuel column, isentropic top) with optional
seed velocity vortices (`problem.apply_vel_field`,
`problem_initialize_state_data.H`).  Burns with rprox
(`network/rprox.py`), as the reference (`GNUmakefile` NETWORK_DIR).
Inputs mirrored: g = -2.45e14, box 1536 x 4608 cm."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from castro_tpu.config import Params

DEFAULTS = dict(dens_base=3.43e6, T_star=1.0e9, T_hi=2.0e8, T_lo=8.0e6,
                H_star=1450.0, atm_delta=12.0,
                apply_vel_field=1, velpert_height_loc=1475.0,
                velpert_scale=1.0e2, velpert_amplitude=1.0e5,
                num_vortices=4)
G_CONST = -2.45e14

# rprox indices (network/rprox.py _SPECIES)
IC12, IO14, IO15, IO16, IF17, IMG22, IS30, INI56, IHE4, IH1 = range(10)


def make_params(n=(64, 192), **prob):
    merged = dict(DEFAULTS)
    merged.update(prob)
    p = Params()
    p = p.with_ns("amr", n_cell=tuple(n))
    p = p.with_ns("geometry", prob_lo=(0.0, 0.0, 0.0),
                  prob_hi=(1536.0, 4608.0, 1.0))
    p = p.with_ns("castro", lo_bc=(0, 1), hi_bc=(0, 2), do_grav=1,
                  do_react=1, small_dens=1e-5, small_temp=1e6,
                  cfl=0.5, dtnuc_e=0.25)
    p = p.with_ns("gravity", gravity_type="ConstantGrav",
                  const_grav=G_CONST)
    p = p.with_ns("eos", eos_name="helmholtz")
    p = p.with_ns("network", network_name="rprox", nspec=10)
    p = p.with_ns("tpu", dtype="float64")
    return p.replace(problem=merged)


def problem_init(sim, u):
    from castro_tpu.utils.initial_models import toy_atm, model_to_grid
    from castro_tpu.problems.util import fill_from_prim

    pp = dict(DEFAULTS)
    pp.update(sim.params.problem)
    L = sim.layout
    g = sim.geom
    shape = u.shape[1:]
    z1 = np.asarray(g.cell_centers_1d(1, sim.ng))

    xn_star = np.zeros(L.nspec)
    xn_star[INI56] = 1.0          # NS-surface ash substrate
    xn_base = np.zeros(L.nspec)
    xn_base[IH1] = 0.7            # accreted solar-ish fuel
    xn_base[IHE4] = 0.28
    xn_base[IC12] = 0.02

    model = toy_atm(sim.eos, z1, pp["dens_base"], pp["T_star"],
                    pp["T_hi"], pp["T_lo"], pp["H_star"],
                    pp["atm_delta"], xn_star, xn_base, G_CONST)
    vals = model_to_grid(model, z1)

    x = jnp.broadcast_to(g.cell_centers(0, sim.ng), shape)
    y = jnp.broadcast_to(g.cell_centers(1, sim.ng), shape)
    rho = jnp.broadcast_to(jnp.asarray(vals["density"])[None, :], shape)
    T = jnp.broadcast_to(jnp.asarray(vals["temperature"])[None, :], shape)
    xn = jnp.stack([jnp.broadcast_to(
        jnp.asarray(vals[f"spec_{k}"])[None, :], shape)
        for k in range(L.nspec)])

    vx = jnp.zeros(shape, u.dtype)
    vy = jnp.zeros(shape, u.dtype)
    if pp["apply_vel_field"]:
        # rows of counter-rotating vortices at the fuel interface
        # (reference problem_initialize_state_data.H vortex loop)
        nv = int(pp["num_vortices"])
        Lx = float(g.prob_hi[0] - g.prob_lo[0])
        dxv = Lx / nv
        yloc = pp["velpert_height_loc"]
        scale = pp["velpert_scale"]
        amp = pp["velpert_amplitude"]
        ydist = y - yloc
        for m in range(nv):
            xc = float(g.prob_lo[0]) + (m + 0.5) * dxv
            xdist = x - xc
            r = jnp.sqrt(xdist ** 2 + ydist ** 2)
            sgn = 1.0 if m % 2 == 0 else -1.0
            w = amp * jnp.exp(-ydist ** 2 / (2.0 * scale ** 2))
            vx = vx + sgn * w * (ydist / jnp.maximum(r, 1e-8)) * \
                jnp.exp(-r / scale)
            vy = vy - sgn * w * (xdist / jnp.maximum(r, 1e-8)) * \
                jnp.exp(-r / scale)

    return fill_from_prim(sim, u, rho, (vx, vy, 0.0), T=T, xn=xn)
