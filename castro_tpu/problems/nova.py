"""nova (reference `Exec/science/nova`): an accreted hydrogen envelope
on a CO white-dwarf surface building toward a CNO runaway, with optional
seed velocity vortices.  The reference reads the Glasner HSE model
(`glasner_T5_Gconst_Snone.hse`); here the layered envelope is generated
with the toy_atm builder (CO substrate -> solar-composition envelope)
through the Helmholtz EOS and the hot-CNO nova network
(`network/nova.py`), as the reference (`GNUmakefile` NETWORK_DIR).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from castro_tpu.config import Params

DEFAULTS = dict(dens_base=3.0e4, T_star=3.0e7, T_hi=6.0e7, T_lo=1.0e6,
                H_star=1.0e7, atm_delta=2.0e6,
                apply_vel_field=0, velpert_height_loc=1.2e8,
                velpert_scale=5.0e6, velpert_amplitude=1.0e5,
                num_vortices=2)
G_CONST = -8.0e8  # GM/R^2 for a ~1.1 Msun WD

# nova-network indices (network/nova.py _SPECIES)
(IH1, IHE3, IHE4, IC12, IC13, IN13, IN14, IN15, IO14, IO15, IO16, IO17,
 IF17, IF18) = range(14)


def make_params(n=(64, 128), **prob):
    merged = dict(DEFAULTS)
    merged.update(prob)
    p = Params()
    p = p.with_ns("amr", n_cell=tuple(n))
    p = p.with_ns("geometry", prob_lo=(0.0, 0.0, 0.0),
                  prob_hi=(2.5e7, 5.0e7, 1.0))
    p = p.with_ns("castro", lo_bc=(0, 1), hi_bc=(0, 2), do_grav=1,
                  do_react=1, small_dens=1e-8, small_temp=1e4, cfl=0.5)
    p = p.with_ns("gravity", gravity_type="ConstantGrav",
                  const_grav=G_CONST)
    p = p.with_ns("eos", eos_name="helmholtz")
    p = p.with_ns("network", network_name="nova", nspec=14)
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
    xn_star[IC12] = 0.5
    xn_star[IO16] = 0.5
    xn_base = np.zeros(L.nspec)
    xn_base[IH1] = 0.7
    xn_base[IHE4] = 0.28
    xn_base[IC12] = 0.01
    xn_base[IN14] = 0.01

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
        nv = int(pp["num_vortices"])
        Lx = float(g.prob_hi[0] - g.prob_lo[0])
        dxv = Lx / nv
        ydist = y - pp["velpert_height_loc"]
        scale = pp["velpert_scale"]
        amp = pp["velpert_amplitude"]
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
