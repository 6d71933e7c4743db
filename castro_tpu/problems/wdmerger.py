"""wdmerger: binary white-dwarf problems (reference
`Exec/science/wdmerger`): head-on collision (problem=0, the
`wdmerger_collision` test: two free-falling WDs on the symmetry axis in
2D RZ) and a circular binary in the rotating frame (problem=1).

The reference builds each star with its offline initial-model tool and
keeps an ambient medium + relaxation/damping machinery; here the stars
come from `utils/initial_models.wd_model_for_mass` and are superposed on
a low-density ambient.  Collision speed comes from the two-body
free-fall from the initial separation (reference
`Problem_setup.cpp` collision_separation logic, in units of the
secondary's radius).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from castro_tpu.config import Params
from castro_tpu.utils import constants as C

DEFAULTS = dict(
    mass_P=0.64,               # solar masses
    mass_S=0.64,
    problem=0,                 # 0: collision, 1: circular binary
    collision_separation=2.0,  # in secondary radii
    stellar_temp=1.0e7,
    ambient_density=1.0e-4,
    rotational_period=100.0,   # s (problem=1)
)


def make_params(n=(64, 128), **prob):
    merged = dict(DEFAULTS)
    merged.update(prob)
    p = Params()
    p = p.with_ns("amr", n_cell=tuple(n))
    p = p.with_ns("geometry", coord_sys=1, prob_lo=(0.0, -5.12e9, 0.0),
                  prob_hi=(5.12e9, 5.12e9, 1.0))
    p = p.with_ns("castro", lo_bc=(3, 2), hi_bc=(2, 2), do_grav=1,
                  do_react=0, small_dens=1e-5, small_temp=1e5, cfl=0.5,
                  do_sponge=1, sponge_upper_density=1e-2,
                  sponge_lower_density=1e-4, sponge_timescale=1e-2)
    if merged["problem"] == 1:
        p = p.with_ns("castro", do_rotation=1,
                      rotational_period=merged["rotational_period"])
    p = p.with_ns("gravity", gravity_type="PoissonGrav", max_multipole_order=6)
    p = p.with_ns("eos", eos_name="helmholtz")
    p = p.with_ns("network", network_name="general_null", nspec=3,
                  spec_names=("He4", "C12", "O16"))
    p = p.with_ns("tpu", dtype="float64")
    return p.replace(problem=merged)


def _wd(sim, mass_msol, T, nshell=512):
    from castro_tpu.utils import initial_models as im

    rmax = 2.0e9

    xn_co = jnp.asarray([0.0, 0.5, 0.5])

    def xn_of_m(m):
        return xn_co

    r = np.linspace(rmax / (2 * nshell), rmax, nshell)
    model = im.wd_model_for_mass(sim.eos, r, mass_msol * C.M_solar, T,
                                 xn_of_m)
    rho = model["density"]
    floor = rho.min()
    live = rho > 1.5 * floor
    R = float(r[np.argwhere(live).max()]) if live.any() else rmax
    return model, R


def problem_init(sim, u):
    pp = dict(DEFAULTS)
    pp.update(sim.params.problem)
    L = sim.layout
    g = sim.geom
    shape = u.shape[1:]

    model_P, R_P = _wd(sim, pp["mass_P"], pp["stellar_temp"])
    model_S, R_S = _wd(sim, pp["mass_S"], pp["stellar_temp"])
    M_P = pp["mass_P"] * C.M_solar
    M_S = pp["mass_S"] * C.M_solar

    # star centers on the symmetry axis (2D RZ: x=r, y=z)
    sep = pp["collision_separation"] * 2.0 * R_S
    zP, zS = -0.5 * sep, 0.5 * sep

    # free-fall approach speed from infinity-at-rest at separation `sep`
    # 0.5 mu v_rel^2 = G M_P M_S / sep (two-body energy)
    v_rel = np.sqrt(2.0 * C.Gconst * (M_P + M_S) / sep)
    vP = v_rel * M_S / (M_P + M_S)
    vS = -v_rel * M_P / (M_P + M_S)

    x = jnp.broadcast_to(g.cell_centers(0, sim.ng), shape)
    y = jnp.broadcast_to(g.cell_centers(1, sim.ng), shape)

    from castro_tpu.utils.initial_models import model_to_grid

    def star_fields(model, zc):
        d = jnp.sqrt(x * x + (y - zc) ** 2)
        vals = model_to_grid(model, np.asarray(d).reshape(-1))
        rho = jnp.asarray(vals["density"]).reshape(shape)
        T = jnp.asarray(vals["temperature"]).reshape(shape)
        return rho, T

    rho_P, T_P = star_fields(model_P, zP)
    rho_S, T_S = star_fields(model_S, zS)

    amb = pp["ambient_density"]
    in_P = rho_P > 10.0 * amb
    in_S = rho_S > 10.0 * amb
    rho = jnp.maximum(jnp.maximum(rho_P, rho_S), amb)
    T = jnp.where(in_P, T_P, jnp.where(in_S, T_S, pp["stellar_temp"]))
    if pp["problem"] == 0:
        vy = jnp.where(in_P, vP, jnp.where(in_S, vS, 0.0))
    else:
        # circular binary: the rotating-frame state is static (the frame
        # corotates); reference state_in_rotating_frame=1 default
        vy = jnp.zeros_like(rho)

    xn = jnp.zeros((L.nspec,) + shape)
    xn = xn.at[1].set(0.5).at[2].set(0.5)

    from castro_tpu.problems.util import fill_from_prim

    return fill_from_prim(sim, u, rho, (0.0, vy, 0.0), T=T, xn=xn)
