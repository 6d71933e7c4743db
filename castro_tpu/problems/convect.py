"""Convection test problems (reference `Exec/hydro_tests/toy_convect` and
`Exec/hydro_tests/test_convect`): plane-parallel stellar atmospheres under
constant gravity, driven either by an initial vortex velocity field
(toy_convect) or by a sinusoidally-modulated heating layer (test_convect,
`problem_source.H`).

Both use the Helmholtz EOS. The reference reads tabulated initial models
(`toy_nova_constg_tanh2...` / `model.hse`); here the equivalent structures
are generated in place with the toy_atm / hse_plane_parallel builders.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from castro_tpu.config import Params
from castro_tpu.problems.util import fill_from_prim

# toy_convect _prob_params
TOY_DEFAULTS = dict(
    apply_vel_field=1, velpert_scale=1.0e6, velpert_amplitude=1.0e5,
    velpert_height_loc=4.1e8, num_vortices=2,
    # toy_nova-like accreted envelope (H/He on a C/O substrate)
    dens_base=2.0e4, T_star=2.0e8, T_hi=2.0e8, T_lo=8.0e6,
    H_star=5.0e7, atm_delta=2.54e6,
)
TOY_G = -1.04263053e9  # inputs_2d gravity.const_grav


def toy_convect_params(n=(64, 128), **prob):
    merged = dict(TOY_DEFAULTS)
    merged.update(prob)
    p = Params()
    p = p.with_ns("amr", n_cell=tuple(n), stop_time=1000.0)
    p = p.with_ns("geometry", prob_lo=(0.0, 3.5e8, 0.0),
                  prob_hi=(7.5e7, 5.0e8, 1.0))
    p = p.with_ns("castro", lo_bc=(0, 1, 0), hi_bc=(0, 2, 0), cfl=0.7,
                  do_grav=1, do_sponge=1, init_shrink=0.1, change_max=1.1,
                  sponge_upper_density=50.0, sponge_lower_density=12.5,
                  sponge_timescale=1e-3,
                  small_dens=1e-5, small_temp=1e5)
    p = p.with_ns("gravity", gravity_type="ConstantGrav", const_grav=TOY_G)
    p = p.with_ns("eos", eos_name="helmholtz")
    p = p.with_ns("network", network_name="general_null",
                  spec_names=("H1", "He4", "C12"))
    p = p.with_ns("tpu", dtype="float64")
    return p.replace(problem=merged)


def toy_convect_init(sim, u):
    """Interpolate the toy-nova atmosphere onto height, then add the
    alternating-sign vortex field of `problem_initialize_state_data.H:63-95`
    at xloc_vortices = (i+1/2) Lx/num (problem_initialize.H:32-36)."""
    from castro_tpu.utils.initial_models import toy_atm, model_to_grid

    pp = dict(TOY_DEFAULTS)
    pp.update(sim.params.problem)
    g = sim.geom
    shape = u.shape[1:]
    y1 = np.asarray(g.cell_centers_1d(1, sim.ng))

    nspec = sim.layout.nspec
    xn_star = np.zeros(nspec)
    xn_star[2] = 1.0   # substrate: heavy species (C/O ash)
    xn_base = np.zeros(nspec)
    xn_base[0] = 0.7   # accreted envelope: H/He
    xn_base[1] = 0.3
    # heights are relative to the domain bottom (the accreted layer sits
    # H_star above prob_lo[1])
    model = toy_atm(sim.eos, y1, pp["dens_base"], pp["T_star"], pp["T_hi"],
                    pp["T_lo"], pp["H_star"], pp["atm_delta"],
                    xn_star, xn_base, TOY_G)
    vals = model_to_grid(model, y1)

    bshape = [1] * len(shape)
    bshape[1] = shape[1]

    def col(a):
        return jnp.broadcast_to(jnp.asarray(a).reshape(bshape), shape)

    rho = col(vals["density"])
    T = col(vals["temperature"])
    xn = jnp.stack([col(vals[f"spec_{k}"]) for k in range(nspec)])

    x = jnp.broadcast_to(g.cell_centers(0, sim.ng), shape)
    y = jnp.broadcast_to(g.cell_centers(1, sim.ng), shape)

    ux = jnp.zeros(shape, u.dtype)
    uy = jnp.zeros(shape, u.dtype)
    if pp["apply_vel_field"]:
        nv = int(pp["num_vortices"])
        Lx = g.prob_hi[0] - g.prob_lo[0]
        ydist = y - pp["velpert_height_loc"]
        s = pp["velpert_scale"]
        for v in range(nv):
            xloc = (v + 0.5) * Lx / nv + g.prob_lo[0]
            xdist = x - xloc
            r2 = xdist * xdist + ydist * ydist
            amp = pp["velpert_amplitude"] * jnp.exp(-r2 / (2.0 * s * s)) * (-1.0) ** (v + 1)
            ux = ux + (-ydist / s) * amp
            uy = uy + (xdist / s) * amp
    return fill_from_prim(sim, u, rho, (ux, uy, 0.0), T=T, xn=xn)


# ---------------------------------------------------------------------------
# test_convect: heating-layer driven convection

TC_DEFAULTS = dict(dens_base=9.8e9, T_base=7.2e6, y_layer=1.25e8,
                   heating_peak=2.5e16)
TC_G = -1.5e10


def test_convect_params(n=(160, 256), **prob):
    merged = dict(TC_DEFAULTS)
    merged.update(prob)
    p = Params()
    p = p.with_ns("amr", n_cell=tuple(n), stop_time=5.0)
    p = p.with_ns("geometry", prob_lo=(0.0, 0.0, 0.0),
                  prob_hi=(2.5e8, 4.0e8, 1.0))
    p = p.with_ns("castro", lo_bc=(0, 1, 0), hi_bc=(0, 2, 0), cfl=0.5,
                  do_grav=1, do_sponge=1, add_ext_src=1, init_shrink=0.1,
                  ppm_type=1, use_flattening=1, small_temp=5e6,
                  small_dens=1e-5,
                  sponge_upper_density=1e4, sponge_lower_density=1e2,
                  sponge_timescale=1e-3)
    p = p.with_ns("gravity", gravity_type="ConstantGrav", const_grav=TC_G)
    p = p.with_ns("eos", eos_name="helmholtz")
    p = p.with_ns("network", network_name="general_null",
                  spec_names=("C12", "O16", "Mg24"))
    p = p.with_ns("tpu", dtype="float64")
    return p.replace(problem=merged)


def test_convect_init(sim, u):
    """Plane-parallel HSE C/O atmosphere standing in for `model.hse`
    (512-pt, rho_base≈9.8e9, T≈7.2e6, X(C12)=0.3, X(O16)=0.7)."""
    from castro_tpu.utils.initial_models import hse_plane_parallel, model_to_grid

    pp = dict(TC_DEFAULTS)
    pp.update(sim.params.problem)
    g = sim.geom
    shape = u.shape[1:]
    y1 = np.asarray(g.cell_centers_1d(1, sim.ng))

    nspec = sim.layout.nspec
    xn0 = np.zeros(nspec)
    xn0[0] = 0.3  # C12
    xn0[1] = 0.7  # O16
    model = hse_plane_parallel(sim.eos, y1, pp["dens_base"], pp["T_base"],
                               TC_G, lambda z: xn0, T_min=1e6)
    vals = model_to_grid(model, y1)

    bshape = [1] * len(shape)
    bshape[1] = shape[1]

    def col(a):
        return jnp.broadcast_to(jnp.asarray(a).reshape(bshape), shape)

    rho = col(vals["density"])
    T = col(vals["temperature"])
    xn = jnp.stack([col(vals[f"spec_{k}"]) for k in range(nspec)])
    return fill_from_prim(sim, u, rho, (0.0, 0.0, 0.0), T=T, xn=xn)


def make_test_convect_source(params):
    """The heating layer of test_convect `problem_source.H`: a Gaussian
    layer at y_layer modulated by three sinusoids in x, deposited into
    UEDEN/UEINT at rho*H*2.5e16."""
    pp = dict(TC_DEFAULTS)
    pp.update(params.problem)
    y_layer = pp["y_layer"]
    peak = pp["heating_peak"]
    L_x = 2.5e8

    def ext_src(sim, u, q, qaux, t, dt, ctx=None):
        g = ctx.geom if ctx is not None else sim.geom
        L = sim.layout
        shape = u.shape[1:]
        x = jnp.broadcast_to(g.cell_centers(0, sim.ng), shape)
        y = jnp.broadcast_to(g.cell_centers(1, sim.ng), shape)
        ey = jnp.exp(-(y - y_layer) ** 2 / 1e14)
        H = ey * (1.0 + 0.00625 * jnp.sin(2 * math.pi * x / L_x)
                  + 0.01875 * jnp.sin(6 * math.pi * x / L_x + math.pi / 3.0)
                  + 0.01250 * jnp.sin(8 * math.pi * x / L_x + math.pi / 5.0))
        src = jnp.zeros_like(u)
        rhoH = u[L.URHO] * H * peak
        src = src.at[L.UEDEN].set(rhoH)
        src = src.at[L.UEINT].set(rhoH)
        return src

    ext_src.name = "problem_source"
    return ext_src
