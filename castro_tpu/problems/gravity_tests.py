"""Gravity test-problem setups (reference `Exec/gravity_tests/*`).

- uniform_cube_sphere: isolated Poisson solve for a uniform sphere
  (problem=1) or cube (problem=2); the sphere potential is analytic and
  the cube potential has the closed Hummer (arctan/log) form the
  reference compares against in its unit test.
- evrard_collapse: the Evrard (1988) adiabatic collapse of a cold
  1/r-density gas sphere under self-gravity.

Both use PoissonGrav with multipole boundary conditions.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from castro_tpu.config import Params
from castro_tpu.problems.util import fill_from_prim
from castro_tpu.utils import constants as C

CUBE_DEFAULTS = dict(ambient_dens=1e-8, density=1.0, diameter=1.0,
                     problem=1)


def cube_sphere_params(n=32, **prob):
    merged = dict(CUBE_DEFAULTS)
    merged.update(prob)
    p = Params()
    p = p.with_ns("amr", n_cell=(n, n, n))
    p = p.with_ns("geometry", prob_lo=(-1.6, -1.6, -1.6),
                  prob_hi=(1.6, 1.6, 1.6))
    p = p.with_ns("castro", lo_bc=(2, 2, 2), hi_bc=(2, 2, 2), do_grav=1,
                  do_hydro=0, small_dens=1e-12, small_temp=1e-12)
    p = p.with_ns("gravity", gravity_type="PoissonGrav",
                  max_multipole_order=4)
    p = p.with_ns("eos", eos_gamma=5.0 / 3.0)
    p = p.with_ns("tpu", dtype="float64")
    return p.replace(problem=merged)


def cube_sphere_init(sim, u):
    pp = dict(CUBE_DEFAULTS)
    pp.update(sim.params.problem)
    g = sim.geom
    shape = u.shape[1:]
    x = jnp.broadcast_to(g.cell_centers(0, sim.ng), shape)
    y = jnp.broadcast_to(g.cell_centers(1, sim.ng), shape)
    z = jnp.broadcast_to(g.cell_centers(2, sim.ng), shape)
    half = 0.5 * pp["diameter"]
    if int(pp["problem"]) == 1:
        inside = x * x + y * y + z * z < half * half
    else:
        inside = ((jnp.abs(x) < half) & (jnp.abs(y) < half)
                  & (jnp.abs(z) < half))
    rho = jnp.where(inside, pp["density"], pp["ambient_dens"])
    return fill_from_prim(sim, u, rho, (0.0, 0.0, 0.0), p=1e-6)


def sphere_potential_exact(r, R, rho0):
    """Uniform-sphere potential (negative): interior/exterior closed form."""
    M = 4.0 / 3.0 * np.pi * R**3 * rho0
    G = C.Gconst
    return np.where(r >= R, -G * M / np.maximum(r, 1e-300),
                    -G * M * (3 * R**2 - r**2) / (2 * R**3))


EVRARD_DEFAULTS = dict(sphere_mass=1.0, sphere_radius=9.0e8,
                       ambient_density=1.0e-5)


def evrard_params(n=32, **prob):
    merged = dict(EVRARD_DEFAULTS)
    merged.update(prob)
    L = 1.6e9
    p = Params()
    p = p.with_ns("amr", n_cell=(n, n, n))
    p = p.with_ns("geometry", prob_lo=(-L, -L, -L), prob_hi=(L, L, L))
    p = p.with_ns("castro", lo_bc=(2, 2, 2), hi_bc=(2, 2, 2), do_grav=1,
                  small_dens=1e-12, small_temp=1e-12, small_pres=1e-30,
                  cfl=0.5)
    p = p.with_ns("gravity", gravity_type="PoissonGrav",
                  max_multipole_order=2)
    p = p.with_ns("eos", eos_gamma=5.0 / 3.0)
    p = p.with_ns("tpu", dtype="float64")
    return p.replace(problem=merged)


def evrard_init(sim, u):
    """Evrard sphere: rho = M/(2 pi R^2 r) inside R, cold (e = 0.05 GM/R
    specific internal energy)."""
    pp = dict(EVRARD_DEFAULTS)
    pp.update(sim.params.problem)
    g = sim.geom
    shape = u.shape[1:]
    x = jnp.broadcast_to(g.cell_centers(0, sim.ng), shape)
    y = jnp.broadcast_to(g.cell_centers(1, sim.ng), shape)
    z = jnp.broadcast_to(g.cell_centers(2, sim.ng), shape)
    r = jnp.sqrt(x * x + y * y + z * z)
    R = pp["sphere_radius"]
    # use M in grams ~ solar-ish scaled: sphere_mass given in units of
    # 1e33 g in the reference inputs (M_sun); keep the input literal
    M = pp["sphere_mass"] * 1.9884e33
    rho_in = M / (2.0 * np.pi * R**2 * jnp.maximum(r, 0.25 * g.dx[0]))
    rho = jnp.where(r < R, rho_in, pp["ambient_density"])
    e_spec = 0.05 * C.Gconst * M / R
    gamma = sim.params.eos.eos_gamma
    pres = (gamma - 1.0) * rho * e_spec
    return fill_from_prim(sim, u, rho, (0.0, 0.0, 0.0), p=pres)


# ---------------------------------------------------------------------------
# StarGrav (Exec/gravity_tests/StarGrav): a white dwarf held in HSE under
# MonopoleGrav — tests that the hydro + gravity balance preserves the star.
# The reference reads `WD_rhoc_2.e9_M_1.1.hse.2560`; the equivalent model
# is generated with the spherical HSE builder at the same central density.

STARGRAV_DEFAULTS = dict(rho_c=2.0e9, T_c=1.0e7, rho_ambient=1.0e-4)


def star_grav_params(n=640, dim=1, **prob):
    merged = dict(STARGRAV_DEFAULTS)
    merged.update(prob)
    p = Params()
    p = p.with_ns("amr", n_cell=(n,) * dim, stop_time=1.0)
    p = p.with_ns("geometry", coord_sys=2 if dim == 1 else (1 if dim == 2 else 0),
                  prob_lo=(0.0,) * 3, prob_hi=(2.5e8,) * 3)
    p = p.with_ns("castro", lo_bc=(3,) * dim, hi_bc=(2,) * dim, cfl=0.9,
                  do_grav=1, do_sponge=1, init_shrink=0.1, change_max=1.05,
                  sponge_upper_density=1e4, sponge_lower_density=1e2,
                  sponge_timescale=1e-3, small_dens=1e-5, small_temp=1e5)
    p = p.with_ns("gravity", gravity_type="MonopoleGrav", drdxfac=2)
    p = p.with_ns("eos", eos_name="helmholtz")
    p = p.with_ns("network", network_name="general_null",
                  spec_names=("C12", "O16", "He4"))
    p = p.with_ns("tpu", dtype="float64")
    return p.replace(problem=merged)


def star_grav_init(sim, u):
    """Spherical C/O WD interpolated onto |x - center| (reference
    `StarGrav/problem_initialize_state_data.H:20-66`)."""
    from castro_tpu.utils import initial_models as im
    from castro_tpu.utils.initial_models import model_to_grid

    pp = dict(STARGRAV_DEFAULTS)
    pp.update(sim.params.problem)
    L = sim.layout
    g = sim.geom
    shape = u.shape[1:]

    rmax = float(g.prob_hi[0]) * 1.05
    nshell = 1024
    r1 = np.linspace(rmax / (2 * nshell), rmax, nshell)
    xn0 = np.zeros(L.nspec)
    xn0[0] = 0.5  # C12
    xn0[1] = 0.5  # O16
    xnj = jnp.asarray(xn0)
    model = im.hse_spherical(sim.eos, r1, pp["rho_c"], pp["T_c"],
                             lambda m: xnj, rho_cutoff=pp["rho_ambient"])

    if L.dim == 1:
        dist = jnp.broadcast_to(g.cell_centers(0, sim.ng), shape)
    else:
        axes = [jnp.broadcast_to(g.cell_centers(d, sim.ng), shape)
                for d in range(L.dim)]
        dist = jnp.sqrt(sum(a * a for a in axes))
    vals = model_to_grid(model, np.asarray(dist).reshape(-1))
    rho = jnp.asarray(vals["density"]).reshape(shape)
    T = jnp.asarray(vals["temperature"]).reshape(shape)
    xn = jnp.stack([jnp.asarray(vals[f"spec_{k}"]).reshape(shape)
                    for k in range(L.nspec)])
    return fill_from_prim(sim, u, rho, (0.0, 0.0, 0.0), T=T, xn=xn)


# ---------------------------------------------------------------------------
# hydrostatic_adjust (Exec/gravity_tests/hydrostatic_adjust): drive a star
# out of HSE with a central Gaussian heating layer for `heating_time`
# seconds, then watch it relax (problem_source.H prob_type=1; prob_type=3
# modulates the heating by the He mass fraction for the sub-chandra model).

HSE_ADJ_DEFAULTS = dict(prob_type=1, heating_time=0.5, heating_rad=0.0,
                        heating_peak=1.0e16, heating_sigma=1.0e7,
                        rho_c=2.0e9, T_c=1.0e7)


def hse_adjust_params(n=640, **prob):
    merged = dict(HSE_ADJ_DEFAULTS)
    merged.update(prob)
    p = Params()
    p = p.with_ns("amr", n_cell=(n,), stop_time=1.0)
    p = p.with_ns("geometry", coord_sys=2, prob_lo=(0.0,) * 3,
                  prob_hi=(5.0e8, 1.0, 1.0))
    p = p.with_ns("castro", lo_bc=(3,), hi_bc=(2,), cfl=0.9, do_grav=1,
                  add_ext_src=1, init_shrink=0.1, change_max=1.05,
                  small_temp=5e6, small_dens=1e-5)
    p = p.with_ns("gravity", gravity_type="MonopoleGrav")
    p = p.with_ns("eos", eos_name="helmholtz")
    p = p.with_ns("network", network_name="general_null",
                  spec_names=("C12", "O16", "He4"))
    p = p.with_ns("tpu", dtype="float64")
    return p.replace(problem=merged)


hse_adjust_init = star_grav_init  # same spherical HSE star construction


def make_hse_adjust_source(params):
    """Gaussian shell heating H0 exp(-(r-r0)^2/W^2) into UEINT/UEDEN,
    switched off after heating_time (problem_source.H:36-54)."""
    pp = dict(HSE_ADJ_DEFAULTS)
    pp.update(params.problem)
    H0, W0 = pp["heating_peak"], pp["heating_sigma"]
    r0, t_stop = pp["heating_rad"], pp["heating_time"]
    ihe = 2 if pp["prob_type"] == 3 else None

    def ext_src(sim, u, q, qaux, t, dt, ctx=None):
        g = ctx.geom if ctx is not None else sim.geom
        L = sim.layout
        shape = u.shape[1:]
        if L.dim == 1:
            dist = jnp.broadcast_to(g.cell_centers(0, sim.ng), shape)
        else:
            axes = [jnp.broadcast_to(g.cell_centers(d, sim.ng), shape)
                    for d in range(L.dim)]
            dist = jnp.sqrt(sum(a * a for a in axes))
        Hext = H0 * jnp.exp(-((dist - r0) ** 2) / (W0 * W0))
        if ihe is not None:  # sub-chandra: modulate by X(He)
            Hext = Hext * u[L.UFS + ihe] / jnp.maximum(u[L.URHO], 1e-30)
        rhoH = jnp.where(t > t_stop, 0.0, u[L.URHO] * Hext)
        src = jnp.zeros_like(u)
        src = src.at[L.UEINT].set(rhoH)
        src = src.at[L.UEDEN].set(rhoH)
        return src

    ext_src.name = "problem_source"
    return ext_src


# ---------------------------------------------------------------------------
# hse_convergence_general (Exec/gravity_tests/hse_convergence_general):
# 1D toy_atm helium atmosphere on the Helmholtz EOS, used to measure how
# well each hydro method (CTU/PLM, CTU/PPM, SDC) holds HSE. Convergence is
# measured as max |rho u| growth over one sound-crossing time.

HSE_GEN_DEFAULTS = dict(dens_base=2.0e6, T_star=1.0e8, T_hi=5.0e8,
                        T_lo=5.0e7, H_star=500.0, atm_delta=25.0)
HSE_GEN_G = -2.45e14


def hse_general_params(n=256, **prob):
    merged = dict(HSE_GEN_DEFAULTS)
    merged.update(prob)
    p = Params()
    p = p.with_ns("amr", n_cell=(n,), stop_time=1e-4)
    p = p.with_ns("geometry", prob_lo=(0.0,) * 3, prob_hi=(3.2e3, 1.0, 1.0))
    p = p.with_ns("castro", lo_bc=(1,), hi_bc=(2,), cfl=0.8, do_grav=1,
                  small_temp=1e6, small_dens=1e-5)
    p = p.with_ns("gravity", gravity_type="ConstantGrav", const_grav=HSE_GEN_G)
    p = p.with_ns("eos", eos_name="helmholtz")
    p = p.with_ns("network", network_name="general_null",
                  spec_names=("C12", "O16", "He4"))
    p = p.with_ns("tpu", dtype="float64")
    return p.replace(problem=merged)


def hse_general_init(sim, u):
    from castro_tpu.utils.initial_models import toy_atm, model_to_grid

    pp = dict(HSE_GEN_DEFAULTS)
    pp.update(sim.params.problem)
    L = sim.layout
    g = sim.geom
    shape = u.shape[1:]
    x1 = np.asarray(g.cell_centers_1d(0, sim.ng))
    xn_star = np.zeros(L.nspec)
    xn_star[0] = 1.0  # inert C12 substrate
    xn_base = np.zeros(L.nspec)
    xn_base[2] = 1.0  # helium fuel (fuel1_name = "helium-4")
    model = toy_atm(sim.eos, x1, pp["dens_base"], pp["T_star"], pp["T_hi"],
                    pp["T_lo"], pp["H_star"], pp["atm_delta"],
                    xn_star, xn_base, HSE_GEN_G)
    vals = model_to_grid(model, x1)
    rho = jnp.broadcast_to(jnp.asarray(vals["density"]), shape)
    T = jnp.broadcast_to(jnp.asarray(vals["temperature"]), shape)
    xn = jnp.stack([jnp.broadcast_to(jnp.asarray(vals[f"spec_{k}"]), shape)
                    for k in range(L.nspec)])
    return fill_from_prim(sim, u, rho, (0.0, 0.0, 0.0), T=T, xn=xn)
