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
