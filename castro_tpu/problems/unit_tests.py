"""Unit-test problem ports (reference `Exec/unit_tests/{diffusion_test,
particles_test}` + `scf_tests/single_star`).

- diffusion_test: pure thermal diffusion of a Gaussian temperature
  pulse with constant conductivity against the exact heat-kernel
  solution (`diffusion_test/problem_initialize_state_data.H`).
- particles_test: passive tracer particles advected by a solid-body
  velocity field (`particles_test` with vel_amp).
- single_star: a Simulation-integrated SCF initial model
  (`scf_tests/single_star`: castro.do_scf_initial_model=1) — a
  nonrotating or rotating polytrope relaxed by the Hachisu solver at
  init_data time.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from castro_tpu.config import Params
from castro_tpu.problems.util import fill_from_prim

# ---------------------------------------------------------------------------
# diffusion_test

DT_DEFAULTS = dict(diff_coeff=1.0, T1=1.0, T2=2.0, t_0=0.001, rho0=1.0)


def diffusion_params(n=64, dim=1, **prob):
    merged = dict(DT_DEFAULTS)
    merged.update(prob)
    p = Params()
    p = p.with_ns("amr", n_cell=(n,) * dim, stop_time=0.01)
    p = p.with_ns("geometry", prob_lo=(0.0,) * 3, prob_hi=(1.0,) * 3)
    p = p.with_ns("castro", lo_bc=(0,) * dim, hi_bc=(0,) * dim,
                  do_hydro=0, do_thermal_diffusion=1,
                  small_temp=1e-12, small_dens=1e-12, fixed_dt=-1.0)
    p = p.with_ns("eos", eos_gamma=1.4)
    p = p.with_ns("tpu", dtype="float64")
    # conductivity chosen so T diffuses with D = diff_coeff:
    # k = D * rho * cv (constant-conductivity module)
    from castro_tpu.utils import constants as C

    cv = C.k_B / (C.m_u * (1.4 - 1.0))
    k_cond = merged["diff_coeff"] * merged["rho0"] * cv
    return p.replace(problem=merged,
                     extra=dict(p.extra,
                                **{"conductivity.const_conductivity": k_cond}))


def diffusion_init(sim, u):
    """T = T1 + (T2-T1) exp(-r^2/(4 D t_0)): a heat kernel at t_0; at
    t_0 + t it stays Gaussian with width 4D(t_0+t)."""
    pp = dict(DT_DEFAULTS)
    pp.update(sim.params.problem)
    g = sim.geom
    shape = u.shape[1:]
    r2 = jnp.zeros(shape, u.dtype)
    for d in range(g.dim):
        x = jnp.broadcast_to(g.cell_centers(d, sim.ng), shape)
        c = 0.5 * (g.prob_lo[d] + g.prob_hi[d])
        r2 = r2 + (x - c) ** 2
    T = pp["T1"] + (pp["T2"] - pp["T1"]) * jnp.exp(
        -r2 / (4.0 * pp["diff_coeff"] * pp["t_0"]))
    rho = jnp.full(shape, pp["rho0"], u.dtype)
    return fill_from_prim(sim, u, rho, (0.0, 0.0, 0.0), T=T)


def diffusion_exact(r, t, pp):
    """Exact evolution of the Gaussian: amplitude scales as
    (t_0/(t_0+t))^{dim/2} (dim from the r array's context — 1D here)."""
    t0 = pp["t_0"]
    D = pp["diff_coeff"]
    amp = (pp["T2"] - pp["T1"]) * (t0 / (t0 + t)) ** 0.5
    return pp["T1"] + amp * np.exp(-np.asarray(r) ** 2 / (4.0 * D * (t0 + t)))


# ---------------------------------------------------------------------------
# particles_test

PT_DEFAULTS = dict(vel_amp=1.0)


def particles_params(n=64, **prob):
    merged = dict(PT_DEFAULTS)
    merged.update(prob)
    p = Params()
    p = p.with_ns("amr", n_cell=(n, n), stop_time=1.0)
    p = p.with_ns("geometry", prob_lo=(0.0,) * 3, prob_hi=(1.0,) * 3)
    p = p.with_ns("castro", lo_bc=(0, 0, 0), hi_bc=(0, 0, 0), cfl=0.5,
                  small_temp=1e-12, small_dens=1e-12)
    p = p.with_ns("eos", eos_gamma=1.4)
    p = p.with_ns("tpu", dtype="float64")
    return p.replace(problem=merged)


def particles_init(sim, u):
    """Solid-body rotation about the box center: u = -amp*(y-1/2),
    v = amp*(x-1/2), uniform rho/p — tracers should circle."""
    pp = dict(PT_DEFAULTS)
    pp.update(sim.params.problem)
    g = sim.geom
    shape = u.shape[1:]
    x = jnp.broadcast_to(g.cell_centers(0, sim.ng), shape)
    y = jnp.broadcast_to(g.cell_centers(1, sim.ng), shape)
    vx = -pp["vel_amp"] * (y - 0.5)
    vy = pp["vel_amp"] * (x - 0.5)
    rho = jnp.ones(shape, u.dtype)
    pres = jnp.full(shape, 10.0, u.dtype)  # stiff: flow stays ~steady
    return fill_from_prim(sim, u, rho, (vx, vy, 0.0), p=pres)


# ---------------------------------------------------------------------------
# single_star (scf_tests)

SS_DEFAULTS = dict(ambient_dens=1.0e-8)


def single_star_params(n=48, L=2.0, rotating=False, **prob):
    """n=1 polytrope SCF model through the Simulation driver path
    (castro.do_scf_initial_model, scf_relax.cpp)."""
    merged = dict(SS_DEFAULTS)
    merged.update(prob)
    from castro_tpu.utils import constants as C

    K = 2.0 * C.Gconst / np.pi  # n=1 polytrope with R = 1
    p = Params()
    p = p.with_ns("amr", n_cell=(n, n, n), stop_time=1.0)
    p = p.with_ns("geometry", prob_lo=(-L, -L, -L), prob_hi=(L, L, L))
    p = p.with_ns("castro", lo_bc=(2,) * 3, hi_bc=(2,) * 3, cfl=0.5,
                  do_grav=1, do_scf_initial_model=1,
                  scf_maximum_density=1.0,
                  scf_equatorial_radius=1.0 if rotating else 0.95,
                  scf_polar_radius=0.8 if rotating else -1.0,
                  small_dens=merged["ambient_dens"], small_temp=1e-12)
    p = p.with_ns("gravity", gravity_type="PoissonGrav")
    p = p.with_ns("eos", eos_name="polytrope", polytrope_gamma=2.0,
                  polytrope_K=K)
    p = p.with_ns("tpu", dtype="float64")
    return p.replace(problem=merged)


def single_star_init(sim, u):
    """Ambient seed; the SCF relaxation in init_data replaces it."""
    pp = dict(SS_DEFAULTS)
    pp.update(sim.params.problem)
    shape = u.shape[1:]
    rho = jnp.full(shape, max(pp["ambient_dens"], 1e-8), u.dtype)
    return fill_from_prim(sim, u, rho, (0.0, 0.0, 0.0), T=jnp.ones(shape))


def model_burner(model, burn_dt, network, eos):
    """`Exec/unit_tests/model_burner` (problem_initialize.H:1-50): read a
    1D initial model, burn EVERY zone for burn_dt with the production
    burner, and report the per-zone specific energy release
    enuc = (e_new - e)/burn_dt. `model`: an InitialModel or a file path
    (the reference's read_model_file). Returns (xn_new [nspec, npts],
    enuc [npts], fail [npts] bool)."""
    import jax.numpy as jnp

    from castro_tpu.integrators.stiff import make_burner
    from castro_tpu.utils.model_parser import InitialModel

    if isinstance(model, str):
        model = InitialModel.from_file(model)
    rho = jnp.asarray(model.data["density"])
    T = jnp.asarray(model.data["temperature"])
    xn = jnp.stack([jnp.asarray(model.data[s.lower()])
                    for s in network.spec_names])
    es = eos.rt(rho=rho, T=T, xn=xn)
    burn = make_burner(network, eos)
    xn_new, e_new, fail = burn(rho, T, xn, es.e, burn_dt)
    enuc = (e_new - es.e) / burn_dt
    return xn_new, enuc, fail
