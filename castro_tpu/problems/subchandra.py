"""sub_chandra: double-detonation sub-Chandrasekhar SN Ia setup — a CO
white dwarf with a helium shell, perturbed at the base of the shell
(reference `Exec/science/subchandra`: spherical HSE model interpolated
onto the grid + the tanh temperature perturbation convolved with X(He4),
`problem_initialize_state_data.H:25-86`).

The reference reads a pre-built model file (`sub_chandra.M_WD-*.hse.*`);
here the model is generated at init by the spherical HSE integrator
(`utils/initial_models.hse_spherical`) with the He-shell composition hung
on the mass coordinate — same structure, no offline tool.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from castro_tpu.config import Params
from castro_tpu.utils import constants as C

DEFAULTS = dict(
    M_WD=1.0 * C.M_solar,     # CO core mass target
    M_He=0.05 * C.M_solar,    # He shell mass
    T_core=1.0e7,
    T_shell=2.0e8,            # reference models: hot shell base
    pert_temp_factor=20.0,
    pert_rad_factor=8.0,
    R_pert=-1.0,              # <0: auto = shell-base radius
    rho_cutoff=1.0e-4,
)

# subch composition indices (network/subch.py: aprox13 order + N14/F18/Ne21/H1)
IHE4, IC12, IO16, IN14 = 0, 1, 2, 13


def make_params(n=(128, 256), dim=2, **prob):
    merged = dict(DEFAULTS)
    merged.update(prob)
    p = Params()
    if dim == 1:
        p = p.with_ns("amr", n_cell=(n if np.isscalar(n) else n[0],))
        p = p.with_ns("geometry", coord_sys=2, prob_lo=(0.0, 0.0, 0.0),
                      prob_hi=(1.25e9, 1.0, 1.0))
        p = p.with_ns("castro", lo_bc=(3,), hi_bc=(2,))
    else:
        p = p.with_ns("amr", n_cell=tuple(n))
        p = p.with_ns("geometry", coord_sys=1, prob_lo=(0.0, -1.25e9, 0.0),
                      prob_hi=(1.25e9, 1.25e9, 1.0))
        p = p.with_ns("castro", lo_bc=(3, 2), hi_bc=(2, 2))
    p = p.with_ns("castro", do_grav=1, do_react=1, do_sponge=1,
                  small_dens=1e-5, small_temp=1e5, cfl=0.5,
                  sponge_upper_density=1e-2, sponge_lower_density=1e-4,
                  sponge_timescale=1e-3)
    p = p.with_ns("gravity", gravity_type="MonopoleGrav")
    p = p.with_ns("eos", eos_name="helmholtz")
    p = p.with_ns("network", network_name="subch", nspec=17)
    p = p.with_ns("tpu", dtype="float64")
    return p.replace(problem=merged)


def build_model(sim, nshell=1024):
    """Spherical CO-WD + He-shell HSE model on a fine 1D radial mesh."""
    from castro_tpu.utils import initial_models as im

    pp = dict(DEFAULTS)
    pp.update(sim.params.problem)
    L = sim.layout
    rmax = float(sim.geom.prob_hi[0]) * 1.1
    r = np.linspace(rmax / (2 * nshell), rmax, nshell)

    M_core = pp["M_WD"]
    co = np.zeros(L.nspec)
    co[IC12] = 0.5
    co[IO16] = 0.5
    he = np.zeros(L.nspec)
    he[IHE4] = 0.99
    he[IN14] = 0.01          # N14 admixture driving the subch bypass
    co_j, he_j = jnp.asarray(co), jnp.asarray(he)

    def xn_of_m(m):
        return jnp.where(m <= M_core, co_j, he_j)

    def T_of_rho(rho):
        # crude core/shell split: the shell is hotter (reference models
        # carry T(r) from the offline build; isothermal-per-layer here)
        return jnp.where(rho > 1e5, pp["T_core"], pp["T_shell"])

    model = im.wd_model_for_mass(
        sim.eos, r, M_core + pp["M_He"], pp["T_core"], xn_of_m,
        T_of_rho=T_of_rho, rho_cutoff=pp["rho_cutoff"])
    # shell-base radius: where He first dominates
    he = model[f"spec_{IHE4}"]
    idx = np.argwhere(he > 0.5)
    model["R_shell_base"] = float(model["r"][idx.min()]) if idx.size \
        else 0.8 * rmax
    return model


def problem_init(sim, u, model=None):
    pp = dict(DEFAULTS)
    pp.update(sim.params.problem)
    L = sim.layout
    g = sim.geom
    model = model if model is not None else build_model(sim)
    shape = u.shape[1:]

    if L.dim == 1:
        dist = jnp.broadcast_to(g.cell_centers(0, sim.ng), shape)
        xoff = dist
        yoff = jnp.zeros_like(dist)
    else:
        x = jnp.broadcast_to(g.cell_centers(0, sim.ng), shape)
        y = jnp.broadcast_to(g.cell_centers(1, sim.ng), shape)
        xoff = x
        yoff = y  # RZ: axis at r=0, center at z=0
        dist = jnp.sqrt(x * x + y * y)

    rq = np.asarray(dist).reshape(-1)
    from castro_tpu.utils.initial_models import model_to_grid

    vals = model_to_grid(model, rq)
    rho = jnp.asarray(vals["density"]).reshape(shape)
    T = jnp.asarray(vals["temperature"]).reshape(shape)
    xn = jnp.stack([jnp.asarray(vals[f"spec_{k}"]).reshape(shape)
                    for k in range(L.nspec)])

    # tanh temperature perturbation at the shell base, weighted by X_He
    R_pert = pp["R_pert"] if pp["R_pert"] > 0 else model["R_shell_base"]
    r1 = jnp.sqrt(xoff ** 2 + (yoff - R_pert) ** 2) / (
        2.5e6 * pp["pert_rad_factor"])
    X_he = xn[IHE4]
    T = T * (1.0 + X_he * pp["pert_temp_factor"] *
             (0.150 * (1.0 + jnp.tanh(2.0 - r1))))

    from castro_tpu.problems.util import fill_from_prim

    return fill_from_prim(sim, u, rho, (0.0, 0.0, 0.0), T=T, xn=xn)
