"""Gravity verification: uniform-sphere field (Poisson + monopole paths,
the DustCollapse/A4 analog) and constant-gravity hydrostatic balance
(the hse_convergence analog, SURVEY.md §4.3)."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.config import Params
from castro_tpu.driver.sim import Simulation
from castro_tpu.gravity import Gravity
from castro_tpu.problems.util import fill_from_prim
from castro_tpu.state import layout_from_params
from castro_tpu.geometry import geometry_from_params
from castro_tpu.utils import constants as C


def sphere_params(n=32, gtype="PoissonGrav"):
    p = Params()
    p = p.with_ns("amr", n_cell=(n, n, n))
    p = p.with_ns("geometry", prob_lo=(-1.0, -1.0, -1.0), prob_hi=(1.0, 1.0, 1.0))
    p = p.with_ns("castro", lo_bc=(2, 2, 2), hi_bc=(2, 2, 2), do_grav=1)
    p = p.with_ns("gravity", gravity_type=gtype)
    p = p.with_ns("tpu", dtype="float64")
    return p


@pytest.mark.parametrize("gtype", ["PoissonGrav", "MonopoleGrav"])
def test_uniform_sphere_field(gtype):
    params = sphere_params(32, gtype)
    layout = layout_from_params(params)
    geom = geometry_from_params(params)
    grav = Gravity(params, geom, layout, 4)

    n = 32
    x = np.asarray(geom.cell_centers_1d(0, 0))
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    r = np.sqrt(X**2 + Y**2 + Z**2)
    R = 0.5
    rho = np.where(r < R, 1.0, 0.0)
    M = 4.0 / 3.0 * np.pi * R**3

    g3, phi = grav.grav_vector(jnp.asarray(rho))
    g3 = np.asarray(g3)
    gmag = np.sqrt((g3**2).sum(axis=0))

    g_exact = np.where(r < R, C.Gconst * M * r / R**3, C.Gconst * M / r**2)
    # compare away from the surface discontinuity and the singular center
    mask = (r > 0.25) & ((r < 0.4) | (r > 0.65)) & (r < 0.95)
    rel = np.abs(gmag - g_exact)[mask] / g_exact[mask]
    assert rel.mean() < 0.05, rel.mean()
    assert rel.max() < 0.25, rel.max()

    # direction: radial inward
    gr = (g3[0] * X + g3[1] * Y + g3[2] * Z) / np.maximum(r, 1e-10)
    assert (gr[mask] < 0).all()


def test_constant_gravity_hse():
    """Discrete hydrostatic atmosphere stays static (velocities ~ 0)."""
    n = 64
    p = Params()
    p = p.with_ns("amr", n_cell=(n,))
    p = p.with_ns("geometry", prob_lo=(0.0,), prob_hi=(1.0,))
    p = p.with_ns("castro", lo_bc=(3,), hi_bc=(3,), do_grav=1, cfl=0.5,
                  small_dens=1e-12, small_temp=1e-12, small_pres=1e-15)
    p = p.with_ns("gravity", gravity_type="ConstantGrav", const_grav=-1.0)
    p = p.with_ns("eos", eos_gamma=1.4)
    p = p.with_ns("tpu", dtype="float64")

    H = 0.5  # scale height; isothermal: p = c2*rho, c2 = |g|*H
    c2 = 1.0 * H

    def init(sim, u):
        z = np.asarray(sim.geom.cell_centers_1d(0, sim.ng))
        dz = sim.geom.dx[0]
        # discrete HSE: p_{i+1} = p_i + 0.5*(rho_i + rho_{i+1})*g*dz
        rho = np.exp(-z / H)
        pres = np.empty_like(rho)
        pres[0] = c2 * rho[0]
        for i in range(1, len(z)):
            pres[i] = pres[i - 1] + 0.5 * (rho[i] + rho[i - 1]) * (-1.0) * dz
        return fill_from_prim(sim, u, jnp.asarray(rho), (0.0, 0.0, 0.0),
                              p=jnp.asarray(pres))

    sim = Simulation(p, problem_init=init)
    sim.run(stop_time=1.0, max_step=2000, verbose=False)

    L = sim.layout
    ui = np.asarray(sim.interior())
    vel = np.abs(ui[L.UMX] / ui[L.URHO])
    cs = np.sqrt(1.4 * c2)
    # interior balance; the outermost cells feel the reflect-BC/gravity
    # mismatch (the reference fixes that with its hse_fill BC, TODO)
    assert vel[2:-2].max() < 5e-3 * cs, vel[2:-2].max()
    assert vel.max() < 0.05 * cs, vel.max()


def test_multipole_boundary_conditions_offset_blob():
    """Isolated Poisson BCs via the full multipole expansion (reference
    fill_multipole_BCs, Gravity.cpp:1579-1743): an off-center compact blob
    must recover the point-mass field far away much more accurately with
    l<=6 moments than with the monopole alone."""
    import jax.numpy as jnp
    from castro_tpu.config import Params
    from castro_tpu.geometry import geometry_from_params
    from castro_tpu.gravity import Gravity
    from castro_tpu.state import layout_from_params
    from castro_tpu.utils import constants as C

    n = 32

    def solve(lnum):
        p = Params()
        p = p.with_ns("amr", n_cell=(n, n, n))
        p = p.with_ns("geometry", prob_lo=(-1.0,) * 3, prob_hi=(1.0,) * 3)
        p = p.with_ns("castro", lo_bc=(2, 2, 2), hi_bc=(2, 2, 2))
        p = p.with_ns("gravity", gravity_type="PoissonGrav",
                      max_multipole_order=lnum)
        geom = geometry_from_params(p, jnp.float64)
        grav = Gravity(p, geom, layout_from_params(p), 4)

        x = np.asarray(geom.cell_centers_1d(0, 0))
        X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
        x0 = (0.35, 0.2, -0.15)
        r2 = (X - x0[0])**2 + (Y - x0[1])**2 + (Z - x0[2])**2
        sig = 0.08
        rho = np.exp(-r2 / (2 * sig**2))
        g3, phi = grav.grav_vector(jnp.asarray(rho))
        g3 = np.asarray(g3)

        # compare |g| against the point-mass value in far-field cells
        dx3 = float(np.prod(geom.dx))
        M = rho.sum() * dx3
        rr = np.sqrt(r2)
        far = rr > 0.7
        gmag = np.sqrt((g3[:3] ** 2).sum(axis=0))
        gref = C.Gconst * M / rr**2
        rel = np.abs(gmag - gref) / gref
        return rel[far].max()

    err0 = solve(0)
    err6 = solve(6)
    assert err6 < err0 / 3.0, (err0, err6)
    assert err6 < 0.02, err6
