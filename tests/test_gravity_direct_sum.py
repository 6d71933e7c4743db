"""Direct-summation boundary potential (reference fill_direct_sum_BCs,
Gravity.cpp:1745-1910; gravity.direct_sum_bcs=1)."""

import numpy as np

import jax.numpy as jnp

from castro_tpu.config import Params
from castro_tpu.driver.sim import Simulation
from castro_tpu.problems.util import fill_from_prim


def _mk(n, direct):
    p = Params()
    p = p.with_ns("amr", n_cell=(n,) * 3)
    p = p.with_ns("geometry", prob_lo=(-1.0,) * 3, prob_hi=(1.0,) * 3)
    p = p.with_ns("castro", lo_bc=(2,) * 3, hi_bc=(2,) * 3, do_grav=1,
                  small_dens=1e-10)
    p = p.with_ns("gravity", gravity_type="PoissonGrav",
                  max_multipole_order=6, direct_sum_bcs=direct)
    p = p.with_ns("tpu", dtype="float64")
    return p


def _sphere(sim, u):
    r = sim.geom.radius(sim.ng, center=(0.0, 0.0, 0.0))
    rho = jnp.where(r < 0.5, 1.0, 1e-6)
    return fill_from_prim(sim, u, rho, (0.0, 0.0, 0.0), p=1.0)


def test_direct_sum_bcs_match_multipole_for_sphere():
    """For a centered uniform sphere the multipole BCs are already exact
    (monopole); direct summation must agree closely, validating the
    kernel against an independent formulation."""
    phis = []
    for direct in (0, 1):
        sim = Simulation(_mk(16, direct), problem_init=_sphere)
        sim.init_data()
        g0 = next(fn.gravity for fn in sim.source_fns
                  if getattr(fn, "name", "") == "grav")
        from castro_tpu.ops.stencil import interior_slice
        rho = sim.u[(sim.layout.URHO,) + interior_slice(sim.ng, 3)[1:]]
        phis.append(np.asarray(g0._poisson(rho)[1]))
    scale = np.abs(phis[0]).max()
    assert np.abs(phis[0] - phis[1]).max() / scale < 5e-3, \
        np.abs(phis[0] - phis[1]).max() / scale


def test_direct_sum_bcs_beat_low_order_multipole_offcenter():
    """An OFF-center blob: l<=0 multipole truncates badly; direct
    summation is exact up to quadrature, so its phi at the boundary is
    closer to the high-order multipole answer."""
    def blob(sim, u):
        r = sim.geom.radius(sim.ng, center=(0.45, 0.3, 0.2))
        rho = jnp.where(r < 0.3, 1.0, 1e-6)
        return fill_from_prim(sim, u, rho, (0.0, 0.0, 0.0), p=1.0)

    out = {}
    for tag, (direct, lmax) in {"l0": (0, 0), "direct": (1, 0),
                                "l6": (0, 6)}.items():
        p = _mk(16, direct).with_ns("gravity", max_multipole_order=lmax,
                                    direct_sum_bcs=direct)
        sim = Simulation(p, problem_init=blob)
        sim.init_data()
        g0 = next(fn.gravity for fn in sim.source_fns
                  if getattr(fn, "name", "") == "grav")
        from castro_tpu.ops.stencil import interior_slice
        rho = sim.u[(sim.layout.URHO,) + interior_slice(sim.ng, 3)[1:]]
        out[tag] = np.asarray(g0._poisson(rho)[1])
    scale = np.abs(out["l6"]).max()
    e_l0 = np.abs(out["l0"] - out["l6"]).max() / scale
    e_direct = np.abs(out["direct"] - out["l6"]).max() / scale
    assert e_direct < 0.5 * e_l0, (e_direct, e_l0)
