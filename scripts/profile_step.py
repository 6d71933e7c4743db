"""Stage-by-stage timing of the 3D CTU step on the current backend.

Methodology: each stage runs K times inside one jitted `lax.fori_loop`
with a data dependency threaded through the carry, and the result is
fetched to host — single-dispatch wall-clock, immune to async-dispatch
pipelining (the axon tunnel otherwise reports impossible speeds for
dispatch-per-iteration loops).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import sedov
from castro_tpu.ops.advection_util import ctoprim
from castro_tpu.ops.ctu import ctu_hydro


def timeloop(name, stage, u0, k=20):
    """stage: u -> pytree. Chains a scalar of the output back into u."""

    @jax.jit
    def loop(u):
        def body(i, u):
            out = stage(u)
            s = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out))
            return u * (1.0 + 0.0 * s)

        return lax.fori_loop(0, k, body, u)

    r = loop(u0)
    np.asarray(r[0, 0, 0, 0])  # force
    t0 = time.perf_counter()
    r = loop(u0)
    np.asarray(r[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / k
    print(f"{name:30s} {dt*1e3:9.2f} ms")


def main(n=120):
    params = sedov.make_params(n=n, dim=3, stop_time=1.0, r_init=0.1,
                               exp_energy=0.5, dtype="float32")
    sim = Simulation(params, problem_init=sedov.problem_init)
    sim.init_data()
    L = sim.layout
    dt = np.float32(1e-5)
    print(f"grid {n}^3, NVAR={L.NVAR}, NQ={L.NQ}, backend={jax.default_backend()}")

    u = sim._jit_clean_fill(sim.u)
    q, qaux = jax.jit(lambda uu: ctoprim(uu, L, sim.eos, sim.cfg.small_dens,
                                         1e-12))(u)

    timeloop("clean_fill", lambda uu: sim._clean_fill_impl(uu), u)
    timeloop("ctoprim", lambda uu: ctoprim(uu, L, sim.eos,
                                           sim.cfg.small_dens, 1e-12), u)

    from castro_tpu.ops.flatten import uflatten

    timeloop("flatten", lambda uu: uflatten(
        ctoprim(uu, L, sim.eos, sim.cfg.small_dens, 1e-12)[0], L), u)

    from castro_tpu.ops import pallas_kernels as pk
    from castro_tpu.ops.trace_ppm import trace_ppm

    flatn = jax.jit(lambda qq: uflatten(qq, L))(q)
    if sim.cfg.use_pallas:
        for d in range(3):
            timeloop(f"trace pallas d={d}",
                     lambda uu, d=d: pk.trace_ppm_pallas(
                         q * (1 + 0 * uu[0, 0, 0, 0]), qaux, None, flatn, d,
                         dt, sim.geom.dx[d], L, 1e-12, 1e-12, 1e-12), u)
    from castro_tpu.ops.riemann import cmpflx

    timeloop("cmpflx (1 dir)",
             lambda uu: cmpflx(q * (1 + 0 * uu[0, 0, 0, 0]), q, qaux, 2, L,
                               sim.geom.coord, use_pallas=sim.cfg.use_pallas,
                               small_dens=1e-12, small_pres=1e-12), u)

    timeloop("ctu_hydro (full)",
             lambda uu: ctu_hydro(uu, q * (1 + 0 * uu[0, 0, 0, 0]), qaux,
                                  None, dt, sim.geom, L, sim.cfg), u)
    timeloop("full step", lambda uu: sim._step_impl(uu, dt, 0.0)[0], u)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 120)
