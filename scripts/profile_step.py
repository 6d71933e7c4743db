"""Stage-by-stage timing of the 3D CTU step on the current backend."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np

from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import sedov
from castro_tpu.ops.advection_util import ctoprim, divu_node, shock
from castro_tpu.ops.ctu import ctu_hydro
from castro_tpu.ops.flatten import uflatten
from castro_tpu.ops.trace_ppm import trace_ppm
from castro_tpu.ops.riemann import cmpflx


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:24s} {dt*1e3:9.2f} ms")
    return out


def main(n=128):
    params = sedov.make_params(n=n, dim=3, stop_time=1.0, r_init=0.1,
                               exp_energy=0.5, dtype="float32")
    sim = Simulation(params, problem_init=sedov.problem_init)
    sim.init_data()
    L = sim.layout
    dt = np.float32(1e-5)

    print(f"grid {n}^3, NVAR={L.NVAR}, backend={jax.default_backend()}")

    u = sim.u
    fill = jax.jit(sim._fill)
    u = timeit("fill_ghosts", fill, u)

    c2p = jax.jit(lambda uu: ctoprim(uu, L, sim.eos, sim.cfg.small_dens, 1e-12))
    q, qaux = timeit("ctoprim", c2p, u)

    flat_fn = jax.jit(lambda qq: uflatten(qq, L))
    flat = timeit("flatten", flat_fn, q)

    tr = jax.jit(lambda qq, qa, fl: trace_ppm(qq, qa, None, fl, 0, dt,
                                              sim.geom.dx[0], L, 1e-12, 1e-20))
    qm, qp = timeit("trace_ppm (1 dir)", tr, q, qaux, flat)

    rs = jax.jit(lambda a, b, qa: cmpflx(a, b, qa, 0, L, sim.geom.coord, 0,
                                         1e-12, 1e-20))
    timeit("cmpflx (1 dir)", rs, qm, qp, qaux)

    hyd = jax.jit(lambda uu, qq, qa: ctu_hydro(uu, qq, qa, None, dt, sim.geom,
                                               L, sim.cfg))
    timeit("ctu_hydro (full)", hyd, u, q, qaux, n=3)

    step = jax.jit(lambda uu: sim._step_impl(uu, dt, 0.0))
    timeit("full step", step, sim.u, n=3)

    zups = n**3 / (timeit("full step again", step, sim.u, n=5) if False else 1)


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
