import sys; sys.path.insert(0, "/root/repo")
import time
import jax
import jax.numpy as jnp
import numpy as np

from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import sedov
from castro_tpu.ops import pallas_kernels as pk

n = 120
params = sedov.make_params(n=n, dim=3, stop_time=1.0, r_init=0.1,
                           exp_energy=0.5, dtype="float32")
sim = Simulation(params, problem_init=sedov.problem_init)
sim.init_data()
L = sim.layout
cfg = sim.cfg
dt = np.float32(float(sim._jit_estdt(sim.u)) * 0.5)
u = sim.u

def timeit(name, fn, *args, reps=30):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:34s} {ms:8.3f} ms")

timeit("FULL _step_impl", lambda u, dt: sim._step_impl(u, dt, 0.0)[0], u, dt)
q, qaux, divn = jax.jit(lambda u: pk.prim_aux_pallas(u, L, sim.eos, cfg.small_dens, 1e-200, sim.geom.dx))(u)
timeit("prim_aux (ctoprim+divu)", lambda u: pk.prim_aux_pallas(u, L, sim.eos, cfg.small_dens, 1e-200, sim.geom.dx), u)
timeit("flatten_pallas", lambda q: pk.flatten_pallas(q, L), q)
flatn = jax.jit(lambda q: pk.flatten_pallas(q, L))(q)
from castro_tpu.ops.pallas_kernels import trace_ppm_pallas, ctu_face_pallas, consup_pallas, clean_fill_pallas
for d in range(3):
    timeit(f"trace d={d}", lambda q, qa, f, d=d: trace_ppm_pallas(q, qa, None, f, d, dt, sim.geom.dx[d], L, cfg.small_dens, cfg.small_pres, cfg.small_ener), q, qaux, flatn)
qm, qp = jax.jit(lambda q, qa, f: trace_ppm_pallas(q, qa, None, f, 0, dt, sim.geom.dx[0], L, cfg.small_dens, cfg.small_pres, cfg.small_ener))(q, qaux, flatn)
def f1d(qm, qp, qaux, d=0):
    return ctu_face_pallas(qm, qp, qaux, d, [], L, sim.geom.coord, 0, cfg.small_dens, cfg.small_pres, True, False)
timeit("face f1d d=0", f1d, qm, qp, qaux)
fx, qe = jax.jit(f1d)(qm, qp, qaux)
def corner_ib(qm, qp, qaux, fx, qe):
    # t=2 in-block for n=0
    return ctu_face_pallas(qm, qp, qaux, 0, [{"flux": fx, "qe": qe, "t_dir": 2, "cdtdx": dt/3/sim.geom.dx[2]}], L, sim.geom.coord, 0, cfg.small_dens, cfg.small_pres, True, False)
timeit("face corner (t in-block)", corner_ib, qm, qp, qaux, fx, qe)
def corner_ps(qm, qp, qaux, fx, qe):
    # t=1 pre-shift for n=0
    return ctu_face_pallas(qm, qp, qaux, 0, [{"flux": fx, "qe": qe, "t_dir": 1, "cdtdx": dt/3/sim.geom.dx[1]}], L, sim.geom.coord, 0, cfg.small_dens, cfg.small_pres, True, False)
timeit("face corner (t pre-shift)", corner_ps, qm, qp, qaux, fx, qe)
def final(qm, qp, qaux, fx, qe):
    return ctu_face_pallas(qm, qp, qaux, 0, [
        {"flux": fx, "qe": qe, "t_dir": 1, "cdtdx": dt/2/sim.geom.dx[1]},
        {"flux": fx, "qe": qe, "t_dir": 2, "cdtdx": dt/2/sim.geom.dx[2]}], L, sim.geom.coord, 0, cfg.small_dens, cfg.small_pres, True, False)
timeit("face final", final, qm, qp, qaux, fx, qe)
def consup(fx, qe, divn, u):
    h = jnp.zeros_like(u)
    h, _ = consup_pallas(h, fx, qe[L.GDPRES], qe[L.GDU], divn, u, 0, L, cfg.difmag, sim.geom.dx)
    return h
timeit("consup d=0", consup, fx, qe, divn, u)
timeit("clean_fill_pallas", lambda u: clean_fill_pallas(u, L, sim.eos, cfg.lo_bc, cfg.hi_bc, sim.ng, cfg.small_dens, 1e-200, 1e-4, True), u)
from castro_tpu.ops import advection_util as au
timeit("max_courant whole", lambda q, qa: au.max_courant(q, qa, dt, sim.geom, L, sim.ng, whole_grid=True), q, qaux)
timeit("u + dt*hsrc", lambda u, h: u + dt * h, u, u)
