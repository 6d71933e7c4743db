import sys; sys.path.insert(0, "/root/repo")
"""Stage-level timing of the CTU step on the real TPU (bench config)."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import sedov
from castro_tpu.ops.advection_util import ctoprim
from castro_tpu.ops import advection_util as au
from castro_tpu.ops.ctu import ctu_hydro, _bnd_masks
from castro_tpu.ops.flatten import uflatten
from castro_tpu.ops.fill import fill_ghosts

n = 120
params = sedov.make_params(n=n, dim=3, stop_time=1.0, r_init=0.1,
                           exp_energy=0.5, dtype="float32")
sim = Simulation(params, problem_init=sedov.problem_init)
sim.init_data()
L = sim.layout
cfg = sim.cfg
print("use_pallas:", cfg.use_pallas, "NQ:", L.NQ, "NVAR:", L.NVAR,
      "nspec:", L.nspec, "check_cfl:", sim.params.castro.check_cfl_violation)
dt = np.float32(float(sim._jit_estdt(sim.u)) * 0.5)
u = sim.u


def timeit(name, fn, *args, reps=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:34s} {ms:8.3f} ms")
    return ms


# full step
timeit("FULL _step_impl", lambda u, dt: sim._step_impl(u, dt, 0.0)[0], u, dt)

# stages
timeit("fill_ghosts", lambda u: sim._fill(u), u)
q, qaux = jax.jit(lambda u: ctoprim(u, L, sim.eos, cfg.small_dens, 1e-200))(u)
timeit("ctoprim", lambda u: ctoprim(u, L, sim.eos, cfg.small_dens, 1e-200), u)
timeit("flatten", lambda q: uflatten(q, L), q)
timeit("divu_node", lambda q: au.divu_node(q, sim.geom.dx, L), q)

from castro_tpu.ops.trace_ppm import trace_ppm
from castro_tpu.ops.pallas_kernels import trace_ppm_pallas
from castro_tpu.ops.riemann import cmpflx

flatn = jax.jit(lambda q: uflatten(q, L))(q)
for d in range(3):
    timeit(f"trace_ppm_pallas d={d}",
           lambda q, qaux, flatn: trace_ppm_pallas(
               q, qaux, None, flatn, d, dt, sim.geom.dx[d], L,
               cfg.small_dens, cfg.small_pres, cfg.small_ener),
           q, qaux, flatn)

qm, qp = jax.jit(lambda q, qaux, flatn: trace_ppm_pallas(
    q, qaux, None, flatn, 0, dt, sim.geom.dx[0], L,
    cfg.small_dens, cfg.small_pres, cfg.small_ener))(q, qaux, flatn)

masks = [None, None, None]
for d in range(3):
    timeit(f"cmpflx(pallas) d={d}",
           lambda qm, qp, qaux: cmpflx(qm, qp, qaux, d, L, sim.geom.coord,
                                       riemann_solver=cfg.riemann_solver,
                                       small_dens=cfg.small_dens,
                                       small_pres=cfg.small_pres,
                                       bnd_mask=None, use_pallas=True),
           qm, qp, qaux)

# fused trans+cmpflx stage (single corner term)
from castro_tpu.ops.pallas_kernels import trans_cmpflx_pallas
from castro_tpu.ops.trans import _term_bundle
from castro_tpu.ops.stencil import shifted

flux, qe = jax.jit(lambda qm, qp, qaux: cmpflx(
    qm, qp, qaux, 1, L, sim.geom.coord, riemann_solver=cfg.riemann_solver,
    small_dens=cfg.small_dens, small_pres=cfg.small_pres,
    use_pallas=True))(qm, qp, qaux)


def corner(qm, qp, flux, qe, qaux):
    nrm = 0
    term = {"flux": flux, "qe": qe, "t_ax": 1, "t_dir": 1,
            "cdtdx": dt / 3.0 / sim.geom.dx[1]}
    c_arr = qaux[L.QC]
    g_arr = qaux[L.QGAMC]
    df_p, dre_p, dp_p = _term_bundle([term], qaux, nrm, 0, L)
    df_m, dre_m, dp_m = _term_bundle([term], qaux, nrm, -1, L)
    return trans_cmpflx_pallas(
        qm, qp, df_m, df_p, dre_m, dre_p, dp_m, dp_p,
        shifted(g_arr, -1, nrm), g_arr, shifted(c_arr, -1, nrm), c_arr,
        nrm, L, sim.geom.coord, cfg.riemann_solver, cfg.small_dens,
        cfg.small_pres, cfg.transverse_reset_density,
        cfg.transverse_reset_rhoe)


timeit("fused trans+cmpflx (1 corner)", corner, qm, qp, flux, qe, qaux)

# whole ctu_hydro
timeit("ctu_hydro (all)",
       lambda u, q, qaux: ctu_hydro(u, q, qaux, None, dt, sim.geom, L, cfg)[0],
       u, q, qaux)

timeit("clean_fill", lambda u: sim._clean_fill_impl(u), u)
timeit("max_courant", lambda q, qaux: au.max_courant(q, qaux, dt, sim.geom,
                                                     L, sim.ng), q, qaux)
