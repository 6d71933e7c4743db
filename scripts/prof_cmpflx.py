import sys; sys.path.insert(0,"/root/repo")
import time, jax, jax.numpy as jnp, numpy as np
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import sedov
from castro_tpu.ops import riemann as rm
from castro_tpu.ops import pallas_kernels as pk

n=120
params = sedov.make_params(n=n, dim=3, stop_time=1.0, r_init=0.1, exp_energy=0.5, dtype="float32")
sim = Simulation(params, problem_init=sedov.problem_init)
sim.init_data()
L=sim.layout; cfg=sim.cfg
from castro_tpu.ops.advection_util import ctoprim
q, qaux = jax.jit(lambda u: ctoprim(u, L, sim.eos, cfg.small_dens, 1e-200))(sim.u)
from castro_tpu.ops.flatten import uflatten
flatn = jax.jit(lambda q: uflatten(q, L))(q)
from castro_tpu.ops.pallas_kernels import trace_ppm_pallas
dt = np.float32(1e-4)
qm, qp = jax.jit(lambda q,qa,f: trace_ppm_pallas(q,qa,None,f,0,dt,sim.geom.dx[0],L,cfg.small_dens,cfg.small_pres,cfg.small_ener))(q,qaux,flatn)
gshape = q.shape[1:]
gl = jnp.roll(qaux[L.QGAMC],1,0); gr = qaux[L.QGAMC]
cl = jnp.roll(qaux[L.QC],1,0); cr = qaux[L.QC]

def timeit(name, f, *args, reps=30):
    ff=jax.jit(f); out=ff(*args); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(reps): out=ff(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/reps*1e3:7.3f} ms")

def make_cmpflx(tiles):
    def f(qm,qp,gl,gr,cl,cr):
        grid = tuple(gshape[i]//tiles[i] for i in range(len(tiles)))
        def bs(nc):
            block=(nc,)+tuple(tiles)+(gshape[2],) if len(tiles)==2 else (nc,)+tuple(tiles)
            if len(tiles)==2:
                return pl.BlockSpec((nc,tiles[0],tiles[1],gshape[2]), lambda i,j:(0,i,j,0))
            return pl.BlockSpec((nc,tiles[0],gshape[1],gshape[2]), lambda i:(0,i,0,0))
        def kernel(qm_ref,qp_ref,gl_ref,gr_ref,cl_ref,cr_ref,flux_ref,qe_ref):
            flux,qg = pk._riemann_block(qm_ref[...],qp_ref[...],gl_ref[0],gr_ref[0],cl_ref[0],cr_ref[0],0,L,sim.geom.coord,0,cfg.small_dens,cfg.small_pres)
            flux_ref[...]=flux; qe_ref[...]=qg
        out_shape=(jax.ShapeDtypeStruct((L.NVAR,)+gshape,jnp.float32),
                   jax.ShapeDtypeStruct((L.NGDNV,)+gshape,jnp.float32))
        return pl.pallas_call(kernel, grid=grid,
            in_specs=[bs(L.NQ),bs(L.NQ),bs(1),bs(1),bs(1),bs(1)],
            out_specs=(bs(L.NVAR),bs(L.NGDNV)), out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024))(qm,qp,gl[None],gr[None],cl[None],cr[None])
    return f

timeit("cmpflx current (16,16)", make_cmpflx((16,16)), qm,qp,gl,gr,cl,cr)
timeit("cmpflx (8,8)", make_cmpflx((8,8)), qm,qp,gl,gr,cl,cr)
timeit("cmpflx (32,32)", make_cmpflx((32,32)), qm,qp,gl,gr,cl,cr)
timeit("cmpflx (8,128) row", make_cmpflx((8,)), qm,qp,gl,gr,cl,cr)
timeit("cmpflx (16,) row", make_cmpflx((16,)), qm,qp,gl,gr,cl,cr)
timeit("cmpflx (4,) row", make_cmpflx((4,)), qm,qp,gl,gr,cl,cr)

# pure-copy kernel as roofline probe: same blocks, trivial compute
def make_copy(tiles):
    def f(qm,qp,gl,gr,cl,cr):
        grid=(gshape[0]//tiles[0],)
        def bs(nc): return pl.BlockSpec((nc,tiles[0],gshape[1],gshape[2]), lambda i:(0,i,0,0))
        def kernel(qm_ref,qp_ref,gl_ref,gr_ref,cl_ref,cr_ref,flux_ref,qe_ref):
            flux_ref[...]=qm_ref[:L.NVAR]+qp_ref[:L.NVAR]
            qe_ref[...]=qm_ref[:L.NGDNV]*2.0
        out_shape=(jax.ShapeDtypeStruct((L.NVAR,)+gshape,jnp.float32),
                   jax.ShapeDtypeStruct((L.NGDNV,)+gshape,jnp.float32))
        return pl.pallas_call(kernel, grid=grid,
            in_specs=[bs(L.NQ),bs(L.NQ),bs(1),bs(1),bs(1),bs(1)],
            out_specs=(bs(L.NVAR),bs(L.NGDNV)), out_shape=out_shape)(qm,qp,gl[None],gr[None],cl[None],cr[None])
    return f
timeit("copy-roofline (8,) same IO", make_copy((8,)), qm,qp,gl,gr,cl,cr)
