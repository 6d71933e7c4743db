import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp, numpy as np
from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import sedov

n=120
params = sedov.make_params(n=n, dim=3, stop_time=1.0, r_init=0.1, exp_energy=0.5, dtype="float32")
sim = Simulation(params, problem_init=sedov.problem_init)
sim.init_data()
u = sim.u; L=sim.layout; ng=sim.ng

def timeit(name, fn, *args, reps=30):
    f = jax.jit(fn); out=f(*args); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(reps): out=f(*args)
    jax.block_until_ready(out)
    print(f"{name:30s} {(time.perf_counter()-t0)/reps*1e3:7.3f} ms")

timeit("fill current", lambda u: sim._fill(u), u)

# variant: per-axis clamp gather (outflow) via take
N = u.shape[1]
idx = np.clip(np.arange(N), ng, N-1-ng)
idxj = jnp.asarray(idx)
def fill_take(u):
    for ax in (1,2,3):
        u = jnp.take(u, idxj, axis=ax)
    return u
timeit("fill clamp-take x3", fill_take, u)

# variant: single gather via advanced indexing all at once
def fill_take1(u):
    return u[:, idxj[:,None,None], idxj[None,:,None], idxj[None,None,:]]
timeit("fill fancy-gather", fill_take1, u)

# fused clean_state: single stack
from castro_tpu.driver import clean as clean_mod
timeit("clean_state current", lambda u: clean_mod.clean_state(u, L, sim.eos, 1e-12, 1e-12), u)

def clean_fused(u):
    rho0 = u[L.URHO]
    bad = rho0 < 1e-12
    rho = jnp.where(bad, 1e-12, rho0)
    mom = [jnp.where(bad, 0.0, u[c]) for c in (L.UMX,L.UMY,L.UMZ)]
    xn = u[L.UFS:L.UFS+L.nspec] / jnp.where(bad, rho0, rho)[None]
    xn = jnp.where(bad[None], 1.0/L.nspec, xn)
    rx = jnp.clip(xn*rho[None], 1e-30*rho[None], rho[None])
    s = jnp.sum(rx, axis=0)
    rxn = rx * (rho/s)[None]
    es_small_e = sim.eos.rt(rho=rho, T=jnp.full(rho.shape, 1e-12, u.dtype), xn=rxn/rho[None]).e
    ueint0 = jnp.where(bad, rho*es_small_e, u[L.UEINT])
    ueden0 = jnp.where(bad, rho*es_small_e, u[L.UEDEN])
    ke = 0.5*(mom[0]**2+mom[1]**2+mom[2]**2)/rho
    rho_eint = ueden0 - ke
    eint = jnp.where((rho_eint>0.0)&(rho_eint/jnp.maximum(ueden0,1e-300)>1e-4), rho_eint, ueint0)
    rescue = eint <= 0.0
    eint = jnp.where(rescue, rho*es_small_e, eint)
    ueden = jnp.where(rescue, eint+ke, ueden0)
    es = sim.eos.re(rho=rho, e=eint/rho, xn=rxn/rho[None])
    T = jnp.maximum(es.T, 1e-12)
    comps = [None]*L.NVAR
    comps[L.URHO]=rho; comps[L.UMX],comps[L.UMY],comps[L.UMZ]=mom
    comps[L.UEINT]=eint; comps[L.UEDEN]=ueden; comps[L.UTEMP]=T
    for i in range(L.nspec): comps[L.UFS+i]=rxn[i]
    for i,c in enumerate(comps):
        if c is None: comps[i]=u[i]
    return jnp.stack(comps)
timeit("clean_state fused", clean_fused, u)

# check parity
a = jax.jit(lambda u: clean_mod.clean_state(u, L, sim.eos, 1e-12, 1e-12))(u)
b = jax.jit(clean_fused)(u)
print("clean parity:", float(jnp.max(jnp.abs(a-b))))
f1 = jax.jit(lambda u: sim._fill(u))(u)
f2 = jax.jit(fill_take)(u)
print("fill parity:", float(jnp.max(jnp.abs(f1-f2))))
