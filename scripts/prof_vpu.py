import time, jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

shape = (512, 512)
def make(body, iters):
    def kernel(x_ref, o_ref):
        def b(i, x): return body(x)
        o_ref[...] = jax.lax.fori_loop(0, iters, b, x_ref[...])
    @jax.jit
    def f(x):
        return pl.pallas_call(kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    return f

x = jnp.ones(shape, jnp.float32)*1.1
n = np.prod(shape)
def t(f):
    y=f(x); s=float(jnp.sum(y[:2,:2]))
    best=1e9
    for _ in range(3):
        t0=time.perf_counter(); y=f(x); s=float(jnp.sum(y[:2,:2])); best=min(best,time.perf_counter()-t0)
    return best

for name, body in [
    ("fma", lambda x: x*1.0000001+1e-9),
    ("div", lambda x: 1.0/(x+1e-9)),
    ("rsqrt", lambda x: jax.lax.rsqrt(x)+1.0),
    ("recip_approx", lambda x: pl.reciprocal(x, approx=True)+1e-9),
    ("exp", lambda x: jnp.exp(x*1e-9)),
]:
    d = t(make(body, 60000)) - t(make(body, 10000))
    print(f"{name}: {n*50000/d/1e12:.2f} Telem-iter/s -> per-elem-op {d/ (n*50000) *1e12:.2f} ps")
