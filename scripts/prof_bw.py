import time, jax, jax.numpy as jnp, numpy as np

n = 256*1024*1024//4
a = jnp.ones((n,), jnp.float32)

for iters in [10, 50, 200]:
    @jax.jit
    def chain(a):
        def body(i, x): return x*1.0000001
        x = jax.lax.fori_loop(0, iters, body, a)
        return jnp.sum(x[:4])
    s = float(chain(a))  # warm
    t0=time.perf_counter(); s = float(chain(a)); dt = time.perf_counter()-t0
    gb = iters*2*256/1024
    print(f"iters={iters}: total {dt*1e3:.1f} ms, {gb:.0f} GB -> {gb/dt:.0f} GB/s")
