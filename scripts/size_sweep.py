"""FOM vs grid size on the TPU chip (fused-path coverage at large n)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_n(n, steps=10):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from castro_tpu.driver.sim import Simulation
    from castro_tpu.problems import sedov

    params = sedov.make_params(n=n, dim=3, stop_time=1.0, r_init=0.1,
                               exp_energy=0.5, dtype="float32")
    sim = Simulation(params, problem_init=sedov.problem_init)
    sim.init_data()
    dt0 = np.float32(float(sim._jit_estdt(sim.u)) * 0.5)

    @jax.jit
    def multi_step(u, dt, k):
        def body(i, carry):
            u, dt = carry
            u_new, _, _ = sim._step_impl(u, dt, 0.0)
            return u_new, dt
        u, dt = lax.fori_loop(0, k, body, (u, dt))
        return u

    u = multi_step(sim.u, dt0, 2)
    jax.block_until_ready(u)
    t0 = time.perf_counter()
    u = multi_step(u, dt0 * 0.5, steps)
    jax.block_until_ready(u)
    el = time.perf_counter() - t0
    fom = n ** 3 * steps / el / 1e6
    print(f"n={n}: pallas={sim.cfg.use_pallas} {fom:.2f} zones/us "
          f"({el/steps*1e3:.1f} ms/step)", flush=True)
    del multi_step, u, sim
    return fom


if __name__ == "__main__":
    sizes = [int(s) for s in sys.argv[1:]] or [120, 184, 248]
    for n in sizes:
        bench_n(n)
