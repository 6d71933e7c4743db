"""FOM benchmark: cell-updates/sec/chip on 3D Sedov pure gamma-law hydro.

Mirrors the reference's figure of merit — average zones advanced per
microsecond (`Source/driver/main.cpp:169-214`; the `inputs.mini-Castro`
Sedov GPU benchmark config). Baseline target (BASELINE.json): 1e8
cell-updates/sec/chip = 100 zones/us/chip on TPU.

Prints ONE JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from castro_tpu.driver.sim import Simulation
    from castro_tpu.problems import sedov

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    # n chosen so the grown extent n+2*NG is a multiple of 128: the TPU
    # vector lanes tile the last dim in 128s, so unaligned grown shapes
    # waste ~2x bandwidth (measured 14.9 -> 26 zones/us at 128 vs 120)
    n = 120 if on_tpu else 64
    warm_steps, bench_steps = (5, 20) if on_tpu else (2, 5)

    params = sedov.make_params(n=n, dim=3, stop_time=1.0, r_init=0.1,
                               exp_energy=0.5, dtype="float32")
    sim = Simulation(params, problem_init=sedov.problem_init)
    sim.init_data()

    dt0 = float(sim._jit_estdt(sim.u)) * 0.5

    def one_step(u, dt):
        u_new, _, _ = sim._step_impl(u, dt, 0.0)
        return u_new

    @jax.jit
    def multi_step(u, dt, k):
        def body(i, carry):
            u, dt = carry
            return one_step(u, dt), dt * 1.0
        u, dt = lax.fori_loop(0, k, body, (u, dt))
        return u

    u = multi_step(sim.u, jnp.float32(dt0), warm_steps)
    jax.block_until_ready(u)

    t0 = time.perf_counter()
    u = multi_step(u, jnp.float32(dt0 * 0.5), bench_steps)
    jax.block_until_ready(u)
    elapsed = time.perf_counter() - t0

    zones = n**3 * bench_steps
    zups = zones / elapsed  # cell updates per second (single chip)
    baseline = 1.0e8
    print(json.dumps({
        "metric": "cell_updates_per_sec_per_chip (3D Sedov gamma-law hydro, "
                  f"{n}^3 f32, {'tpu' if on_tpu else 'cpu-fallback'})",
        "value": round(zups, 1),
        "unit": "zones/s",
        "vs_baseline": round(zups / baseline, 4),
    }))


if __name__ == "__main__":
    main()
