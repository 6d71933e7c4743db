"""Profile the 3D Sedov bench step on TPU: per-kernel time breakdown."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n=120):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from castro_tpu.driver.sim import Simulation
    from castro_tpu.problems import sedov

    params = sedov.make_params(n=n, dim=3, stop_time=1.0, r_init=0.1,
                               exp_energy=0.5, dtype="float32")
    sim = Simulation(params, problem_init=sedov.problem_init)
    sim.init_data()
    print("use_pallas:", sim.cfg.use_pallas, "fused_prim:",
          sim._use_fused_prim, flush=True)
    dt0 = np.float32(float(sim._jit_estdt(sim.u)) * 0.5)

    @jax.jit
    def multi_step(u, dt, k):
        def body(i, carry):
            u, dt = carry
            u_new, _, _ = sim._step_impl(u, dt, 0.0)
            return u_new, dt
        u, dt = lax.fori_loop(0, k, body, (u, dt))
        return u

    u = multi_step(sim.u, dt0, 3)
    jax.block_until_ready(u)

    t0 = time.perf_counter()
    u = multi_step(u, dt0 * 0.5, 20)
    jax.block_until_ready(u)
    el = time.perf_counter() - t0
    print(f"n={n}: {n**3*20/el/1e6:.2f} zones/us total", flush=True)

    out = "/tmp/jaxprof"
    os.system(f"rm -rf {out}")
    with jax.profiler.trace(out):
        u = multi_step(u, dt0 * 0.5, 20)
        jax.block_until_ready(u)

    # parse the trace
    files = glob.glob(f"{out}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace produced; files:", glob.glob(f"{out}/**/*",
                                                     recursive=True))
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    durs = defaultdict(float)
    counts = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        cat = ev.get("args", {})
        name = ev.get("name", "?")
        pid = ev.get("pid")
        # keep device (TPU) lane events only: heuristics on name
        durs[name] += ev.get("dur", 0)
        counts[name] += 1
    tot = sum(durs.values())
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{d/1e3:10.2f} ms {counts[name]:6d}x  {name[:90]}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 120)
