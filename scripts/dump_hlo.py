"""Dump the compiled HLO of the bench step; map fusion/custom-call names."""
import os
import re
import sys

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

    @jax.jit
    def multi_step(u, dt, k):
        def body(i, carry):
            u, dt = carry
            u_new, _, _ = sim._step_impl(u, dt, 0.0)
            return u_new, dt
        u, dt = lax.fori_loop(0, k, body, (u, dt))
        return u

    txt = multi_step.lower(sim.u, jnp.float32(1e-4), 20).compile().as_text()
    with open("/tmp/bench_hlo.txt", "w") as f:
        f.write(txt)
    # every custom-call (pallas) with its name + metadata line
    for m in re.finditer(r'(\S+) = .*custom-call.*', txt):
        line = m.group(0)
        meta = re.search(r'metadata=\{op_name="([^"]*)"', line)
        kern = re.search(r'kernel_name="([^"]*)"', line)
        print(m.group(1)[:20], "|", (kern.group(1) if kern else "?"), "|",
              (meta.group(1)[:100] if meta else "?"))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 120)
