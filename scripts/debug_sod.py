import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import sod
from castro_tpu.ops.advection_util import ctoprim
from castro_tpu.ops.ctu import ctu_hydro

print("devices:", jax.devices())

params = sod.make_params(n=128, dim=1)
sim = Simulation(params, problem_init=sod.problem_init)
sim.init_data()
L = sim.layout
u = sim.u
print("u0 finite:", bool(jnp.all(jnp.isfinite(u))))
print("rho range", float(u[L.URHO].min()), float(u[L.URHO].max()))
print("eint range", float(u[L.UEINT].min()), float(u[L.UEINT].max()))
print("T range", float(u[L.UTEMP].min()), float(u[L.UTEMP].max()))

dt = sim.estimate_dt()
print("dt =", dt)

u_f = sim._fill(u)
q, qaux = ctoprim(u_f, L, sim.eos, sim.cfg.small_dens, 1e-12)
print("q finite:", bool(jnp.all(jnp.isfinite(q))), "qaux finite:", bool(jnp.all(jnp.isfinite(qaux))))
print("p range", float(q[L.QPRES].min()), float(q[L.QPRES].max()))
print("c range", float(qaux[L.QC].min()), float(qaux[L.QC].max()))

hsrc, fluxes, qes, shk = ctu_hydro(u_f, q, qaux, None, dt, sim.geom, L, sim.cfg)
print("hsrc finite:", bool(jnp.all(jnp.isfinite(hsrc))))
for comp in range(L.NVAR):
    h = hsrc[comp]
    print(comp, "finite", bool(jnp.all(jnp.isfinite(h))), float(jnp.nanmin(h)), float(jnp.nanmax(h)))
print("flux0 finite:", bool(jnp.all(jnp.isfinite(fluxes[0]))))
u1 = u_f + dt * hsrc
print("u1 rho min interior:", float(sim.interior(u1)[L.URHO].min()))
