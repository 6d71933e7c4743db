"""Worker for the 2-process jax.distributed smoke test (the closest this
environment gets to a TPU pod: two OS processes, one CPU device each,
collectives over gloo — exercising `multihost.initialize`, the global
mesh, and a sharded halo-exchange step across a real process boundary).

Usage: python scripts/multiproc_worker.py <coordinator> <nprocs> <pid>
Prints one line: `RESULT <sha of sharded-step output on this process>`.
"""
import os
import sys

coordinator, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from castro_tpu.parallel import multihost

assert multihost.initialize(coordinator_address=coordinator,
                            num_processes=nprocs, process_id=pid), \
    "multi-process runtime did not come up"
assert jax.process_count() == nprocs

import numpy as np
import jax.numpy as jnp

from castro_tpu.driver.sim import Simulation
from castro_tpu.parallel.decomp import make_sharded_step, state_sharding
from castro_tpu.problems import sedov

mesh = multihost.global_mesh((nprocs,), axis_names=("mx",))

params = sedov.make_params(n=32, dim=1, r_init=0.2, exp_energy=0.1,
                           dtype="float64")
params = params.with_ns("tpu", mesh_axes=("mx",))
sim = Simulation(params, problem_init=sedov.problem_init)
sim.init_data()

step = make_sharded_step(sim, mesh)
u_global = np.asarray(sim.interior())  # identical on both processes

# build the globally-sharded array from per-process local shards
from jax.sharding import NamedSharding, PartitionSpec as P

sharding = state_sharding(sim, mesh)
n_loc = u_global.shape[1] // nprocs
local = u_global[:, pid * n_loc:(pid + 1) * n_loc]
u = jax.make_array_from_single_device_arrays(
    u_global.shape, sharding,
    [jax.device_put(local, jax.local_devices()[0])])

dt = np.float64(1e-4)
for i in range(3):
    u, min_rho, bad = step(u, dt, i * dt)
assert not bool(bad), "sharded step produced NaNs"

# each process reports a digest of ITS addressable shard + the global
# reduction (must agree across processes)
shard = np.asarray([s.data for s in u.addressable_shards][0])
print(f"RESULT pid={pid} min_rho={float(min_rho):.17e} "
      f"shard_sum={float(shard.sum()):.17e}", flush=True)

# checkpoint-slab helper must partition the domain disjointly
sl = multihost.process_local_slice((u_global.shape[1],), mesh, ("mx",))
print(f"SLAB pid={pid} {sl[0].start}:{sl[0].stop}", flush=True)
jax.distributed.shutdown()
