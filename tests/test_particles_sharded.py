"""Tracer particles under a device mesh (SURVEY §2.7 particles x P1):
the sharded one-owner-psum advance matches the single-device advance
exactly (decomposition invariance), including shard-boundary crossings
and periodic wrap."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from castro_tpu.driver.sim import Simulation
from castro_tpu.particles import TracerParticles
from castro_tpu.problems import sedov, sod
from castro_tpu.problems.util import fill_from_prim


def _get_mesh(shape, names):
    devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


@pytest.mark.parametrize("mesh_shape,names",
                         [((4,), ("mx",)), ((2, 2), ("mx", "my"))])
def test_sharded_particle_advance_matches_single(mesh_shape, names):
    """Nonuniform (Sedov) velocity field: particles scattered across all
    shard subdomains, including ones sitting on shard boundaries."""
    params = sedov.make_params(n=64, dim=2, stop_time=0.02, r_init=0.05)
    params = params.with_ns("tpu", mesh_axes=("mx", "my", "mz"))
    sim = Simulation(params, problem_init=sedov.problem_init)
    sim.init_data()
    # evolve a few steps so the velocity field is nontrivial
    dt = 1e-4
    u = sim.u
    for _ in range(3):
        u, _, _ = sim._jit_step(u, dt, 0.0)
    sim.u = u

    rng = np.random.default_rng(42)
    pos = rng.uniform(0.05, 0.95, size=(64, 2))
    # pin some particles exactly on the 4-way shard boundaries
    pos[:8, 0] = np.array([0.25, 0.5, 0.75, 0.25, 0.5, 0.75, 0.5, 0.5])

    pts = TracerParticles(sim, pos.copy())
    x_ref = pts.x
    for _ in range(4):
        x_ref = pts._jit_advance(x_ref, sim.u, 5e-4)

    mesh = _get_mesh(mesh_shape, names)
    step = pts.make_sharded_advance(mesh)
    x = jnp.asarray(pos.copy(), sim.dtype)
    u_int = jnp.asarray(np.asarray(sim.interior()))
    for _ in range(4):
        x = step(x, u_int, 5e-4)

    assert np.allclose(np.asarray(x), np.asarray(x_ref),
                       rtol=1e-12, atol=1e-12), \
        np.abs(np.asarray(x) - np.asarray(x_ref)).max()


def test_sharded_particles_periodic_wrap_and_uniform_flow():
    """Uniform periodic flow across a 4-way shard: particles advect at
    exactly the flow speed, wrapping through both the domain boundary
    and the shard boundaries."""
    params = sod.make_params(n=64, dim=2)
    params = params.with_ns("castro", lo_bc=(0, 0), hi_bc=(0, 0))
    params = params.with_ns("tpu", mesh_axes=("mx", "my"))

    def init(sim, u):
        return fill_from_prim(sim, u, 1.0, (1.0, 0.5, 0.0), p=1.0)

    sim = Simulation(params, problem_init=init)
    sim.init_data()
    pts = TracerParticles(sim, np.array([[0.25, 0.25], [0.9, 0.5]]))
    mesh = _get_mesh((4,), ("mx",))
    step = pts.make_sharded_advance(mesh)
    x = pts.x
    u_int = jnp.asarray(np.asarray(sim.interior()))
    for _ in range(20):
        x = step(x, u_int, 0.01)
    x = np.asarray(x)
    assert np.allclose(x[0], [(0.25 + 0.2) % 1, (0.25 + 0.1) % 1],
                       atol=1e-10)
    assert np.allclose(x[1], [(0.9 + 0.2) % 1, (0.5 + 0.1) % 1],
                       atol=1e-10)
