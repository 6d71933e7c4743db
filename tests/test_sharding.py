"""Decomposition-invariance tests (SURVEY.md §4: 1-chip vs N-chip answers
agree — the TPU analog of the reference's MPI-count-independent regression
runs), on an 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from castro_tpu.driver.sim import Simulation
from castro_tpu.parallel.decomp import make_sharded_step, state_sharding
from castro_tpu.problems import sedov, sod


def _get_mesh(shape, names):
    devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


@pytest.mark.parametrize("mesh_shape,names", [((4,), ("mx",)), ((2, 2), ("mx", "my"))])
def test_sharded_matches_single_device_2d(mesh_shape, names):
    params = sedov.make_params(n=64, dim=2, stop_time=0.02, r_init=0.05)
    params = params.with_ns("tpu", mesh_axes=("mx", "my", "mz"))

    # single-device run, 5 steps
    sim = Simulation(params, problem_init=sedov.problem_init)
    sim.init_data()
    u_ref = sim.u
    dt = 1e-4
    for _ in range(5):
        u_ref, _, _ = sim._jit_step(u_ref, dt, 0.0)
    ref = np.asarray(sim.interior(u_ref))

    # sharded run
    sim2 = Simulation(params, problem_init=sedov.problem_init)
    sim2.init_data()
    mesh = _get_mesh(mesh_shape, names)
    step = make_sharded_step(sim2, mesh)
    u = jax.device_put(np.asarray(sim2.interior()), state_sharding(sim2, mesh))
    for _ in range(5):
        u, min_rho, nan = step(u, dt, 0.0)
    got = np.asarray(u)

    assert np.allclose(got, ref, rtol=1e-11, atol=1e-11), np.abs(got - ref).max()
    assert not bool(nan)


def test_sharded_periodic_wrap():
    """Advected pulse through the periodic boundary on a 4-way shard."""
    from castro_tpu.problems.util import fill_from_prim
    import jax.numpy as jnp

    params = sod.make_params(n=64, dim=1)
    params = params.with_ns("castro", lo_bc=(0,), hi_bc=(0,), cfl=0.8)
    params = params.with_ns("tpu", mesh_axes=("mx",))

    def init(sim, u):
        x = sim.geom.cell_centers(0, sim.ng)
        rho = 1.0 + 0.5 * jnp.exp(-((x - 0.8) ** 2) / 0.005)
        return fill_from_prim(sim, u, rho, (1.0, 0.0, 0.0), p=1.0)

    sim = Simulation(params, problem_init=init)
    sim.init_data()
    mesh = _get_mesh((4,), ("mx",))
    step = make_sharded_step(sim, mesh)
    u = jax.device_put(np.asarray(sim.interior()), state_sharding(sim, mesh))
    dt = 2e-3
    for _ in range(50):
        u, min_rho, nan = step(u, dt, 0.0)
    got = np.asarray(u)
    assert not bool(nan)
    L = sim.layout
    # mass conserved
    assert np.isclose(got[L.URHO].sum(), np.asarray(sim.interior())[L.URHO].sum(), rtol=1e-12)
    # pulse has moved by ~ u*t = 0.1 (peak near x=0.9)
    x = np.asarray(sim.geom.cell_centers_1d(0, 0))
    peak = x[np.argmax(got[L.URHO])]
    assert abs(peak - 0.9) < 0.05
