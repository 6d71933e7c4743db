"""Multi-host scaffolding (reference ParallelDescriptor::StartParallel /
amrex::Initialize MPI bootstrap; SURVEY.md §5.8): jax.distributed init
wrapper, global mesh construction, per-process IO slabs."""

import numpy as np
import jax

from castro_tpu.parallel import multihost


def test_initialize_single_process_noop():
    assert multihost.initialize() is False  # single-process environment
    assert jax.process_count() == 1


def test_global_mesh_shapes():
    mesh = multihost.global_mesh((2, 4), axis_names=("y", "z"))
    assert mesh.shape == {"y": 2, "z": 4}
    mesh3 = multihost.global_mesh((8,), axis_names=("x", "y", "z"))
    assert mesh3.shape == {"x": 1, "y": 1, "z": 8}
    try:
        multihost.global_mesh((3, 3))
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError for bad shape")


def test_process_local_slice_single_process():
    mesh = multihost.global_mesh((2, 4), axis_names=("y", "z"))
    sl = multihost.process_local_slice((64, 64), mesh, ("y", "z"))
    # single process owns every shard -> the full slab
    assert sl == (slice(0, 64), slice(0, 64))


def test_sharded_step_on_multihost_mesh():
    """The decomp step composes with a multihost-built mesh (all local
    here, but the same code path a pod run takes)."""
    from castro_tpu.driver.sim import Simulation
    from castro_tpu.parallel import decomp
    from castro_tpu.problems import sedov

    mesh = multihost.global_mesh((2, 2, 2), axis_names=("mx", "my", "mz"))
    sim = Simulation(sedov.make_params(n=16, dim=3),
                     problem_init=sedov.problem_init)
    sim.init_data()
    step = decomp.make_sharded_step(sim, mesh)
    u = jax.device_put(np.asarray(sim.interior()),
                       decomp.state_sharding(sim, mesh))
    u2, _, bad = step(u, 1e-4, 0.0)
    assert not bool(bad)
    ref, _, _ = sim._jit_step(sim.u, 1e-4, 0.0)
    ref_int = np.asarray(sim.interior(ref))
    np.testing.assert_allclose(np.asarray(u2), ref_int, rtol=0, atol=1e-10)
