"""Distributed AMR: level 0 sharded over a device mesh, windows
replicated — answers must match the single-device hierarchy (the
reference's decomposition-independence property, SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from castro_tpu.driver.amr import AmrSimulation
from castro_tpu.problems import sedov


def _params(n=32):
    p = sedov.make_params(n=n, dim=2, r_init=0.12, exp_energy=0.3)
    p = p.with_ns("amr", max_level=1, regrid_int=2, n_error_buf=2,
                  refinement_indicators=("denerr",))
    p = p.with_ns("tpu", mesh_axes=("x", "y"))
    return p.replace(extra={"amr.denerr.field": "density",
                            "amr.denerr.relative_gradient": 0.1})


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_amr_sharded_matches_single_device():
    params = _params()

    ref = AmrSimulation(params, problem_init=sedov.problem_init)
    ref.init_data()

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("x", "y"))
    amr = AmrSimulation(params, problem_init=sedov.problem_init, mesh=mesh)
    amr.init_data()

    for _ in range(3):
        dt = ref.estimate_dt()
        ref.advance(dt)
        amr.advance(dt)
        ref.step_count += 1
        amr.step_count += 1

    for l in range(2):
        a = np.asarray(ref.u[l])
        b = np.asarray(amr.u[l])
        assert np.allclose(a, b, rtol=5e-12, atol=1e-13), \
            (l, np.abs(a - b).max())


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_amr_sharded_with_gravity():
    """Distributed 2-level hierarchy with composite Poisson gravity: the
    sharded level-0 solve (distributed MG) + replicated window solves
    agree with the single-device run."""
    from tests.test_composite_gravity import _blob_init, _mk

    params = _mk(32, max_level=1).with_ns("tpu", mesh_axes=("x", "y"))

    ref = AmrSimulation(params, problem_init=_blob_init)
    ref.init_data()
    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("x", "y"))
    amr = AmrSimulation(params, problem_init=_blob_init, mesh=mesh)
    amr.init_data()

    dt = 1e-3
    for _ in range(2):
        ref.advance(dt)
        amr.advance(dt)

    for l in range(2):
        a = np.asarray(ref.u[l])
        b = np.asarray(amr.u[l])
        assert np.allclose(a, b, rtol=1e-9, atol=1e-11), \
            (l, np.abs(a - b).max())


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_amr_distribute_fine_matches_replicated():
    """amr.distribute_fine=1: the PRIMARY fine window's step runs SHARDED
    over the mesh (instead of replicated) and reproduces the replicated
    2-level run to round-off (the reference distributes fine grids like
    any level — BoxArray/DistributionMapping; SURVEY P5)."""
    params = _params()

    ref = AmrSimulation(params, problem_init=sedov.problem_init)
    ref.init_data()

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("x", "y"))
    pdist = params.with_ns("amr", distribute_fine=1)
    amr = AmrSimulation(pdist, problem_init=sedov.problem_init, mesh=mesh)
    amr.init_data()
    lev = amr._get_level(1, amr.window[1][1])
    assert lev.jit_sharded_step is not None

    for _ in range(3):
        dt = ref.estimate_dt()
        ref.advance(dt)
        amr.advance(dt)

    for l in range(2):
        a = np.asarray(ref.u[l])
        b = np.asarray(amr.u[l])
        assert np.allclose(a, b, rtol=5e-12, atol=1e-13), \
            (l, np.abs(a - b).max())
