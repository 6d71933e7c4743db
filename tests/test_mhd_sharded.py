"""MHD x sharding: decomposition invariance of the full MHD driver step
(reference: MHD is Castro with USE_MHD under the same MPI domain
decomposition — `Source/mhd/Castro_mhd.cpp` runs inside do_advance_ctu
with FillBoundary halo exchange on both the gas state and the face
fields). 1-chip vs 8-chip answers must agree to round-off."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from castro_tpu.config import Params
from castro_tpu.driver.sim import Simulation
from castro_tpu.parallel.decomp import (make_sharded_mhd_step,
                                        spatial_axis_names, state_sharding)
from castro_tpu.problems.util import fill_from_prim


def _params(n=16):
    p = Params()
    p = p.with_ns("amr", n_cell=(n, n, n))
    p = p.with_ns("geometry", prob_lo=(0.0,) * 3, prob_hi=(1.0,) * 3)
    p = p.with_ns("castro", lo_bc=(0, 0, 0), hi_bc=(0, 0, 0), do_mhd=1,
                  cfl=0.4, small_dens=1e-12, small_temp=1e-12,
                  small_pres=1e-15)
    p = p.with_ns("tpu", mesh_axes=("mx", "my", "mz"))
    return p


def _init(sim, u, b):
    """Div-free field: By = By(x) only (dBy/dy = 0), Bx/Bz uniform."""
    g, ng = sim.geom, sim.ng
    twopi = 2.0 * math.pi
    x = g.cell_centers(0, ng)
    y = g.cell_centers(1, ng)
    rho = 1.0 + 0.2 * jnp.sin(twopi * x) * jnp.cos(twopi * y)
    u = fill_from_prim(sim, u, rho, (0.3, 0.15, 0.05), p=1.0)
    shape = u.shape[1:]
    xf = g.faces_1d(0, ng)[:-1]
    bx = jnp.broadcast_to(jnp.full_like(xf, 0.5)[:, None, None], shape)
    xc = g.cell_centers_1d(0, ng)
    by = jnp.broadcast_to(
        (0.3 + 0.2 * jnp.sin(twopi * xc))[:, None, None], shape)
    bz = jnp.full(shape, 0.1)
    return u, (bx, by, bz)


def _interior_b(sim, b):
    ng = sim.ng
    sl = (slice(ng, -ng),) * sim.layout.dim
    return tuple(np.asarray(bb[sl]) for bb in b)


@pytest.mark.parametrize("mesh_shape,names",
                         [((2, 1, 1), ("mx", "my", "mz")),
                          ((2, 2, 2), ("mx", "my", "mz"))])
def test_sharded_mhd_matches_single_device(mesh_shape, names):
    params = _params(n=16)

    # single device: 3 CTU-CT driver steps
    sim = Simulation(params, problem_init=_init)
    sim.init_data()
    u, b = sim.u, sim.u_b
    dt = 2e-3
    for i in range(3):
        u, b, min_rho, bad = sim._jit_mhd_step(u, b, dt, i * dt)
    assert not bool(bad)
    ref_u = np.asarray(sim.interior(u))
    ref_b = _interior_b(sim, b)

    # sharded
    sim2 = Simulation(params, problem_init=_init)
    sim2.init_data()
    nd = int(np.prod(mesh_shape))
    devs = np.array(jax.devices()[:nd]).reshape(mesh_shape)
    mesh = Mesh(devs, names)
    step = make_sharded_mhd_step(sim2, mesh)
    sh_u = state_sharding(sim2, mesh)
    sh_b = NamedSharding(mesh, P(*spatial_axis_names(sim2, mesh)))
    us = jax.device_put(np.asarray(sim2.interior()), sh_u)
    bs = tuple(jax.device_put(v, sh_b)
               for v in _interior_b(sim2, sim2.u_b))
    for i in range(3):
        us, bs, min_rho, bad = step(us, bs, dt, i * dt)
    assert not bool(bad)
    got_u = np.asarray(us)

    assert np.allclose(got_u, ref_u, rtol=1e-11, atol=1e-11), \
        np.abs(got_u - ref_u).max()
    for d in range(3):
        got = np.asarray(bs[d])
        assert np.allclose(got, ref_b[d], rtol=1e-11, atol=1e-11), \
            (d, np.abs(got - ref_b[d]).max())

    # div B = 0 survives the decomposition (interior faces only); the
    # default production dtype is f32, so round-off = eps_f32 * B / dx
    got_b = [np.asarray(v) for v in bs]
    div = np.zeros((15, 15, 15))
    dx = 1.0 / 16
    for d in range(3):
        hi = [slice(0, 15)] * 3
        lo = [slice(0, 15)] * 3
        hi[d] = slice(1, 16)
        div += (got_b[d][tuple(hi)] - got_b[d][tuple(lo)]) / dx
    eps = np.finfo(got_b[0].dtype).eps
    assert np.abs(div).max() < 100 * eps / dx


@pytest.mark.parametrize("mesh_shape,names",
                         [((1, 2, 1), ("mx", "my", "mz")),
                          ((2, 2, 2), ("mx", "my", "mz"))])
def test_sharded_mhd_slipwall_matches_single_device(mesh_shape, names):
    """Wall-bounded sharded MHD: domain-edge shards fill the face fields
    with the full filfc parities (wall-odd normal about the wall face,
    tangential even — `exchange_face(df=...)`), matching the
    single-device `MhdSolver._fill_b` to round-off. Previously the
    sharded path clamped at non-periodic edges (ROADMAP item)."""
    params = _params(n=16).with_ns("castro", lo_bc=(0, 4, 0),
                                   hi_bc=(0, 4, 0))

    def init_wall(sim, u, b):
        g, ng = sim.geom, sim.ng
        twopi = 2.0 * math.pi
        x = g.cell_centers(0, ng)
        y = g.cell_centers(1, ng)
        rho = 1.0 + 0.2 * jnp.sin(twopi * x) * jnp.cos(twopi * y)
        u = fill_from_prim(sim, u, rho, (0.3, 0.0, 0.05), p=1.0)
        shape = u.shape[1:]
        xf = g.faces_1d(0, ng)[:-1]
        bx = jnp.broadcast_to(jnp.full_like(xf, 0.5)[:, None, None], shape)
        xc = g.cell_centers_1d(0, ng)
        by = jnp.broadcast_to(
            (0.2 * jnp.sin(twopi * xc))[:, None, None], shape)
        bz = jnp.full(shape, 0.1)
        return u, (bx, by, bz)

    sim = Simulation(params, problem_init=init_wall)
    sim.init_data()
    u, b = sim.u, sim.u_b
    dt = 2e-3
    for i in range(3):
        u, b, min_rho, bad = sim._jit_mhd_step(u, b, dt, i * dt)
    assert not bool(bad)
    ref_u = np.asarray(sim.interior(u))
    ref_b = _interior_b(sim, b)

    sim2 = Simulation(params, problem_init=init_wall)
    sim2.init_data()
    nd = int(np.prod(mesh_shape))
    devs = np.array(jax.devices()[:nd]).reshape(mesh_shape)
    mesh = Mesh(devs, names)
    step = make_sharded_mhd_step(sim2, mesh)
    sh_u = state_sharding(sim2, mesh)
    sh_b = NamedSharding(mesh, P(*spatial_axis_names(sim2, mesh)))
    us = jax.device_put(np.asarray(sim2.interior()), sh_u)
    bs = tuple(jax.device_put(v, sh_b)
               for v in _interior_b(sim2, sim2.u_b))
    for i in range(3):
        us, bs, min_rho, bad = step(us, bs, dt, i * dt)
    assert not bool(bad)
    got_u = np.asarray(us)

    assert np.allclose(got_u, ref_u, rtol=1e-11, atol=1e-11), \
        np.abs(got_u - ref_u).max()
    for d in range(3):
        got = np.asarray(bs[d])
        assert np.allclose(got, ref_b[d], rtol=1e-11, atol=1e-11), \
            (d, np.abs(got - ref_b[d]).max())
