"""MHD as a first-class driver path (reference: USE_MHD=TRUE is just
Castro — same sources framework, retry, dt control, checkpoint/IO;
`Castro_mhd.cpp` called from `do_advance_ctu`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.config import Params
from castro_tpu.driver.sim import Simulation
from castro_tpu.ops.stencil import interior_slice
from castro_tpu.problems.util import fill_from_prim


def _params(n=8, gamma=5.0 / 3.0, **castro_kw):
    p = Params()
    p = p.with_ns("amr", n_cell=(n, n, n))
    p = p.with_ns("geometry", prob_lo=(0.0,) * 3, prob_hi=(1.0,) * 3)
    p = p.with_ns("castro", do_mhd=1, lo_bc=(0, 0, 0), hi_bc=(0, 0, 0),
                  **castro_kw)
    p = p.with_ns("eos", eos_gamma=gamma)
    return p


def _alfven_init(sim, u, b):
    """Circularly polarized Alfven wave along x."""
    rho0, p0, B0, amp = 1.0, 0.1, 1.0, 1e-3
    vA = B0 / np.sqrt(rho0)
    x = sim.geom.cell_centers(0, sim.ng)
    ph = 2 * np.pi * x
    vy = amp * vA * jnp.cos(ph)
    vz = amp * vA * jnp.sin(ph)
    shape = u.shape[1:]
    u = fill_from_prim(sim, u, rho0,
                       (jnp.zeros(shape), jnp.broadcast_to(vy, shape),
                        jnp.broadcast_to(vz, shape)), p=p0)
    xf = sim.geom.faces_1d(0, sim.ng)[: shape[0]]
    phf = 2 * np.pi * sim.geom.bshape(xf, 0)
    b = (jnp.full(shape, B0),
        jnp.broadcast_to(-amp * B0 * jnp.cos(ph), shape),
        jnp.broadcast_to(-amp * B0 * jnp.sin(ph), shape))
    return u, b


def test_driver_mhd_run_and_divb():
    """Simulation.run drives the CTU-CT MHD advance: dt from the MHD
    estdt, divB at round-off, finite state."""
    sim = Simulation(_params(), problem_init=_alfven_init)
    sim.init_data()
    assert sim.mhd is not None and sim.u_b is not None
    sim.run(max_step=3, verbose=False)
    assert sim.step_count == 3 and sim.t > 0
    inner = interior_slice(sim.ng, 3, 0)
    div = np.asarray(sim.mhd.div_b(sim.u_b))[inner]
    assert np.abs(div).max() < 1e-10
    assert np.all(np.isfinite(np.asarray(sim.interior())))


def test_driver_mhd_constant_gravity_source():
    """The sources framework applies to MHD runs: constant gravity
    accelerates a uniform magnetized gas at exactly g*t (periodic box,
    uniform B -> no MHD forces)."""
    g0 = -2.0
    p = _params(do_grav=1)
    p = p.with_ns("gravity", gravity_type="ConstantGrav", const_grav=g0)

    def init(sim, u, b):
        shape = u.shape[1:]
        u = fill_from_prim(sim, u, 1.0, (0.0, 0.0, 0.0), p=1.0)
        b = (jnp.full(shape, 0.3), jnp.zeros(shape), jnp.zeros(shape))
        return u, b

    sim = Simulation(p, problem_init=init)
    sim.init_data()
    dt = 1e-3
    for i in range(3):
        sim.advance(dt)
    L = sim.layout
    w = np.asarray(sim.interior())[L.UMZ]
    assert np.allclose(w, g0 * 3 * dt, rtol=1e-6), (w.mean(), g0 * 3 * dt)


def test_driver_mhd_checkpoint_restart(tmp_path):
    """Exact restart including the face-B fields."""
    from castro_tpu.driver import io as io_mod

    sim = Simulation(_params(), problem_init=_alfven_init)
    sim.init_data()
    sim.advance(1e-3)
    path = io_mod.write_checkpoint(sim, str(tmp_path / "chk"))

    sim2 = Simulation(_params(), problem_init=_alfven_init)
    sim2.init_data()
    io_mod.restart(sim2, path)
    assert np.array_equal(np.asarray(sim2.u), np.asarray(sim.u))
    for d in range(3):
        assert np.array_equal(np.asarray(sim2.u_b[d]),
                              np.asarray(sim.u_b[d]))
    # both continue identically
    sim.advance(1e-3)
    sim2.advance(1e-3)
    assert np.allclose(np.asarray(sim2.u), np.asarray(sim.u), atol=0,
                       rtol=0)
