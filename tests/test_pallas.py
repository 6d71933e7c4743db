"""Parity of the Pallas TPU fast path vs the XLA reference path, run via
the Pallas interpreter on CPU (ADVICE r1: the production use_pallas=True
float32 configuration previously had zero test coverage)."""



import numpy as np
import pytest

from castro_tpu.driver.sim import Simulation
from castro_tpu.ops import pallas_kernels as pk
from castro_tpu.problems import sedov


def _run(n_steps, use_pallas, dim=2):
    params = sedov.make_params(n=32, dim=dim, stop_time=0.1, r_init=0.1,
                               dtype="float32")
    sim = Simulation(params, problem_init=sedov.problem_init)
    sim.cfg = sim.cfg._replace(use_pallas=use_pallas)
    # recompute the fused-prim gate (normally set from cfg at construction)
    sim._use_fused_prim = (use_pallas and sim.layout.dim == 3
                           and getattr(sim.eos, "pallas_safe", False)
                           and sim.rad is None)
    sim.init_data()
    u = sim.u
    dt = np.float32(2e-3)
    for _ in range(n_steps):
        u, _, bad = sim._jit_step(u, dt, 0.0)
    assert not bool(bad)
    return np.asarray(sim.interior(u))


def test_pallas_step_parity_2d():
    ref = _run(3, use_pallas=False)
    pk.INTERPRET = True
    try:
        got = _run(3, use_pallas=True)
    finally:
        pk.INTERPRET = False
    # identical math modulo fusion/rounding order (float32)
    assert np.allclose(got, ref, rtol=2e-5, atol=2e-5), \
        np.abs(got - ref).max()


def test_pallas_step_parity_3d():
    ref = _run(2, use_pallas=False, dim=3)
    pk.INTERPRET = True
    try:
        got = _run(2, use_pallas=True, dim=3)
    finally:
        pk.INTERPRET = False
    assert np.allclose(got, ref, rtol=2e-5, atol=2e-5), \
        np.abs(got - ref).max()


@pytest.mark.parametrize("bcs", [(3, 3), (0, 0)],
                         ids=["symmetry-octant", "periodic"])
def test_pallas_step_parity_3d_bcs(bcs):
    """Mirror and periodic branches of the fused clean+fill / face kernels
    (the default Sedov config only exercises the outflow clamp)."""
    lo, hi = bcs

    def run(use_pallas):
        params = sedov.make_params(n=16, dim=3, stop_time=0.1, r_init=0.2,
                                   dtype="float32")
        params = params.with_ns("castro", lo_bc=(lo,) * 3, hi_bc=(hi,) * 3)
        sim = Simulation(params, problem_init=sedov.problem_init)
        sim.cfg = sim.cfg._replace(use_pallas=use_pallas)
        sim._use_fused_prim = (use_pallas and sim.layout.dim == 3
                               and getattr(sim.eos, "pallas_safe", False)
                               and sim.rad is None)
        sim.init_data()
        u = sim.u
        dt = np.float32(2e-3)
        for _ in range(2):
            u, _, bad = sim._jit_step(u, dt, 0.0)
        assert not bool(bad)
        return np.asarray(sim.interior(u))

    ref = run(False)
    pk.INTERPRET = True
    try:
        got = run(True)
    finally:
        pk.INTERPRET = False
    assert np.allclose(got, ref, rtol=2e-5, atol=2e-5), \
        np.abs(got - ref).max()
