"""HSE balance preservation + convergence (reference
Exec/gravity_tests/hse_convergence; SURVEY §4.3)."""

import numpy as np

from castro_tpu.problems import hse_convergence


def _max_vel(n, nsteps=20):
    sim = hse_convergence.build(n=n)
    sim.init_data()
    dt = 0.5 * float(sim._jit_estdt(sim.u))
    u = sim.u
    for _ in range(nsteps):
        u, _, bad = sim._jit_step(u, dt, 0.0)
        assert not bool(bad)
    L = sim.layout
    ui = np.asarray(sim.interior(u))
    return np.abs(ui[L.UMX] / ui[L.URHO]).max()


def test_hse_balance_converges():
    v64 = _max_vel(64)
    v128 = _max_vel(128)
    # residual velocities tiny compared to cs=1...
    assert v64 < 5e-4, v64
    # ...and converging at >= ~2nd order
    assert v128 < v64 / 3.0, (v64, v128)
