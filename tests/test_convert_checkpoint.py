"""ConvertCheckpoint/Embiggen analog (reference Util/ConvertCheckpoint):
enlarge a checkpoint domain by grown_factor and restart from it."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.driver import io as io_mod
from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import sedov
from castro_tpu.utils.convert_checkpoint import embiggen, grown_params


def test_embiggen_roundtrip(tmp_path):
    n = 16
    params = sedov.make_params(n=n, dim=2, r_init=0.2)
    sim = Simulation(params, problem_init=sedov.problem_init)
    sim.init_data()
    # advance a little so the state is nontrivial
    u = sim.u
    for _ in range(3):
        u, _, bad = sim._jit_step(u, 1e-3, 0.0)
        assert not bool(bad)
    sim.u = u
    sim.t = 3e-3
    sim.step_count = 3
    chk = io_mod.write_checkpoint(sim, path=str(tmp_path / "chk"))

    big_path, n_new = embiggen(chk, str(tmp_path / "chk_big"),
                               grown_factor=2, star_at_center=True)
    assert n_new == [32, 32]

    big_params = grown_params(params, grown_factor=2, star_at_center=True)
    sim2 = Simulation(big_params, problem_init=sedov.problem_init)
    sim2.init_data()
    io_mod.restart(sim2, big_path)
    assert sim2.t == sim.t and sim2.step_count == 3

    # the original interior sits centered in the new domain
    old = np.asarray(sim.interior())
    new = np.asarray(sim2.interior())
    off = (32 - 16) // 2
    assert np.array_equal(new[:, off:off + n, off:off + n], old)
    # ambient fill outside
    assert np.allclose(new[0, 0, 0], old[0, 0, 0])

    # and the enlarged run advances cleanly
    u2, _, bad = sim2._jit_step(sim2.u, 1e-3, sim2.t)
    assert not bool(bad)
    assert np.isfinite(np.asarray(u2)).all()
