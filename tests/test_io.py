"""Checkpoint/restart, plotfile, derived quantities, diagnostics
(reference: Castro_io.cpp behaviors, SURVEY.md §5.4/5.5)."""

import os

import numpy as np
import pytest

from castro_tpu.driver import diagnostics as diag
from castro_tpu.driver import io as cio
from castro_tpu.driver.derive import registry
from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import sod


def make_sim(tmp):
    params = sod.make_params(n=64, dim=1)
    params = params.with_ns("amr", check_file=os.path.join(tmp, "chk"),
                            plot_file=os.path.join(tmp, "plt"),
                            derive_plot_vars=("pressure", "MachNumber"))
    sim = Simulation(params, problem_init=sod.problem_init)
    sim.init_data()
    return sim


def test_checkpoint_restart_exact(tmp_path):
    sim = make_sim(str(tmp_path))
    sim.run(stop_time=0.05, verbose=False)
    path = cio.write_checkpoint(sim)
    u_ref = np.asarray(sim.u)
    t_ref, s_ref = sim.t, sim.step_count

    # continue the original
    sim.run(stop_time=0.1, verbose=False)
    u_cont = np.asarray(sim.u)

    # restart a fresh sim and continue identically
    sim2 = make_sim(str(tmp_path))
    cio.restart(sim2, path)
    assert sim2.t == t_ref and sim2.step_count == s_ref
    assert np.array_equal(np.asarray(sim2.u), u_ref)  # bit-exact state
    sim2.run(stop_time=0.1, verbose=False)
    assert np.allclose(np.asarray(sim2.u), u_cont, rtol=1e-13, atol=1e-13)


def test_restart_variable_check(tmp_path):
    sim = make_sim(str(tmp_path))
    path = cio.write_checkpoint(sim)
    # corrupt variable list
    import json

    mpath = os.path.join(path, "meta.json")
    meta = json.load(open(mpath))
    meta["state_variables"] = ["bogus"]
    json.dump(meta, open(mpath, "w"))
    sim2 = make_sim(str(tmp_path))
    with pytest.raises(ValueError):
        cio.restart(sim2, path)


def test_plotfile_roundtrip_and_derives(tmp_path):
    sim = make_sim(str(tmp_path))
    sim.run(stop_time=0.05, verbose=False)
    path = cio.write_plotfile(sim)
    meta, data = cio.read_plotfile(path)
    assert meta["time"] == sim.t
    assert "density" in data and "pressure" in data and "MachNumber" in data
    assert data["density"].shape == (64,)
    # derived pressure consistent with gamma-law
    ui = np.asarray(sim.interior())
    L = sim.layout
    p_expect = ui[L.UEINT] * 0.4
    assert np.allclose(data["pressure"], p_expect, rtol=1e-10)
    assert os.path.exists(os.path.join(path, "job_info"))


def test_sum_integrated_quantities_and_datalog(tmp_path):
    sim = make_sim(str(tmp_path))
    sums = diag.sum_integrated_quantities(sim)
    # Sod initial mass: 0.5*1.0 + 0.5*0.125
    assert np.isclose(sums["mass"], 0.5625, rtol=1e-12)
    assert np.isclose(sums["xmom"], 0.0, atol=1e-15)
    assert sums["total_energy"] > 0

    log = diag.DataLogger(str(tmp_path / "grid_diag.out"))
    log.log(sums)
    log.log(sums)
    lines = open(tmp_path / "grid_diag.out").read().splitlines()
    assert lines[0].startswith("# time mass")
    assert len(lines) == 3


def test_all_derives_evaluate(tmp_path):
    sim = make_sim(str(tmp_path))
    ui = np.asarray(sim.interior())
    reg = registry(sim)
    assert len(reg) >= 18
    for name, fn in reg.items():
        out = np.asarray(fn(sim, ui))
        assert out.shape == (64,), name
        assert np.isfinite(out).all(), name


def test_native_async_checkpoint(tmp_path):
    """Native threaded writer: checkpoint written off-thread, CRC verified
    on restart, corruption detected (cpp/castro_io.cpp)."""
    from castro_tpu.utils import native

    lib = native.get_lib()
    assert lib is not None, "native castro_io failed to build"

    sim = make_sim(str(tmp_path))
    sim.run(stop_time=0.02, verbose=False)
    w = native.AsyncWriter(2)
    path = cio.write_checkpoint(sim, str(tmp_path / "chk_async"),
                                async_writer=w)
    w.wait()
    assert w.ok()

    sim2 = make_sim(str(tmp_path))
    cio.restart(sim2, path)
    assert np.array_equal(np.asarray(sim2.u), np.asarray(sim.u))

    # corrupt one byte -> checksum failure on restart
    blob = (tmp_path / "chk_async" / "state.cio")
    raw = bytearray(blob.read_bytes())
    raw[40] ^= 0xFF
    blob.write_bytes(bytes(raw))
    sim3 = make_sim(str(tmp_path))
    with pytest.raises(ValueError):
        cio.restart(sim3, path)


def test_async_writer_many_files(tmp_path):
    from castro_tpu.utils import native

    w = native.AsyncWriter(4)
    blobs = {f"f{i}": bytes(np.random.default_rng(i).integers(
        0, 255, 10000, dtype=np.uint8)) for i in range(16)}
    for name, b in blobs.items():
        w.submit(str(tmp_path / name), b)
    w.wait()
    assert w.ok()
    for name, b in blobs.items():
        assert native.read_blob(str(tmp_path / name)) == b
