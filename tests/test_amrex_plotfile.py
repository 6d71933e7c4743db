"""AMReX/BoxLib plotfile format round-trip (+ yt readability when yt is
available). Reference format: Castro_io.cpp:853-1100 + AMReX VisMF."""

import numpy as np
import pytest

from castro_tpu.driver import amrex_plotfile as apf


def test_roundtrip_3d(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((3, 8, 12, 16))
    path = str(tmp_path / "plt00000")
    apf.write_plotfile(path, [{"data": data}],
                       ["density", "xmom", "rho_E"], 0.125,
                       [0.0, 0.0, 0.0], [1.0, 1.5, 2.0],
                       level_steps=[7])
    out = apf.read_plotfile(path)
    assert out["varnames"] == ["density", "xmom", "rho_E"]
    assert out["time"] == 0.125
    assert np.array_equal(out["levels"][0]["data"], data)


def test_roundtrip_2d_multilevel(tmp_path):
    rng = np.random.default_rng(1)
    coarse = rng.standard_normal((2, 16, 16))
    fine = rng.standard_normal((2, 16, 24))  # window at offset (8, 4)
    path = str(tmp_path / "plt00001")
    apf.write_plotfile(
        path,
        [{"data": coarse},
         {"data": fine, "lo": (8, 4), "domain_lo": (0, 0),
          "domain_hi": (31, 31)}],
        ["density", "Temp"], 1.0, [0.0, 0.0], [1.0, 1.0])
    out = apf.read_plotfile(path)
    assert np.array_equal(out["levels"][0]["data"], coarse)
    lev1 = out["levels"][1]["data"]
    assert np.array_equal(lev1[:, 8:24, 4:28], fine)
    assert np.isnan(lev1[:, 0, 0]).all()  # uncovered region


def test_sim_plotfile_is_amrex_readable(tmp_path):
    """Simulation.write_plotfile emits the AMReX layout alongside npz."""
    from castro_tpu.driver import io as io_mod
    from castro_tpu.driver.sim import Simulation
    from castro_tpu.problems import sedov

    params = sedov.make_params(n=16, dim=2)
    sim = Simulation(params, problem_init=sedov.problem_init)
    sim.init_data()
    path = io_mod.write_plotfile(sim, path=str(tmp_path / "plt"))
    out = apf.read_plotfile(path)
    assert "density" in out["varnames"]
    rho = out["levels"][0]["data"][out["varnames"].index("density")]
    assert np.allclose(rho, np.asarray(sim.interior())[sim.layout.URHO])

    try:
        import yt  # noqa: F401
    except ImportError:
        pytest.skip("yt not installed in this image")
    ds = yt.load(path)
    ad = ds.all_data()
    assert float(ad["boxlib", "density"].max()) > 0
