"""Golden-file regression harness (reference QA mechanism: the nightly
AMReX regression tester bit-compares plotfiles against stored benchmarks,
SURVEY.md §4.1). Each config runs a fixed number of fixed-dt steps and the
full interior state is compared against a committed golden array.

Regenerate after an INTENTIONAL answer change with:
    CASTRO_TPU_REGEN_GOLDENS=1 python -m pytest tests/test_regression.py
and commit the updated tests/goldens/*.npz alongside the change that
explains why the answer moved.
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
REGEN = os.environ.get("CASTRO_TPU_REGEN_GOLDENS", "") == "1"


def _run_config(name):
    import jax.numpy as jnp
    from castro_tpu.driver.sim import Simulation

    if name == "sod_x":
        from castro_tpu.problems import sod
        p = sod.make_params(n=64, dim=1)
        sim = Simulation(p, problem_init=sod.problem_init)
        nsteps, dt = 20, 1.5e-3
    elif name == "sedov_2d":
        from castro_tpu.problems import sedov
        p = sedov.make_params(n=32, dim=2, r_init=0.1)
        sim = Simulation(p, problem_init=sedov.problem_init)
        nsteps, dt = 10, 5e-4
    elif name == "sedov_1d_sph":
        from castro_tpu.problems import sedov
        p = sedov.make_params(n=64, dim=1, coord=2, r_init=0.1)
        sim = Simulation(p, problem_init=sedov.problem_init)
        nsteps, dt = 10, 5e-4
    elif name == "detonation":
        from castro_tpu.problems import detonation
        p = detonation.make_params(n=64)
        sim = Simulation(p, problem_init=detonation.problem_init)
        nsteps, dt = 10, 1e-6
    elif name == "double_mach":
        from castro_tpu.problems import double_mach
        sim = double_mach.build(n=(64, 16))
        nsteps, dt = 10, 5e-4
    else:
        raise ValueError(name)

    sim.init_data()
    u = sim.u
    t = 0.0
    for _ in range(nsteps):
        u, _, bad = sim._jit_step(u, dt, t)
        assert not bool(bad), name
        t += dt
    return np.asarray(sim.interior(u))


CONFIGS = ["sod_x", "sedov_2d", "sedov_1d_sph", "detonation", "double_mach"]


@pytest.mark.parametrize("name", CONFIGS)
def test_golden(name):
    got = _run_config(name)
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if REGEN or not os.path.exists(path):
        np.savez_compressed(path, state=got.astype(np.float64))
        if not REGEN:
            pytest.skip(f"golden for {name} created; rerun to compare")
        return
    ref = np.load(path)["state"]
    assert got.shape == ref.shape, (got.shape, ref.shape)
    # tight tolerance: catches unintended numerics changes while allowing
    # benign cross-platform rounding
    scale = np.abs(ref).max(axis=tuple(range(1, ref.ndim)), keepdims=True)
    adiff = np.abs(got - ref) / np.maximum(scale, 1e-300)
    assert adiff.max() < 1e-10, (name, adiff.max())


def test_reference_analytic_plotfile_golden():
    """Field-level comparison against a golden NOT produced by this
    repo's solver (VERDICT r2 #7): an AMReX-format plotfile whose data is
    the reference's shipped analytic Sedov solution
    (`Exec/hydro_tests/Sedov/Verification/spherical_sedov.dat`, Timmes
    sedov3), ingested through the reference-format plotfile reader."""
    import numpy as np

    from castro_tpu.driver.amrex_plotfile import read_plotfile
    from castro_tpu.driver.sim import Simulation
    from castro_tpu.problems import sedov

    gold = read_plotfile("tests/goldens/sedov_ref_analytic_plt")
    assert gold["varnames"][:2] == ["density", "pressure"]
    rho_gold = gold["levels"][0]["data"][0]
    n = rho_gold.shape[0]

    params = sedov.make_params(n=n, dim=1, coord=2, stop_time=0.01,
                               r_init=0.01, p_ambient=1e-5, exp_energy=1.0,
                               prob_hi=0.5)
    params = params.with_ns("castro", lo_bc=(3,), hi_bc=(2,), cfl=0.5)
    sim = Simulation(params, problem_init=lambda s, u: sedov.problem_init(
        s, u, center=(0.0,)))
    sim.run(verbose=False)
    rho = np.asarray(sim.interior())[sim.layout.URHO]

    # L1 norm over the blast region (reference Verification tolerance
    # style); the discrete shock is 1-2 cells displaced vs analytic
    m = rho_gold > 1e-3
    l1 = np.abs(rho[m] - rho_gold[m]).sum() / rho_gold[m].sum()
    assert l1 < 0.2, l1
    # shock position: peak-density radius within 3 cells of analytic
    assert abs(int(np.argmax(rho)) - int(np.argmax(rho_gold))) <= 3
