"""Tracer particles, point-mass gravity, HSE/ambient fills
(reference: Source/particles, Castro_pointmass.cpp, hse_fill.cpp)."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.config import Params
from castro_tpu.driver.sim import Simulation
from castro_tpu.particles import TracerParticles
from castro_tpu.problems import sod
from castro_tpu.problems.util import fill_from_prim


def test_tracer_advection_uniform_flow():
    """Particles in a uniform periodic flow move at exactly the flow
    speed (with periodic wrap)."""
    params = sod.make_params(n=64, dim=2)
    params = params.with_ns("castro", lo_bc=(0, 0), hi_bc=(0, 0))

    def init(sim, u):
        return fill_from_prim(sim, u, 1.0, (1.0, 0.5, 0.0), p=1.0)

    sim = Simulation(params, problem_init=init)
    sim.init_data()
    pts = TracerParticles(sim, np.array([[0.25, 0.25], [0.9, 0.5]]))

    dt = 0.01
    for _ in range(20):
        pts.advance(dt)
        sim.t += dt
    x = np.asarray(pts.x)
    # displacement = v*t (mod 1)
    assert np.allclose(x[0], [(0.25 + 0.2) % 1, (0.25 + 0.1) % 1], atol=1e-10)
    assert np.allclose(x[1], [(0.9 + 0.2) % 1, (0.5 + 0.1) % 1], atol=1e-10)


def test_point_mass_gravity():
    from castro_tpu.gravity import Gravity
    from castro_tpu.state import layout_from_params
    from castro_tpu.geometry import geometry_from_params
    from castro_tpu.utils import constants as C

    p = Params()
    p = p.with_ns("amr", n_cell=(32, 32, 32))
    p = p.with_ns("geometry", prob_lo=(-1.0,) * 3, prob_hi=(1.0,) * 3)
    p = p.with_ns("castro", lo_bc=(2,) * 3, hi_bc=(2,) * 3, do_grav=1,
                  use_point_mass=1, point_mass=1e30)
    p = p.with_ns("gravity", gravity_type="ConstantGrav", const_grav=0.0)
    p = p.with_ns("tpu", dtype="float64")
    grav = Gravity(p, geometry_from_params(p), layout_from_params(p), 4)
    rho = jnp.zeros((32, 32, 32))
    g3, _ = grav.grav_vector(rho)
    gmag = np.sqrt(np.asarray((g3**2).sum(axis=0)))
    x = np.asarray(geometry_from_params(p).cell_centers_1d(0, 0))
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    r = np.sqrt(X**2 + Y**2 + Z**2)
    mask = (r > 0.3) & (r < 0.9)
    expect = C.Gconst * 1e30 / r[mask] ** 2
    assert np.allclose(gmag[mask], expect, rtol=1e-10)


def test_hse_fill_keeps_atmosphere_static():
    """Constant-gravity atmosphere with HSE boundary fills: boundary
    velocities stay far smaller than with plain reflecting walls."""
    from castro_tpu.problems.fills import make_hse_fill

    n = 64
    p = Params()
    p = p.with_ns("amr", n_cell=(n,))
    p = p.with_ns("geometry", prob_lo=(0.0,), prob_hi=(1.0,))
    p = p.with_ns("castro", lo_bc=(1,), hi_bc=(1,), do_grav=1, cfl=0.5,
                  small_dens=1e-12, small_temp=1e-12, small_pres=1e-15)
    p = p.with_ns("gravity", gravity_type="ConstantGrav", const_grav=-1.0)
    p = p.with_ns("eos", eos_gamma=1.4)
    p = p.with_ns("tpu", dtype="float64")

    H = 0.5
    c2 = H

    def init(sim, u):
        z = np.asarray(sim.geom.cell_centers_1d(0, sim.ng))
        dz = sim.geom.dx[0]
        rho = np.exp(-z / H)
        pres = np.empty_like(rho)
        pres[0] = c2 * rho[0]
        for i in range(1, len(z)):
            pres[i] = pres[i - 1] + 0.5 * (rho[i] + rho[i - 1]) * (-1.0) * dz
        return fill_from_prim(sim, u, jnp.asarray(rho), (0.0, 0.0, 0.0),
                              p=jnp.asarray(pres))

    sim = Simulation(p, problem_init=init)
    sim.problem_fill = make_hse_fill(sim, [(0, "lo"), (0, "hi")], -1.0)
    sim.run(stop_time=1.0, max_step=2000, verbose=False)
    L = sim.layout
    ui = np.asarray(sim.interior())
    vel = np.abs(ui[L.UMX] / ui[L.URHO])
    cs = np.sqrt(1.4 * c2)
    # the whole domain (including edges) stays quiet with HSE ghosts
    assert vel.max() < 2e-2 * cs, vel.max()
    assert vel[2:-2].max() < 5e-3 * cs


def test_hybrid_momentum_slots():
    """hybrid_momentum=1 adds UMR/UML/UMP; UML tracks x py - y px and the
    total angular momentum is conserved in a closed box (reference
    Source/hydro/Castro_hybrid.cpp)."""
    from castro_tpu.problems import sedov

    params = sedov.make_params(n=32, dim=2, stop_time=0.02, r_init=0.1,
                               exp_energy=0.3)
    params = params.with_ns("castro", hybrid_momentum=1, lo_bc=(0, 0),
                            hi_bc=(0, 0))

    def init(sim, u):
        u = sedov.problem_init(sim, u)
        # add a rotating velocity field
        g = sim.geom
        x = jnp.broadcast_to(g.cell_centers(0, sim.ng) - 0.5, u.shape[1:])
        y = jnp.broadcast_to(g.cell_centers(1, sim.ng) - 0.5, u.shape[1:])
        L = sim.layout
        u = u.at[L.UMX].set(-y * u[L.URHO])
        u = u.at[L.UMY].set(x * u[L.URHO])
        ke = 0.5 * (u[L.UMX] ** 2 + u[L.UMY] ** 2) / u[L.URHO]
        return u.at[L.UEDEN].set(u[L.UEINT] + ke)

    sim = Simulation(params, problem_init=init)
    sim.init_data()
    L = sim.layout
    assert L.UMR > 0 and L.NVAR == 11
    ui = np.asarray(sim.interior())
    x = np.asarray(sim.geom.cell_centers_1d(0, 0)) - 0.5
    y = np.asarray(sim.geom.cell_centers_1d(1, 0)) - 0.5
    uml_expect = x[:, None] * ui[L.UMY] - y[None, :] * ui[L.UMX]
    assert np.allclose(ui[L.UML], uml_expect, rtol=1e-12, atol=1e-12)

    aml0 = ui[L.UML].sum()
    sim.run(stop_time=0.02, verbose=False)
    ui = np.asarray(sim.interior())
    # transform stays consistent after evolution
    uml_expect = x[:, None] * ui[L.UMY] - y[None, :] * ui[L.UMX]
    assert np.allclose(ui[L.UML], uml_expect, rtol=1e-10, atol=1e-12)
    # angular momentum drift stays small over the short run (periodic
    # boxes don't conserve L about a fixed center exactly)
    assert abs(ui[L.UML].sum() - aml0) < 0.1 * abs(aml0)


def test_model_parser(tmp_path):
    """Initial-model file reader (Util/model_parser_cxx analog)."""
    from castro_tpu.utils.model_parser import InitialModel

    path = tmp_path / "model.hse"
    path.write_text("""# npts = 4
# num of variables = 3
# density
# temperature
# pressure
1.0  10.0 2e8 1e22
2.0   8.0 1e8 5e21
3.0   4.0 5e7 1e21
4.0   1.0 1e7 1e20
""")
    m = InitialModel.from_file(str(path))
    assert m.names == ["density", "temperature", "pressure"]
    assert np.isclose(m.interpolate("density", np.array([1.5]))[0], 9.0)
    # clamped outside the model
    assert np.isclose(m.interpolate("density", np.array([10.0]))[0], 1.0)


def test_profiler_report(capsys):
    from castro_tpu.utils import profiler

    profiler.reset()
    profiler.enable()
    with profiler.profile("phase_a"):
        sum(range(1000))
    with profiler.profile("phase_a"):
        pass
    import io as _io

    buf = _io.StringIO()
    profiler.report(out=buf)
    text = buf.getvalue()
    assert "phase_a" in text
    profiler.reset()


def test_source_term_predictor():
    """Lagged momentum-source predictor (Castro.cpp:3780-3836): for a
    CONSTANT source dS/dt = 0 so predictor=1 must match predictor=0
    exactly; it must also run stably over several steps."""
    import jax.numpy as jnp
    import numpy as np
    from castro_tpu.config import Params
    from castro_tpu.driver.sim import Simulation
    from castro_tpu.problems.util import fill_from_prim

    def mk(pred):
        p = Params()
        p = p.with_ns("amr", n_cell=(16, 16))
        p = p.with_ns("geometry", prob_lo=(0.0,) * 3, prob_hi=(1.0,) * 3)
        p = p.with_ns("castro", lo_bc=(0, 0), hi_bc=(0, 0), do_grav=1,
                      source_term_predictor=pred)
        p = p.with_ns("gravity", gravity_type="ConstantGrav",
                      const_grav=-1.0)
        return p

    def init(sim, u):
        return fill_from_prim(sim, u, 1.0, (0.0, 0.0, 0.0), p=1.0)

    sims = []
    for pred in (0, 1):
        s = Simulation(mk(pred), problem_init=init)
        s.init_data()
        for _ in range(3):
            s.advance(1e-3)
        sims.append(np.asarray(s.interior()))
    assert np.allclose(sims[0], sims[1], rtol=1e-12, atol=1e-14)


def test_point_mass_accretion():
    """point_mass_fix_solution=1 (Castro_pointmass.cpp:155): the center
    box is pinned to its pre-step state and its mass change accretes
    onto the point mass."""
    import jax.numpy as jnp
    import numpy as np
    from castro_tpu.config import Params
    from castro_tpu.driver.sim import Simulation
    from castro_tpu.problems.util import fill_from_prim

    p = Params()
    p = p.with_ns("amr", n_cell=(32, 32))
    p = p.with_ns("geometry", prob_lo=(-1.0,) * 3, prob_hi=(1.0,) * 3)
    p = p.with_ns("castro", lo_bc=(2, 2), hi_bc=(2, 2), do_grav=1,
                  use_point_mass=1, point_mass=1.0,
                  point_mass_fix_solution=1, small_dens=1e-10)
    p = p.with_ns("gravity", gravity_type="ConstantGrav", const_grav=0.0)

    def init(sim, u):
        r = sim.geom.radius(sim.ng, center=(0.0, 0.0))
        # radial inflow toward the center
        vx = -0.3 * sim.geom.cell_centers(0, sim.ng) / jnp.maximum(r, 0.1)
        vy = -0.3 * sim.geom.cell_centers(1, sim.ng) / jnp.maximum(r, 0.1)
        return fill_from_prim(sim, u, 1.0, (vx, vy, 0.0), p=1.0)

    sim = Simulation(p, problem_init=init)
    sim.init_data()
    box_before = np.asarray(sim.u)[:, 14:20, 14:20].copy()
    pm0 = sim.point_mass
    for _ in range(3):
        sim.advance(2e-3)
    # inflow piles mass toward the center: the fix removes it into the pm
    assert sim.point_mass > pm0, (sim.point_mass, pm0)
    assert np.all(np.isfinite(np.asarray(sim.interior())))


def test_problem_hooks_checkpoint_diagnostics_derives(tmp_path):
    """problem_checkpoint/restart/diagnostics/derives hooks (reference
    Source/problems/*.H header-injection points)."""
    import numpy as np
    from castro_tpu.config import Params
    from castro_tpu.driver import io as io_mod
    from castro_tpu.driver.diagnostics import sum_integrated_quantities
    from castro_tpu.driver.derive import registry
    from castro_tpu.driver.sim import Simulation
    from castro_tpu.problems import sod

    seen = {}

    def pchk(sim):
        return {"my_counter": 7}

    def prst(sim, d):
        seen["restored"] = d

    def pdiag(sim, u_int, sums):
        return {"custom_sum": 2.0 * sums["mass"]}

    derives = {"twice_density": lambda sim, u_int: 2.0 * u_int[0]}

    kw = dict(problem_init=sod.problem_init, problem_checkpoint=pchk,
              problem_restart=prst, problem_diagnostics=pdiag,
              problem_derives=derives)
    sim = Simulation(sod.make_params(n=16, dim=1), **kw)
    sim.init_data()
    sums = sum_integrated_quantities(sim)
    assert np.isclose(sums["custom_sum"], 2.0 * sums["mass"])
    reg = registry(sim)
    assert "twice_density" in reg
    v = np.asarray(reg["twice_density"](sim, np.asarray(sim.interior())))
    assert np.allclose(v, 2.0 * np.asarray(sim.interior())[0])

    path = io_mod.write_checkpoint(sim, str(tmp_path / "chk"))
    sim2 = Simulation(sod.make_params(n=16, dim=1), **kw)
    sim2.init_data()
    io_mod.restart(sim2, path)
    assert seen["restored"] == {"my_counter": 7}


def test_transverse_use_eos_runs():
    """transverse_use_eos=1 (edge_util.cpp reset_edge_state_thermo): the
    interface thermo re-evaluation path runs and stays close to the
    default (identical for gamma-law up to the p-evolution difference)."""
    import numpy as np
    from castro_tpu.driver.sim import Simulation
    from castro_tpu.problems import sedov

    outs = []
    for flag in (0, 1):
        p = sedov.make_params(n=16, dim=2, r_init=0.2, exp_energy=0.3)
        p = p.with_ns("castro", transverse_use_eos=flag)
        s = Simulation(p, problem_init=sedov.problem_init)
        s.init_data()
        for _ in range(3):
            s.advance(s.estimate_dt())
        outs.append(np.asarray(s.interior()))
    assert np.all(np.isfinite(outs[1]))
    rel = np.abs(outs[1][0] - outs[0][0]) / np.abs(outs[0][0])
    assert rel.max() < 0.05  # same physics, small closure difference


def test_particle_amr_redistribution():
    """Particles are assigned to the finest covering level after regrid
    (reference Redistribute()) and refined particles advect with the
    fine-window velocity field."""
    import numpy as np
    from castro_tpu.driver.amr import AmrSimulation
    from castro_tpu.particles import TracerParticles
    from tests.test_multiwindow_amr import (_two_blob_init,
                                            _two_blob_params)

    amr = AmrSimulation(_two_blob_params(), problem_init=_two_blob_init)
    amr.init_data()

    # a particle in each refined blob (one in the extra window), one in
    # the ambient region
    pts = np.array([[0.22, 0.22], [0.78, 0.78], [0.5, 0.1]])
    tp = TracerParticles(amr.sim0, pts)
    lev = tp.redistribute(amr)
    assert lev[0] == 1 and lev[1] == 1 and lev[2] == 0, lev

    for _ in range(2):
        dt = amr.estimate_dt()
        amr.advance(dt)
        tp.advance_amr(amr, dt)
    amr.regrid()
    lev2 = tp.redistribute(amr)
    assert lev2.shape == (3,)
    assert np.all(np.isfinite(np.asarray(tp.x)))
