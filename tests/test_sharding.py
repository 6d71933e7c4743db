"""Decomposition-invariance tests (SURVEY.md §4: 1-chip vs N-chip answers
agree — the TPU analog of the reference's MPI-count-independent regression
runs), on an 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from castro_tpu.driver.sim import Simulation
from castro_tpu.parallel.decomp import make_sharded_step, state_sharding
from castro_tpu.problems import sedov, sod


def _get_mesh(shape, names):
    devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


@pytest.mark.parametrize("mesh_shape,names", [((4,), ("mx",)), ((2, 2), ("mx", "my"))])
def test_sharded_matches_single_device_2d(mesh_shape, names):
    params = sedov.make_params(n=64, dim=2, stop_time=0.02, r_init=0.05)
    params = params.with_ns("tpu", mesh_axes=("mx", "my", "mz"))

    # single-device run, 5 steps
    sim = Simulation(params, problem_init=sedov.problem_init)
    sim.init_data()
    u_ref = sim.u
    dt = 1e-4
    for _ in range(5):
        u_ref, _, _ = sim._jit_step(u_ref, dt, 0.0)
    ref = np.asarray(sim.interior(u_ref))

    # sharded run
    sim2 = Simulation(params, problem_init=sedov.problem_init)
    sim2.init_data()
    mesh = _get_mesh(mesh_shape, names)
    step = make_sharded_step(sim2, mesh)
    u = jax.device_put(np.asarray(sim2.interior()), state_sharding(sim2, mesh))
    for _ in range(5):
        u, min_rho, nan = step(u, dt, 0.0)
    got = np.asarray(u)

    assert np.allclose(got, ref, rtol=1e-11, atol=1e-11), np.abs(got - ref).max()
    assert not bool(nan)


def test_sharded_periodic_wrap():
    """Advected pulse through the periodic boundary on a 4-way shard."""
    from castro_tpu.problems.util import fill_from_prim
    import jax.numpy as jnp

    params = sod.make_params(n=64, dim=1)
    params = params.with_ns("castro", lo_bc=(0,), hi_bc=(0,), cfl=0.8)
    params = params.with_ns("tpu", mesh_axes=("mx",))

    def init(sim, u):
        x = sim.geom.cell_centers(0, sim.ng)
        rho = 1.0 + 0.5 * jnp.exp(-((x - 0.8) ** 2) / 0.005)
        return fill_from_prim(sim, u, rho, (1.0, 0.0, 0.0), p=1.0)

    sim = Simulation(params, problem_init=init)
    sim.init_data()
    mesh = _get_mesh((4,), ("mx",))
    step = make_sharded_step(sim, mesh)
    u = jax.device_put(np.asarray(sim.interior()), state_sharding(sim, mesh))
    dt = 2e-3
    for _ in range(50):
        u, min_rho, nan = step(u, dt, 0.0)
    got = np.asarray(u)
    assert not bool(nan)
    L = sim.layout
    # mass conserved
    assert np.isclose(got[L.URHO].sum(), np.asarray(sim.interior())[L.URHO].sum(), rtol=1e-12)
    # pulse has moved by ~ u*t = 0.1 (peak near x=0.9)
    x = np.asarray(sim.geom.cell_centers_1d(0, 0))
    peak = x[np.argmax(got[L.URHO])]
    assert abs(peak - 0.9) < 0.05


def _run_pair(params, problem_init, mesh_shape, names, nsteps, dt,
              rtol=1e-8, atol=1e-10):
    """Run single-device vs sharded and compare interiors."""
    sim = Simulation(params, problem_init=problem_init)
    sim.init_data()
    u_ref = sim.u
    for _ in range(nsteps):
        u_ref, _, _ = sim._jit_step(u_ref, dt, 0.0)
    ref = np.asarray(sim.interior(u_ref))

    sim2 = Simulation(params, problem_init=problem_init)
    sim2.init_data()
    mesh = _get_mesh(mesh_shape, names)
    step = make_sharded_step(sim2, mesh)
    u = jax.device_put(np.asarray(sim2.interior()), state_sharding(sim2, mesh))
    for _ in range(nsteps):
        u, min_rho, bad = step(u, dt, 0.0)
    got = np.asarray(u)
    assert not bool(bad)
    assert np.allclose(got, ref, rtol=rtol, atol=atol), \
        np.abs(got - ref).max()
    return got, ref


def test_sharded_full_physics_burning():
    """Decomposition invariance with Strang reactions (powerlaw network) —
    the sharded step runs the SAME _step_impl incl. both burn halves."""
    from castro_tpu.problems import detonation

    params = detonation.make_params(n=64)
    params = params.with_ns("tpu", mesh_axes=("mx",))
    # CFL-stable dt for this configuration (estdt ~ 2e-6)
    _run_pair(params, detonation.problem_init, (4,), ("mx",),
              nsteps=4, dt=1e-6)


def test_sharded_poisson_gravity_and_sponge():
    """Decomposition invariance with the distributed Poisson multigrid
    (isolated multipole BCs) + position-dependent sponge: 2D, 2x2 mesh."""
    import jax.numpy as jnp
    from castro_tpu.problems.util import fill_from_prim
    from castro_tpu.config import Params

    p = Params()
    n = 32
    p = p.with_ns("amr", n_cell=(n, n))
    p = p.with_ns("geometry", prob_lo=(-1.0,) * 3, prob_hi=(1.0,) * 3)
    p = p.with_ns("castro", lo_bc=(2, 2), hi_bc=(2, 2), do_grav=1,
                  do_sponge=1, sponge_lower_radius=0.6,
                  sponge_upper_radius=0.9, sponge_timescale=1e-2)
    p = p.with_ns("gravity", gravity_type="PoissonGrav")
    p = p.with_ns("tpu", mesh_axes=("mx", "my"))

    def init(sim, u):
        r = sim.geom.radius(sim.ng)
        rho = 1.0 + 2.0 * jnp.exp(-(r / 0.3) ** 2)
        return fill_from_prim(sim, u, rho, (0.0, 0.0, 0.0), p=1.0)

    _run_pair(p, init, (2, 2), ("mx", "my"), nsteps=3, dt=1e-3,
              rtol=1e-6, atol=1e-8)


def test_sharded_monopole_gravity():
    """Decomposition invariance for MonopoleGrav (radial binning with
    cross-shard psum): 2D, 4x2 mesh."""
    import jax.numpy as jnp
    from castro_tpu.problems.util import fill_from_prim
    from castro_tpu.config import Params

    p = Params()
    n = 32
    p = p.with_ns("amr", n_cell=(n, n))
    p = p.with_ns("geometry", prob_lo=(-1.0,) * 3, prob_hi=(1.0,) * 3)
    p = p.with_ns("castro", lo_bc=(2, 2), hi_bc=(2, 2), do_grav=1)
    p = p.with_ns("gravity", gravity_type="MonopoleGrav")
    p = p.with_ns("tpu", mesh_axes=("mx", "my"))

    def init(sim, u):
        r = sim.geom.radius(sim.ng)
        rho = 1.0 + 2.0 * jnp.exp(-(r / 0.3) ** 2)
        return fill_from_prim(sim, u, rho, (0.0, 0.0, 0.0), p=1.0)

    # tolerance note: the radial-bin mass sums reduce in different orders
    # on 1 vs 8 shards (psum reassociation), giving an inherent ~4e-11/step
    # linear f64 drift; 1e-9 is ~10x headroom over that floor while still
    # catching any real collective/decomposition error (those show up at
    # ~1e-6+).
    _run_pair(p, init, (4, 2), ("mx", "my"), nsteps=3, dt=1e-3,
              rtol=1e-9, atol=1e-9)


def test_sharded_gray_fld_update():
    """Distributed gray FLD implicit solve under shard_map matches the
    single-device answer (VERDICT r1 #3: the ABec multigrid must run
    multi-chip)."""
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P
    from castro_tpu.config import Params
    from castro_tpu.radiation.fld import FLDRadiation
    from castro_tpu.state import layout_from_params

    n = 32
    p = Params()
    p = p.with_ns("amr", n_cell=(n, n))
    p = p.with_ns("geometry", prob_lo=(0.0,) * 3, prob_hi=(1.0,) * 3)
    p = p.with_ns("castro", lo_bc=(2, 2), hi_bc=(2, 2), do_radiation=1)
    p = p.with_ns("radiation", const_kappa_p=5.0, const_kappa_r=5.0)
    from castro_tpu.geometry import geometry_from_params

    geom = geometry_from_params(p, jnp.float64)
    rad = FLDRadiation(p, geom, layout_from_params(p))

    key = np.random.default_rng(0)
    x = np.linspace(0, 1, n)
    X, Y = np.meshgrid(x, x, indexing="ij")
    Er = jnp.asarray(1e8 * (1.0 + np.exp(-((X - 0.5) ** 2 +
                                           (Y - 0.5) ** 2) / 0.02)))
    rho = jnp.asarray(1.0 + 0.1 * np.sin(2 * np.pi * X))
    T = jnp.asarray(100.0 + 10.0 * np.cos(2 * np.pi * Y))
    cv = jnp.full_like(rho, 1e8)
    e = cv * T
    dt = 1e-10

    Er1, e1, T1 = jax.jit(rad.gray_update)(Er, rho, e, T, cv, dt)

    mesh = _get_mesh((2, 2), ("mx", "my"))
    names = ("mx", "my")

    def local(Er, rho, e, T, cv):
        return rad.gray_update(Er, rho, e, T, cv, dt, axis_names=names)

    spec = P(*names)
    f = jax.jit(shard_map(local, mesh=mesh, in_specs=(spec,) * 5,
                          out_specs=(spec,) * 3))
    sh = NamedSharding(mesh, spec)
    Er2, e2, T2 = f(*(jax.device_put(a, sh) for a in (Er, rho, e, T, cv)))

    assert np.allclose(np.asarray(Er2), np.asarray(Er1), rtol=1e-7), \
        np.abs(np.asarray(Er2) - np.asarray(Er1)).max()
    assert np.allclose(np.asarray(e2), np.asarray(e1), rtol=1e-9)


def test_sharded_characteristic_rad_ctu_matches_single_device():
    """The characteristic rad-CTU coupling (radiation.hydro_coupling=1,
    the reference rad_hydro_combined scheme) runs UNDER THE MESH: the CTU
    rad chain on halo-exchanged ghosts, the implicit solve through the
    distributed multigrid. Answers match single-device to solver
    tolerance (previously sharded runs silently fell back to operator
    splitting)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from castro_tpu.config import Params
    from castro_tpu.parallel.decomp import (make_sharded_rad_step,
                                            state_sharding)
    from castro_tpu.problems.util import fill_from_prim

    n = 32
    p = Params()
    p = p.with_ns("amr", n_cell=(n, n))
    p = p.with_ns("geometry", prob_lo=(0.0,) * 3, prob_hi=(1.0,) * 3)
    p = p.with_ns("castro", do_radiation=1, do_hydro=1,
                  lo_bc=(0, 0), hi_bc=(0, 0))
    p = p.with_ns("radiation", const_kappa_p=1e-6, const_kappa_r=50.0,
                  limiter=0)
    p = p.with_ns("tpu", mesh_axes=("mx", "my", "mz"))

    def init(sim, u):
        r = sim.geom.radius(sim.ng, center=(0.5, 0.5))
        T = 0.1 + 1.0 * jnp.exp(-(r / 0.12) ** 2)
        return fill_from_prim(sim, u, 1.0, (0.0, 0.0, 0.0), T=T)

    nsteps, dt = 3, 2e-7
    ref = Simulation(p, problem_init=init)
    ref.init_data()
    assert ref.params.radiation.hydro_coupling == 1
    for _ in range(nsteps):
        u_new, st = ref.try_step(dt)
        assert st.success
        ref.u = u_new
    ref_u = np.asarray(ref.interior())
    ref_er = np.asarray(ref.u_rad)

    sim2 = Simulation(p, problem_init=init)
    sim2.init_data()
    mesh = _get_mesh((2, 2), ("mx", "my"))
    step = make_sharded_rad_step(sim2, mesh)
    sh_u = state_sharding(sim2, mesh)
    sh_er = NamedSharding(mesh, P("mx", "my"))
    u = jax.device_put(np.asarray(sim2.interior()), sh_u)
    Er = jax.device_put(np.asarray(sim2.u_rad), sh_er)
    rhs0 = jax.device_put(np.zeros_like(ref_er), sh_er)
    for _ in range(nsteps):
        u, Er, min_rho, bad = step(u, Er, dt, 0.0, rhs0)
    assert not bool(bad)
    got_u = np.asarray(u)
    got_er = np.asarray(Er)

    scale = np.abs(ref_er).max()
    assert np.abs(got_er - ref_er).max() / scale < 1e-6, \
        np.abs(got_er - ref_er).max() / scale
    su = np.abs(ref_u).max()
    assert np.abs(got_u - ref_u).max() / su < 1e-6, \
        np.abs(got_u - ref_u).max() / su


def test_sharded_multigroup_rad_ctu_matches_single_device():
    """Multigroup variant of the sharded characteristic rad-CTU test:
    per-group halo exchange (leading group axis), the batched per-group
    implicit solves through the distributed MG, and the f-space
    machinery all under shard_map."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from castro_tpu.config import Params
    from castro_tpu.parallel.decomp import (make_sharded_rad_step,
                                            state_sharding)
    from castro_tpu.problems.util import fill_from_prim

    n = 32
    p = Params()
    p = p.with_ns("amr", n_cell=(n, n))
    p = p.with_ns("geometry", prob_lo=(0.0,) * 3, prob_hi=(1.0,) * 3)
    p = p.with_ns("castro", do_radiation=1, do_hydro=1,
                  lo_bc=(0, 0), hi_bc=(0, 0))
    p = p.with_ns("radiation", ngroups=4, const_kappa_p=1e-6,
                  const_kappa_r=50.0, limiter=0,
                  lowest_group_hz=1e14, highest_group_hz=1e18,
                  do_inelastic_scattering=1)  # Compton under the mesh too
    p = p.with_ns("tpu", mesh_axes=("mx", "my", "mz"))

    def init(sim, u):
        r = sim.geom.radius(sim.ng, center=(0.5, 0.5))
        T = 0.1 + 1.0 * jnp.exp(-(r / 0.12) ** 2)
        return fill_from_prim(sim, u, 1.0, (0.0, 0.0, 0.0), T=T)

    nsteps, dt = 2, 2e-7
    ref = Simulation(p, problem_init=init)
    ref.init_data()
    assert ref.u_rad.shape[0] == 4
    for _ in range(nsteps):
        u_new, st = ref.try_step(dt)
        assert st.success
        ref.u = u_new
    ref_u = np.asarray(ref.interior())
    ref_er = np.asarray(ref.u_rad)

    sim2 = Simulation(p, problem_init=init)
    sim2.init_data()
    mesh = _get_mesh((2, 2), ("mx", "my"))
    step = make_sharded_rad_step(sim2, mesh)
    sh_u = state_sharding(sim2, mesh)
    sh_er = NamedSharding(mesh, P(None, "mx", "my"))
    u = jax.device_put(np.asarray(sim2.interior()), sh_u)
    Er = jax.device_put(np.asarray(sim2.u_rad), sh_er)
    rhs0 = jax.device_put(np.zeros_like(ref_er), sh_er)
    for _ in range(nsteps):
        u, Er, min_rho, bad = step(u, Er, dt, 0.0, rhs0)
    assert not bool(bad)

    scale = np.abs(ref_er).max()
    assert np.abs(np.asarray(Er) - ref_er).max() / scale < 1e-6
    su = np.abs(ref_u).max()
    assert np.abs(np.asarray(u) - ref_u).max() / su < 1e-6
