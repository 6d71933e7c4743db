"""Tests for the reacting_tests problem ports and the
triple_alpha_plus_cago network (reference
Exec/reacting_tests/{reacting_convergence,bubble_convergence,nse_test},
Microphysics networks/triple_alpha_plus_cago)."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.driver.sim import Simulation
from castro_tpu.problems import reacting_tests as rt


def _run(sim, nsteps, dt_frac=0.4):
    u = sim.u
    t = 0.0
    for _ in range(nsteps):
        d = float(sim._jit_estdt(u)) * dt_frac
        u, _, bad = sim._jit_step(u, d, t)
        t += d
        assert not bool(bad)
    return u, t


def test_triple_alpha_network_rates():
    """3-alpha produces C12 at He-flash conditions; C12(a,g) produces O16
    once C12 is present; mass is conserved."""
    from castro_tpu.network import make_network
    from castro_tpu.config import Params

    net = make_network(Params().with_ns(
        "network", network_name="triple_alpha_plus_cago"))
    rho = jnp.asarray(1e6)
    T = jnp.asarray(3e8)
    xn = jnp.asarray([0.6, 0.4, 0.0, 0.0])
    xd, ed = net.rhs(rho, T, xn)
    assert float(jnp.abs(jnp.sum(xd))) < 1e-12 * float(jnp.max(jnp.abs(xd)))
    assert float(xd[2]) > 0.0  # O16 production via C12(a,g)
    assert float(ed) > 0.0


def test_reacting_convergence_isentropic_init_and_burn():
    sim = Simulation(rt.reacting_convergence_params(n=32, dim=2),
                     problem_init=rt.reacting_convergence_init)
    sim.init_data()
    L = sim.layout
    u0 = np.asarray(sim.interior(sim.u))
    # the pressure bump compresses AND heats (isentrope): T and rho peak
    # together at the center
    T0 = u0[L.UTEMP]
    assert T0.max() > 1.3 * np.median(T0)
    ic = np.unravel_index(np.argmax(T0), T0.shape)
    assert u0[L.URHO][ic] > 1.2 * np.median(u0[L.URHO])
    u, _ = _run(sim, 10)
    ui = np.asarray(sim.interior(u))
    assert np.isfinite(ui).all()
    # burning: some C12 produced where it is hottest
    assert ui[L.UFS + 1].max() > u0[L.UFS + 1].max()


@pytest.mark.slow
def test_bubble_convergence_smoke():
    sim = Simulation(rt.bubble_convergence_params(n=32),
                     problem_init=rt.bubble_convergence_init)
    sim.init_data()
    L = sim.layout
    u0 = np.asarray(sim.interior(sim.u))
    assert u0[L.UTEMP].max() > 1.5 * np.median(u0[L.UTEMP])
    u, _ = _run(sim, 10)
    ui = np.asarray(sim.interior(u))
    assert np.isfinite(ui).all()
    assert ui[L.UMY].max() > 0.0  # buoyant rise


def test_nse_test_init_composition():
    """NSE at 6e9 K / 1e9 g/cc / Ye = 0.5 favors the iron group; the
    hotter center is more alpha-rich (photodisintegration) than the
    cooler edge — the gradient the nse_test convergence run advects."""
    sim = Simulation(rt.nse_test_params(n=32, dim=1),
                     problem_init=rt.nse_test_init)
    sim.init_data()
    L = sim.layout
    names = sim.network.spec_names
    u0 = np.asarray(sim.interior(sim.u))
    X = u0[L.UFS : L.UFS + L.nspec] / u0[L.URHO][None]
    ini = names.index("Ni56") if "Ni56" in names else None
    ihe = names.index("He4")
    heavy = sum(X[k] for k, nm in enumerate(names)
                if nm in ("Ni56", "Fe52", "Fe54", "Cr48"))
    assert heavy.max() > 0.3  # iron group dominates somewhere
    # center (hottest) has more He4 than the edge
    assert X[ihe][len(X[ihe]) // 2] > X[ihe][0]
    u, _ = _run(sim, 5)
    assert np.isfinite(np.asarray(sim.interior(u))).all()
