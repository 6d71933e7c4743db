"""Rotation source options (reference Source/rotation): implicit Coriolis
update stability (Katz et al. 2016 Sec 2.4), inertial-frame source form,
rotational potential energy coupling."""

import numpy as np
import pytest

import jax.numpy as jnp

from castro_tpu.config import Params
from castro_tpu.driver.sim import Simulation
from castro_tpu.problems.util import fill_from_prim


def _params(n=16, period=1.0, implicit=1, frame=1, centrifugal=0,
            rot_source_type=3):
    p = Params()
    p = p.with_ns("amr", n_cell=(n, n))
    p = p.with_ns("geometry", prob_lo=(-0.5, -0.5, 0.0),
                  prob_hi=(0.5, 0.5, 1.0))
    p = p.with_ns("castro", lo_bc=(0, 0), hi_bc=(0, 0), do_rotation=1,
                  rotational_period=period,
                  implicit_rotation_update=implicit,
                  state_in_rotating_frame=frame,
                  rotation_include_centrifugal=centrifugal,
                  rot_source_type=rot_source_type,
                  do_hydro=0, small_dens=1e-12, small_temp=1e-12)
    p = p.with_ns("eos", eos_gamma=1.4)
    p = p.with_ns("tpu", dtype="float64")
    return p


def _init_uniform_v(sim, u):
    return fill_from_prim(sim, u, 1.0, (0.1, 0.0, 0.0), p=1.0)


def _run_speed(implicit, omega_dt, nsteps=40):
    """Uniform velocity in a periodic rotating box (pure inertial-circle
    ODE per cell): |v| is exactly conserved by the true solution."""
    period = 1.0
    omega = 2 * np.pi / period
    dt = omega_dt / omega
    sim = Simulation(_params(implicit=implicit),
                     problem_init=_init_uniform_v)
    sim.init_data()
    u = sim.u
    L = sim.layout
    for _ in range(nsteps):
        u, _, bad = sim._jit_step(u, dt, 0.0)
        assert not bool(bad)
    ui = np.asarray(sim.interior(u))
    v = np.sqrt(ui[L.UMX] ** 2 + ui[L.UMY] ** 2) / ui[L.URHO]
    return float(v.mean())


def test_implicit_coriolis_speed_preserving():
    """At moderate Omega*dt the implicit update keeps |v| near-constant;
    the explicit centered corrector drifts noticeably more."""
    v_imp = _run_speed(implicit=1, omega_dt=0.5)
    v_exp = _run_speed(implicit=0, omega_dt=0.5)
    assert abs(v_imp - 0.1) < 2e-3, v_imp
    assert abs(v_imp - 0.1) < abs(v_exp - 0.1), (v_imp, v_exp)


def test_implicit_coriolis_stable_large_omega_dt():
    """Omega*dt = 4: the explicit treatment is far outside its stability
    region; the implicit solve stays bounded."""
    v_imp = _run_speed(implicit=1, omega_dt=4.0, nsteps=30)
    assert np.isfinite(v_imp) and v_imp < 0.3, v_imp


def test_inertial_frame_source_is_half():
    """state_in_rotating_frame=0 uses the -Omega x v form (half the
    rotating-frame Coriolis, no centrifugal): one explicit small step
    rotates v by omega*dt instead of 2*omega*dt."""
    period = 1.0
    omega = 2 * np.pi / period
    dt = 1e-3
    out = {}
    for frame in (1, 0):
        sim = Simulation(_params(implicit=0, frame=frame),
                         problem_init=_init_uniform_v)
        sim.init_data()
        u, _, bad = sim._jit_step(sim.u, dt, 0.0)
        L = sim.layout
        ui = np.asarray(sim.interior(u))
        out[frame] = float((ui[L.UMY] / ui[L.URHO]).mean())
    # dv_y = -(factor) * omega * v_x * dt with factor 2 (rotating) vs 1
    assert np.isclose(out[1] / out[0], 2.0, rtol=0.02), out
