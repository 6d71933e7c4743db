"""Ideal MHD (reference `Source/mhd/`, SURVEY.md §2.3)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from castro_tpu.driver.sim import Simulation
from castro_tpu.mhd.hlld import MhdFaceState, hlld, fast_speed
from castro_tpu.mhd.solver import MhdSolver, MhdState


class MhdSimulation:
    """Driver for ideal-MHD runs: owns a base Simulation (layout, geometry,
    EOS, BC machinery) + the MHD solver and the (u, face-B) state."""

    def __init__(self, params, problem_init=None):
        # force the MHD layout
        params = params.with_ns("castro", do_mhd=1)
        self.base = Simulation(params)
        self.solver = MhdSolver(self.base)
        self.problem_init = problem_init
        self.state = None
        self.t = 0.0
        self.step_count = 0
        # the CTU-CT scheme is dimension-general (3D: the reference
        # Miniati-Martin 12-solve algorithm; 2D/1D: its dimensional
        # reductions); mhd_ctu=0 selects the RK2 + flux-CT integrator
        use_ctu = bool(self.base.params.castro.mhd_ctu)
        self._jit_step = jax.jit(
            self.solver.step_ctu if use_ctu else self.solver.step_rk2)
        self._jit_estdt = jax.jit(
            lambda u, b: self.solver.estdt(u, b, params.castro.cfl))

    def init_data(self):
        u = self.base.allocate()
        b = tuple(jnp.zeros(self.base.grown_shape(), self.base.dtype)
                  for _ in range(3))
        if self.problem_init is not None:
            u, b = self.problem_init(self, u, b)
        # problem hooks set gas energies only; fold in the magnetic energy
        # (reference Castro::add_magnetic_e, Source/driver/Castro.H:823-850)
        L = self.base.layout
        bc = self.solver.cell_b(b)
        pb = 0.5 * sum(bb * bb for bb in bc)
        u = u.at[L.UEDEN].add(pb)
        u = self.solver._clean(u, b)
        b = tuple(self.solver._fill_b(bb, d) for d, bb in enumerate(b))
        # canonicalize dtypes (strong) so the first step compiles the same
        # program as subsequent ones (weak-typed literals in problem inits
        # otherwise force a second trace/compile of the big CTU-CT module)
        dt_ = self.base.dtype
        self.state = MhdState(jnp.asarray(u, dt_),
                              tuple(jnp.asarray(bb, dt_) for bb in b))
        return self.state

    def run(self, stop_time, max_step=10**9, verbose=False):
        if self.state is None:
            self.init_data()
        while self.t < stop_time * (1 - 1e-12) and self.step_count < max_step:
            dt = float(self._jit_estdt(self.state.u, self.state.b))
            dt = min(dt, stop_time - self.t)
            self.state = self._jit_step(self.state, dt)
            self.t += dt
            self.step_count += 1
            if verbose:
                print(f"MHD STEP {self.step_count} t={self.t:.4e} dt={dt:.3e}")
        return self

    def interior(self):
        return self.base.interior(self.state.u)

    def div_b_max(self):
        from castro_tpu.ops.stencil import interior_slice

        div = self.solver.div_b(self.state.b)
        return float(jnp.abs(div[interior_slice(self.base.ng, self.base.layout.dim, 0)]).max())


__all__ = ["MhdSimulation", "MhdSolver", "MhdState", "hlld", "fast_speed",
           "MhdFaceState"]
